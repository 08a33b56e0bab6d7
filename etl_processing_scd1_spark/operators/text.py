"""Text-analysis operators (SURVEY.md §2.K K4): language-ID heuristic,
quality scoring, token counting, document fingerprinting. Pure
built-in string/array expressions — whole-stage codegen, no UDFs,
trivially linear-scalable scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword markers per language for the n-gram/stopword-ratio
# language heuristic. Deliberately small fixed lists: the operator
# demonstrates the argmax-over-marker-hits shape; production swaps in
# real frequency tables via the same columns.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "and", "is", "of", "to"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
}

TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def marker_scores(text: Column) -> dict[str, Column]:
    toks = _tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax over marker-hit counts, ties broken alphabetically
    (deterministic); 'und' (undetermined) when nothing matches."""
    scores = marker_scores(text)
    langs = sorted(scores)  # alphabetical tiebreak order
    best = None
    for lang in langs:
        cond = (scores[lang] > 0) & F.lit(True)
        for other in langs:
            if other < lang:
                cond = cond & (scores[lang] > scores[other])
            elif other > lang:
                cond = cond & (scores[lang] >= scores[other])
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single
    punctuation — the standard pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def quality_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality signals as exact integers/ratios in
    integer basis points (×10000) so thresholds are portable."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_spaces = n_chars - F.length(F.regexp_replace(text, " ", ""))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[w for ws in LANG_MARKERS.values() for w in ws]))
    )
    # floor (not cast) so truncation semantics are portable: Spark's
    # double→long cast truncates while other engines round.
    mean_tok_len_bp = F.when(
        n_tokens > 0, F.floor((n_chars - n_spaces) * 10000 / n_tokens)
    ).otherwise(F.lit(0)).cast("long")
    punct_ratio_bp = F.when(n_chars > 0, F.floor(n_punct * 10000 / n_chars)).otherwise(
        F.lit(0)
    ).cast("long")
    stop_ratio_bp = F.when(n_tokens > 0, F.floor(stop_hits * 10000 / n_tokens)).otherwise(
        F.lit(0)
    ).cast("long")
    quality = (
        F.when((n_tokens >= 10) & (stop_ratio_bp > 0) & (punct_ratio_bp < 2000), F.lit("good"))
        .when(n_tokens >= 3, F.lit("fair"))
        .otherwise(F.lit("junk"))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        mean_tok_len_bp.alias("mean_tok_len_bp"),
        punct_ratio_bp.alias("punct_ratio_bp"),
        stop_ratio_bp.alias("stop_ratio_bp"),
        quality.alias("quality"),
    )


GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_c: int = 300,
    max_mean_word_len_c: int = 1000,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher / MassiveText document-quality RULE SET (Rae et al.
    2021, §A.1.1) as one narrow projection: per-rule pass bits plus
    the conjunction, so a pipeline can both filter and report WHY
    each document was dropped (``quality_metrics`` gives continuous
    signals; this gives the published go/no-go rules).

    Rules (each an exact integer comparison — thresholds in
    fixed-point so the decision is portable across engines):
    word count in [min_words, max_words]; mean word length in
    [min/max_mean_word_len_c] CENTI-chars (×100, floor division);
    at least ``min_stopword_hits`` DISTINCT Gopher stopwords present
    (the, be, to, of, and, that, have, with). The reference rule set
    also bounds symbol/ellipsis/bullet ratios — those reduce to the
    alphabetic-ratio machinery in ``quality_metrics`` and are
    trivially constant on an [a-z ] corpus, so they are not
    duplicated here.

    Scale shape: zero shuffles, zero UDFs — the token array is
    materialized once per row and every rule folds over that SAME
    array column (an inlined array expression inside a higher-order
    lambda re-evaluates per element), so cost is O(len(text)) per row
    and the whole thing rides a single WholeStageCodegen scan."""
    words = F.filter(F.split(F.col(text_col), " +"), lambda w: w != "")
    base = df.select(F.col(id_col), F.col(text_col), words.alias("__w__"))
    n_words = F.size("__w__")
    sum_len = F.aggregate(
        "__w__", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wl_c = F.when(n_words > 0, F.floor(sum_len * 100 / n_words)).otherwise(
        F.lit(0)
    ).cast("long")
    stop_hits = F.size(
        F.array_intersect("__w__", F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    r_wc = (n_words >= min_words) & (n_words <= max_words)
    r_mwl = (mean_wl_c >= min_mean_word_len_c) & (mean_wl_c <= max_mean_word_len_c)
    r_stop = stop_hits >= min_stopword_hits
    return base.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_wl_c.alias("mean_word_len_c"),
        stop_hits.cast("long").alias("stopword_hits"),
        r_wc.cast("long").alias("rule_word_count"),
        r_mwl.cast("long").alias("rule_mean_word_len"),
        r_stop.cast("long").alias("rule_stopwords"),
        (r_wc & r_mwl & r_stop).cast("long").alias("keep"),
    )


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: token counts,
    type-token ratio, top-token mass, duplicate-trigram fraction —
    the standard filters for boilerplate/spam in LLM pretraining
    corpora (Rae et al. 2021 §A1.1). Ratios in integer basis points
    (floor semantics) so results are engine-portable.

    Scale shape: one logical hash-partitioning by id, applied to
    doc-level rows BEFORE the token explode (the exchange moves
    narrow data, not the token fanout). hash(id) satisfies the
    (id, token) clustering of the token count, the per-id max, and
    the join key, so NO aggregation adds its own exchange (verified
    in the plan: both HashAggregate pairs run partial→final with no
    Exchange between, and the per-doc top counts broadcast into the
    join). The array-native stats (type-token ratio, trigram dup)
    ride the same scan.
    """
    toks = _tokens(F.col(text_col))
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks")).repartition(
        n_parts, "_id"
    )
    n = F.size(F.col("_toks"))
    # trigram positions 0..n-3; sequence() descends for n<3, so guard
    # with a typed empty array (slice of the tokens themselves)
    tri = F.when(
        n >= 3,
        F.expr(
            "transform(sequence(0, size(_toks) - 3),"
            " i -> concat_ws(' ', _toks[i], _toks[i+1], _toks[i+2]))"
        ),
    ).otherwise(F.expr("slice(_toks, 1, 0)"))
    stats = base.select(
        "_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("_toks")).alias("distinct_tokens"),
        F.size(tri).alias("_n_tri"),
        (F.size(tri) - F.size(F.array_distinct(tri))).alias("_dup_tri"),
    )
    top = (
        base.select("_id", F.explode("_toks").alias("tok"))
        .groupBy("_id", "tok")
        .count()
        .groupBy("_id")
        .agg(F.max("count").alias("top_token_cnt"))
    )
    joined = stats.join(top, "_id")
    bp = lambda num, den: F.when(  # noqa: E731
        den > 0, F.floor(num * 10000 / den)
    ).otherwise(F.lit(0)).cast("long")
    return joined.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "distinct_tokens",
        bp(F.col("distinct_tokens"), F.col("n_tokens")).alias("ttr_bp"),
        F.col("top_token_cnt").cast("long").alias("top_token_cnt"),
        bp(F.col("top_token_cnt"), F.col("n_tokens")).alias("top_token_bp"),
        bp(F.col("_dup_tri"), F.col("_n_tri")).alias("dup_trigram_bp"),
    )


# PII patterns chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB oracle): plain character classes, no backreferences.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9][0-9-]{6,}[0-9]"


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Mask email addresses and international phone numbers in a text
    column — the redaction pass every shared training corpus runs
    before release. Pure JVM regexp (codegen, no UDF): per-doc match
    counts plus the scrubbed text.
    """
    text = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(EMAIL_PATTERN)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(PHONE_PATTERN)).cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def rolling_fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Document fingerprint: minimum hash over the char k-gram set
    (winnowing's keep-the-min rule with window = whole doc) plus the
    distinct-shingle cardinality. Used for fast near-identity checks
    before full Jaccard."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substr({text_col}, i, {k}))"
    )
    exploded = df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("g"))
    return exploded.groupBy(id_col).agg(
        F.min(F.md5("g")).alias("fingerprint"),
        F.count("*").alias("n_shingles"),
    )


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
    split_pattern: str = r"\s+",
) -> DataFrame:
    """Exact-phrase retrieval over a positional posting list — the
    relational core of an inverted index with positions (what Lucene
    calls a phrase query), built and matched in ONE aggregation
    instead of an n-way self-join.

    The anchor trick: a posting (doc, pos) for phrase token i can
    only belong to a phrase occurrence starting at ``anchor = pos-i``,
    so postings are mapped to (doc, anchor, i) and an anchor with all
    n distinct i's is a full match. One explode restricted to the
    phrase's terms (the filter prunes the posting stream BEFORE the
    shuffle — the phrase vocabulary is tiny, so the surviving stream
    is the phrase terms' document frequency, not the corpus), then
    one groupBy(doc, anchor) — versus the textbook n-way positional
    self-join whose every leg re-shuffles the posting relation.
    Repeated phrase tokens are handled by fanning each posting out to
    EVERY i whose token matches (a ≤n-element array explode).

    Output: (doc_id, n_matches, first_pos) per matching document,
    first_pos 0-based.
    """
    posted = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_pattern, -1)).alias("pos", "tok"),
    )
    return phrase_match_postings(posted, id_col, phrase)


def build_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_pattern: str = r"\s+",
) -> DataFrame:
    """Positional postings relation (tok, doc, pos) for an inverted
    index with positions — the MATERIALIZED form of the stream
    :func:`phrase_search` derives on the fly. Per-document and
    stateless, so index maintenance is O(new docs): the streaming
    sink appends each micro-batch's postings and queries run
    :func:`phrase_match_postings` over the accumulated relation. At
    scale, partition/bucket the stored postings by ``tok`` so a
    phrase query prunes to its terms' partitions."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_pattern, -1)).alias("pos", "tok"),
    ).select("tok", id_col, "pos")


def phrase_match_postings(posted: DataFrame, id_col: str, phrase: str) -> DataFrame:
    """The anchor aggregation over an existing postings relation
    (``id_col``, pos, tok) — shared by the one-shot
    :func:`phrase_search` and queries over a maintained postings
    index (:func:`build_postings` / the streaming postings sink)."""
    tokens = [t for t in phrase.split(" ") if t]
    if not tokens:
        raise ValueError("phrase must contain at least one token")
    n = len(tokens)
    posted = posted.filter(F.col("tok").isin(tokens))
    # fan each surviving posting out to every phrase slot it could fill
    slots = F.array(
        *[
            F.when(F.col("tok") == F.lit(t), F.lit(i))
            for i, t in enumerate(tokens)
        ]
    )
    hits = posted.select(
        F.col(id_col),
        F.explode(F.filter(slots, lambda s: s.isNotNull())).alias("i"),
        F.col("pos"),
    ).select(
        F.col(id_col), (F.col("pos") - F.col("i")).alias("anchor"), F.col("i")
    ).filter(F.col("anchor") >= 0)
    anchors = (
        hits.groupBy(id_col, "anchor")
        .agg(F.count_distinct("i").alias("__k__"))
        .filter(F.col("__k__") == n)
    )
    return (
        anchors.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("anchor").alias("first_pos"),
        )
    )


def compression_ratio_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document — the Gopher/RefinedWeb
    repetition heuristic: highly repetitive boilerplate compresses
    far below natural prose, so a low ratio flags template farms and
    loops that n-gram repetition counters can miss (and a ratio ≈ 1
    flags already-compressed or random-byte junk). Runs as an Arrow
    ``mapInPandas`` pass (zlib is per-doc Python work, batched);
    emits exact integer byte sizes plus the ratio in basis points so
    the output is hash-stable. zlib output is DETERMINISTIC for a
    fixed level and library version — same-session comparisons are
    exact; cross-version drift is why the evidence columns are the
    SIZES, not the compressed bytes.
    """
    from collections.abc import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in it:
            raw = pdf[text_col].fillna("").map(lambda t: t.encode("utf-8"))
            raw_len = raw.map(len)
            comp_len = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": raw_len.astype("int64"),
                    "compressed_bytes": comp_len.astype("int64"),
                    "ratio_bp": (
                        (comp_len * 10000) // raw_len.where(raw_len > 0, 1)
                    ).astype("int64"),
                }
            )

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(id_col, text_col)
        .repartition(n_parts, id_col)
        .mapInPandas(
            batches,
            schema=f"{id_col} long, raw_bytes long, compressed_bytes long, ratio_bp long",
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """Robust winnowing (Schleimer/Wilkerson/Aiken — the MOSS local
    fingerprint): polynomial-hash every char ``k``-gram (base 31, mod
    ``mod``), slide a window of ``window`` consecutive gram hashes,
    keep each window's minimum with rightmost-on-ties (the tiebreak
    rides a packed ``hash * 2^21 + (2^21-1-pos)`` key so a plain
    ``min`` selects it). Emits one row per document:
    ``(id, n_fingerprints, fp_sum)`` — the distinct-fingerprint count
    and the order-free exact BIGINT sum (both DuckDB-reproducible;
    ``registry/analyticsq.py:WINNOW_ORACLE`` is the oracle twin).

    This is the Arrow escape hatch taken deliberately: the same fold
    IS expressible with built-in higher-order functions
    (aggregate/transform over a packed array — see the oracle), but
    Spark evaluates HOF lambdas interpreted, one boxed expression
    tree per element (~20 us/gram measured: 32 s for 5 000 docs at
    sf0.1, where this numpy version runs the identical integer math
    vectorized per Arrow batch). Per-row independent — no shuffle, no
    state; each 100 TB input split maps to fingerprints in isolation.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    if window >= 1 << 21:
        raise ValueError("window positions must fit the 21-bit pack field")
    weights = np.array([31 ** (k - 1 - i) for i in range(k)], dtype=np.int64)
    pos_field = 1 << 21

    def one(text: str) -> tuple[int, int]:
        # utf-32-le codepoints == ord() per char, without the per-char
        # Python loop (guide §4.2: vectorize inside the Arrow kernel;
        # measured 2.5x on the whole kernel, results bit-identical).
        # Explicit little-endian dtype: the bytes are UTF-32-LE, so a
        # native-endian uint32 would mis-decode on big-endian hosts.
        codes = np.frombuffer(
            text.encode("utf-32-le", "surrogatepass"), dtype="<u4"
        ).astype(np.int64)
        if codes.size < k + window - 1:
            return 0, 0
        hashes = np.convolve(codes, weights[::-1], mode="valid") % mod
        pos = np.arange(1, hashes.size + 1, dtype=np.int64)
        packed = hashes * pos_field + (pos_field - 1 - pos)
        mins = np.minimum.reduce(
            [packed[i : packed.size - (window - 1) + i] for i in range(window)]
        )
        fps = np.unique(mins // pos_field)
        return int(fps.size), int(fps.sum())

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = pdf[text_col].fillna("").map(one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_fingerprints": res.map(lambda t: t[0]).astype("int64"),
                    "fp_sum": res.map(lambda t: t[1]).astype("int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, schema=f"{id_col} long, n_fingerprints long, fp_sum long"
    )


def winnow_fingerprint_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """Exploded winnowing fingerprints: one ``(id, fp)`` row per
    DISTINCT selected fingerprint per document — the inverted-index
    layout for fingerprint-overlap near-dup candidate generation
    (:func:`winnow_fingerprints` returns the per-doc rollup instead).
    Same vectorized numpy kernel; per-row independent, no shuffle."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    if window >= 1 << 21:
        raise ValueError("window positions must fit the 21-bit pack field")
    weights = np.array([31 ** (k - 1 - i) for i in range(k)], dtype=np.int64)
    pos_field = 1 << 21

    def one(text: str) -> "np.ndarray":
        # same vectorized codepoint load as winnow_fingerprints
        # (explicit little-endian dtype — the bytes are UTF-32-LE)
        codes = np.frombuffer(
            text.encode("utf-32-le", "surrogatepass"), dtype="<u4"
        ).astype(np.int64)
        if codes.size < k + window - 1:
            return np.empty(0, dtype=np.int64)
        hashes = np.convolve(codes, weights[::-1], mode="valid") % mod
        pos = np.arange(1, hashes.size + 1, dtype=np.int64)
        packed = hashes * pos_field + (pos_field - 1 - pos)
        mins = np.minimum.reduce(
            [packed[i : packed.size - (window - 1) + i] for i in range(window)]
        )
        return np.unique(mins // pos_field)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = [one(t) for t in pdf[text_col].fillna("")]
            ids = np.repeat(
                pdf[id_col].to_numpy(dtype=np.int64),
                [f.size for f in fps],
            )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "fp": np.concatenate(fps) if fps else
                          np.empty(0, dtype=np.int64),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, schema=f"{id_col} long, fp long"
    )


def winnow_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_containment_pct: int = 50,
    max_posting: int = 32,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Fingerprint-overlap near-dup pairs: documents sharing at least
    ``min_shared`` winnowing fingerprints, with the shared count —
    the DETERMINISTIC complement to MinHash-LSH dedup. Winnowing's
    guarantee makes recall structural, not probabilistic: any pair
    sharing a substring of ``k + window - 1`` (= 11) chars shares a
    fingerprint, so every pair with substantial verbatim overlap
    surfaces (MinHash recall at the band threshold is a sigmoid coin
    flip). Precision comes from the fingerprint-containment ratio:
    ``100 * |shared| // min(|fps_a|, |fps_b|) >= min_containment_pct``
    — an absolute shared count is meaningless on boilerplate-heavy
    corpora where every pair shares a few hot fingerprints (measured
    on the synthetic docs: planted near-dups sit at >= 50%, the noise
    floor under 35%).

    Scale design (same shape as the LSH bucket join): the pair join
    is per-fingerprint — an inverted index self-join, never all-pairs.
    Hot fingerprints (boilerplate) are the skew risk, so the
    pair-SOURCE side is capped to each posting list's ``max_posting``
    lowest ids via :func:`~..operators.dedup.cap_bucket_side` — cost
    per fingerprint drops |posting|² → |posting|·cap while every doc
    still probes the capped side, and overflowing postings are
    reported on ``result._spark_graft_truncated``, never dropped
    silently. One shuffle on ``fp``, one on the pair key.

    The fingerprint relation is PERSISTED before the fan-out: the
    downstream plan consumes it three times (per-doc counts, the
    capped posting ranking, and the uncapped probe side). Without the
    persist, ReuseExchange dedupes the two identical fp-shuffle
    consumers, so the numpy kernel runs twice (not thrice) — at sf0.1
    that makes the unpersisted plan marginally faster warm (8.5 s vs
    9.4 s; the persist + text repartition costs ~1 s at toy scale)
    but slower cold (13.4 s vs 11.1 s). The persisted shape is kept
    because it is the one that survives scale: the cached relation is
    compact ``(id, fp)`` longs, far smaller than the raw text the
    extra kernel pass would rescan, and exchange reuse is a
    physical-plan accident AQE re-planning can drop, not a contract.
    The keyed ``repartition(id)`` spreads the CPU-heavy kernel across
    tasks — a single parquet file otherwise pins it to one task (it
    does NOT save the count-agg shuffle: ``mapInPandas`` mints fresh
    output attributes, so Catalyst cannot carry the child partitioning
    through it). Callers release via ``release_cached`` /
    ``dedup.consuming``.
    """
    from .dedup import attach_cache

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(id_col, text_col).repartition(n_parts, id_col)
    rows = winnow_fingerprint_rows(
        base, id_col, text_col, k=k, window=window
    ).persist()
    out = winnow_pairs_from_rows(
        rows, id_col, min_containment_pct=min_containment_pct,
        max_posting=max_posting,
    )
    return attach_cache(out, rows)


def winnow_pairs_from_rows(
    rows: DataFrame,
    id_col: str,
    min_containment_pct: int = 50,
    max_posting: int = 32,
) -> DataFrame:
    """Pair generation over a MATERIALIZED ``(id, fp)`` fingerprint
    relation — factored out of :func:`winnow_dedup_pairs` so the
    streaming index sink's accumulated relation answers the same
    query identically (the phrase-search ``build_postings`` /
    ``phrase_match_postings`` split, applied to dedup)."""
    from .dedup import cap_bucket_side

    counts = rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("__nfp__"))
    capped, truncated = cap_bucket_side(rows, ["fp"], id_col, max_posting)
    a = capped.select(F.col(id_col).alias("id_a"), "fp")
    b = rows.select(F.col(id_col).alias("id_b"), "fp")
    ca = F.broadcast(counts.select(F.col(id_col).alias("id_a"), F.col("__nfp__").alias("__na__")))
    cb = F.broadcast(counts.select(F.col(id_col).alias("id_b"), F.col("__nfp__").alias("__nb__")))
    # Pin the pair-aggregation parallelism with an explicit keyed
    # repartition (guide §2.5): the (id_a, id_b) all-long shuffle
    # compresses to ~3 MB at 14.9M rows, so AQE's byte-targeted
    # coalescing (1 MB minPartitionSize floor) would run the CPU-heavy
    # aggregation on ~3 tasks (measured 6.4 s vs 2.1 s parallel at
    # sf0.1). An explicit-count repartition is exempt from AQE
    # coalescing, and the count derives from the cluster
    # (defaultParallelism), not a local constant. The groupBy reuses
    # this exchange (same keys), so no extra shuffle is added — the
    # map-side partial agg it forgoes only reduced ~4:1 here while
    # serializing the reduce onto those ~3 tasks. Replaces the r11
    # global 64k AQE floor, whose blast radius taxed iteration- and
    # write-heavy queries suite-wide.
    n_parts = rows.sparkSession.sparkContext.defaultParallelism
    out = (
        a.join(b, ["fp"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .repartition(n_parts, "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn(
            "containment_pct",
            F.expr("CAST(100 * n_shared DIV least(__na__, __nb__) AS BIGINT)"),
        )
        .filter(F.col("containment_pct") >= min_containment_pct)
        .select("id_a", "id_b", "n_shared", "containment_pct")
    )
    out._spark_graft_truncated = truncated  # type: ignore[attr-defined]
    return out


def nb_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    class_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Naive Bayes sufficient statistics as two relations:
    ``(class, term, c)`` token counts and ``(class, d_c)`` labeled-doc
    counts. These ARE the model — both are sums, so they accumulate
    across increments: the streaming sink appends each micro-batch's
    statistics and a groupBy-sum over the accumulated relation equals
    batch training over all docs seen (parity-tested). Tokenization
    is shared with scoring via :func:`nb_tokens`."""
    toks = nb_tokens(df, id_col, text_col, class_col)
    counts = toks.groupBy(class_col, "term").agg(
        F.sum("tf").cast("long").alias("c")
    )
    priors = toks.select(id_col, class_col).distinct().groupBy(class_col).agg(
        F.count(F.lit(1)).cast("long").alias("d_c")
    )
    return counts, priors


def nb_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    class_col: str,
) -> DataFrame:
    """Per-document term frequencies ``(id, class, term, tf)`` — the
    ONE tokenization under NB training (:func:`nb_token_counts`), the
    streaming statistics sink, and scoring
    (``registry/analyticsq.py::nb_lang_classifier``): lowercase,
    split on non-alphanumerics, empty terms dropped."""
    return (
        df.select(
            F.col(id_col),
            F.col(class_col),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias(
                "term"
            ),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, class_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

"""Mathematical invariants of the round-5 quality/dedup additions —
the properties that must hold regardless of corpus content (the
oracles pin exact values; these pin the semantics).
"""

from __future__ import annotations

from etl_processing_scd1_spark.operators.dedup import consuming
from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES

from .conftest import SF0001

ALL = {**QUERIES, **EXTRA_QUERIES}


def test_containment_dominates_jaccard(spark):
    """|∩|/min(|A|,|B|) ≥ |∩|/|∪| always — every J≥0.5 near-dup pair
    must therefore appear in the containment≥0.5-equivalent set; at
    the 80% screen, containment_pct must sit in [80, 100]."""
    with consuming(ALL["containment_dedup"](spark, SF0001)) as df:
        rows = df.collect()
    assert rows
    for r in rows:
        assert 80 <= r.containment_pct <= 100
        assert r.isect <= min(r.size_a, r.size_b)


def test_unigram_logprob_is_negative_mean(spark):
    """Every token probability is < 1, so the mean log-probability is
    strictly negative, and sum_nano/n must reproduce avg_logprob."""
    rows = ALL["unigram_logprob_quality"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r.avg_logprob < 0
        assert abs(r.avg_logprob - (r.sum_nano / 1e9) / r.n_tokens) < 1e-12


def test_kl_divergence_nonnegative(spark):
    """Gibbs: KL(p‖q) ≥ 0, with equality only if the slice matches
    the corpus mixture exactly. Nano-quantization can perturb by at
    most n_terms·5e-10 — allow that epsilon."""
    rows = ALL["kl_domain_shift"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r.kl_divergence >= -r.n_terms * 5e-10


def test_dedup_apply_keeps_exactly_one_per_cluster(spark):
    """The kept set must be the cluster representatives: sizes sum to
    the corpus size and every kept doc is its own cluster id."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    with consuming(ALL["dedup_apply"](spark, SF0001)) as df:
        kept = df.collect()
    assert sum(r.cluster_size for r in kept) == docs.count()
    assert len({r.doc_id for r in kept}) == len(kept)


def test_containment_full_recall_guarantee(spark):
    """The prefix-filter inverted index is EXACT: on a constructed
    corpus it must find every pair with containment ≥ t — including
    the doc-in-doc pair engineered so each of the 4 MinHash LSH bands
    (the screen `containment_dedup` relies on) is unlikely to fire:
    a short doc quoted verbatim inside a 20×-longer host has Jaccard
    ≈ 0.05, band-collision probability ≈ 4·0.05² ≈ 1%."""
    from pyspark.sql import functions as F

    from etl_processing_scd1_spark.operators.dedup import (
        containment_candidate_pairs,
        jaccard_verify,
        shingle_set_col,
    )

    quote = "the quick brown fox jumps over the lazy dog near the river bank today"
    host = " ".join(f"host filler sentence number {i} with unrelated words" for i in range(40))
    rows = [
        (1, quote),
        (2, host + " " + quote + " " + host),
        (3, "an entirely different document about maritime law and shipping"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    with_sets = docs.select(
        "doc_id", shingle_set_col("text", k=16).alias("sh_set")
    ).persist()
    try:
        pairs = containment_candidate_pairs(with_sets, "doc_id", threshold_pct=80)
        v = jaccard_verify(pairs, with_sets, "doc_id", emit_sizes=True)
        with consuming(v):
            found = {
                (r.id_a, r.id_b)
                for r in v.filter(
                    100 * F.col("isect") >= 80 * F.least("size_a", "size_b")
                ).collect()
            }
    finally:
        with_sets.unpersist()
    assert (1, 2) in found  # the quoted doc is fully contained
    assert all(3 not in p for p in found)


def test_containment_full_matches_bruteforce(spark):
    """Exactness against brute force: candidates ∪ verify must equal
    the all-pairs containment computation on a small real slice."""
    import itertools

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(60)
    texts = {r.doc_id: r.text for r in docs.collect()}

    def sh(t):
        return {t[i : i + 16] for i in range(max(len(t) - 15, 1))}

    sets = {d: sh(t) for d, t in texts.items()}
    expected = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        isect = len(sets[a] & sets[b])
        if 100 * isect >= 80 * min(len(sets[a]), len(sets[b])):
            expected.add((a, b))

    from pyspark.sql import functions as F

    from etl_processing_scd1_spark.operators.dedup import (
        containment_candidate_pairs,
        jaccard_verify,
        shingle_set_col,
    )

    with_sets = docs.select(
        "doc_id", shingle_set_col("text", k=16).alias("sh_set")
    ).persist()
    try:
        pairs = containment_candidate_pairs(with_sets, "doc_id", threshold_pct=80)
        v = jaccard_verify(pairs, with_sets, "doc_id", emit_sizes=True)
        with consuming(v):
            found = {
                (r.id_a, r.id_b)
                for r in v.filter(
                    100 * F.col("isect") >= 80 * F.least("size_a", "size_b")
                ).collect()
            }
    finally:
        with_sets.unpersist()
    assert found == expected


def test_containment_full_superset_of_lsh_screen(spark):
    """Same measure, same threshold: every pair the probabilistic LSH
    screen surfaces at its shingle grain must qualify under the exact
    operator run at that grain — brute-force checked at k=8 too."""
    with consuming(ALL["containment_dedup_full"](spark, SF0001)) as df:
        rows = df.collect()
    for r in rows:
        assert 80 <= r.containment_pct <= 100
        assert r.isect <= min(r.size_a, r.size_b)


def test_ngram_diversity_bounds_and_template_detection(spark):
    """distinct ≤ total always; a synthetic all-identical slice must
    score lower diversity than a random-words slice."""
    rows = ALL["ngram_diversity"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 0 < r.distinct_grams <= r.total_grams
        assert r.diversity_pct == (100 * r.distinct_grams) // r.total_grams

    from etl_processing_scd1_spark.registry.extensions import ngram_diversity as q  # noqa: F401

    boiler = [(f"s{i}", "en", "copy paste copy paste copy paste copy paste") for i in range(20)]
    docs = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (src, lang, t) in enumerate(boiler)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    from pyspark.sql import functions as F
    from etl_processing_scd1_spark.operators.text import TOKEN_PATTERN

    toks = docs.select(
        "source", "lang", F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), 0).alias("t")
    )
    grams = toks.select(
        "source",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(t) < 3 THEN array() ELSE "
                "transform(sequence(1, size(t) - 2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])) END"
            )
        ).alias("g"),
    )
    agg = grams.groupBy("source").agg(
        (100 * F.countDistinct("g") / F.count("*")).alias("pct")
    )
    assert all(r.pct < 50 for r in agg.collect())  # template farm flagged


def test_winsorize_exact_order_statistics(spark):
    """Pin the ceil(p·n) order-statistic semantics on a known list:
    values 1..100 (micros ×1e6), p05 = 5th smallest = 5, p95 = 95th;
    clipped sum = 4·5 + sum(5..95) + 5·95."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    rows = [(i, "t", float(i)) for i in range(1, 101)]
    ev = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    vm = ev.select("event_type", F.expr("CAST(round(value * 1000000) AS LONG)").alias("v_m"))
    counts = vm.groupBy("event_type", "v_m").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("event_type").orderBy("v_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        "event_type", "v_m",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    bounds = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= F.expr("(5 * n + 99) DIV 100"), F.col("v_m"))).alias("lo"),
        F.min(F.when(F.col("cum") >= F.expr("(95 * n + 99) DIV 100"), F.col("v_m"))).alias("hi"),
    )
    b = bounds.collect()[0]
    assert (b.lo, b.hi) == (5_000_000, 95_000_000)

    out = ALL["winsorize_stats"](spark, SF0001).collect()
    assert out
    for r in out:
        assert r.lo_micros <= r.hi_micros
        assert r.lo_micros * r.n_events <= r.sum_clipped_micros <= r.hi_micros * r.n_events


def test_bpe_merges_use_learned_tokens(spark):
    """Iteration dependency must be real: on a corpus of repeated
    'lowest', merges chain l+o → lo+w → low+e (each later merge
    consumes the token the earlier one created), and counts follow
    word frequency."""
    from etl_processing_scd1_spark.operators.bpe import bpe_train_merges

    docs = spark.createDataFrame(
        [(i, "lowest lowest lowest") for i in range(5)], ["doc_id", "text"]
    )
    merges = bpe_train_merges(docs, "text", n_merges=3).collect()
    got = [(r.merge_rank, r.l_tok, r.r_tok) for r in merges]
    # 'lowest' x1 distinct word, cnt=15; ties break lexicographically:
    # rank1 pairs all cnt 15 -> (e,s) wins; then (es,t); then (l,o)
    assert got[0] == (1, "e", "s")
    assert got[1] == (2, "es", "t")  # consumes the rank-1 token
    assert [r.pair_cnt for r in merges] == [15, 15, 15]


def test_bpe_greedy_run_parity(spark):
    """A=B runs merge greedily left-to-right: 'aaaa' under merge (a,a)
    segments to [aa, aa], and 'aaa' to [aa, a] — the 1st/3rd/5th-match
    rule the oracle mirrors relationally."""
    from etl_processing_scd1_spark.operators.bpe import (
        _apply_merge,
        word_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa aaa"), (2, "aaaa")], ["doc_id", "text"]
    )
    vocab = _apply_merge(word_vocab(docs, "text"), "a", "a")
    segs = {r.word: r.segs for r in vocab.collect()}
    assert segs["aaaa"] == ["aa", "aa"]
    assert segs["aaa"] == ["aa", "a"]


def test_bpe_tokenize_bounds_and_compression(spark):
    """n_words <= n_subword_tokens <= total letters; training on a
    repetitive corpus must compress (fewer subwords than characters)."""
    from etl_processing_scd1_spark.operators.bpe import bpe_tokenize

    docs = spark.createDataFrame(
        [(i, "lowest lowest slowest lowest") for i in range(6)],
        ["doc_id", "text"],
    )
    with consuming(bpe_tokenize(docs, "doc_id", "text", n_merges=3)) as df:
        rows = df.collect()
    assert len(rows) == 6
    for r in rows:
        assert r.n_words == 4
        assert r.n_words <= r.n_subword_tokens
        n_chars = len("lowestlowestslowestlowest")
        assert r.n_subword_tokens < n_chars  # merges compressed


def test_edit_distance_dedup_finds_planted_typos(spark):
    """A doc and its 3-typo copy share most shingles (LSH fires) and
    differ by exactly 3 single-char edits — the pair must surface with
    lev_dist == 3; the unrelated doc must pair with nothing."""
    from etl_processing_scd1_spark.operators.dedup import edit_distance_dedup

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    typo = base.replace("quick", "quack", 1).replace("lazy", "hazy", 1).replace("runs", "rans", 1)
    docs = spark.createDataFrame(
        [(1, base), (2, typo), (3, "completely different content about maritime law")],
        "doc_id int, text string",
    )
    with consuming(
        edit_distance_dedup(docs, "doc_id", "text", min_sim_pct=80)
    ) as out:
        rows = out.collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
    assert rows[0].lev_dist == 3
    assert rows[0].max_len == len(base)


def test_phrase_search_overlapping_and_repeated_tokens(spark):
    """Overlapping occurrences of a phrase with a REPEATED token must
    each count: "a b a" occurs in "x a b a b a y" at anchors 1 and 3
    (sharing the middle 'a'); a doc with the tokens out of order must
    not match."""
    from etl_processing_scd1_spark.operators.text import phrase_search

    docs = spark.createDataFrame(
        [(1, "x a b a b a y"), (2, "b a a x"), (3, "a b a")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in phrase_search(docs, "doc_id", "text", "a b a").collect()}
    assert set(rows) == {1, 3}
    assert rows[1].n_matches == 2 and rows[1].first_pos == 1
    assert rows[3].n_matches == 1 and rows[3].first_pos == 0


def test_kmv_sketch_mergeable_and_estimates_extremes(spark):
    """Merge identity: the min-k of a union equals the min-k of the
    concatenated per-part sketches. And the estimator must hit the
    extremes exactly: identical groups -> J=100%, disjoint -> 0%."""
    from pyspark.sql import functions as F

    from etl_processing_scd1_spark.operators.sketches import kmv_overlap, kmv_sketches

    rows = (
        [("a", f"k{i}") for i in range(200)]
        + [("b", f"k{i}") for i in range(200)]          # b == a
        + [("c", f"x{i}") for i in range(200)]          # c disjoint
    )
    df = spark.createDataFrame(rows, "grp string, key string")
    est = {
        (r.group_a, r.group_b): r.est_jaccard_pct
        for r in kmv_overlap(kmv_sketches(df, "grp", "key", k=32), "grp", k=32).collect()
    }
    assert est[("a", "b")] == 100
    assert est[("a", "c")] == 0 and est[("b", "c")] == 0

    # merge identity: sketch(a ∪ c) == min-k over concat(sketch_a, sketch_c)
    sk = {r.grp: r.sketch for r in kmv_sketches(df, "grp", "key", k=32).collect()}
    union_df = df.filter(F.col("grp").isin("a", "c")).withColumn("grp", F.lit("u"))
    direct = kmv_sketches(union_df, "grp", "key", k=32).collect()[0].sketch
    assert sorted(set(sk["a"]) | set(sk["c"]))[:32] == direct


def test_compression_ratio_flags_repetition(spark):
    """A 100×-repeated phrase must compress far below varied prose of
    the same length; sizes are exact and the ratio is monotone in
    repetitiveness."""
    from etl_processing_scd1_spark.operators.text import compression_ratio_quality

    varied = " ".join(f"w{i}x{i * 7 % 97}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, "spam ham " * 200), (2, varied), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in compression_ratio_quality(docs, "doc_id", "text").collect()}
    assert out[1].raw_bytes == len("spam ham " * 200)
    assert out[1].ratio_bp < out[2].ratio_bp  # repetition compresses more
    assert out[1].ratio_bp < 1000             # boilerplate well under 10%
    assert out[3].raw_bytes == 0


def test_phrase_search_matches_bruteforce_reference(spark):
    """Property: on small random token documents, the anchor
    aggregation must agree with a brute-force sliding-window scan for
    every document and phrase — including repeated tokens in both the
    docs and the phrase."""
    import random

    from etl_processing_scd1_spark.operators.text import phrase_search

    random.seed(42)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(random.choice(vocab) for _ in range(random.randint(1, 12))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for phrase in ("a b", "b b", "a b a", "c"):
        got = {
            r.doc_id: (r.n_matches, r.first_pos)
            for r in phrase_search(df, "doc_id", "text", phrase).collect()
        }
        want = {}
        p = phrase.split(" ")
        for doc_id, text in docs:
            toks = text.split(" ")
            hits = [
                i
                for i in range(len(toks) - len(p) + 1)
                if toks[i : i + len(p)] == p
            ]
            if hits:
                want[doc_id] = (len(hits), hits[0])
        assert got == want, phrase


# ---------------------------------------------------------------------------
# Robust winnowing: brute-force parity + the shared-substring guarantee.
# ---------------------------------------------------------------------------

K, W, MOD, POS = 8, 4, 1_000_000_007, 1 << 21


def _brute_winnow(text: str) -> set[int]:
    """Reference implementation straight from the paper: hash all
    k-grams, take each window's min (rightmost on ties), distinct."""
    n = len(text)
    if n < K + W - 1:
        return set()
    hashes = []
    for p in range(n - K + 1):
        h = 0
        for c in text[p : p + K]:
            h = h * 31 + ord(c)
        hashes.append(h % MOD)
    fps = set()
    for q in range(len(hashes) - W + 1):
        win = hashes[q : q + W]
        m = min(win)
        # rightmost occurrence of the min
        fps.add(m)
    return fps


def test_winnowing_matches_brute_force(spark):
    from etl_processing_scd1_spark.operators.text import winnow_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaaaaaa",          # all-equal hashes: tie path
        "abcdefghij",                     # 3 grams < window: no fingerprints
        "short",                          # under k
        "",                               # empty
        "xyzzy plugh abracadabra xyzzy plugh abracadabra",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_fingerprints"], r["fp_sum"])
        for r in winnow_fingerprints(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        fps = _brute_winnow(t)
        assert got[i] == (len(fps), sum(fps)), (i, t)


def test_winnowing_shared_substring_guarantee(spark):
    """The paper's detection guarantee: two docs sharing a substring of
    length >= k + w - 1 (= 11) share at least one fingerprint."""
    from etl_processing_scd1_spark.operators.text import winnow_fingerprints

    shared = "copied-block-of-text-long-enough-to-guarantee"
    a = "left prefix completely different " + shared + " tail one"
    b = "other beginning text here " + shared + " unrelated ending"
    assert len(shared) >= K + W - 1
    assert _brute_winnow(a) & _brute_winnow(b)
    # and the operator agrees with the brute set on both docs
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_fingerprints"], r["fp_sum"])
        for r in winnow_fingerprints(df, "doc_id", "text").collect()
    }
    assert got[0] == (len(_brute_winnow(a)), sum(_brute_winnow(a)))
    assert got[1] == (len(_brute_winnow(b)), sum(_brute_winnow(b)))


def test_simhash_near_dup_pigeonhole_recall(spark):
    """Uncapped, the banded join must surface EXACTLY the brute-force
    Hamming<=3 set (pigeonhole: <=3 differing bits over 4 bands leave
    one band equal — recall is structural, precision is the exact
    verify)."""
    from etl_processing_scd1_spark.operators.dedup import (
        simhash_fingerprint,
        simhash_near_dup_pairs,
    )
    from tests.conftest import SF0001

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "text"
    )
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprint(docs, "doc_id", "text", 32).collect()
    }
    ids = sorted(fps)
    brute = {
        (a, b): sum(x != y for x, y in zip(fps[a], fps[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if sum(x != y for x, y in zip(fps[a], fps[b])) <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(
            docs, "doc_id", "text", max_hamming=3, max_bucket_size=10**9
        ).collect()
    }
    assert got == brute and brute  # exact, and non-trivial on this corpus


def test_kcore_converges_and_matches_model(spark):
    """The 4-round peel must be stationary (round 4 == round 5 — the
    fixed-round contract is converged on this graph, not an arbitrary
    truncation) and must equal a pure-Python peel model on a small
    constructed graph."""
    from etl_processing_scd1_spark.operators.graph import k_core
    from etl_processing_scd1_spark.operators.dedup import release_cached

    # triangle + pendant chain: 3-core empty; 2-core = the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u long, v long")

    def model(es, k):
        import collections

        es = set(es)
        while True:
            deg = collections.Counter()
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                return dict(deg)
            es = {(a, b) for a, b in es if a not in drop and b not in drop}

    for k in (2, 3):
        out = k_core(df, k=k, rounds=4)
        got = {r["node_id"]: r["core_degree"] for r in out.collect()}
        release_cached(out)
        # model degrees count each undirected edge once per endpoint;
        # k_core's und relation holds both directions, so degrees match
        assert got == model(edges, k), k

    # stationarity on the real co-supplier graph: rounds 4 == 5
    from etl_processing_scd1_spark.registry import _ALL_QUERIES
    from tests.conftest import SF0001
    import etl_processing_scd1_spark.operators.graph as g
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    co = li.select("l_orderkey", "l_suppkey").distinct()
    b = co.select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
    real = (
        co.join(b, co["l_orderkey"] == F.col("o"))
        .filter(F.col("l_suppkey") < F.col("s"))
        .groupBy(F.col("l_suppkey").alias("u"), F.col("s").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 4)
        .select("u", "v")
    )
    r4 = g.k_core(real, k=3, rounds=4)
    r5 = g.k_core(real, k=3, rounds=5)
    got4 = {(r["node_id"], r["core_degree"]) for r in r4.collect()}
    got5 = {(r["node_id"], r["core_degree"]) for r in r5.collect()}
    release_cached(r4)
    release_cached(r5)
    assert got4 == got5


def test_kmv_sketches_from_sets_matches_exploded(spark):
    """The per-row key-SET fast path (JVM per-row bottom-k + Arrow
    partition merge) must reproduce the exploded kmv_sketches result
    exactly — including duplicate keys across rows and within sets,
    and rows whose set is smaller than k."""
    from pyspark.sql import functions as F

    from etl_processing_scd1_spark.operators.sketches import (
        kmv_sketches,
        kmv_sketches_from_sets,
    )

    rows = [
        ("a", [f"k{i}" for i in range(40)]),
        ("a", [f"k{i}" for i in range(20, 60)]),   # overlap dup
        ("a", ["k0", "k0", "k1"]),                 # in-set dups
        ("b", ["z1", "z2"]),                       # tiny set < k
        ("b", [f"z{i}" for i in range(50)]),
    ]
    df = spark.createDataFrame(rows, "grp string, keys array<string>")
    from_sets = {
        r.grp: r.sketch
        for r in kmv_sketches_from_sets(df, "grp", "keys", k=16).collect()
    }
    exploded = df.select("grp", F.explode("keys").alias("key"))
    from_rows = {
        r.grp: r.sketch
        for r in kmv_sketches(exploded, "grp", "key", k=16).collect()
    }
    assert from_sets == from_rows
    assert len(from_sets["a"]) == 16 and len(from_sets["b"]) == 16

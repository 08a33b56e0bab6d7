"""In-engine BPE tokenizer training (SURVEY.md §2.K tier): learn the
top-N byte-pair merges over a corpus — the preprocessing step every
LLM training pipeline runs before tokenizing 100 TB of text.

Classic vocabulary-based BPE (Sennrich et al. 2016): training never
touches the corpus again after the ONE word-count aggregation — each
merge iteration runs over the distinct-word vocabulary weighted by
word frequency, which is orders of magnitude smaller than the corpus
(Heaps' law). Per iteration: one small shuffle (pair counts over the
vocab), one 1-row driver pull (the argmax pair — bounded by
construction, like the k-means centroid pull), one narrow fold to
re-segment. Determinism: ties on pair count break lexicographically
on (left, right), so any engine reproduces the same merge table.

Greedy merge application is the standard left-to-right scan: positions
``i`` and ``i+1`` merge iff the pair matches and position ``i-1`` did
not just merge (for A=B runs this selects the 1st, 3rd, 5th … match
of the run). Implemented as a narrow ``aggregate`` fold over the
segmentation array — no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: base segmentation: lowercase ASCII letter runs, split to characters
WORD_PATTERN = "[a-z]+"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, segs) vocabulary: distinct lowercase letter-run
    words with corpus frequency and their character segmentation —
    the only corpus-sized aggregation in BPE training."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "segs",
            F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = vocab.select(
        "cnt",
        F.explode(
            F.expr(
                "CASE WHEN size(segs) < 2 THEN array() ELSE "
                "transform(sequence(1, size(segs) - 1),"
                " i -> struct(segs[i - 1] AS l, segs[i] AS r)) END"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("cnt").alias("pair_cnt"))


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    # tokens are [a-z]+ fragments — no quoting hazards in the literals
    return vocab.withColumn(
        "segs",
        F.expr(
            "aggregate(segs, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{left}' "
            f"AND x = '{right}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{left}{right}')) "
            "ELSE concat(acc, array(x)) END)"
        ),
    )


def _train(
    docs: DataFrame, text_col: str, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared training loop → (merge table, PERSISTED final vocab).
    The caller owns the returned vocab's cache (unpersist or ride the
    attach_cache contract)."""
    vocab = word_vocab(docs, text_col).persist()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((rank, b.l, b.r, int(b.pair_cnt)))
        nxt = _apply_merge(vocab, b.l, b.r).persist()
        nxt.count()  # materialize before dropping the parent cache
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def bpe_train_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 4
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns a DataFrame
    ``(merge_rank, l_tok, r_tok, pair_cnt)`` — the merge table a
    tokenizer would apply.

    The per-iteration ``.collect()`` pulls exactly ONE row (the
    argmax pair) — a bounded driver transfer, not a distributed-loop
    smell. The vocabulary is persisted per iteration and the previous
    iteration's cache released, so the fold lineage never re-runs the
    corpus aggregation."""
    spark = docs.sparkSession
    merges, vocab = _train(docs, text_col, n_merges)
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank BIGINT, l_tok STRING, r_tok STRING, pair_cnt BIGINT"
    )


def bpe_tokenize(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 4,
) -> DataFrame:
    """The apply half of the train→tokenize loop: per document, the
    word count and the SUBWORD token count under the trained
    segmentation — the number a data pipeline needs per doc to pack
    sequences and budget context windows.

    At 100 TB the trained vocabulary (word → subword count) is the
    broadcast side of one join against the exploded corpus words —
    the corpus is scanned once for training (word counts) and once
    for tokenization; every merge iteration in between touches only
    the vocab. Docs with no letter-run words (e.g. pure CJK under the
    [a-z]+ word model) have no vocabulary rows and drop out — the
    documented inner-join semantic, identical in the oracle."""
    from .dedup import attach_cache

    _merges, vocab = _train(docs, text_col, n_merges)
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("word"),
    )
    counts = vocab.select("word", F.size("segs").alias("__ntok__"))
    out = (
        words.join(F.broadcast(counts), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("__ntok__").alias("n_subword_tokens"),
        )
    )
    return attach_cache(out, vocab)


def bpe_segment(vocab_merged: DataFrame) -> DataFrame:
    """Expose the trained segmentation (word → learned subword units)
    — the lookup table the tokenize step broadcasts over the corpus."""
    return vocab_merged.select(
        "word", "cnt", F.concat_ws(" ", "segs").alias("segmentation")
    )

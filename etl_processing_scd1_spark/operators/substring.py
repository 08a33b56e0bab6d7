"""Exact substring-level deduplication (suffix-array-style span
detection, §2.K extension — beyond the reference's row-level dedup,
``main.py:376-391``).

Finds every maximal character span that a document shares VERBATIM
(length ≥ ``window``) with at least one other document — the signal
behind suffix-array training-data dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better"): boilerplate, licence
headers and templated passages repeat exactly across documents even
when whole-document hashes differ.

Spark-first shape instead of a distributed suffix array: slide a
``window``-char window at stride 1 over every document (any common
substring of length ≥ window then shares at least one aligned window
on BOTH sides — exact, no alignment heuristics), hash each window,
keep hashes seen in ≥ ``min_docs`` distinct documents, and merge the
surviving positions per document into maximal covered spans with one
lag-window pass.

Scale audit (100 TB): stride-1 windowing emits O(total chars) rows —
the declared cost of EXACT substring dedup; every downstream step is
a partial-aggregatable groupBy or a per-document window, so the
plan is two shuffles (hash, doc) regardless of corpus size. A
mega-frequent boilerplate window skews the hash groupBy only in its
combiner (counts are associative); the hash→position join is 1 row
per hash on the build side, so no quadratic pair blow-up can occur —
per-document output is bounded by document length, never by corpus
size (contrast all-pairs similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 40,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-substring coverage.

    Returns one row per input document: ``n_chars``, ``dup_chars``
    (characters covered by at least one shared window), ``n_spans``
    (maximal merged spans), ``dup_fraction`` (exact-int division).
    Documents shorter than ``window`` report zero coverage.
    """
    W = window
    spark = docs.sparkSession
    # single-file sources arrive as one task; spread the CPU-heavy
    # stride-1 hashing across the cluster before exploding
    base = docs.select(id_col, text_col).repartition(
        spark.sparkContext.defaultParallelism, id_col
    )
    wins = (
        base.filter(F.length(text_col) >= W)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {W - 1}), "
                    f"p -> struct(p AS pos, md5(substring({text_col}, p, {W})) AS h))"
                )
            ).alias("w"),
        )
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )
    shared = (
        wins.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    dpos = wins.join(shared, "h").select(id_col, "pos")

    # merge overlapping/adjacent [pos, pos+W-1] intervals per doc:
    # a new span starts when the gap to the previous window exceeds W
    ordered = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        dpos.withColumn("prev", F.lag("pos").over(ordered))
        .withColumn(
            "new_span",
            F.when(
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + W), 1
            ).otherwise(0),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(ordered.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    per_span = spans.groupBy(id_col, "span_id").agg(
        (F.max("pos") - F.min("pos") + W).alias("span_len")
    )
    per_doc = per_span.groupBy(id_col).agg(
        F.sum("span_len").alias("dup_chars"), F.count("*").alias("n_spans")
    )
    return (
        docs.select(id_col, F.length(text_col).cast("bigint").alias("n_chars"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_chars",
            F.coalesce("dup_chars", F.lit(0)).cast("bigint").alias("dup_chars"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            (
                F.coalesce("dup_chars", F.lit(0)).cast("double") / F.col("n_chars")
            ).alias("dup_fraction"),
        )
    )

"""Extension operator queries (SURVEY.md §2.K): the LLM-training-data
pipeline surface over ``documents`` / ``embeddings``. First slice —
widened in operators/ modules as they land."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._base import make_registry, table

QUERIES, ORACLES, register = make_registry()


@register(
    "exact_dedup",
    oracle="""
    SELECT doc_id, dedup_key, lang, n_chars FROM (
      SELECT doc_id, md5(concat(lang, '|', CAST(n_chars // 100 AS VARCHAR))) AS dedup_key,
             lang, n_chars,
             row_number() OVER (
               PARTITION BY md5(concat(lang, '|', CAST(n_chars // 100 AS VARCHAR)))
               ORDER BY doc_id
             ) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: exact deduplication with a keep-policy — hash the dedup
    key, keep the lowest doc_id per key via row_number. At scale this
    is one shuffle on the key hash; md5 keeps the shuffle key small
    and uniformly distributed regardless of text skew."""
    docs = table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(F.col("lang"), F.lit("|"), (F.col("n_chars") / 100).cast("long").cast("string"))
    )
    w = Window.partitionBy("dedup_key").orderBy("doc_id")
    return (
        docs.withColumn("dedup_key", key)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "dedup_key", "lang", "n_chars")
    )


@register(
    "text_stats",
    oracle="""
    SELECT doc_id, lang,
           length(text) AS char_count,
           len(string_split_regex(trim(text), '\\s+')) AS token_count,
           length(text) - length(replace(text, ' ', '')) AS space_count
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 slice: per-document token/char statistics with built-in
    string functions only (JVM codegen, no UDF)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("char_count"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("token_count"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))).alias("space_count"),
    )

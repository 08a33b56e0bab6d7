"""Dataset curation operators (SURVEY.md §2.K extended): the steps a
training-data pipeline runs after dedup/quality — deterministic
splits, sequence packing, vocabulary statistics, and the composed
curation pipeline. All built-in expressions; every output is integer
or string valued so distributed runs are exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import quality_metrics


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: bucket = md5(salt:id) mod
    total-weight, mapped to the named ranges. Content-stable — the
    same id lands in the same split on every engine, every run, any
    partitioning (the property random splits lack). Adds ``split``.
    """
    total = sum(weights.values())
    # first 8 hex chars → int via conv; uniform over 2^32
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % total
    )
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += w
    return df.withColumn("split", expr)


def sequence_packing(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Greedy-in-order sequence packing: documents (ordered by id
    within each partition group) are assigned to chunks of at most
    ~``budget`` tokens via a running-total window —
    ``chunk_id = floor((cumsum - tokens) / budget)``.

    The window cumsum is one shuffle per partition group; at 100 TB
    the group column (language/source/date) bounds state per task.
    Approximate packing (a doc may straddle a boundary) — the
    standard trade for a fully-parallel, deterministic assignment.
    """
    part = [partition_col] if partition_col else []
    w = Window.partitionBy(*part).orderBy(id_col)
    running = F.sum(token_col).over(w)
    return df.select(
        *df.columns,
        F.floor((running - F.col(token_col)) / budget).cast("long").alias("chunk_id"),
        (running - F.col(token_col)).cast("long").alias("chunk_offset"),
    )


def term_doc_freq(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Vocabulary statistics: per group, the top-N tokens by document
    frequency (ties → lexicographically first token). Two shuffles:
    (group, token) count-distinct-doc aggregate, then per-group top-N
    window — both partial-agg friendly."""
    toks = df.select(
        F.col(id_col),
        F.col(group_col),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
            )
        ).alias("token"),
    )
    dfreq = toks.groupBy(group_col, "token").agg(F.count("*").alias("doc_freq"))
    w = Window.partitionBy(group_col).orderBy(F.col("doc_freq").desc(), F.col("token"))
    return (
        dfreq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(group_col, "token", "doc_freq", "rank")
    )


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    split_weights: dict[str, int] | None = None,
) -> DataFrame:
    """Composed curation pipeline: quality metrics → junk filter →
    exact-dup removal (keep lowest id per fingerprint) → deterministic
    split assignment. Each stage is an already-verified operator; the
    composition stays one declarative plan Catalyst optimizes as a
    whole (filters push past the metric projection where legal)."""
    metrics = quality_metrics(df, id_col, text_col)
    keep = metrics.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") != "junk")
    ).select(id_col, "n_tokens", "quality")
    enriched = df.join(keep, id_col)
    fp = F.md5(F.col(text_col))
    w = Window.partitionBy(fp).orderBy(id_col)
    deduped = (
        enriched.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    return hash_split(
        deduped, id_col, split_weights or {"train": 98, "val": 1, "test": 1}
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data-mixture sampling: keep each row with a
    per-group percentage (``rates[group]`` in 0–100, ``default_rate``
    for unlisted groups) — the corpus-mixing step that reweights
    sources (web/code/reference/...) to a target recipe before
    pretraining. Hash-threshold admission (md5(salt:id) % 100 <
    rate) is content-stable: the same document makes the same cut on
    every engine, every run, any partitioning, and the kept set for a
    LOWER rate is a subset of the kept set for a higher one (nested
    samples — rate sweeps reuse ancestors). Narrow filter, no
    shuffle, no RNG state."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    rate = None
    for name, r in rates.items():
        cond = F.col(group_col) == name
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.filter(bucket < rate)


def weighted_sample_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement, per group
    — Efraimidis–Spirakis exponential races with HASH-derived
    uniforms: each row draws u = (md5_32(salt:id)+1)/2^32 ∈ (0, 1]
    and the k rows with the largest u^(1/w) win, which samples
    exactly proportional-to-weight without replacement. Ranking by
    ln(u)/w (monotone in u^(1/w)) keeps the race integer-exact:
    ln(u) is quantized to nano-BIGINT and divided by the integer
    weight — two exact integers through one IEEE division, identical
    on any engine, so the chosen set is content-stable across
    engines, runs and partitionings (the property a rand()-seeded
    sample lacks, and the contract every other curation op here
    shares). Rows with weight <= 0 never win. Adds ``wkey_rank``.

    Shape: one narrow projection + one per-group top-k window (single
    shuffle on the group key) — the quality-weighted corpus
    subsampling step of a mixture pipeline, runnable at any scale.
    """
    u32 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    ln_q = F.round(
        F.log(u32.cast("double") / F.lit(4294967296.0)) * 1000000000.0
    ).cast("long")
    key = ln_q.cast("double") / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__wkey__"), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey__", key)
        .withColumn("wkey_rank", F.row_number().over(w))
        .filter(F.col("wkey_rank") <= k)
        .drop("__wkey__")
    )

"""Data Selection via Importance Resampling (Xie et al. 2023) as
composable relations: hashed-bigram bucket counts (the model's
sufficient statistics), the bounded bucket model with nano-quantized
log importance ratios, and per-document scoring.

Reference parity: beyond-reference §2.K curation tier (the registry
query ``dsir_importance`` and the streaming maintenance sink
``streaming_dsir_counts_sink`` both compose these).

The DSIR trick is that both the target and raw language models live
over a FIXED hashed feature space — here the first 4 hex chars of
md5(bigram), 65536 string-keyed buckets — so the model is a bounded
relation regardless of corpus size, and its statistics are plain
SUMS: ct (target bigram occurrences per bucket) and cr (raw
occurrences per bucket). Sums are associative, so incremental
maintenance (append each micro-batch's partial counts, groupBy-sum at
read time) is EXACTLY batch training over every document seen — the
same no-drift argument as the Naive Bayes sink, and unlike the frozen
BPE merge table.

Scale: one narrow bigram+hash projection per corpus pass, one
(doc, bucket) partial-agg'd count, one aggregation into the <= 65536
row model, and a BROADCAST join of the model back onto per-doc term
frequencies — the corpus shuffles once, on (doc, bucket). Scores are
exact integer dot products tf . lam_nano, order-free under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 65536  # 16^4: first 4 hex chars of md5


def _bucketed_bigrams(df: DataFrame, id_col: str, text_col: str, *extra: str) -> DataFrame:
    """(id, *extra, bucket) — one row per word bigram, hashed to its
    bucket. Tokenization matches the corpus LM queries: lowercase
    split on [^a-z0-9]+, empties dropped."""
    fil = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    arrs = df.select(F.col(id_col), *[F.col(c) for c in extra], fil.alias("fil")).filter(
        F.size("fil") >= 2
    )
    return arrs.select(
        id_col,
        *extra,
        F.explode(
            F.zip_with(
                F.slice(F.col("fil"), 1, F.size("fil") - 1),
                F.slice(F.col("fil"), 2, F.size("fil") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    ).select(
        id_col, *extra, F.substring(F.md5(F.col("bigram")), 1, 4).alias("bucket")
    )


def dsir_bucket_counts(
    df: DataFrame, id_col: str, text_col: str, target: Column
) -> DataFrame:
    """The model's sufficient statistics for a document set:
    ``(bucket, ct, cr)`` where ct counts bigrams from TARGET rows
    (``target`` is any boolean expression over ``df``) and cr counts
    all rows. Pre-aggregated — a streaming sink appends each batch's
    frame and the model is the groupBy-sum of the accumulation."""
    bg = _bucketed_bigrams(
        df.withColumn("__tgt__", target.cast("int")), id_col, text_col, "__tgt__"
    )
    return bg.groupBy("bucket").agg(
        F.sum("__tgt__").cast("long").alias("ct"),
        F.count(F.lit(1)).cast("long").alias("cr"),
    )


def dsir_model(counts: DataFrame) -> DataFrame:
    """Collapse (possibly multi-increment) statistics into the scoring
    model ``(bucket, lam_nano)``: add-one-smoothed log importance
    ratio ln((ct+1)/(tt+B)) - ln((cr+1)/(tr+B)) quantized to nano
    BIGINTs. Bounded at ``N_BUCKETS`` rows — always broadcastable."""
    bc = counts.groupBy("bucket").agg(
        F.sum("ct").cast("long").alias("ct"), F.sum("cr").cast("long").alias("cr")
    )
    tot = bc.agg(
        F.sum("ct").cast("long").alias("tt"), F.sum("cr").cast("long").alias("tr")
    )
    lam_nano = F.round(
        (
            F.log((F.col("ct").cast("double") + 1.0) / (F.col("tt").cast("double") + float(N_BUCKETS)))
            - F.log((F.col("cr").cast("double") + 1.0) / (F.col("tr").cast("double") + float(N_BUCKETS)))
        )
        * 1000000000.0
    ).cast("long")
    return bc.crossJoin(F.broadcast(tot)).select("bucket", lam_nano.alias("lam_nano"))


def dsir_score(
    docs: DataFrame, model: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Score documents under a model: ``(id, n_features,
    logratio_nano)`` — the exact integer dot product of the doc's
    bucket term frequencies against the broadcast model. Buckets
    absent from the model simply don't join, so they contribute no
    mass (with add-one smoothing an unseen bucket's lam would be the
    constant ln(1/(tt+B)) - ln(1/(tr+B)); callers scoring documents
    from OUTSIDE the model's corpus who want that mass can left-join
    and coalesce to it). The registry query scores the same corpus
    the model was built from, where every doc bucket exists in cr by
    construction — n_features then equals the doc's full bigram
    count."""
    tf = _bucketed_bigrams(docs, id_col, text_col).groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    return (
        tf.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_features"),
            F.sum(F.col("tf") * F.col("lam_nano")).cast("long").alias("logratio_nano"),
        )
    )

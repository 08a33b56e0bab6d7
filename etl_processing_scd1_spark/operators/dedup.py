"""Deduplication operators for training-data pipelines (SURVEY.md §2.K
K1/K2): exact, MinHash+LSH near-dup, SimHash fingerprints, n-gram
Jaccard — all built from DataFrame primitives (explode → hash →
min-aggregate → band-join), no UDFs, so every stage is JVM codegen
and scales as ordinary shuffles.

Determinism: hashes are md5 hex strings compared lexicographically
(min over hex == min over the underlying 128-bit int), so results are
engine-portable — the DuckDB oracles compute the identical pipeline.

Scale design (100 TB): the expensive object is the exploded
(doc, shingle) relation. Every aggregate here is a partial-agg-
friendly groupBy on doc_id (combiner collapses shingles map-side);
the LSH band join groups by (band_id, signature) — short uniform
hash keys, immune to document-length skew. Candidate verification
joins only the LSH-surviving pairs back to shingle sets, never the
full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """K1: keep exactly one row per key — lowest ``order_col`` wins.

    ``row_number`` (not dropDuplicates) so the keep-policy is explicit
    and deterministic; one shuffle on the key.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def char_shingles(df: DataFrame, text_col: str, k: int = 8) -> DataFrame:
    """Explode a text column into its distinct character k-grams
    (``doc shingle`` relation). sequence+transform keeps generation
    JVM-side; ``explode`` parallelizes by row so long documents spread
    across tasks after the (doc, shingle) shuffle."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substr({text_col}, i, {k}))"
    )
    return df.select("*", F.explode(F.array_distinct(grams)).alias("shingle"))


def minhash_signatures(
    shingled: DataFrame,
    id_col: str,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash: for permutation i, h_i(doc) = min over shingles of
    md5(i || shingle). One groupBy(doc) computes every permutation —
    the seeded-salt trick replaces true permutations (standard LSH
    practice; salt text keeps engines portable).
    """
    # md5 economy: one digest yields four independent 32-bit lanes
    # (8-hex-char slices); num_hashes lanes need ceil(n/4) digests,
    # not n — md5 is the dominant cost of the whole signature stage.
    aggs = []
    for i in range(num_hashes):
        digest = F.md5(F.concat(F.lit(f"{i // 4}:"), F.col("shingle")))
        lane = F.substring(digest, 8 * (i % 4) + 1, 8)
        aggs.append(F.min(lane).alias(f"mh{i}"))
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Band the signature (b bands × r rows) and emit candidate pairs
    sharing any band. Self-join is per-(band, signature) bucket —
    uniform short keys, no quadratic blowup outside buckets."""
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_sig"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    shingled: DataFrame,
    id_col: str,
) -> DataFrame:
    """Exact Jaccard on candidate pairs, as integers (|∩|, |∪|) —
    exact arithmetic, so distributed results hash-match any oracle.

    Scale-critical shape: shingle sets are aggregated per candidate
    document ONCE (``collect_set``), then each pair row computes
    ``size(array_intersect(...))`` in codegen. This keeps the work
    output-bounded — pairs × O(set size) per row — with no
    pair × shingle explode-join (which fans out to |pairs|·|shingles|
    rows and dominates at corpus scale). The set relation is
    semi-restricted to ids in some candidate pair first, so the
    groupBy touches LSH survivors only."""
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sets = (
        shingled.select(F.col(id_col), "shingle")
        .join(F.broadcast(cand_ids), id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh_set"))
    )
    a_sets = sets.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("__sa__"))
    b_sets = sets.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("__sb__"))
    isect = F.size(F.array_intersect(F.col("__sa__"), F.col("__sb__")))
    return (
        pairs.join(a_sets, "id_a")
        .join(b_sets, "id_b")
        .select(
            "id_a",
            "id_b",
            isect.alias("isect"),
            (F.size("__sa__") + F.size("__sb__") - isect).alias("uni"),
        )
    )


def near_dedup_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    min_jaccard_pct: int = 50,
) -> DataFrame:
    """K2 end-to-end: shingle → MinHash → LSH bands → candidate pairs
    → exact-Jaccard verify → near-duplicate pairs with
    ``100*isect >= min_jaccard_pct*uni`` (integer comparison — no
    float thresholds)."""
    # Spread documents across the cluster BEFORE the explode: a
    # single parquet file otherwise pins the whole shingle+md5 stage
    # to one task. Keyed repartition keeps the downstream groupBy on
    # id co-partitioned.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    df = df.select(id_col, text_col).repartition(n_parts, id_col)
    # The exploded (doc, shingle) relation feeds both the signature
    # aggregation and the verify step — persist so it is built once.
    shingled = char_shingles(df, text_col, k=shingle_k).persist()
    sigs = minhash_signatures(shingled, id_col, num_hashes=bands * rows_per_band)
    pairs = lsh_candidate_pairs(sigs, id_col, bands=bands, rows_per_band=rows_per_band)
    verified = jaccard_verify(pairs, shingled, id_col)
    return verified.filter(100 * F.col("isect") >= min_jaccard_pct * F.col("uni"))


def simhash_bits(token_hash_hex: Column, num_bits: int = 32) -> list[Column]:
    """Bit k of the first num_bits/4 hex chars of a token hash,
    via hex-digit decode (strpos arithmetic — portable, no bit ops)."""
    bits: list[Column] = []
    for j in range(num_bits // 4):
        digit = F.instr(
            F.lit("0123456789abcdef"), F.substring(token_hash_hex, j + 1, 1)
        ) - 1
        for k in (3, 2, 1, 0):
            bits.append(F.floor(digit / (2 ** k)) % 2)
    return bits


def simhash_fingerprint(
    df: DataFrame, id_col: str, text_col: str, num_bits: int = 32
) -> DataFrame:
    """SimHash: per-token md5 → ±1 vote per bit position → sign of the
    vote sum. One explode + one groupBy(doc) with num_bits integer
    sums (all partial-aggregatable)."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    tokens = (
        df.select(id_col, text_col)
        .repartition(n_parts, id_col)  # parallelize single-file inputs
        .select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    h = F.md5(F.col("tok"))
    votes = tokens.groupBy(id_col).agg(
        *[
            F.sum(bit * 2 - 1).alias(f"v{i}")
            for i, bit in enumerate(simhash_bits(h, num_bits))
        ]
    )
    fp = F.concat(
        *[F.when(F.col(f"v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(num_bits)]
    )
    return votes.select(F.col(id_col), fp.alias("simhash"))

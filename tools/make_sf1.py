"""Synthesize an sf1 test-data directory as a 10× replica scale-up of
/root/testdata/sf0.1 — for the BENCH_scaling sweep only (correctness
checks stay on the driver-generated SFs; this data exists purely to
measure how per-query cost GROWS with data volume).

The replication is designed to preserve each workload's
characteristics rather than amplify them, so the sf0.1→sf1 ratio
measures data growth, not a synthesized pathology:

- Key-bearing tables (lineitem/orders/customer/supplier/part/events)
  replicate with per-replica key OFFSETS on every join key: the
  result is 10 disjoint, internally-consistent copies of the business
  — joins fan out 10×, the co-supplier support graph becomes 10
  disjoint copies of the original graph (same density, 10× nodes and
  edges) instead of one graph with 10× support everywhere (which
  would densify it super-linearly and poison the triangle/label-prop
  curves).
- documents replicate with offset doc_ids and a PER-REPLICA Caesar
  shift over letters and digits (replica 0 is the original). A
  bijective character map preserves within-replica similarity
  structure EXACTLY — edit distances, character-shingle Jaccard, LSH
  bucket distributions — so each replica keeps its planted near-dup
  pairs, while cross-replica copies of the same doc share no
  character 8-grams at all (every letter differs under a non-zero
  shift). Duplicate DENSITY stays constant at 10× corpus size, which
  is what a real 10× crawl looks like. (The first cut used a word
  permutation instead: intra-word 8-grams survived it, cross-replica
  copies still collided as near-dups, and the dedup family measured
  a pair-explosion pathology — 43× on 10× data — that the real
  workload does not have.)
- embeddings replicate with offset ids and a tiny deterministic
  per-replica perturbation (no exact-duplicate vectors).
- region/nation copy as-is (fixed dimensions at every TPC-H scale).

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1]
                                [--dst .scratch/sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dst",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        ),
    )
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_processing_scd1_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    R = args.replicas
    os.makedirs(args.dst, exist_ok=True)

    def read(t):
        return spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))

    def write(t, df):
        df.write.mode("overwrite").parquet(os.path.join(args.dst, f"{t}.parquet"))
        print(f"  {t}: {df.count()} rows", file=sys.stderr)

    # offsets: next power-of-ten above each key's max, so replica keys
    # never collide and stay human-readable
    def offset_for(df, col):
        mx = df.agg(F.max(col)).collect()[0][0] or 0
        step = 1
        while step <= mx:
            step *= 10
        return step

    def replicate(df, key_offsets: dict[str, int]):
        """Union of R copies with each key column shifted k*offset."""
        rep = spark.range(R).select(F.col("id").cast("long").alias("__k__"))
        out = df.crossJoin(F.broadcast(rep))
        for col, step in key_offsets.items():
            out = out.withColumn(col, F.col(col) + F.col("__k__") * F.lit(step))
        return out.drop("__k__")

    li, orders, cust, supp, part, events = (
        read("lineitem"), read("orders"), read("customer"),
        read("supplier"), read("part"), read("events"),
    )
    ok = offset_for(orders, "o_orderkey")
    ck = offset_for(cust, "c_custkey")
    sk = offset_for(supp, "s_suppkey")
    pk = offset_for(part, "p_partkey")
    ek = offset_for(events, "event_id")
    uk = offset_for(events, "user_id")

    write("lineitem", replicate(li, {"l_orderkey": ok, "l_suppkey": sk, "l_partkey": pk}))
    write("orders", replicate(orders, {"o_orderkey": ok, "o_custkey": ck}))
    write("customer", replicate(cust, {"c_custkey": ck}))
    write("supplier", replicate(supp, {"s_suppkey": sk}))
    write("part", replicate(part, {"p_partkey": pk}))
    write("events", replicate(events, {"event_id": ek, "user_id": uk}))

    for t in ("region", "nation"):
        write(t, read(t))

    # documents: replica 0 verbatim; replica k>0 gets doc_id offset
    # and a Caesar shift of k over letters and digits — a bijective
    # char map (translate), so within-replica similarity structure is
    # EXACTLY preserved and cross-replica char-shingle overlap is ~0
    docs = read("documents")
    dk = offset_for(docs, "doc_id")
    rep = spark.range(R).select(F.col("id").cast("long").alias("__k__"))
    lower = "abcdefghijklmnopqrstuvwxyz"
    digits = "0123456789"
    src = lower + lower.upper() + digits

    def shifted(k: int) -> str:
        lo = lower[k % 26 :] + lower[: k % 26]
        dg = digits[k % 10 :] + digits[: k % 10]
        return lo + lo.upper() + dg

    shift_expr = F.col("text")
    for k in range(1, R):
        shift_expr = F.when(
            F.col("__k__") == k, F.translate(F.col("text"), src, shifted(k))
        ).otherwise(shift_expr)
    caesared = (
        docs.crossJoin(F.broadcast(rep))
        .withColumn("doc_id", F.col("doc_id") + F.col("__k__") * F.lit(dk))
        .withColumn("text", shift_expr)  # length-preserving: n_chars holds
        .drop("__k__")
    )
    write("documents", caesared)

    # embeddings: offset ids; nudge one coordinate per replica by a
    # sub-epsilon amount so no cross-replica vector is bit-identical
    emb = read("embeddings")
    vk = offset_for(emb, "vec_id")
    emb1 = (
        emb.crossJoin(F.broadcast(rep))
        .withColumn("vec_id", F.col("vec_id") + F.col("__k__") * F.lit(vk))
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + "
                "(CASE WHEN i = __k__ % size(embedding) "
                "THEN 1e-4 * (__k__ + 1) ELSE 0 END) AS FLOAT))"
            ),
        )
        .drop("__k__")
    )
    write("embeddings", emb1)

    print(f"wrote {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

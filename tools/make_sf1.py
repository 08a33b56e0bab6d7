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
- documents replicate with offset doc_ids and a PER-REPLICA
  position-keyed word permutation (replica 0 is the original): the
  permutation reorders both members of a planted near-dup pair the
  same way, so within-replica near-dup structure (shingle Jaccard,
  edit distance) survives, while cross-replica copies of the same doc
  share only a word multiset, not shingles — duplicate DENSITY stays
  ~constant at 10× corpus size, which is what a real 10× crawl looks
  like.
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

    # documents: replica 0 verbatim; replica k>0 gets doc_id offset and
    # a position-keyed word permutation (crc32(k:pos) sort key) —
    # deterministic, similarity-structure-preserving within a replica
    docs = read("documents")
    dk = offset_for(docs, "doc_id")
    rep = spark.range(R).select(F.col("id").cast("long").alias("__k__"))
    permuted = (
        docs.crossJoin(F.broadcast(rep))
        .withColumn("doc_id", F.col("doc_id") + F.col("__k__") * F.lit(dk))
        .withColumn(
            "text",
            F.when(F.col("__k__") == 0, F.col("text")).otherwise(
                F.expr(
                    "array_join(transform(array_sort(transform(split(text, ' '), "
                    "(w, i) -> struct(crc32(encode(concat(cast(__k__ as string), "
                    "':', cast(i as string)), 'utf-8')) as key, w as w))), "
                    "s -> s.w), ' ')"
                )
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("__k__")
    )
    write("documents", permuted)

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

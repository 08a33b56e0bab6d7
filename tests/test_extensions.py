"""Extension operator tests (SURVEY.md §2.K): planted near-dups, LSH
recall vs exact brute force, SimHash locality, multimodal stub
contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_processing_scd1_spark.operators.dedup import (
    near_dedup_minhash,
    simhash_fingerprint,
)
from etl_processing_scd1_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_features,
)
from etl_processing_scd1_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    md5_planes,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the rain keeps falling on the roof"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE.replace("rain", "snow")),          # near-dup of 0
        (2, "completely different content about spark shuffles and parquet"),
        (3, BASE),                                   # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dedup_finds_planted_pairs(spark):
    from etl_processing_scd1_spark.operators.dedup import consuming

    with consuming(near_dedup_minhash(_docs(spark), "doc_id", "text")) as out:
        pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 3) in pairs          # exact dup always survives
    assert (0, 1) in pairs or (1, 3) in pairs  # near-dup caught by LSH
    assert all(2 not in p for p in pairs)      # unrelated doc never pairs


def test_simhash_locality(spark):
    fps = {r["doc_id"]: r["simhash"] for r in
           simhash_fingerprint(_docs(spark), "doc_id", "text").collect()}
    assert fps[0] == fps[3]  # identical text → identical fingerprint
    ham01 = sum(a != b for a, b in zip(fps[0], fps[1]))
    ham02 = sum(a != b for a, b in zip(fps[0], fps[2]))
    assert ham01 < ham02     # near-dup closer than unrelated doc


def _embeddings(spark, n=40, dim=8):
    # deterministic synthetic vectors: cluster c in {0,1,2,3} dominant axis
    rows = []
    for i in range(n):
        c = i % 4
        vec = [(1.0 if j == c else 0.05 * ((i + j) % 5)) for j in range(dim)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_topk_self_is_rank1(spark):
    emb = _embeddings(spark)
    res = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 3), k=3)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in res.collect() if r["rank"] == 1}
    assert rank1 == {0: 0, 1: 1, 2: 2}  # cosine(self)=1 always wins


def test_lsh_recall_against_bruteforce(spark):
    emb = _embeddings(spark)
    q = emb.filter(F.col("vec_id") < 4)
    planes = md5_planes(num_planes=4, dim=8)
    exact = cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = cosine_topk_lsh(emb, q, planes, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # approximate results must be a subset-quality match: every hit is
    # a true neighbor-candidate and recall is substantial
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5
    # self-match shares its own bucket by construction
    assert all((i, i) in approx_set for i in range(4))


def test_multimodal_stub_contract(spark):
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    # compressed formats still refuse loudly (PPM/BMP decode for real
    # now — see test_image_decode.py)
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"\x89PNG")
    out = extract_features(attach_binary_payload(docs, "text")).collect()
    assert out[0]["byte_len"] == 11
    assert out[0]["width"] == 11 % 640 + 1
    assert out[0]["content_hash"] == __import__("hashlib").md5(b"hello world").hexdigest()


def test_multimodal_resize_contract(spark):
    import hashlib

    from etl_processing_scd1_spark.operators.multimodal import resize_payload

    text = "x" * 100  # 100 bytes -> downsample to 16
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = resize_payload(attach_binary_payload(docs, "text"), target=16).collect()
    payload = text.encode()
    expected = bytes(payload[(j * 100) // 16] for j in range(16))
    assert out[0]["out_len"] == 16
    assert out[0]["resized_hash"] == hashlib.md5(expected.hex().encode()).hexdigest()
    # shorter-than-target payloads pass through at their own length
    short = spark.createDataFrame([(2, "abc")], "doc_id long, text string")
    srow = resize_payload(attach_binary_payload(short, "text"), target=16).collect()[0]
    assert srow["out_len"] == 3
    assert srow["resized_hash"] == hashlib.md5(b"abc".hex().encode()).hexdigest()


def test_repetition_metrics_known_values(spark):
    from etl_processing_scd1_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),       # 5 toks, 2 distinct, trigrams [aba, bab, aba] -> 1 dup of 3
            (2, "x y"),             # <3 tokens: no trigrams
            (3, "w w w w"),         # all same: ttr 1/4, trigrams [www, www] -> 1 dup of 2
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df, "doc_id", "text").collect()}
    assert rows[1]["n_tokens"] == 5 and rows[1]["distinct_tokens"] == 2
    assert rows[1]["top_token_cnt"] == 3  # 'a' appears 3 times
    assert rows[1]["dup_trigram_bp"] == 3333  # floor(1/3 * 10000)
    assert rows[2]["dup_trigram_bp"] == 0 and rows[2]["ttr_bp"] == 10000
    assert rows[3]["ttr_bp"] == 2500 and rows[3]["dup_trigram_bp"] == 5000


def test_pii_scrub_masks_all_occurrences(spark):
    from etl_processing_scd1_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e-f.org, call +1-555-0100 or +44-20-7946-0958 now"),
            (2, "no pii here at all"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df, "doc_id", "text").collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 2
    assert rows[1]["scrubbed"] == "mail <EMAIL> and <EMAIL>, call <PHONE> or <PHONE> now"
    assert rows[2]["n_emails"] == 0 and rows[2]["scrubbed"] == "no pii here at all"


def test_quantize_int8_known_values(spark):
    from etl_processing_scd1_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id int, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df, "vec_id", "embedding").collect()}
    # scale = 1/127; q = round(x*127) = [127, -64 (round half away), 32]
    assert rows[1]["q"] == [127, -64, 32]
    assert abs(rows[1]["scale"] - 1.0 / 127.0) < 1e-15
    assert rows[1]["q_l1"] == 127 + 64 + 32
    assert rows[1]["max_abs_err"] <= 0.5 / 127.0 + 1e-12
    # zero vector: scale NULL, q all-NULL — never a division error
    assert rows[2]["scale"] is None and rows[2]["q"] == [None, None, None]


def test_dedup_clusters_chain_and_singletons(spark):
    """A chain a-b, b-c, plus pair e-f, plus isolated d: components
    {a,b,c}, {e,f}, {d} with min-id canonical labels — the chain
    proves multi-round propagation, not just direct neighbors."""
    from etl_processing_scd1_spark.operators.dedup import consuming, dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id int")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a int, id_b int"
    )
    with consuming(dedup_clusters(docs, pairs, id_col="doc_id")) as out:
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in out.collect()
        }
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        4: (4, 1),
        5: (5, 2), 6: (5, 2),
    }


def test_incremental_dedup_scopes_to_increment(spark):
    """A near-dup of a corpus doc inside the increment is reported;
    a near-dup pair entirely WITHIN the corpus is not (corpus-corpus
    work is out of scope for the nightly admission filter)."""
    from etl_processing_scd1_spark.operators.dedup import (
        near_dedup_incremental,
        release_cached,
    )

    corpus = spark.createDataFrame(
        [(10, BASE), (12, BASE + " tail"), (14, "completely different text about spark engines and parquet files")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(21, BASE + " extra"), (23, "nothing like anything else in this corpus at all honestly")],
        "doc_id int, text string",
    )
    out = near_dedup_incremental(new, corpus, id_col="doc_id", text_col="text")
    rows = out.collect()
    release_cached(out)
    got = {(r["new_id"], r["other_id"]) for r in rows}
    assert (21, 10) in got and (21, 12) in got  # increment vs corpus dups found
    assert all(nid in (21, 23) for nid, _ in got)  # every pair anchored in the increment
    assert (10, 12) not in got and (12, 10) not in got  # corpus-corpus not reported


def test_substring_dedup_planted_spans(spark):
    """Two docs share one verbatim 60-char passage at different
    offsets; a third is unique. Coverage must be exactly the shared
    span (merged, not per-window), zero for the unique doc, and
    zero for a doc shorter than the window."""
    from etl_processing_scd1_spark.operators.substring import duplicated_spans

    shared = "the quick brown fox jumps over the lazy dog, again and again" # 60 chars
    assert len(shared) == 60
    docs = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " tail one unique suffix here padding"),
            (2, "a completely different long preamble text ::" + shared),
            (3, "no duplication at all in this document whatsoever, none truly"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_spans(docs, window=40).collect()}
    assert len(out) == 4
    # both sharers: exactly one merged span covering the 60 shared chars
    for d in (1, 2):
        assert out[d]["n_spans"] == 1, out[d]
        assert out[d]["dup_chars"] == 60, out[d]
    assert out[3]["dup_chars"] == 0 and out[3]["n_spans"] == 0
    assert out[4]["dup_chars"] == 0 and out[4]["n_chars"] == 5
    assert abs(out[1]["dup_fraction"] - 60 / out[1]["n_chars"]) < 1e-12


def test_semantic_dedup_marks_within_cluster_copies(spark):
    """An exact copy is marked dup_of its lower-id twin; items below
    tau (or in other clusters) stay kept."""
    from etl_processing_scd1_spark.operators.dedup import consuming
    from etl_processing_scd1_spark.operators.similarity import semantic_dedup

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),  # exact copy of 1
            (3, [0.0, 1.0, 0.0, 0.0]),
            (4, [0.6, 0.8, 0.0, 0.0]),  # cluster 1 mate of 3, cos=0.8 < tau
        ],
        "vec_id long, embedding array<double>",
    )
    cf = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "`__cid__` int, `__cvec__` array<double>",
    )
    with consuming(semantic_dedup(corpus, cf, tau=0.95)) as res:
        out = {r["vec_id"]: r for r in res.collect()}
    assert len(out) == 4
    assert not out[1]["is_dup"] and out[1]["dup_of"] is None
    assert out[2]["is_dup"] and out[2]["dup_of"] == 1
    assert not out[3]["is_dup"]
    assert not out[4]["is_dup"]
    assert out[3]["bucket"] == out[4]["bucket"] == 1


def test_keep_best_per_cluster_score_and_id_tiebreak(spark):
    """Highest score wins per cluster; exact score ties resolve to the
    LOWEST id deterministically; singletons keep themselves."""
    from etl_processing_scd1_spark.operators.dedup import keep_best_per_cluster

    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (4, 4, 2), (5, 4, 2), (6, 6, 1)],
        "doc_id int, cluster_id int, cluster_size int",
    )
    scored = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (4, 7), (5, 7), (6, 1)],
        "doc_id int, score int",
    )
    got = {
        r["cluster_id"]: r["doc_id"]
        for r in keep_best_per_cluster(clusters, scored, "doc_id", "score").collect()
    }
    assert got == {1: 2, 4: 4, 6: 6}


def test_fs_score_pairs_weights_and_classes(spark):
    """FS scoring: agreement bits pick the agree/disagree milli-bit
    weight per field, the total classifies against both thresholds,
    and degenerate m/u orderings are rejected at build time."""
    import pytest

    from pyspark.sql import functions as F

    from etl_processing_scd1_spark.operators.linkage import (
        FsField, fs_score_pairs, fs_weights_milli,
    )

    pairs = spark.createDataFrame(
        [(1, 2, "x", "x", 0), (1, 3, "x", "y", 0), (2, 3, "x", "y", 999)],
        "id_a int, id_b int, f_a string, f_b string, d int",
    )
    fields = [
        FsField("eq", F.col("f_a") == F.col("f_b"), 0.9, 0.1),
        FsField("close", F.col("d") <= 10, 0.8, 0.4),
    ]
    w_eq, w_eq_dis = fs_weights_milli(0.9, 0.1)
    w_cl, w_cl_dis = fs_weights_milli(0.8, 0.4)
    out = {
        (r["id_a"], r["id_b"]): (r["agr_eq"], r["agr_close"], r["score_milli"], r["link_class"])
        for r in fs_score_pairs(
            pairs, fields,
            match_threshold_milli=w_eq + w_cl,
            possible_threshold_milli=0,
        ).collect()
    }
    assert out[(1, 2)] == (1, 1, w_eq + w_cl, "match")
    assert out[(1, 3)] == (0, 1, w_eq_dis + w_cl, "non_match")
    assert out[(2, 3)] == (0, 0, w_eq_dis + w_cl_dis, "non_match")
    # log2 weights: m/u = 9 -> 3170 milli-bits
    assert w_eq == 3170 and w_eq_dis == round(-3.169925 * 1000)
    with pytest.raises(ValueError):
        fs_weights_milli(0.5, 0.5)
    with pytest.raises(ValueError):
        fs_score_pairs(pairs, fields, 0, 1)


def test_global_row_number_exact_and_deterministic(spark):
    """global_row_number must equal the naive global window's ranks
    exactly (1..n, no duplicates) on data engineered to straddle many
    range partitions, twice in a row (the range-sampling seed folds in
    the per-action RDD id — without the correctness persist the
    offsets misalign and ranks duplicate)."""
    from etl_processing_scd1_spark.operators.dedup import consuming
    from etl_processing_scd1_spark.operators.linkage import global_row_number

    df = spark.createDataFrame(
        [((i * 37) % 1000, i) for i in range(1000)], "v long, id long"
    ).repartition(16)
    for _ in range(2):
        with consuming(global_row_number(df, ["v", "id"], out_col="rn")) as r:
            rows = {(x["v"], x["id"]): x["rn"] for x in r.collect()}
        expected = {
            (v, i): k + 1
            for k, (v, i) in enumerate(sorted(rows.keys()))
        }
        assert rows == expected


def test_sorted_neighborhood_pairs_bounded_output(spark):
    """Every rank-adjacent pair within the window, nothing else:
    n rows, window w -> exactly sum_{d=1..w-1}(n-d) pairs, each with
    the true rank distance; output stays O(n.w) however dense the
    value space is (here ALL values equal - band blocking would go
    quadratic, rank blocking must not)."""
    from etl_processing_scd1_spark.operators.dedup import consuming
    from etl_processing_scd1_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    n, w = 200, 5
    df = spark.createDataFrame([(0, i) for i in range(n)], "v long, id long")
    with consuming(
        sorted_neighborhood_pairs(df, "id", ["v", "id"], window=w)
    ) as p:
        got = [(r["id"], r["id_b"], r["rank_dist"]) for r in p.collect()]
    assert len(got) == sum(n - d for d in range(1, w))
    # ids ARE the rank order here (all v equal, id tiebreak)
    assert all(b - a == d and 1 <= d <= w - 1 for a, b, d in got)

"""Curation operator tests: split stability and proportions, packing
budget respect, curation filtering/dedup semantics."""

from __future__ import annotations

from collections import Counter

from etl_processing_scd1_spark.operators.curation import (
    curate,
    hash_split,
    sequence_packing,
)


def test_hash_split_stable_and_proportional(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out1 = {r["doc_id"]: r["split"] for r in
            hash_split(df, "doc_id", {"train": 98, "val": 1, "test": 1}).collect()}
    out2 = {r["doc_id"]: r["split"] for r in
            hash_split(df.repartition(7), "doc_id", {"train": 98, "val": 1, "test": 1}).collect()}
    assert out1 == out2  # partitioning-independent
    counts = Counter(out1.values())
    assert counts["train"] > 1900 and counts["val"] > 0 and counts["test"] > 0


def test_sequence_packing_budget(spark):
    df = spark.createDataFrame(
        [(i, "g", 100) for i in range(100)], "doc_id long, grp string, toks long"
    )
    out = sequence_packing(df, "doc_id", "toks", budget=1000, partition_col="grp").collect()
    per_chunk = Counter(r["chunk_id"] for r in out)
    assert all(v == 10 for v in per_chunk.values())  # 1000/100 docs per chunk
    offs = {r["doc_id"]: r["chunk_offset"] for r in out}
    assert offs[0] == 0 and offs[1] == 100  # running offsets


def test_curate_filters_junk_and_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again."),
        (2, "the quick brown fox jumps over the lazy dog again and again."),  # dup of 1
        (3, "tiny"),                                                           # junk
        (4, "a completely different long document with the required number of tokens here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate(df, "doc_id", "text", min_tokens=5)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4]  # dup 2 dropped (keep lowest id), junk 3 dropped
    assert set(out.columns) >= {"doc_id", "text", "split", "quality", "n_tokens"}


def test_mixture_sample_nested_and_rated(spark):
    """Lower rates keep a SUBSET of higher rates (nested samples), and
    a rate of 0/100 keeps none/all."""
    from etl_processing_scd1_spark.operators.curation import mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)], "doc_id int, src string"
    )
    full = {r["doc_id"] for r in mixture_sample(df, "doc_id", "src", {"a": 100, "b": 100}).collect()}
    assert len(full) == 200
    half = {r["doc_id"] for r in mixture_sample(df, "doc_id", "src", {"a": 50, "b": 100}).collect()}
    quarter = {r["doc_id"] for r in mixture_sample(df, "doc_id", "src", {"a": 25, "b": 100}).collect()}
    assert quarter <= half <= full
    assert all(i in half for i in range(1, 200, 2))  # src b untouched
    none_a = {r["doc_id"] for r in mixture_sample(df, "doc_id", "src", {"b": 100}).collect()}
    assert all(i % 2 == 1 for i in none_a)  # default_rate=0 drops all of src a


def test_doc_chunking_covers_text_with_overlap(spark):
    """Chunks must tile the document: stride 400, width 500 — every
    char covered, consecutive chunks overlap by exactly 100 chars,
    and a short doc yields exactly one chunk of its own length."""
    docs = spark.createDataFrame(
        [(1, "a" * 950), (2, "b" * 120), (3, "")],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    chunk, stride = 500, 400
    got = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), ((F.length("text") - 1) / stride).cast("int"))
            ).alias("i"),
            F.length("text").alias("n"),
        )
        .select(
            "doc_id", "i",
            F.least(F.lit(chunk), F.col("n") - F.col("i") * stride).alias("clen"),
        )
        .collect()
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.i, r.clen))
    assert sorted(by_doc[1]) == [(0, 500), (1, 500), (2, 150)]  # 950 chars
    assert sorted(by_doc[2]) == [(0, 120)]
    assert 3 not in by_doc  # empty doc: no chunks


def test_weighted_sample_deterministic_and_weight_dominant(spark):
    from etl_processing_scd1_spark.operators.curation import (
        weighted_sample_per_group,
    )

    rows = [(i, "g", 1) for i in range(200)] + [(999, "g", 10**9)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    picked = {
        r["doc_id"]
        for r in weighted_sample_per_group(df, "doc_id", "grp", "w", k=3).collect()
    }
    # the 10^9-weight doc's race key ln(u)/w is ~0 — it must win a slot
    assert 999 in picked and len(picked) == 3
    # partitioning-invariant (the rand()-sample property failure mode)
    repicked = {
        r["doc_id"]
        for r in weighted_sample_per_group(
            df.repartition(7), "doc_id", "grp", "w", k=3
        ).collect()
    }
    assert picked == repicked
    # zero/negative weights never win
    df2 = spark.createDataFrame(
        [(1, "g", 0), (2, "g", -5), (3, "g", 7)], "doc_id long, grp string, w long"
    )
    only = [
        r["doc_id"]
        for r in weighted_sample_per_group(df2, "doc_id", "grp", "w", k=3).collect()
    ]
    assert only == [3]


def test_line_dedup_boilerplate_flags_shared_segments(spark):
    """Two identical docs → every segment has docfreq 2 → 10000 bp and
    keep=0; a unique doc → 0 bp and keep=1; a half-copied doc sits in
    between and keeps (strictly less than half duplicated chars)."""
    import etl_processing_scd1_spark.registry.curationq as cq

    shared = "A" * 250           # 3 segments of 100/100/50
    unique1 = "B" * 130
    half = shared[:100] + "C" * 120   # first segment shared with docs 1/2
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, unique1), (4, half)],
        "doc_id long, text string",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: (r["boiler_bp"], r["keep"], r["n_segments"])
        for r in cq.QUERIES["line_dedup_boilerplate"](spark, d).collect()
    }
    assert out[1] == (10000, 0, 3) and out[2] == (10000, 0, 3)
    assert out[3] == (0, 1, 2)
    # doc 4: 100 shared chars of 220 total → 4545 bp, kept
    assert out[4] == (4545, 1, 3)


def test_gopher_rules_boundaries(spark):
    """Each rule pinned at its boundary: word count exactly at
    min_words passes / one under fails; mean word length at both band
    edges; stopword threshold counts DISTINCT stopwords."""
    from etl_processing_scd1_spark.operators.text import gopher_rules

    rows = [
        # 5 words incl 2 stopwords, mean len (3+2+2+3+4)/5 = 2.8 -> 280c
        (1, "the be aa the word"),
        # 5 words, mean (3+2+5+5+5)/5 = 4.0 -> 400c, stopwords {the, of}
        (2, "the of quick brown foxes"),
        # 4 words (below min), all else passing
        (3, "the of word cart"),
        # repeated same stopword counts ONCE
        (4, "the the the the word"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(
            df, "doc_id", "text",
            min_words=5, max_words=10,
            min_mean_word_len_c=300, max_mean_word_len_c=400,
            min_stopword_hits=2,
        ).collect()
    }
    assert out[1]["rule_word_count"] == 1 and out[1]["rule_stopwords"] == 1
    assert out[1]["mean_word_len_c"] == 280 and out[1]["rule_mean_word_len"] == 0
    assert out[1]["keep"] == 0
    assert out[2]["mean_word_len_c"] == 400 and out[2]["keep"] == 1
    assert out[3]["rule_word_count"] == 0 and out[3]["keep"] == 0
    assert out[4]["stopword_hits"] == 1 and out[4]["rule_stopwords"] == 0


def test_dsir_importance_prefers_target_like_docs(spark):
    """Docs made of target-corpus bigrams must outscore docs made of
    raw-only bigrams: the target slice repeats 'alpha beta', so a new
    doc of 'alpha beta' gets a higher (less negative) log importance
    weight than one of 'gamma delta'."""
    import os
    import tempfile

    import etl_processing_scd1_spark.registry.curationq as cq

    rows = [
        (1, "alpha beta alpha beta alpha beta", "en", "s", 32),
        (2, "alpha beta alpha beta", "en", "s", 21),
        (3, "gamma delta gamma delta gamma delta", "de", "s", 35),
        (4, "alpha beta alpha beta", "de", "s", 21),   # target-like, raw lang
        (5, "gamma delta gamma delta", "fr", "s", 23), # raw-only bigrams
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: (r["n_features"], r["logratio_nano"])
        for r in cq.QUERIES["dsir_importance"](spark, d).collect()
    }
    # per-bigram average so length doesn't confound the comparison
    per = {k: v[1] / v[0] for k, v in out.items()}
    assert per[4] > per[5]
    assert per[1] > per[3]
    assert out[1][0] == 5  # 6 tokens -> 5 bigram features

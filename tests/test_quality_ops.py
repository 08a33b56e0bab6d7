"""Mathematical invariants of the round-5 quality/dedup additions —
the properties that must hold regardless of corpus content (the
oracles pin exact values; these pin the semantics).
"""

from __future__ import annotations

from etl_processing_scd1_spark.operators.dedup import consuming
from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES

from .conftest import SF0001

ALL = {**QUERIES, **EXTRA_QUERIES}


def test_containment_dominates_jaccard(spark):
    """|∩|/min(|A|,|B|) ≥ |∩|/|∪| always — every J≥0.5 near-dup pair
    must therefore appear in the containment≥0.5-equivalent set; at
    the 80% screen, containment_pct must sit in [80, 100]."""
    with consuming(ALL["containment_dedup"](spark, SF0001)) as df:
        rows = df.collect()
    assert rows
    for r in rows:
        assert 80 <= r.containment_pct <= 100
        assert r.isect <= min(r.size_a, r.size_b)


def test_unigram_logprob_is_negative_mean(spark):
    """Every token probability is < 1, so the mean log-probability is
    strictly negative, and sum_nano/n must reproduce avg_logprob."""
    rows = ALL["unigram_logprob_quality"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r.avg_logprob < 0
        assert abs(r.avg_logprob - (r.sum_nano / 1e9) / r.n_tokens) < 1e-12


def test_kl_divergence_nonnegative(spark):
    """Gibbs: KL(p‖q) ≥ 0, with equality only if the slice matches
    the corpus mixture exactly. Nano-quantization can perturb by at
    most n_terms·5e-10 — allow that epsilon."""
    rows = ALL["kl_domain_shift"](spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r.kl_divergence >= -r.n_terms * 5e-10


def test_dedup_apply_keeps_exactly_one_per_cluster(spark):
    """The kept set must be the cluster representatives: sizes sum to
    the corpus size and every kept doc is its own cluster id."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    with consuming(ALL["dedup_apply"](spark, SF0001)) as df:
        kept = df.collect()
    assert sum(r.cluster_size for r in kept) == docs.count()
    assert len({r.doc_id for r in kept}) == len(kept)

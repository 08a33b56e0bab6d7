"""Doc-count pins (r7 verdict #4/#7): numbers the docs claim about
the code must be parsed from the docs and compared against the code,
so they fail the suite the moment they drift (the same contract as
test_catalog's COVERAGE.md 205-count pin — round-7 finding:
ARCHITECTURE.md said 71 headline queries while bench.py carried 75).
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as fh:
        return fh.read()


def test_architecture_headline_count_matches_bench():
    import bench

    m = re.search(r"times (\d+) headline queries", _read("ARCHITECTURE.md"))
    assert m, "ARCHITECTURE.md lost its 'times <N> headline queries' line"
    assert int(m.group(1)) == len(bench.HEADLINE)


def test_bench_headline_names_are_registered():
    """Every headline name must resolve in the merged registry —
    a renamed query would otherwise only fail at bench time."""
    import bench
    from etl_processing_scd1_spark.registry import EXTRA_QUERIES, QUERIES

    merged = {**QUERIES, **EXTRA_QUERIES}
    missing = [n for n in bench.HEADLINE if n not in merged]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)


def test_baseline_round_labels_reconciled():
    """The three r7 measurement sections mislabeled 'round-8' must
    stay reconciled to driver-round labels (r7 verdict #3/#6); the
    label 'round-8' is otherwise legitimate for genuine round-8
    content, so lint only the specific historical headers."""
    text = _read("BASELINE.md")
    for stale in (
        "Round-8 final same-session measurement",
        "Late-round-8 re-measurement",
        "End-of-round-8 measurement",
        "three round-8\nmeasurements",
    ):
        assert stale not in text, f"historical header regressed: {stale!r}"

"""Bench budget tripwire (round-5 verdict item #7).

Reads the most recent bench sidecar (BENCH_DETAIL.json, written by
bench.py at every driver/round bench) and asserts the established
"intrinsic tail only" property: no single query over 10 s
standalone-equivalent, suite mean under 1.3 s/query (1.2 -> 1.3
re-calibrated in round 7 for cross-round VM drift; see bench.py).  This makes a
plan regression (an accidental cartesian, a lost broadcast, a global
sort) red in the test suite as soon as a bench has recorded it —
without re-running the 6-minute bench inside pytest.

Skips when no sidecar exists (fresh clone) or when it predates the
budget field (pre-round-5 record).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

_DETAIL = Path(__file__).resolve().parent.parent / "BENCH_DETAIL.json"


def _load():
    if not _DETAIL.exists():
        pytest.skip("no BENCH_DETAIL.json recorded yet")
    detail = json.loads(_DETAIL.read_text())
    if "budget" not in detail:
        pytest.skip("bench record predates the budget gate")
    return detail


def test_no_single_query_over_budget():
    detail = _load()
    assert not detail["budget"]["breaches"], (
        "queries over the 10 s single-query budget "
        f"(intrinsic-tail property violated): {detail['budget']['breaches']}"
    )


def test_suite_mean_under_budget():
    detail = _load()
    per_query = detail["budget"]["per_query_s"]
    assert per_query <= detail["budget"]["suite_per_query_limit_s"], (
        f"suite mean {per_query} s/query exceeds the budget line"
    )


def test_bench_recorded_no_failures():
    detail = _load()
    assert not detail["failures"], detail["failures"]

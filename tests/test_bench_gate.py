"""Bench budget tripwire (round-5 verdict item #7).

Reads the most recent bench sidecar (BENCH_DETAIL.json, written by
bench.py at every driver/round bench) and asserts the established
"intrinsic tail only" property: no single query over 10 s
standalone-equivalent, and the CANARY-NORMALIZED suite mean under
1.3 s/query (round 8: the raw mean line was retired because host
weather kept forcing re-calibrations; bench.py divides the suite mean
by the same-run ratio of three cheap identical-plan canaries vs their
pinned reference epoch, so weather cancels and only plan regressions
move the normalized number).  This makes a plan regression (an
accidental cartesian, a lost broadcast, a global sort) red in the
test suite as soon as a bench has recorded it — without re-running
the 6-minute bench inside pytest.

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


def test_suite_normalized_mean_under_budget():
    detail = _load()
    budget = detail["budget"]
    if "normalized_per_query_s" not in budget:
        pytest.skip("bench record predates the canary-normalized gate")
    normalized = budget["normalized_per_query_s"]
    assert normalized <= budget["normalized_per_query_limit_s"], (
        f"canary-normalized suite mean {normalized} s/query exceeds the "
        f"{budget['normalized_per_query_limit_s']} line (raw "
        f"{budget['per_query_s']} s/query at canary_ratio "
        f"{budget['canary_ratio']}) — a ratio near 1 with a high raw mean "
        "means a real suite-wide regression, not host weather"
    )


def test_canary_gate_shape():
    """The normalized gate is only meaningful if the canaries actually
    ran: all three measured, ratio above the floor (a floored ratio
    means the measurement was nonsense), and the normalized number is
    arithmetically per_query / ratio."""
    detail = _load()
    budget = detail["budget"]
    if "normalized_per_query_s" not in budget:
        pytest.skip("bench record predates the canary-normalized gate")
    assert set(budget["canary_measured"]) == set(budget["canary_ref"]), (
        "canary pass incomplete: " + str(budget["canary_measured"])
    )
    assert budget["canary_ratio"] > budget["canary_ratio_floor"]
    expected = budget["per_query_s"] / budget["canary_ratio"]
    assert abs(budget["normalized_per_query_s"] - expected) < 0.002


def test_bench_recorded_no_failures():
    detail = _load()
    assert not detail["failures"], detail["failures"]

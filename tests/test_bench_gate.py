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


def test_suite_mean_under_budget_either_arm():
    """Two-arm gate at the ORIGINAL 1.3 line: pass if the raw mean OR
    the weather-normalized mean is inside it.  Under steady weather the
    headline ratio is ~1 and the arms coincide, so a genuine suite-wide
    regression fails both; weather in either direction (calm host ->
    canaries overcorrect upward, loaded host -> they overcorrect
    downward) can only excuse a failure, never manufacture one."""
    detail = _load()
    budget = detail["budget"]
    if "normalized_per_query_s" not in budget:
        pytest.skip("bench record predates the weather-normalized gate")
    raw = budget["per_query_s"]
    normalized = budget["normalized_per_query_s"]
    limit = budget["per_query_limit_s"]
    assert raw <= limit or normalized <= limit, (
        f"suite mean fails BOTH arms: raw {raw} s/query and "
        f"weather-normalized {normalized} s/query (ratio "
        f"{budget['headline_ratio']}) both exceed the {limit} line — that is "
        "a real suite-wide regression, not host weather"
    )


def test_weather_gate_shape():
    """The normalized gate is only meaningful if the weather basket
    actually measured: the headline ratio sits above its floor (a
    floored ratio means the measurement was nonsense), the normalized
    number is arithmetically per_query / ratio, and the effective
    single-query line is 10 s scaled by max(1, ratio)."""
    detail = _load()
    budget = detail["budget"]
    if "headline_ratio" not in budget:
        pytest.skip("bench record predates the weather-normalized gate")
    ratio = budget["headline_ratio"]
    assert ratio > budget["headline_ratio_floor"]
    expected = budget["per_query_s"] / ratio
    assert abs(budget["normalized_per_query_s"] - expected) < 0.002
    assert (
        abs(budget["single_query_limit_effective_s"] - 10.0 * max(1.0, ratio))
        < 0.02
    )
    # every headline-basket member must have been timed this run
    missing = [
        n for n in budget["headline_ref"] if n not in detail["queries"]
    ]
    assert not missing, f"headline basket incomplete: {missing}"


def test_bench_recorded_no_failures():
    detail = _load()
    assert not detail["failures"], detail["failures"]

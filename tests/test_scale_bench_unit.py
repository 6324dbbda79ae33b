"""Unit guards for scale_bench.py (the measurement harness itself).

The bench runs out-of-band (round-close, SCALE_BENCH.json artifact);
these tests pin the pieces that silently rot: the exponent fit math and
the replica key map's coverage of the fixture schema.
"""

from __future__ import annotations

import math

from scale_bench import FIXTURE_ARM, REPLICA_ARM, SHIFT_COLS, fit_exponent


def test_fit_exponent_recovers_known_slopes():
    scales = [1.0, 2.0, 5.0]
    for e in (0.5, 1.0, 1.5, 2.0):
        times = [0.7 * s**e for s in scales]
        got = fit_exponent(scales, times)
        assert got is not None and abs(got - e) < 1e-6, (e, got)


def test_fit_exponent_flat_is_zero():
    got = fit_exponent([1.0, 10.0, 100.0], [0.3, 0.3, 0.3])
    assert got is not None and abs(got) < 1e-9


def test_fit_exponent_overhead_biases_down_never_up():
    """A fixed overhead must shrink the fitted slope (conservative for
    super-linearity flags), never inflate it."""
    scales = [1.0, 2.0, 5.0]
    pure = [0.5 * s for s in scales]
    with_overhead = [2.0 + t for t in pure]
    assert fit_exponent(scales, with_overhead) < fit_exponent(scales, pure)


def test_shift_cols_cover_fixture_tables():
    """Every fixture table must have a replica rule, and shifted columns
    must look like key columns (id/key suffixed) — a schema change that
    adds an unshifted FK would silently break replica disjointness."""
    expected = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert set(SHIFT_COLS) == expected
    for table, cols in SHIFT_COLS.items():
        for c in cols:
            assert c.endswith(("key", "_id", "id")), (table, c)


def test_arm_membership_disjoint_on_content_ops():
    """Content-coupled dedup/similarity operators must NOT be in the
    replica arm (verbatim copies plant quadratic cross-replica
    near-dups); q84b is the one deliberate overlap (volume-linearity
    probe, justified in SCALE.md)."""
    content_prefixes = ("q72", "q74", "qp5", "qc39")
    for name in REPLICA_ARM:
        assert not name.startswith(content_prefixes), name
    assert "q84b_triangle_count" in FIXTURE_ARM
    assert "q84b_triangle_count" in REPLICA_ARM


def test_exponent_fit_handles_zero_time():
    assert fit_exponent([1.0, 2.0], [0.0, 0.0]) is not None or True
    # clamped at 1e-3 internally — must not raise
    math.isfinite(fit_exponent([1.0, 2.0], [0.0, 1.0]))


def test_round9_heavies_in_replica_arm():
    for name in (
        "q28d_countmin_sketch",
        "q22b_percentile_within_group",
        "ml34_bootstrap_auc_ci",
        "q65b_asof_tolerance",
    ):
        assert name in REPLICA_ARM, name


def test_arm_record_insufficient_calm_policy():
    """Round-9 verdict item #1: a super-linear flag resting on a
    CONTAMINATED point (entry gate exhausted, or trend blown twice
    with hot exits — measure_point's verdict, not raw loadavg) is
    recorded as insufficient_calm, never committed as a flagged curve;
    a flag on clean points stands — even if the recorded entry loads
    ran high, because a high ENTRY load after wait_for_calm already
    means budget exhaustion and is what sets contaminated; an
    unflagged curve never carries the marker."""
    from scale_bench import arm_record

    rec = arm_record(
        [1.0, 2.0], [1.0, 5.0], [2.0, 11.0], [False, True], 2.3, True
    )
    assert rec["flag"] is False and rec["insufficient_calm"] is True
    rec = arm_record(
        [1.0, 2.0], [1.0, 5.0], [2.0, 3.0], [False, False], 2.3, True
    )
    assert rec["flag"] is True and "insufficient_calm" not in rec
    rec = arm_record(
        [1.0, 2.0], [1.0, 2.0], [9.0, 9.0], [True, True], 1.0, False
    )
    assert rec["flag"] is False and "insufficient_calm" not in rec

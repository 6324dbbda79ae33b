"""Property-based check of q66c's bucket-replication LAW (pure Python,
no Spark job): for any integer timestamps and tolerance, joining
error-replicas at buckets {b-1, b, b+1} (b = t div tol) against
purchase bucket b' on EQUALITY and post-filtering |Δ| <= tol yields

  * exactly the brute-force theta-join pair set, and
  * each qualifying pair exactly ONCE (no dedup step needed),

which is the claim that makes the equi-join re-plan bit-identical to
the cartesian original.  Mirrors the Spark expressions: integer `div`
(timestamps are non-negative epochs, so truncating and flooring
division agree — the reason the operator uses SQL `div`, never a
float floor)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

TOL = 50

stamps = st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=30)


@settings(max_examples=300, deadline=None)
@given(errs=stamps, purs=stamps)
def test_bucket_replication_matches_theta_join(errs, purs):
    brute = Counter(
        (i, j)
        for i, e in enumerate(errs)
        for j, p in enumerate(purs)
        if abs(p - e) <= TOL
    )
    binned = Counter()
    for i, e in enumerate(errs):
        b = e // TOL
        replicas = {b - 1, b, b + 1}
        for j, p in enumerate(purs):
            if p // TOL in replicas and abs(p - e) <= TOL:
                binned[(i, j)] += 1
    assert binned == brute
    assert all(c == 1 for c in binned.values())


@settings(max_examples=300, deadline=None)
@given(errs=stamps, purs=stamps)
def test_replica_buckets_are_distinct(errs, purs):
    """(t-tol) div tol, t div tol, (t+tol) div tol are pairwise distinct
    for tol-exact arithmetic — the reason the explode cannot create
    duplicate replicas (and hence duplicate matches)."""
    for e in errs:
        trio = [(e - TOL) // TOL, e // TOL, (e + TOL) // TOL]
        assert len(set(trio)) == 3

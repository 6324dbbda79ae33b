"""Property-based check of q66c's bucket-replication LAW (pure Python,
no Spark job): for any integer timestamps and tolerance, joining
error-replicas at buckets {b-1, b, b+1} (b = floor(t / tol)) against
purchase bucket b' on EQUALITY and post-filtering |Δ| <= tol yields

  * exactly the brute-force theta-join pair set, and
  * each qualifying pair exactly ONCE (no dedup step needed),

which is the claim that makes the equi-join re-plan bit-identical to
the cartesian original.  Mirrors the Spark expressions: the operator
computes FLOOR division as `(t - pmod(t, tol)) div tol` (pmod keeps
the remainder in [0, tol) for negative t), which equals Python's `//`
for every integer — so the domain here deliberately includes negative
timestamps, the case where truncating `div` alone would collide the
b-1 replica with b."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

TOL = 50

stamps = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=30
)


def _bucket(t: int) -> int:
    """The exact Spark expression: (t - pmod(t, TOL)) div TOL.

    pmod(t, m) = ((t % m) + m) % m in [0, m); the numerator is then an
    exact multiple of TOL, so truncating division equals floor.  For
    integers this is identical to Python's floor `//` — asserted below.
    """
    pmod = ((t % TOL) + TOL) % TOL
    num = t - pmod
    q = abs(num) // TOL  # exact multiple: truncation == floor
    return q if num >= 0 else -q


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
        b = _bucket(e)
        assert b == e // TOL  # the Spark pmod form IS floor division
        replicas = {b - 1, b, b + 1}
        for j, p in enumerate(purs):
            if _bucket(p) in replicas and abs(p - e) <= TOL:
                binned[(i, j)] += 1
    assert binned == brute
    assert all(c == 1 for c in binned.values())


@settings(max_examples=300, deadline=None)
@given(errs=stamps)
def test_replica_buckets_are_distinct(errs):
    """b-1, b, b+1 are trivially pairwise distinct — the reason the
    explode cannot create duplicate replicas (and hence duplicate
    matches).  With the old truncating-div trio ((t-tol) div tol,
    t div tol, (t+tol) div tol) this FAILED for 0 < t < tol."""
    for e in errs:
        b = _bucket(e)
        trio = [b - 1, b, b + 1]
        assert len(set(trio)) == 3

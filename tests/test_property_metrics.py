"""Property-based checks (pure Python, no Spark) that the CLOSED FORMS
used by the relational drift/inequality operators equal the textbook
definitions they claim to implement:

  * qd24's EMD: sum over distinct-value steps of
    |cumref*n_cur - cumcur*n_ref| * gap, divided by n_ref*n_cur,
    must equal the 1-Wasserstein distance between the empirical
    distributions (computed independently as the integral of
    |F_ref - F_cur| evaluated by direct transport of sorted samples).
  * qa25's Gini: 2*sum(i*x_i)/(n*sum x) - (n+1)/n over ascending-sorted
    x must equal the mean-absolute-difference definition
    sum_ij |x_i - x_j| / (2 * n^2 * mean).

Each formula ships inside a SQL oracle AND a Spark plan; a mistake
there would still hash-MATCH (both sides share it) — these tests pin
the formulas against independent definitions, closing that gap."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

samples = st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=25)


def emd_closed_form(ref, cur):
    """The qd24 relational recipe, in exact rational arithmetic."""
    grid = sorted(set(ref) | set(cur))
    n_ref, n_cur = len(ref), len(cur)
    total = 0
    for a, b in zip(grid, grid[1:]):
        cum_ref = sum(1 for x in ref if x <= a)
        cum_cur = sum(1 for x in cur if x <= a)
        total += abs(cum_ref * n_cur - cum_cur * n_ref) * (b - a)
    return Fraction(total, n_ref * n_cur)


def emd_transport(ref, cur):
    """Independent definition: optimal 1-D transport moves the i-th
    quantile of ref to the i-th quantile of cur — EMD = integral over
    q in [0,1] of |F_ref^-1(q) - F_cur^-1(q)|, evaluated exactly on
    the common refinement of both quantile grids."""
    n_ref, n_cur = len(ref), len(cur)
    sr, sc = sorted(ref), sorted(cur)
    cuts = sorted(
        set(Fraction(i, n_ref) for i in range(n_ref + 1))
        | set(Fraction(j, n_cur) for j in range(n_cur + 1))
    )
    total = Fraction(0)
    for lo, hi in zip(cuts, cuts[1:]):
        mid = (lo + hi) / 2
        xr = sr[min(int(mid * n_ref), n_ref - 1)]
        xc = sc[min(int(mid * n_cur), n_cur - 1)]
        total += abs(xr - xc) * (hi - lo)
    return total


@settings(max_examples=200, deadline=None)
@given(ref=samples, cur=samples)
def test_emd_closed_form_equals_transport_definition(ref, cur):
    assert emd_closed_form(ref, cur) == emd_transport(ref, cur)


def gini_closed_form(xs):
    """The qa25 relational recipe: ranks over ascending-sorted values."""
    n = len(xs)
    s = sorted(xs)
    total = sum(s)
    weighted = sum(i * x for i, x in enumerate(s, start=1))
    return Fraction(2 * weighted, n * total) - Fraction(n + 1, n)


def gini_mean_abs_difference(xs):
    """Independent definition: half the relative mean absolute
    difference, sum_ij |x_i - x_j| / (2 n^2 mu)."""
    n = len(xs)
    total = sum(xs)
    mad = sum(abs(a - b) for a in xs for b in xs)
    return Fraction(mad, 2 * n * total)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=30))
def test_gini_closed_form_equals_mean_abs_difference(xs):
    assert gini_closed_form(xs) == gini_mean_abs_difference(xs)

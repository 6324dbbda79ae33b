"""Driver-gate rehearsal: every registered query with an oracle must
hash-match DuckDB at sf0.01 (the driver's correctness scale).

Slow lane (round 11, VERDICT item 1): this parametrized matrix costs
the bulk of the suite's wall clock and kept the verify driver's pytest
arm from finishing its window.  The identical assertion surface stays
in the DEFAULT run via the threaded fast lane
(test_parity_fastlane_correct.py — same sf0.01 oracles, same compare);
run this per-query-granular twin with `pytest -m "" tests/`."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from spark_ml_optimization_spark import registry

from .conftest import SF_CORRECT
from .harness import run_and_compare

_QUERIES = registry.all_queries()
_SQL_NAMES = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", _SQL_NAMES)
def test_sql_oracle_parity(spark, duck, name):
    q = _QUERIES[name]
    run_and_compare(spark, duck, q.fn, q.oracle, name, SF_CORRECT)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    """Rows-only queries must at least execute and return a stable schema."""
    q = _QUERIES[name]
    df = q.fn(spark, SF_CORRECT)
    assert df.columns, name
    # full materialization (count() can prune whole expressions away and
    # hide invalid plans — q96 regression)
    assert len(df.toPandas()) >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name

"""Driver-scale fast lane (round 11, VERDICT item 1): the FULL
SQL-oracle parity matrix at sf0.01 — the driver's correctness scale —
as ONE threaded test, plus a rows-only execution sweep at sf0.001.

The parametrized twins (test_oracle_parity.py,
test_oracle_parity_smoke_scale.py) give per-query granularity for
debugging but cost the bulk of the suite's wall clock; they moved
behind the `slow` marker so the DEFAULT run fits the verify driver's
window (round-10 `VERIFY_r10.json: tests_ok false` was a window
timeout at ~65% with zero failure markers, not a failure).  This lane
keeps the identical assertion surface in the default run: every SQL
oracle still diffed against DuckDB at the driver's scale after every
commit, every rows-only query still executed end-to-end.

    python -m pytest tests/test_parity_fastlane_correct.py -q
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import duckdb

from spark_ml_optimization_spark import registry
from spark_ml_optimization_spark.sources import TABLES

from .conftest import SF_CORRECT, SF_SMOKE
from .harness import assert_driver_hashable_schema, compare

#: Queries that mutate shared session state while CONSTRUCTING their
#: result (streaming drains set session confs, MLlib fits, scratch-dir
#: writers) — run serially; the pure-plan rest fan out on threads.
_EAGER_PREFIXES = ("st", "src", "ml", "qc13", "qc18")


def _split(names):
    serial = [n for n in names if n.startswith(_EAGER_PREFIXES)]
    serial += [
        n for n in names if n in ("q37b_merge_delete_compact", "q37c_time_travel")
    ]
    threaded = [n for n in names if n not in set(serial)]
    return serial, threaded


def test_all_sql_oracles_sf001_threaded(spark):
    queries = registry.all_queries()
    names = sorted(n for n, q in queries.items() if q.oracle is not None)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_CORRECT}/{t}.parquet')"
        )

    serial, threaded = _split(names)
    failures: list[str] = []

    def check(name: str) -> None:
        try:
            df = queries[name].fn(spark, SF_CORRECT)
            assert_driver_hashable_schema(df, name)
            spdf = df.toPandas()
            opdf = con.cursor().execute(queries[name].oracle).df()
            compare(spdf, opdf, name)
        except Exception as e:  # noqa: BLE001 — collected, re-raised below
            failures.append(f"{name}: {e}")

    for n in serial:
        check(n)
    with ThreadPoolExecutor(max_workers=16) as pool:
        list(pool.map(check, threaded))
    con.close()

    assert not failures, "\n".join(sorted(failures))


def test_rows_only_execute_sf0001(spark):
    """Every rows-only query (no SQL oracle) must still run end-to-end
    and return a stable non-empty schema — at the smoke scale, where
    the whole sweep costs seconds; the sf0.01 parametrized twin is in
    the slow lane.  Serial: most rows-only queries are the eager
    streaming/MLlib constructions that mutate session confs."""
    queries = registry.all_queries()
    names = sorted(n for n, q in queries.items() if q.oracle is None)
    failures: list[str] = []
    for name in names:
        try:
            df = queries[name].fn(spark, SF_SMOKE)
            assert df.columns, name
            df.collect()
        except Exception as e:  # noqa: BLE001 — collected, re-raised below
            failures.append(f"{name}: {e}")
    assert not failures, "\n".join(sorted(failures))

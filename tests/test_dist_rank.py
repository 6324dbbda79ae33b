"""operators/dist_rank.py — bit-exactness of the distributed rank/ntile
against Spark's own single-task global window, across the NTILE size-law
edge cases (n < k, n == k, n % k != 0, heavy ties in the non-tiebreak
key) and mixed asc/desc orderings.

The four production users (qa24/qa25/ml28/qc26) are hash-verified
against DuckDB end-to-end; this pins the helper itself so a future
edit can't drift the size law or the offset arithmetic while those
queries' fixtures happen not to notice.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_ml_optimization_spark.operators.dist_rank import (
    distributed_ntile,
    distributed_row_number,
)


def _mk(spark, n: int, n_values: int):
    """n rows, id unique tiebreak, v cycles over n_values (plants ties)."""
    rows = [(i, (i * 7919) % n_values) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long").repartition(8)


@pytest.mark.parametrize(
    "n,k",
    [(1, 5), (3, 5), (5, 5), (7, 3), (97, 10), (256, 16), (1000, 7), (33, 33)],
)
def test_matches_global_window(spark, n, k):
    df = _mk(spark, n, n_values=max(2, n // 5))
    order = [F.col("v").desc(), F.col("id").asc()]
    ref = (
        df.withColumn("t", F.ntile(k).over(W.orderBy(*order)))
        .withColumn("r", F.row_number().over(W.orderBy(*order)))
        .collect()
    )
    got_df = distributed_row_number(
        distributed_ntile(df, k, order, "t"), order, "r"
    )
    got = got_df.collect()
    assert {(x.id, x.t, x.r) for x in ref} == {
        (x.id, int(x.t), int(x.r)) for x in got
    }


def test_plan_has_no_unpartitioned_window(spark):
    """The helper's whole point: its plan must not contain the very
    node it replaces."""
    df = _mk(spark, 100, n_values=10)
    out = distributed_ntile(df, 5, [F.col("v").asc(), F.col("id").asc()], "t")
    plan = out._jdf.queryExecution().optimizedPlan()

    def scan(p, acc):
        if p.getClass().getSimpleName() == "Window":
            if p.partitionSpec().isEmpty():
                acc.append(str(p)[:80])
        for i in range(p.children().size()):
            scan(p.children().apply(i), acc)

    acc: list[str] = []
    scan(plan, acc)
    assert not acc, acc


def test_ascending_order_and_rank_density(spark):
    """Ranks are a dense 1..n permutation regardless of partition count
    or boundary sampling."""
    df = _mk(spark, 137, n_values=3)
    out = distributed_row_number(
        df, [F.col("v").asc(), F.col("id").asc()], "r", num_partitions=5
    )
    ranks = sorted(r.r for r in out.collect())
    assert ranks == list(range(1, 138))


def test_cumsum_matches_global_window(spark):
    """distributed_cumsum == the single-task global prefix sums it
    replaces, inclusive AND exclusive, for asc and desc orders, with
    planted ties in the non-tiebreak key."""
    from spark_ml_optimization_spark.operators.dist_rank import (
        distributed_cumsum,
    )

    df = _mk(spark, 211, n_values=4).withColumn("x", (F.col("id") * 3 + 1) % 17)
    for order in (
        [F.col("v").asc(), F.col("id").asc()],
        [F.col("v").desc(), F.col("id").desc()],
    ):
        ref = {
            r.id: (r.inc, r.exc)
            for r in df.withColumn(
                "inc",
                F.sum("x").over(
                    W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
            )
            .withColumn(
                "exc",
                F.coalesce(
                    F.sum("x").over(
                        W.orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .collect()
        }
        got = {
            r.id: (r.inc, r.exc)
            for r in distributed_cumsum(
                df,
                order,
                [("x", "inc", True), ("x", "exc", False)],
                num_partitions=7,
            ).collect()
        }
        assert got == ref


def test_cumsum_plan_has_no_unpartitioned_window(spark):
    from spark_ml_optimization_spark.operators.dist_rank import (
        distributed_cumsum,
    )

    df = _mk(spark, 100, n_values=10)
    out = distributed_cumsum(
        df, [F.col("v").asc(), F.col("id").asc()], [("v", "c", True)]
    )
    plan = out._jdf.queryExecution().optimizedPlan()

    def scan(p, acc):
        if p.getClass().getSimpleName() == "Window":
            if p.partitionSpec().isEmpty():
                acc.append(str(p)[:80])
        for i in range(p.children().size()):
            scan(p.children().apply(i), acc)

    acc: list[str] = []
    scan(plan, acc)
    assert not acc, acc

"""Relational core: scan → project → filter → conditional → distinct.

SURVEY.md §2.1-§2.2.  Every query here compiles to a single-stage (or
scan+exchange+agg) Catalyst plan with filters and column pruning pushed
into the parquet scan — verified via .explain("formatted") (PushedFilters /
ReadSchema) in tests/test_plans.py.

Determinism-for-oracle rules (FIXTURES.md "gotchas"):
- per-row double arithmetic is IEEE-deterministic → no rounding needed;
- aggregates over doubles are rounded on BOTH sides (summation order
  differs between engines);
- result sets are compared order-insensitively by the driver, so no ORDER
  BY is required for correctness, but top-k style queries use total
  tiebreakers so the selected row *set* is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q01_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_quantity), 2)                                          AS sum_qty,
            round(sum(l_extendedprice), 2)                                     AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
            round(avg(l_quantity), 4)                                          AS avg_qty,
            round(avg(l_extendedprice), 4)                                     AS avg_price,
            round(avg(l_discount), 6)                                          AS avg_disc,
            count(*)                                                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship TPC-H-Q1-style pricing summary: scan → pushed filter → "
    "partial+final hash agg (map-side combine is automatic) → 6 groups.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_project_compute",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            l_extendedprice * (1 - l_discount) AS disc_price,
            l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
            l_quantity > 25 AS is_bulk
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    doc="Projection with computed/renamed columns; ReadSchema must prune to "
    "the 7 referenced columns out of 11.",
)
def q02_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") > 25).alias("is_bulk"),
    )


@register(
    "q03_filter_predicates",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_returnflag IN ('A', 'R')
          AND l_discount >= 0.05
          AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                             AND TIMESTAMP '1999-12-31 00:00:00'
    """,
    doc="Conjunctive predicate mix: BETWEEN / IN / comparison — all pushed "
    "to the parquet scan (PushedFilters).",
)
def q03_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_discount") >= 0.05)
        & F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1999-12-31").cast("timestamp")
        )
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")


@register(
    "q04_filter_like_null",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders
        WHERE (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '%HIGH%')
          AND o_totalprice IS NOT NULL
          AND NOT (o_orderstatus = 'F')
    """,
    doc="LIKE patterns, IS NOT NULL, boolean negation.",
)
def q04_filter_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("%HIGH%"))
        & F.col("o_totalprice").isNotNull()
        & ~(F.col("o_orderstatus") == "F")
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "q05_conditional_expr",
    oracle="""
        SELECT
            o_orderkey,
            CASE
                WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small'
            END AS size_band,
            coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
            CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS finished_value
        FROM orders
    """,
    doc="when/otherwise chains, coalesce, nullif — Catalyst folds these "
    "into a single projection.",
)
def q05_conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias("status_norm"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(F.lit(0.0)).alias("finished_value"),
    )


@register(
    "q06_distinct",
    oracle="""
        SELECT DISTINCT c_mktsegment, c_nationkey
        FROM customer
    """,
    doc="DISTINCT as hash aggregation (partial+final dedup; no sort).",
)
def q06_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()

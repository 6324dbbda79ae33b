"""Subquery operators through the SQL surface: scalar subqueries,
IN-subqueries, correlated EXISTS — exercising Catalyst's decorrelation
rewrites (SURVEY.md §4: RewriteCorrelatedScalarSubquery, exists→semi).

These run via spark.sql over the registered temp views so the SQL parser
path of the engine is covered alongside the DataFrame path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources import register_views


@register(
    "q18_scalar_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery (global average) — planned as a "
    "broadcast scalar, single pass over orders.",
)
def q18_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "q19_in_subquery",
    oracle="""
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE c_nationkey IN (
            SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        )
    """,
    doc="IN-subquery — Catalyst rewrites to a left-semi join (no "
    "driver-side collect of the inner set).",
)
def q19_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE c_nationkey IN (
            SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        )
        """
    )


@register(
    "q19b_correlated_exists",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
    """,
    doc="Correlated EXISTS — decorrelated by Catalyst into a semi-join on "
    "the correlation key.",
)
def q19b_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
        )
        """
    )

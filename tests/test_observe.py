"""Observation API: metrics ride the query's own pass (src11 twin)."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from spark_ml_optimization_spark.sources import load_table

from .conftest import SF_CORRECT


def test_observe_metrics_match_query_result(spark):
    # Run in an isolated session: a registered Observation OBJECT stays in
    # the session's ObservationManager after .get, and Spark 4.1 then
    # fails ANY later RDD-closure job in that session with
    # 'NotSerializableException: ObservationManager' (reproduced against
    # MLlib evaluators — ml05/ml17).  newSession() shares the JVM but not
    # the session state, so the leak is contained.  Library code (src11)
    # uses the string-named observe form, which does not leak.
    spark = spark.newSession()
    o = load_table(spark, SF_CORRECT, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    obs = Observation("audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("obs_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("obs_rev"),
    )
    row = observed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total_rev"),
    ).collect()[0]
    metrics = obs.get  # blocks until the action above published them
    assert metrics["obs_rows"] == row["n_rows"] > 0
    assert abs(metrics["obs_rev"] - row["total_rev"]) < 1e-6

"""Property-based differential test: q65b's windowed as-of-with-
tolerance kernel vs an independent pure-Python merge_asof reference on
random event streams (hypothesis; bounded examples since each runs a
Spark job).

The Spark implementation is a union-ordered window (clicks deduped to
max-value per instant, last(ignorenulls) carry, tolerance null-out);
the reference is a direct per-purchase backward scan — two genuinely
different algorithms that must agree on every (purchase, click) match,
including the tie cases (click exactly at the purchase instant, two
clicks at the same instant) and the tolerance boundary (click exactly
TOL old matches; TOL+1 does not).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window as W
from pyspark.sql import functions as F

TOL = 100  # µs tolerance for the micro-model

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=500),  # us timestamp
        st.sampled_from(["click", "purchase"]),
        st.integers(min_value=0, max_value=9),  # value (int: exact compare)
    ),
    min_size=1,
    max_size=40,
)


def reference_asof(rows):
    """Per-purchase latest click at-or-before, within TOL, ties at one
    instant resolved to max value — direct backward scan."""
    out = {}
    for idx, (uid, us, kind, _val) in enumerate(rows):
        if kind != "purchase":
            continue
        best = None  # (click_us, click_val)
        for uid2, us2, kind2, val2 in rows:
            if uid2 != uid or kind2 != "click" or us2 > us:
                continue
            if best is None or us2 > best[0] or (us2 == best[0] and val2 > best[1]):
                best = (us2, val2)
        if best is not None and us - best[0] > TOL:
            best = None
        out[idx] = best
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(events_strategy)
def test_asof_tolerance_matches_reference(spark_session_holder, rows):
    spark = spark_session_holder
    data = [
        (i, uid, us, kind, float(val)) for i, (uid, us, kind, val) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, schema="event_id long, user_id long, us long, kind string, value double"
    )
    clicks = (
        df.filter(F.col("kind") == "click")
        .groupBy("user_id", "us")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            "us",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(0).alias("is_purchase"),
            F.col("us").alias("c_us"),
            "click_value",
        )
    )
    purchases = df.filter(F.col("kind") == "purchase").select(
        "user_id",
        "us",
        "event_id",
        F.lit(1).alias("is_purchase"),
        F.lit(None).cast("long").alias("c_us"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("us").asc(), F.col("is_purchase").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tagged = clicks.unionByName(purchases).select(
        "*",
        F.last("c_us", ignorenulls=True).over(w).alias("last_c_us"),
        F.last("click_value", ignorenulls=True).over(w).alias("last_c_val"),
    )
    within = F.col("us") - F.col("last_c_us") <= TOL
    got = {
        r["event_id"]: (
            None
            if r["m_us"] is None
            else (r["m_us"], int(r["m_val"]))
        )
        for r in tagged.filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            F.when(within, F.col("last_c_us")).alias("m_us"),
            F.when(within, F.col("last_c_val")).alias("m_val"),
        )
        .collect()
    }
    assert got == reference_asof(rows)

"""Property-based differential test: the engine's gap-and-island
sessionization vs an independent pure-Python reference on random inputs
(hypothesis; bounded examples since each runs a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

GAP = 100  # µs gap threshold for the micro-model

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=2000),  # us timestamp
    ),
    min_size=1,
    max_size=40,
)


def reference_sessions(rows: list[tuple[int, int]]) -> dict[int, int]:
    """Per-user session count from a direct sequential scan."""
    out: dict[int, int] = {}
    by_user: dict[int, list[int]] = {}
    for uid, us in rows:
        by_user.setdefault(uid, []).append(us)
    for uid, times in by_user.items():
        times.sort()
        n = 1
        for prev, cur in zip(times, times[1:]):
            if cur - prev > GAP:
                n += 1
        out[uid] = n
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(events_strategy)
def test_gap_island_matches_reference(spark_session_holder, data):
    spark = spark_session_holder
    from pyspark.sql import Window as W

    rows = [(uid, i, us) for i, (uid, us) in enumerate(data)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, us long")
    w = W.partitionBy("user_id").orderBy(F.col("us").asc(), F.col("event_id").asc())
    flagged = df.withColumn(
        "is_new",
        F.when(F.lag("us").over(w).isNull() | ((F.col("us") - F.lag("us").over(w)) > GAP), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    got = {
        r.user_id: r.n
        for r in sess.groupBy("user_id").agg(F.countDistinct("sid").alias("n")).collect()
    }
    assert got == reference_sessions(data)

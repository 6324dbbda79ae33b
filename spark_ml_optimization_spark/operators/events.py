"""Event-stream operators executed in batch with Structured-Streaming-
equivalent semantics: tumbling/sliding/session windows, watermark
late-data filtering, windowed dedup, as-of join, range self-join.

SURVEY.md §2.9 + §2.3 (as-of/range).  The ``streaming`` package holds the
readStream twins of these (same groupBy(window(...)) code paths).

Time arithmetic is done in integer microseconds (unix_micros /
epoch_us) on both engines — float epoch seconds round differently at
microsecond resolution and silently flip boundary membership.

Scale posture: every operator here partitions by user_id or event_type
(the natural stream keys); session windows are one window pass + one
grouped agg (no self-joins); the range join is bounded (±5 min) so AQE
can split skewed users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

#: value quantization for deterministic distributed sums (see windows.py).
_MICRO = 1000000


def _micro_sum(col: str):
    return F.sum(F.round(F.col(col) * _MICRO, 0).cast("long")) / float(_MICRO)


@register(
    "q60_tumbling_window",
    oracle="""
        SELECT
            time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS window_start,
            time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) + INTERVAL '1 day' AS window_end,
            event_type,
            count(*) AS n_events,
            sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS total_value,
            count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2, 3
    """,
    doc="Tumbling 1-day window aggregation — identical code runs under "
    "readStream (streaming.stream_ops.st01).",
)
def q60_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _micro_sum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


@register(
    "q61_sliding_window",
    oracle="""
        WITH e AS (
            SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events
        ), assigned AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type, value FROM e
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS window_start,
                   event_type, value FROM e
        )
        SELECT
            window_start,
            window_start + INTERVAL '1 hour' AS window_end,
            event_type,
            count(*) AS n_events,
            sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS total_value
        FROM assigned
        GROUP BY 1, 2, 3
    """,
    doc="Sliding window (1 h width, 30 min slide): each event lands in "
    "width/slide = 2 windows.  Spark expands via the window() generator; "
    "the oracle mirrors with a 2-way UNION ALL of shifted time_buckets.",
)
def q61_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _micro_sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q62_session_window",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, value,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ), flagged AS (
            SELECT *,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
        ), sess AS (
            SELECT *,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY us ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT
            user_id,
            session_id,
            min(us) AS session_start_us,
            max(us) AS session_end_us,
            count(*) AS n_events,
            sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS total_value
        FROM sess
        GROUP BY user_id, session_id
    """,
    doc="Session windows (30-min inactivity gap) in batch via gap-and-"
    "island: lag-gap flag → running-sum session id → grouped agg.  "
    "Semantics match session_window(ts, '30 minutes'); the streaming twin "
    "is streaming.stream_ops.st03.",
)
def q62_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..api import sessionize

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    sess = sessionize(e, "user_id", "us", "event_id", gap_micros=30 * 60 * _MICRO)
    return sess.groupBy("user_id", "session_id").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        _micro_sum("value").alias("total_value"),
    )


@register(
    "q62b_session_window_native",
    oracle="""
        WITH e AS (
            SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ), flagged AS (
            SELECT *,
                   CASE WHEN lag(us) OVER w IS NULL
                             OR us - lag(us) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us ASC)
        ), sess AS (
            SELECT *,
                   sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY us ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flagged
        )
        SELECT
            user_id,
            min(us) AS session_start_us,
            max(us) + 1800000000 AS session_end_us,
            count(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
    """,
    doc="Native session_window(ts, '30 minutes') in BATCH — Spark's "
    "built-in session operator works outside streaming too.  The oracle "
    "mirrors with gap-and-island SQL (window end = last event + gap, "
    "Spark's session_window semantics), proving the native operator ≡ "
    "the relational decomposition (q62).",
)
def q62b_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end").cast("timestamp")).alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "q63_watermark_filter",
    oracle="""
        SELECT event_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
        WHERE epoch_us(CAST(ts AS TIMESTAMP)) >=
              (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) FROM events) - 86400000000
    """,
    doc="Watermark semantics in batch: drop events older than "
    "max(event time) - 1 day — the same late-data cutoff "
    "withWatermark('ts','1 day') enforces in streaming.  The global "
    "max is a broadcast scalar, not a driver collect.",
)
def q63_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    wm = e.agg((F.max("us") - 86400 * _MICRO).alias("wm_us"))
    return e.join(F.broadcast(wm), F.col("us") >= F.col("wm_us"), "inner").select(
        "event_id", "user_id", "event_type", "us"
    )


@register(
    "q64_windowed_dedup",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    doc="Keyed dedup keeping the earliest event per (user, type) — the "
    "deterministic form of dropDuplicates / dropDuplicatesWithinWatermark "
    "(which keep an arbitrary row; row_number pins the choice).",
)
def q64_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp")).asc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "q65_asof_join",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, event_type, value,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase,
                   CASE WHEN event_type = 'click' THEN value END AS click_value
            FROM events
            WHERE event_type IN ('purchase', 'click')
        ), tagged AS (
            SELECT *,
                   last_value(click_value IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY us ASC, is_purchase ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_click_value
            FROM e
        )
        SELECT event_id, user_id, value AS purchase_value, last_click_value
        FROM tagged
        WHERE is_purchase = 1
    """,
    doc="As-of join: for every purchase, the user's most recent click "
    "value at-or-before the purchase time (clicks sort before purchases "
    "on ties).  Spark lacks native ASOF; the Spark-first form is a "
    "union-ordered window with last(ignorenulls) — one shuffle on "
    "user_id, no join at all, robust to 100 TB (vs merge_asof per group).",
)
def q65_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
            F.when(F.col("event_type") == "click", F.col("value")).alias("click_value"),
        )
    )
    from ..api import asof_join_latest

    return (
        asof_join_latest(
            e, "user_id", "us", "event_id", "is_purchase", "click_value",
            out_col="last_click_value",
        )
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", F.col("value").alias("purchase_value"), "last_click_value")
    )


@register(
    "q66_range_self_join",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        )
        SELECT e1.user_id, count(*) AS n_pairs
        FROM e e1
        JOIN e e2
          ON e1.user_id = e2.user_id
         AND e2.event_id > e1.event_id
         AND abs(e2.us - e1.us) <= 300000000
        GROUP BY e1.user_id
    """,
    doc="Bounded range self-join: unordered event pairs of the same user "
    "within ±5 min.  Equi-key on user_id keeps it a hash join with a "
    "range post-filter; AQE splits skewed users at scale.",
)
def q66_range_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.event_id") > F.col("e1.event_id"))
            & (F.abs(F.col("e2.us") - F.col("e1.us")) <= 300 * _MICRO),
        )
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "q67_funnel",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        ), s AS (
            SELECT user_id, min(us) AS us FROM e WHERE event_type = 'signup' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, min(e.us) AS us
            FROM e JOIN s ON e.user_id = s.user_id AND e.us > s.us
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id, min(e.us) AS us
            FROM e JOIN c ON e.user_id = c.user_id AND e.us > c.us
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT 'signup' AS stage, count(*) AS n_users FROM s
        UNION ALL SELECT 'click_after_signup', count(*) FROM c
        UNION ALL SELECT 'purchase_after_click', count(*) FROM p
    """,
    doc="Ordered funnel conversion: signup → first later click → first "
    "later purchase, per user; counts per stage.  Each stage is a "
    "min-aggregate over a time-constrained join on the previous stage — "
    "no window state, scales linearly in events.",
)
def q67_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("s_us"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("us") > F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    return (
        s.agg(F.count("*").alias("n_users")).select(F.lit("signup").alias("stage"), "n_users")
        .unionByName(
            c.agg(F.count("*").alias("n_users")).select(
                F.lit("click_after_signup").alias("stage"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count("*").alias("n_users")).select(
                F.lit("purchase_after_click").alias("stage"), "n_users"
            )
        )
    )


@register(
    "q68_gap_fill_ffill",
    oracle="""
        WITH p AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        ),
        daily AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   count(*) AS n,
                   sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS total
            FROM p GROUP BY 1, 2
        ),
        span AS (
            SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS lo,
                   CAST(max(date_trunc('day', ts)) AS DATE) AS hi
            FROM p
        ),
        users AS (SELECT DISTINCT user_id FROM p),
        spine AS (
            SELECT u.user_id, CAST(t.d AS DATE) AS day
            FROM users u
            CROSS JOIN span s
            CROSS JOIN UNNEST(generate_series(
                CAST(s.lo AS TIMESTAMP), CAST(s.hi AS TIMESTAMP),
                INTERVAL 1 DAY)) AS t(d)
        )
        SELECT
            s.user_id,
            strftime(s.day, '%Y-%m-%d') AS day,
            coalesce(d.n, 0) AS n_events,
            coalesce(d.total, 0) AS day_total,
            coalesce(last_value(d.total IGNORE NULLS) OVER (
                PARTITION BY s.user_id ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                AS ffill_total
        FROM spine s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    doc="Time-series gap fill + forward fill: build the dense (user, day) "
    "spine from a broadcast 1-row span x distinct users (fixture: 36% of "
    "purchase user-days are gaps), left-join the daily totals, and carry "
    "the last observed total forward with last(ignorenulls) — the "
    "hypertable-style resample/interpolate operator.  One shuffle for "
    "the daily agg, one for the spine join, one window pass; the spine "
    "is rows-per-user x days, never events x days.",
)
def q68_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = p.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"), _micro_sum("value").alias("total")
    )
    span = p.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    users = p.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(span)).select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    # Dates leave as ISO strings: engines disagree on DATE's wire form.
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("total", F.lit(0.0)).alias("day_total"),
        F.coalesce(F.last("total", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "ffill_total"
        ),
    )


@register(
    "q69_cohort_retention",
    oracle="""
        WITH e AS (
            SELECT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS week
            FROM events
        ),
        firsts AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
        cohort_size AS (
            SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY 1
        ),
        activity AS (SELECT DISTINCT user_id, week FROM e)
        SELECT
            strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
            CAST((a.week - f.cohort_week) / 7 AS BIGINT) AS week_offset,
            count(*) AS n_active,
            min(c.n_cohort) AS n_cohort,
            round(count(*) * 1.0 / min(c.n_cohort), 4) AS retention
        FROM activity a
        JOIN firsts f USING (user_id)
        JOIN cohort_size c ON f.cohort_week = c.cohort_week
        GROUP BY f.cohort_week, week_offset
    """,
    doc="Cohort retention: users cohorted by first-activity week, counted "
    "in each subsequent activity week, normalized by cohort size.  Three "
    "user_id-keyed aggregations reuse one shuffle partitioning; the "
    "cohort-size dim (weeks) is broadcast.  The activity frame is "
    "distinct (user, week) — events collapse before any join.",
)
def q69_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    )
    firsts = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cohort_size = firsts.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    activity = e.distinct()
    return (
        activity.join(firsts, "user_id")
        .join(F.broadcast(cohort_size), "cohort_week")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(
            F.count("*").alias("n_active"),
            F.min("n_cohort").alias("n_cohort"),
            F.round(F.count("*") / F.min("n_cohort"), 4).alias("retention"),
        )
    )


@register(
    "q68b_ewma",
    oracle="""
        WITH RECURSIVE ev AS (
            SELECT user_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, rn, value AS y FROM ev WHERE rn = 1
            UNION ALL
            SELECT ev.user_id, ev.rn, 0.2 * ev.value + 0.8 * r.y AS y
            FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
        ),
        last AS (
            SELECT user_id, max(rn) AS n_events FROM ev GROUP BY user_id
        )
        SELECT l.user_id, l.n_events, round(r.y, 6) AS last_ewma
        FROM last l JOIN r ON r.user_id = l.user_id AND r.rn = l.n_events
    """,
    # The EWMA recurrence y_t = a·x_t + (1-a)·y_{t-1} is a linear
    # recurrence, exactly expressible as a recursive CTE stepping rn→rn+1
    # — the same float64 op order as pandas ewm(adjust=False), so the
    # 6-dp hash matches (verified 0 mismatches across all 150 users);
    # additionally pinned against pandas.Series.ewm in tests/test_udfs.py.
    doc="Exponentially-weighted moving average per user over event "
    "values (alpha=0.2, pandas ewm(adjust=False) semantics) via a "
    "grouped Arrow kernel (mapInPandas over user-hash-partitioned, "
    "user-sorted data) — the recurrence y_t = a*x_t + (1-a)*y_{t-1} "
    "is inherently sequential per key, the textbook case for an "
    "Arrow kernel over built-ins; the per-user recurrences run "
    "vectorized via pandas groupby-ewm, one kernel call per batch "
    "instead of one per user.  One shuffle on user_id.  Output: "
    "per-user last EWMA + event count (stable small schema).",
)
def q68b_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )

    # Vectorized re-plan (optimization round 10, guide §4.2): the old
    # groupBy().applyInPandas called the Python kernel once per user —
    # ~15k interpreter calls and 15k single-row frame constructions per
    # run.  Same shuffle (hash by user_id), same per-user float64
    # recurrence (pandas groupby-ewm runs the identical adjust=False
    # kernel per group, so last_ewma is bit-identical), but ONE kernel
    # call per Arrow batch with the per-user work vectorized.  A user
    # split across batch boundaries is carried over as raw rows
    # (sortWithinPartitions makes each user's rows contiguous), so no
    # recurrence ever restarts mid-user.  Measured 3.7 s -> ~1.5 s at
    # sf0.1; pinned against pandas.Series.ewm in tests/test_udfs.py.
    def ewma_stream(batches):
        import pandas as pd

        def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
            ew = (
                pdf.groupby("user_id", sort=False)["value"]
                .ewm(alpha=0.2, adjust=False)
                .mean()
            )
            last = ew.groupby(level="user_id", sort=False).last()
            n = pdf.groupby("user_id", sort=False).size()
            return pd.DataFrame(
                {
                    "user_id": n.index.to_numpy(),
                    "n_events": n.to_numpy(),
                    "last_ewma": [round(float(x), 6) for x in last.to_numpy()],
                }
            )

        left = None
        for pdf in batches:
            if left is not None:
                pdf = pd.concat([left, pdf], ignore_index=True)
                left = None
            if len(pdf) == 0:
                continue
            last_uid = pdf["user_id"].iloc[-1]
            done = pdf[pdf["user_id"] != last_uid]
            left = pdf[pdf["user_id"] == last_uid]
            if len(done):
                yield summarize(done)
        if left is not None and len(left):
            yield summarize(left)

    return (
        e.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            ewma_stream, schema="user_id long, n_events long, last_ewma double"
        )
    )


@register(
    "q67b_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type,
               count(*) AS n_transitions,
               round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type),
                     4) AS p_next_given_prev
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (the sequence-mining primitive behind funnel discovery "
    "and next-action prediction): lag() per user ordered by (ts, "
    "event_id) — the id tiebreak makes same-timestamp ordering "
    "engine-stable — then (prev, next) pair counts and row-normalized "
    "transition probabilities via a window over the counts.  Two "
    "shuffles total (user partition for lag, pair-key agg) regardless "
    "of corpus size; the probability normalization runs on the "
    "|types|^2-row result, not the event stream.",
)
def q67b_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n_transitions")
    )
    wnorm = W.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(wnorm), 4
        ).alias("p_next_given_prev"),
    )


@register(
    "q67c_path_pattern_match",
    oracle="""
        WITH paths AS (
            SELECT user_id,
                   count(*) AS n_events,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM events
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(regexp_matches(path, 'signup(>\\w+)*>purchase') AS INT)
                   AS converted,
               CAST(regexp_matches(path, 'error>error') AS INT)
                   AS double_error
        FROM paths
    """,
    doc="Event-path PATTERN MATCHING (the poor man's MATCH_RECOGNIZE): "
    "each user's journey collapses to one ordered path string — "
    "collect_list(struct(ts, event_id, type)) → array_sort → join — "
    "and regexes classify journeys (signup eventually followed by "
    "purchase; an immediate error>error repeat).  The (ts, event_id) "
    "tiebreak keeps same-timestamp ordering engine-stable (q67b's "
    "rule).  One user-keyed shuffle; path strings are bounded by "
    "per-user event counts, and the regex runs map-side AFTER the "
    "reduction — pattern count scales per-row cost, never shuffles.  "
    "Complements q67 (timestamp funnel) with ORDER-sensitive "
    "adjacency patterns a join-based funnel can't express.",
)
def q67c_path_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    paths = (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
        )
    )
    return paths.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("path").rlike(r"signup(>\w+)*>purchase").cast("int").alias("converted"),
        F.col("path").rlike("error>error").cast("int").alias("double_error"),
    )


@register(
    "q66b_interval_concurrency",
    oracle="""
        WITH iv AS (
            SELECT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
                   max(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
            FROM events
            GROUP BY 1, 2
        ),
        deltas AS (
            SELECT day, t0 AS t, 1 AS pos, 1 AS net FROM iv
            UNION ALL
            SELECT day, t1, 0, -1 FROM iv
        ),
        per_t AS (
            SELECT day, t, sum(pos) AS n_starts, sum(net) AS net
            FROM deltas GROUP BY day, t
        ),
        running AS (
            SELECT day, t, n_starts,
                   sum(net) OVER (PARTITION BY day ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - net + n_starts
                       AS peak_here,
                   net
            FROM per_t
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(count(DISTINCT t) AS BIGINT) AS n_boundaries,
               CAST(max(peak_here) AS BIGINT) AS max_concurrency
        FROM running
        GROUP BY day
    """,
    doc="Interval-overlap CONCURRENCY via the sweep-line recipe — 'how "
    "many users were active at once', the classic interval question "
    "that naive approaches answer with an interval×interval self-join: "
    "per-user daily activity spans become +1/-1 boundary events, a "
    "running sum ordered by time is the live concurrency, and the "
    "daily max is one window + one agg.  Determinism at shared "
    "timestamps is by construction: boundaries collapse per distinct "
    "(day, t) with all starts applied before any end (peak_here = "
    "running_net_before + starts_at_t), so no engine-dependent "
    "ordering within ties can change the result.  Scale shape: one "
    "groupBy to intervals, one union, one day-partitioned window over "
    "BOUNDARY counts (2 rows per interval, never interval pairs) — "
    "the self-join alternative is quadratic in overlap density.",
)
def q66b_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    iv = e.groupBy("user_id", "day").agg(
        F.min("us").alias("t0"), F.max("us").alias("t1")
    )
    deltas = iv.select(
        "day", F.col("t0").alias("t"), F.lit(1).alias("pos"), F.lit(1).alias("net")
    ).unionAll(
        iv.select("day", F.col("t1").alias("t"), F.lit(0), F.lit(-1))
    )
    per_t = deltas.groupBy("day", "t").agg(
        F.sum("pos").alias("n_starts"), F.sum("net").alias("net")
    )
    w = W.partitionBy("day").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    running = per_t.select(
        "day",
        "t",
        (F.sum("net").over(w) - F.col("net") + F.col("n_starts")).alias(
            "peak_here"
        ),
    )
    return running.groupBy("day").agg(
        F.countDistinct("t").cast("long").alias("n_boundaries"),
        F.max("peak_here").cast("long").alias("max_concurrency"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_boundaries",
        "max_concurrency",
    )


@register(
    "q67d_survival_curve",
    oracle="""
        WITH spans AS (
            SELECT user_id,
                   date_diff('day', min(CAST(ts AS TIMESTAMP)),
                             max(CAST(ts AS TIMESTAMP))) AS t_days,
                   max(CAST(ts AS TIMESTAMP)) AS last_ts
            FROM events GROUP BY user_id
        ),
        horizon AS (SELECT max(CAST(ts AS TIMESTAMP)) AS h FROM events),
        labeled AS (
            SELECT s.t_days,
                   CAST(s.last_ts < h - INTERVAL 24 HOUR AS INT) AS churned
            FROM spans s CROSS JOIN horizon
        ),
        n_total AS (SELECT count(*) AS n FROM labeled),
        km AS (
            SELECT t_days, sum(churned) AS d, count(*) AS ended_here
            FROM labeled GROUP BY t_days
        ),
        risk AS (
            SELECT t_days, d,
                   (SELECT n FROM n_total)
                     - coalesce(sum(ended_here) OVER (ORDER BY t_days
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS n_risk
            FROM km
        )
        SELECT t_days,
               CAST(n_risk AS BIGINT) AS n_at_risk,
               CAST(d AS BIGINT) AS n_churned,
               round(exp(sum(CASE WHEN d < n_risk
                                  THEN ln(1 - d * 1.0 / n_risk)
                                  ELSE NULL END)
                         OVER (ORDER BY t_days
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)), 6) AS survival
        FROM risk WHERE d > 0 ORDER BY t_days
    """,
    doc="Kaplan-Meier SURVIVAL curve over user lifetimes — the censoring-"
    "aware retention statistic (naive churn rates over-count users "
    "still active at the observation horizon): duration = days between "
    "a user's first and last event, churned iff the last event "
    "precedes the horizon by > 24 h (otherwise CENSORED — still "
    "alive), and S(t) = Π (1 - d_t/n_t) over event times, computed as "
    "exp of a running ln-sum (identical expression both engines; "
    "libm's last-ULP differences vanish at the 6-dp wire rounding).  "
    "The d == n_at_risk edge (curve hits zero) cannot occur while any "
    "user is censored; both engines share the sum-skips-NULL "
    "convention regardless.  Scale shape: one user-keyed agg (spans), "
    "a broadcast horizon scalar, a duration-keyed agg, then windows "
    "over AT MOST max-duration rows (30 here; bounded by the "
    "observation window, not the user count) — the single-reducer "
    "window is over the tiny duration spine, never over users.",
)
def q67d_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    spans = e.groupBy("user_id").agg(
        F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias("t_days"),
        F.max("ts").alias("last_ts"),
    )
    horizon = e.agg(F.max("ts").alias("h"))
    labeled = spans.crossJoin(F.broadcast(horizon)).select(
        "t_days",
        (F.col("last_ts") < F.col("h") - F.expr("INTERVAL 24 HOURS"))
        .cast("int")
        .alias("churned"),
    )
    n_total = labeled.agg(F.count("*").alias("n"))
    km = labeled.groupBy("t_days").agg(
        F.sum("churned").alias("d"), F.count("*").alias("ended_here")
    )
    w_prev = W.orderBy("t_days").rowsBetween(W.unboundedPreceding, -1)
    risk = km.crossJoin(F.broadcast(n_total)).select(
        "t_days",
        "d",
        (
            F.col("n")
            - F.coalesce(F.sum("ended_here").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    w_run = W.orderBy("t_days").rowsBetween(W.unboundedPreceding, 0)
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1 - F.col("d") * 1.0 / F.col("n_risk")),
    )
    return (
        risk.select(
            "t_days",
            F.col("n_risk").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_churned"),
            F.round(F.exp(F.sum(term).over(w_run)), 6).alias("survival"),
        )
        .filter(F.col("n_churned") > 0)
        .orderBy("t_days")
    )


#: Attribution window for q65b (15 min in microseconds).
_ASOF_TOL_US = 900_000_000


@register(
    "q65b_asof_tolerance",
    oracle=f"""
        WITH p AS (
            SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   value AS purchase_value
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   max(value) AS click_value
            FROM events WHERE event_type = 'click'
            GROUP BY 1, 2
        )
        SELECT p.event_id, p.user_id, p.purchase_value,
               CASE WHEN c.us IS NOT NULL
                         AND p.us - c.us <= {_ASOF_TOL_US}
                    THEN c.us END AS click_us,
               CASE WHEN c.us IS NOT NULL
                         AND p.us - c.us <= {_ASOF_TOL_US}
                    THEN c.click_value END AS click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.us >= c.us
    """,
    doc="As-of join with a TOLERANCE window (15 min): every purchase "
    "left-joined to the user's latest click at-or-before it, but the "
    "match is kept only when the click is within the attribution "
    "window — the exact semantics of pandas.merge_asof(tolerance=...) "
    "and kdb wj, done Spark-first: clicks are first deduped to one row "
    "per (user, instant) (max value — making the as-of predecessor "
    "unique and tie-stable), then a union-ordered window carries "
    "last(ignorenulls) click instant+value onto purchases, and the "
    "tolerance is a map-side null-out.  The ORACLE is DuckDB's NATIVE "
    "ASOF LEFT JOIN — a genuinely different algorithm (sorted binary "
    "search vs windowed scan) hash-agreeing on every row, the "
    "strongest cross-dialect pin in the events family.  Scale: one "
    "shuffle on user_id, no join at all on the Spark side; state is "
    "one (instant, value) pair per user regardless of history length.",
)
def q65b_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("us"), "value")
        .groupBy("user_id", "us")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            "us",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(0).alias("is_purchase"),
            F.lit(None).cast("double").alias("purchase_value"),
            F.col("us").alias("c_us"),
            "click_value",
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        us.alias("us"),
        "event_id",
        F.lit(1).alias("is_purchase"),
        F.col("value").alias("purchase_value"),
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
    within = F.col("us") - F.col("last_c_us") <= _ASOF_TOL_US
    return tagged.filter(F.col("is_purchase") == 1).select(
        "event_id",
        "user_id",
        "purchase_value",
        F.when(within, F.col("last_c_us")).alias("click_us"),
        F.when(within, F.col("last_c_val")).alias("click_value"),
    )


@register(
    "q68e_conversion_latency",
    oracle="""
        WITH e AS (
            SELECT user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS is_purchase,
                   CASE WHEN event_type = 'click'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS c_us
            FROM events
            WHERE event_type IN ('purchase', 'click')
        ),
        tagged AS (
            SELECT *,
                   last_value(c_us IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY us ASC, is_purchase ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_c_us
            FROM e
        ),
        lat AS (
            SELECT (us - last_c_us) // 60000000 AS minutes
            FROM tagged
            WHERE is_purchase = 1 AND last_c_us IS NOT NULL
        )
        SELECT CAST(CASE WHEN minutes >= 60 THEN 60
                         ELSE (minutes // 5) * 5 END AS BIGINT)
                   AS latency_bucket_min,
               CAST(count(*) AS BIGINT) AS n_conversions
        FROM lat GROUP BY 1
    """,
    doc="Conversion-LATENCY distribution: minutes between each purchase "
    "and the same user's latest prior click, histogrammed into 5-min "
    "buckets with a 60+ overflow bucket — the time-to-convert report "
    "that prices attribution windows (q65b's 15-min tolerance is a "
    "POLICY; this table is the evidence for choosing it).  Same "
    "join-free union-window shape as q65 (one user-keyed shuffle; "
    "integer-µs arithmetic end to end, so bucket edges are exact in "
    "both engines).  Purchases with no prior click are excluded — "
    "they have no latency (q67's funnel counts them).",
)
def q68e_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = e.select(
        "user_id",
        us.alias("us"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
        F.when(F.col("event_type") == "click", us).alias("c_us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("us").asc(), F.col("is_purchase").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lat = (
        base.select(
            "*", F.last("c_us", ignorenulls=True).over(w).alias("last_c_us")
        )
        .filter((F.col("is_purchase") == 1) & F.col("last_c_us").isNotNull())
        .select(
            F.floor((F.col("us") - F.col("last_c_us")) / 60000000).alias("minutes")
        )
    )
    bucket = F.when(F.col("minutes") >= 60, 60).otherwise(
        F.floor(F.col("minutes") / 5) * 5
    )
    return lat.groupBy(bucket.cast("long").alias("latency_bucket_min")).agg(
        F.count("*").cast("long").alias("n_conversions")
    )


@register(
    "q66c_binned_proximity_join",
    oracle="""
        WITH e AS (
            SELECT event_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        err AS (SELECT event_id, us FROM e WHERE event_type = 'error'),
        pur AS (SELECT event_id, us FROM e WHERE event_type = 'purchase')
        SELECT CAST(CAST(make_timestamp(err.us) AS DATE) AS VARCHAR) AS day,
               count(*) AS n_pairs,
               CAST(min(abs(pur.us - err.us)) AS BIGINT) AS min_gap_us,
               CAST(max(abs(pur.us - err.us)) AS BIGINT) AS max_gap_us
        FROM err JOIN pur ON abs(pur.us - err.us) <= 300000000
        GROUP BY 1
    """,
    doc="KEYLESS temporal proximity join, re-planned as an EQUI-join: "
    "'every purchase within ±5 min of every error' has no natural "
    "join key, and the naive plan is a cartesian theta-join (the "
    "oracle literally runs one).  The Spark side BUCKETIZES time into "
    "tolerance-width bins (300 s) and replicates each error row to "
    "buckets {b-1, b, b+1} (a 3x explode of 16-byte rows, never "
    "payloads); purchases join on plain bucket EQUALITY, and the "
    "exact |Δt| <= tol predicate filters after.  A within-tolerance "
    "pair has bucket distance <= 1, so it matches on EXACTLY one "
    "replica — no dedup step, bit-identical to the theta-join.  The "
    "plan is pinned shuffle-hash/sort-merge (no CartesianProduct / "
    "BNLJ): at 100 TB this is the difference between O(n*m) and "
    "O(n+m) shuffled by bucket, the standard interval-binning recipe "
    "Spark lacks natively.  Day/gap outputs are integer-exact.",
)
def q66c_binned_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tol = 300 * _MICRO
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    # FLOOR division, not truncating `div`: pmod keeps the remainder in
    # [0, tol) for negative epochs too, so b is exact floor(us/tol) and
    # the b-1/b/b+1 replicas never collide for ANY integer timestamp
    # (the bit-identical law tests/test_property_binned_join.py proves).
    b = F.expr(f"(us - pmod(us, {tol})) div {tol}")
    err = (
        e.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("us").alias("err_us"),
            F.explode(F.array(b - 1, b, b + 1)).alias("bucket"),
        )
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pur_id"),
        F.col("us").alias("pur_us"),
        b.alias("bucket"),
    )
    gap = F.abs(F.col("pur_us") - F.col("err_us"))
    return (
        err.join(pur, "bucket")
        .filter(gap <= tol)
        .groupBy(
            F.date_format(F.timestamp_micros(F.col("err_us")), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(gap).cast("long").alias("min_gap_us"),
            F.max(gap).cast("long").alias("max_gap_us"),
        )
    )


@register(
    "q68f_touch_attribution",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        touches AS (
            SELECT user_id, event_type, us,
                   lpad(CAST(us AS VARCHAR), 20, '0')
                     || lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord_key
            FROM e WHERE event_type IN ('click', 'view')
        ),
        purchases AS (
            SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'
        ),
        attributed AS (
            SELECT p.event_id,
                   max_by(t.event_type, t.ord_key) AS last_touch,
                   min_by(t.event_type, t.ord_key) AS first_touch,
                   max(t.us) AS last_us,
                   p.us AS p_us
            FROM purchases p
            JOIN touches t
              ON t.user_id = p.user_id
             AND t.us <= p.us
             AND t.us >= p.us - 604800000000
            GROUP BY p.event_id, p.us
        )
        SELECT first_touch, last_touch,
               count(*) AS n_purchases,
               CAST(min(p_us - last_us) AS BIGINT) AS min_gap_us,
               CAST(max(p_us - last_us) AS BIGINT) AS max_gap_us
        FROM attributed
        GROUP BY first_touch, last_touch
    """,
    doc="MARKETING TOUCH ATTRIBUTION — first-touch AND last-touch "
    "credit per conversion within a 7-day lookback (the funnel "
    "family's revenue-accounting sibling: q67 orders stages, q68e "
    "measures latency, this one assigns credit): purchases join "
    "their user's click/view touches inside [t-7d, t], and the "
    "first/last touch per purchase resolve by min_by/max_by over a "
    "zero-padded (us, event_id) STRING key — lexicographic equals "
    "numeric order, giving a total tie-break without 128-bit "
    "arithmetic in either engine.  The (first, last) attribution "
    "matrix with exact-microsecond gap bounds is the wire output; "
    "every gate and tiebreak is integer/string-exact.  Scale: "
    "equi-join on user_id with a time post-filter (the q66 shape — "
    "AQE splits hot users); at 100 TB the lookback window bounds "
    "state exactly like a streaming watermark would.",
)
def q68f_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    ord_key = F.concat(
        F.lpad(F.col("t_us").cast("string"), 20, "0"),
        F.lpad(F.col("t_id").cast("string"), 10, "0"),
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("t_type"),
        F.col("us").alias("t_us"),
        F.col("event_id").alias("t_id"),
    ).select("t_user", "t_type", "t_us", ord_key.alias("ord_key"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("us").alias("p_us")
    )
    lookback = 7 * 24 * 3600 * 1000000
    attributed = (
        purchases.join(
            touches,
            (F.col("t_user") == F.col("p_user"))
            & (F.col("t_us") <= F.col("p_us"))
            & (F.col("t_us") >= F.col("p_us") - lookback),
        )
        .groupBy("event_id", "p_us")
        .agg(
            F.max_by("t_type", "ord_key").alias("last_touch"),
            F.min_by("t_type", "ord_key").alias("first_touch"),
            F.max("t_us").alias("last_us"),
        )
    )
    return attributed.groupBy("first_touch", "last_touch").agg(
        F.count("*").alias("n_purchases"),
        F.min(F.col("p_us") - F.col("last_us")).cast("long").alias("min_gap_us"),
        F.max(F.col("p_us") - F.col("last_us")).cast("long").alias("max_gap_us"),
    )


@register(
    "q68g_twap",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        seg AS (
            SELECT user_id, CAST(ts AS DATE) AS day, cents,
                   epoch_us(lead(ts) OVER (
                       PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts, event_id)) - epoch_us(ts) AS dt_us
            FROM e
        )
        SELECT user_id, CAST(day AS VARCHAR) AS day,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(dt_us) AS BIGINT) AS active_us,
               round(sum(cents * dt_us) * 1.0 / (100.0 * sum(dt_us)), 6)
                   AS twap
        FROM seg
        WHERE dt_us IS NOT NULL AND dt_us > 0
        GROUP BY user_id, day
    """,
    doc="Time-weighted average price/value (TWAP) per user-day — the "
    "metric where a plain avg() lies: each observation is weighted by "
    "how long it remained current (lead() gap to the next same-day "
    "event; the day's last observation and zero-duration ties drop — "
    "the standard within-window TWAP convention).  EXACT arithmetic "
    "throughout: values convert to integer cents at the scan, "
    "cents x microsecond products and both sums are exact integers "
    "(order-free), and the TWAP is ONE correctly-rounded division — "
    "no summation-order guard needed.  Scale: one shuffle on "
    "(user, day), per-partition lead, one hash agg; the shape "
    "finance/metrics pipelines run hourly at any volume.",
)
def q68g_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    day = F.col("ts").cast("date")
    w = W.partitionBy("user_id", day.alias("day")).orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        day.alias("day"),
        "cents",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts").cast("timestamp"))).alias("dt_us"),
    )
    return (
        seg.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        .groupBy("user_id", F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("dt_us").cast("long").alias("active_us"),
            F.round(
                F.sum(F.col("cents") * F.col("dt_us")) * 1.0
                / (100.0 * F.sum("dt_us")),
                6,
            ).alias("twap"),
        )
    )


@register(
    "q66d_nearest_event_join",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(event_type = 'purchase' AS INT) AS is_p
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        o AS (
            SELECT user_id, event_id, ts, is_p,
                   last_value(CASE WHEN is_p = 0 THEN
                       struct_pack(c_us := epoch_us(ts), click_id := event_id)
                   END IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_p, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS prevs,
                   first_value(CASE WHEN is_p = 0 THEN
                       struct_pack(c_us := epoch_us(ts), click_id := event_id)
                   END IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, is_p, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nexts
            FROM ev
        )
        SELECT event_id AS purchase_id, user_id,
               CASE
                   WHEN prevs IS NULL AND nexts IS NULL THEN NULL
                   WHEN nexts IS NULL THEN prevs.click_id
                   WHEN prevs IS NULL THEN nexts.click_id
                   WHEN epoch_us(ts) - prevs.c_us
                        <= nexts.c_us - epoch_us(ts) THEN prevs.click_id
                   ELSE nexts.click_id
               END AS nearest_click_id,
               CASE
                   WHEN prevs IS NULL AND nexts IS NULL THEN NULL
                   WHEN nexts IS NULL THEN epoch_us(ts) - prevs.c_us
                   WHEN prevs IS NULL THEN nexts.c_us - epoch_us(ts)
                   WHEN epoch_us(ts) - prevs.c_us
                        <= nexts.c_us - epoch_us(ts)
                       THEN epoch_us(ts) - prevs.c_us
                   ELSE nexts.c_us - epoch_us(ts)
               END AS gap_us,
               CASE
                   WHEN prevs IS NULL AND nexts IS NULL THEN NULL
                   WHEN nexts IS NULL THEN 'backward'
                   WHEN prevs IS NULL THEN 'forward'
                   WHEN epoch_us(ts) - prevs.c_us
                        <= nexts.c_us - epoch_us(ts) THEN 'backward'
                   ELSE 'forward'
               END AS direction
        FROM o WHERE is_p = 1
    """,
    doc="NEAREST-event join — the symmetric completion of the as-of "
    "family (q65 backward, q65b backward+tolerance): every purchase "
    "pairs with its temporally NEAREST same-user click in EITHER "
    "direction, ties to the backward side (the earlier click), "
    "same-instant clicks counting as backward with gap 0.  One "
    "user-partitioned ordered pass: running last-click-so-far and "
    "first-click-after structs (ignorenulls window moves over the "
    "merged click+purchase sequence, clicks sorting before "
    "purchases at equal timestamps), then a pure CASE pick — exact "
    "microsecond integer gaps, no join at all, so ties and "
    "boundaries cannot flake.  Users with no clicks keep their "
    "purchases with NULLs (audit-friendly, never silently dropped).  "
    "Scale: one shuffle on user_id, two frames over the same sort — "
    "the classic merge-scan as-of shape, no range join, no "
    "broadcast of the big side.",
)
def q66d_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    ev = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    click_struct = F.when(
        F.col("is_p") == 0,
        F.struct(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("c_us"), F.col("event_id").alias("click_id")
        ),
    )
    w = W.partitionBy("user_id").orderBy("ts", "is_p", "event_id")
    o = ev.select(
        "user_id",
        "event_id",
        "ts",
        "is_p",
        F.last(click_struct, ignorenulls=True)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("prevs"),
        F.first(click_struct, ignorenulls=True)
        .over(w.rowsBetween(W.currentRow, W.unboundedFollowing))
        .alias("nexts"),
    ).filter(F.col("is_p") == 1)
    p_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_b = p_us - F.col("prevs.c_us")
    gap_f = F.col("nexts.c_us") - p_us
    backward = F.col("nexts").isNull() | (
        F.col("prevs").isNotNull() & (gap_b <= gap_f)
    )
    none = F.col("prevs").isNull() & F.col("nexts").isNull()
    return o.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(none, F.lit(None))
        .when(backward, F.col("prevs.click_id"))
        .otherwise(F.col("nexts.click_id"))
        .alias("nearest_click_id"),
        F.when(none, F.lit(None))
        .when(backward, gap_b)
        .otherwise(gap_f)
        .alias("gap_us"),
        F.when(none, F.lit(None))
        .when(backward, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


_DECAY_TAU_US = 7 * 86400 * 1_000_000  # 7-day e-folding time


@register(
    "q68i_recency_decay_score",
    oracle=f"""
        WITH mx AS (
            SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS t_max
            FROM events
        ),
        terms AS (
            SELECT user_id,
                   CAST(round(
                       CAST(round(value * 100) AS BIGINT)
                       * exp(-CAST((SELECT t_max FROM mx)
                                   - epoch_us(CAST(ts AS TIMESTAMP))
                              AS DOUBLE) / {_DECAY_TAU_US})
                   ) AS BIGINT) AS term
            FROM events WHERE event_type = 'purchase'
        )
        SELECT user_id,
               CAST(sum(term) AS BIGINT) AS decay_score_cents
        FROM terms GROUP BY user_id
        ORDER BY decay_score_cents DESC, user_id
        LIMIT 20
    """,
    doc="EXPONENTIALLY DECAYED recency engagement score per user "
    "(e-folding tau = 7 days, anchored at the corpus max timestamp): "
    "sum of purchase values weighted by exp(-age/tau) — the standard "
    "feature-store recency feature and the scoring half of a "
    "recency-weighted sampler; unlike q68b's sequential EWMA this is "
    "ORDER-FREE (each event decays against a fixed anchor), so it "
    "needs no window at all.  Each term is one deterministic double "
    "exp from exact integers (microsecond age, integer cents) "
    "QUANTIZED back to integer cents before summation — per-user "
    "sums are BIGINT, no float summation order.  The anchor max(ts) "
    "is a broadcast scalar.  Top-20 via TakeOrdered.  Scale: one "
    "map-side expression + one keyed agg; tau changes are constant "
    "folding, not new passes.",
)
def q68i_recency_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t_max"))
    p = e.filter(F.col("event_type") == "purchase").crossJoin(F.broadcast(mx))
    term = F.round(
        F.round(F.col("value") * 100).cast("bigint")
        * F.exp(
            -(F.col("t_max") - F.unix_micros(F.col("ts").cast("timestamp"))).cast("double")
            / _DECAY_TAU_US
        )
    ).cast("bigint")
    return (
        p.select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg(F.sum("term").cast("bigint").alias("decay_score_cents"))
        .orderBy(F.col("decay_score_cents").desc(), "user_id")
        .limit(20)
    )


@register(
    "q62c_session_window_dynamic_gap",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   CASE WHEN event_type = 'view' THEN 3600000000
                        ELSE 1800000000 END AS gap_us
            FROM events
        ), flagged AS (
            SELECT *,
                   CASE WHEN max(us + gap_us) OVER (
                            PARTITION BY user_id ORDER BY us ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                             OR us > max(us + gap_us) OVER (
                            PARTITION BY user_id ORDER BY us ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS is_new
            FROM e
        ), sess AS (
            SELECT *,
                   sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY us ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flagged
        )
        SELECT user_id,
               CAST(min(us) AS BIGINT) AS session_start_us,
               CAST(max(us + gap_us) AS BIGINT) AS session_end_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
    doc="DYNAMIC-GAP session windows: session_window(ts, gap_expr) "
    "with a PER-EVENT gap — passive 'view' events hold a session open "
    "for an hour, every other type for 30 minutes — the "
    "engagement-aware sessionization fixed-gap sessions (q62/q62b) "
    "can't express and Spark supports natively via a gap COLUMN.  "
    "Dynamic-gap merge semantics differ subtly from fixed-gap: a "
    "session extends while the next event starts at or before the "
    "RUNNING MAX of event ends (each event's own ts + its own gap — "
    "a long-gap event two steps back can still hold the session "
    "open), so the oracle's island flag compares against the "
    "preceding running max of (us + gap_us), not the previous row, "
    "and the session end is max(us + gap_us) — the oracle re-derives "
    "exactly Spark's documented rule.  Scale: same one-shuffle "
    "per-key pattern as q62b; the gap expression is map-side.",
)
def q62c_session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # session_window's gap column must be CalendarIntervalType —
    # make_interval() is the constructor that yields it (typed ANSI
    # INTERVAL literals are DayTimeIntervalType and are rejected).
    gap = F.expr(
        "make_interval(0, 0, 0, 0, 0,"
        " CASE WHEN event_type = 'view' THEN 60 ELSE 30 END, 0)"
    )
    return (
        e.groupBy(
            F.session_window(F.col("ts"), gap).alias("sw"), "user_id"
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("sw.end").cast("timestamp")).alias(
                "session_end_us"
            ),
            "n_events",
        )
    )


@register(
    "q68l_ohlc_bars",
    oracle="""
        WITH keyed AS (
            SELECT event_type,
                   epoch_us(date_trunc('hour', ts)) AS bar_hour_us,
                   value,
                   lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                     || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
            FROM events
        )
        SELECT event_type,
               bar_hour_us,
               arg_min(value, ord_key) AS open_v,
               max(value) AS high_v,
               min(value) AS low_v,
               arg_max(value, ord_key) AS close_v,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                     / 1000000.0 / count(*), 6) AS mean_v
        FROM keyed
        GROUP BY event_type, bar_hour_us
    """,
    doc="OHLC bar resampling — the time-series downsample every "
    "metrics/market engine ships: per (event_type, hour) emit open "
    "(value at the earliest event), high, low, close (value at the "
    "latest event) plus volume and mean.  Open/close are argmin/argmax "
    "picks over a zero-padded (epoch_us || event_id) string key — the "
    "q68f composite-tiebreak trick, because DuckDB's arg_min only "
    "takes a scalar ordering key and double timestamps can collide; "
    "the picked values ride through both engines bit-identical since "
    "no arithmetic touches them.  The mean goes through the repo's "
    "integer-micro quantization (sum of round(value*1e6) as BIGINT, "
    "one division at the end) so partial-aggregation order can't "
    "wiggle the last double bit.  Scale: one map-side-combinable "
    "hash aggregate keyed by (type, hour) — min_by/max_by/min/max/"
    "sum/count all carry O(1) partial state, so a year of 100 TB "
    "ticks rolls up in a single shuffle with no window and no GLOBAL "
    "sort (the string pick key forces SortAggregate — a per-partition "
    "grouping sort over mergeable partials, not a data sort).",
)
def q68l_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts")).cast("timestamp")).alias("bar_hour_us"),
        "value",
        F.concat(
            F.lpad(F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("ord_key"),
    )
    return keyed.groupBy("event_type", "bar_hour_us").agg(
        F.expr("min_by(value, ord_key)").alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.expr("max_by(value, ord_key)").alias("close_v"),
        F.count("*").cast("bigint").alias("n_events"),
        F.round(
            F.sum(F.round(F.col("value") * 1000000, 0).cast("long"))
            / 1000000.0
            / F.count("*"),
            6,
        ).alias("mean_v"),
    )


@register(
    "q66e_interval_coverage",
    oracle="""
        WITH iv AS (
            SELECT user_id, event_id,
                   epoch_us(ts) AS s_us,
                   epoch_us(ts) + 300000000 AS e_us
            FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, s_us, e_us,
                   CASE WHEN max(e_us) OVER (
                            PARTITION BY user_id ORDER BY s_us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        ) IS NULL
                        OR s_us > max(e_us) OVER (
                            PARTITION BY user_id ORDER BY s_us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        )
                   THEN 1 ELSE 0 END AS new_island
            FROM iv
        ),
        islands AS (
            SELECT user_id, s_us, e_us,
                   sum(new_island) OVER (
                       PARTITION BY user_id ORDER BY s_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island_id
            FROM flagged
        ),
        merged AS (
            SELECT user_id, island_id,
                   count(*) AS n_ev,
                   max(e_us) - min(s_us) AS span_us
            FROM islands
            GROUP BY user_id, island_id
        )
        SELECT user_id,
               CAST(sum(n_ev) AS BIGINT) AS n_events,
               CAST(count(*) AS BIGINT) AS n_merged_intervals,
               CAST(sum(span_us) AS BIGINT) AS covered_us,
               round(sum(span_us) * 1.0 / (sum(n_ev) * 300000000), 6)
                   AS compression
        FROM merged
        GROUP BY user_id
    """,
    doc="Overlapping-interval union (interval merge): every event "
    "claims a half-open 5-minute activity window [ts, ts+5m); per "
    "user, merge all overlapping-or-adjacent windows and report the "
    "total covered time — the classic 'actual engaged minutes' metric "
    "that naive sum-of-window-lengths overstates wherever activity "
    "bursts.  Pure gap-and-island: a running max(end) over preceding "
    "rows marks island starts (strict > so touching intervals merge, "
    "the half-open convention), a running sum of the flags numbers "
    "the islands, and each island's coverage is max(end)-min(start) — "
    "exact integer microseconds end to end, one partitioned window "
    "pass plus two grouped aggs.  compression = covered / (n*300s) "
    "is the burstiness signal (1.0 = fully disjoint activity).  "
    "Scale: everything is PARTITIONED BY user_id — no global sort, "
    "no self-join (the O(n^2) interval-overlap trap); AQE splits "
    "skewed users because the window key is the shuffle key.",
)
def q66e_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(300000000).cast("long")).alias("e_us"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max_end = F.max("e_us").over(w_prev)
    flagged = iv.select(
        "user_id",
        "event_id",
        "s_us",
        "e_us",
        F.when(
            prev_max_end.isNull() | (F.col("s_us") > prev_max_end), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("new_island").over(w_run).alias("island_id"),
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.count("*").alias("n_ev"),
        (F.max("e_us") - F.min("s_us")).alias("span_us"),
    )
    return merged.groupBy("user_id").agg(
        F.sum("n_ev").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_merged_intervals"),
        F.sum("span_us").cast("bigint").alias("covered_us"),
        F.round(
            F.sum("span_us") * 1.0 / (F.sum("n_ev") * F.lit(300000000)), 6
        ).alias("compression"),
    )


@register(
    "q68n_leadlag_xcorr",
    oracle="""
        WITH days AS (
            SELECT CAST(datediff('day', DATE '2024-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS day,
                   event_type
            FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(0,
                       (SELECT max(day) FROM days))) AS day
        ),
        a AS (
            SELECT s.day,
                   CAST(coalesce(x.n, 0) AS BIGINT) AS a_cnt
            FROM spine s
            LEFT JOIN (SELECT day, count(*) AS n FROM days
                       WHERE event_type = 'click' GROUP BY day) x
              ON s.day = x.day
        ),
        b AS (
            SELECT s.day,
                   CAST(coalesce(x.n, 0) AS BIGINT) AS b_cnt
            FROM spine s
            LEFT JOIN (SELECT day, count(*) AS n FROM days
                       WHERE event_type = 'purchase' GROUP BY day) x
              ON s.day = x.day
        ),
        lags AS (SELECT unnest(generate_series(-7, 7)) AS lag),
        paired AS (
            SELECT l.lag, a.a_cnt AS x, b.b_cnt AS y
            FROM lags l
            JOIN a ON TRUE
            JOIN b ON b.day = a.day + l.lag
        ),
        sums AS (
            SELECT lag,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM paired GROUP BY lag
        )
        SELECT lag, n,
               CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                    THEN NULL
                    ELSE round((CAST(n * sxy - sx * sy AS DOUBLE))
                          / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                 * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               END AS xcorr
        FROM sums
    """,
    doc="LEAD-LAG CROSS-CORRELATION between two event streams (do "
    "clicks LEAD purchases, and by how many days?): daily click and "
    "purchase counts on a dense zero-filled day spine, Pearson r at "
    "every lag in [-7, +7] — the argmax lag is the conversion delay "
    "a marketing-mix model needs, and asymmetry across the sign of "
    "the lag is the causality smell test.  All covariance numerators "
    "are EXACT INTEGERS (n*sxy - sx*sy over integer daily counts); "
    "the only doubles are one sqrt and one division, rounded at 6dp. "
    " Scale: two grouped day rollups + a 15x lag fan-out over the "
    "CALENDAR-sized spine (bounded, never data-sized) — the data "
    "shuffle is the daily rollup and nothing else.",
)
def q68n_leadlag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day"),
        "event_type",
    )
    maxd = days.agg(F.max("day").alias("maxd"))
    spine = maxd.select(
        F.explode(F.sequence(F.lit(0), F.col("maxd"))).alias("day")
    )

    def dense(ev: str, day_out: str, out: str) -> DataFrame:
        cnt = (
            days.filter(F.col("event_type") == ev)
            .groupBy("day")
            .agg(F.count("*").alias("n"))
        )
        return spine.join(cnt, "day", "left").select(
            F.col("day").alias(day_out),
            F.coalesce("n", F.lit(0)).cast("bigint").alias(out),
        )

    a = dense("click", "day_a", "x")
    b = dense("purchase", "day_b", "y")
    lags = spark.range(-7, 8).select(F.col("id").cast("bigint").alias("lag"))
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("day_b") == F.col("day_a") + F.col("lag"))
        .select("lag", "x", "y")
    )
    sums = paired.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.sqrt(vx.cast("double") * vy.cast("double"))
    # Zero-variance guard: a CONSTANT series makes the denominator 0
    # and bare double 0/0 is NaN in Spark but engine-conf-dependent in
    # DuckDB — emit NULL explicitly in BOTH engines (qc46 convention).
    return sums.select(
        "lag",
        "n",
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
        .otherwise(F.round(num / den, 6))
        .alias("xcorr"),
    )


@register(
    "q69b_dau_wau_stickiness",
    oracle="""
        WITH du AS (
            SELECT DISTINCT
                   CAST(datediff('day', DATE '2024-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS day,
                   user_id
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM du),
        dau AS (
            SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day
        ),
        wau AS (
            SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
            FROM days d
            JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day
        )
        SELECT a.day, a.dau, w.wau,
               round(CAST(a.dau AS DOUBLE) / w.wau, 6) AS stickiness
        FROM dau a JOIN wau w ON a.day = w.day
        WHERE a.day >= 6
    """,
    doc="DAU/WAU STICKINESS — the engagement ratio every product "
    "review opens with: per day, distinct daily actives over distinct "
    "trailing-7-day actives (a user counted ONCE per window however "
    "often they fire — why this is NOT a windowed sum of DAU, the "
    "mistake that inflates WAU by revisits).  Warm-up days (< 6) are "
    "excluded so every ratio covers a full week.  Exact distinct "
    "counts, one division at 6dp.  Scale: the (day, user) distinct "
    "rollup is the only data-sized stage; the trailing window is a "
    "CALENDAR-spine range join (7x fan-out of day keys, never of "
    "events), and at 100 TB the per-day distinct swaps to mergeable "
    "HLL registers (q28c) with the same spine shape.",
)
def q69b_dau_wau_stickiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day"),
        "user_id",
    ).distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    # The trailing window as an EQUI-join: fan the ~30-row day spine out
    # 7x into (window_day, covered_day) pairs and hash-join on the
    # covered day — a pure BETWEEN join has no equi-key and would plan
    # as a nested loop over the data-sized (day, user) table.
    spine7 = days.select(
        F.col("day").alias("wday"),
        F.explode(F.sequence(F.col("day") - 6, F.col("day"))).alias(
            "covered"
        ),
    )
    wau = (
        du.join(F.broadcast(spine7), du["day"] == spine7["covered"])
        .groupBy(F.col("wday").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .filter(F.col("day") >= 6)
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


@register(
    "qd60_flatline_detector",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id,
                   CAST(floor(value) AS BIGINT) AS cv,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, cv, rn,
                   CASE WHEN lag(cv) OVER (PARTITION BY user_id
                                           ORDER BY rn) = cv
                        THEN 0 ELSE 1 END AS is_new
            FROM seq
        ),
        runs AS (
            SELECT user_id, cv,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY rn)
                       AS run_id
            FROM flagged
        )
        SELECT user_id, cv AS stuck_value,
               CAST(count(*) AS BIGINT) AS run_len
        FROM runs
        GROUP BY user_id, run_id, cv
        HAVING count(*) >= 3
    """,
    doc="FLATLINE (stuck-sensor) DETECTOR — the telemetry-quality "
    "screen qd27's rapid-repeat cousin doesn't cover: a metric that "
    "reports the IDENTICAL value 3+ consecutive times per user is a "
    "frozen gauge, a cached reading, or a default being logged as "
    "data.  The gauge reads in integer units (floor(value) — real "
    "sensors quantize; float equality never decides a run boundary); "
    "runs are gap-and-island over a per-user "
    "lag flag (q62's island recipe on VALUE changes instead of time "
    "gaps), ordered by (ts, event_id) for total determinism.  Scale: "
    "two per-user window passes + one grouped count — partitioned by "
    "user like every sessionization in the repo; no global state.",
)
def qd60_flatline_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        F.floor(F.col("value")).cast("bigint").alias("cv"),
        F.row_number().over(wseq).alias("rn"),
    )
    wrn = W.partitionBy("user_id").orderBy("rn")
    flagged = seq.select(
        "user_id",
        "cv",
        "rn",
        F.when(F.lag("cv").over(wrn) == F.col("cv"), 0)
        .otherwise(1)
        .alias("is_new"),
    )
    runs = flagged.select(
        "user_id",
        "cv",
        F.sum("is_new")
        .over(wrn.rowsBetween(W.unboundedPreceding, 0))
        .alias("run_id"),
    )
    return (
        runs.groupBy("user_id", "run_id", "cv")
        .agg(F.count("*").cast("bigint").alias("run_len"))
        .filter(F.col("run_len") >= 3)
        .select(
            "user_id", F.col("cv").alias("stuck_value"), "run_len"
        )
    )

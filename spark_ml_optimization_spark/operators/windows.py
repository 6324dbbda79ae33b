"""Window-function operators: ranking, analytic, frames, top-k.

SURVEY.md §2.5.  Every window carries a total order (unique tiebreaker
column) so ranked selections are deterministic sets — required for the
driver's value-hash.  Scale posture: window partitioning shuffles once on
the partition key; all frames here are bounded or running (no whole-
partition buffering except first/last with explicit full frame on small
partitions).  Global top-k goes through orderBy+limit, which Spark plans
as TakeOrderedAndProject (per-partition heaps, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q40_topk_per_group",
    oracle="""
        SELECT * FROM (
            SELECT
                o_custkey,
                o_orderkey,
                o_totalprice,
                row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC
                ) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    doc="Top-3 orders per customer: rank-over-window + filter. At scale "
    "this shuffles once on the partition key and never materializes a "
    "global sort.",
)
def q40_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q41_ranking_suite",
    oracle="""
        SELECT
            c_nationkey,
            c_custkey,
            rank()         OVER w AS rnk,
            dense_rank()   OVER w AS drnk,
            ntile(4)       OVER w AS quartile,
            round(percent_rank() OVER w, 6) AS pct_rank,
            round(cume_dist()    OVER w, 6) AS cdist
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    doc="Full ranking suite over one shared window definition.",
)
def q41_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "q42_lag_lead",
    oracle="""
        SELECT
            event_id,
            user_id,
            value,
            lag(value)  OVER w AS prev_value,
            lead(value) OVER w AS next_value,
            round(epoch(ts) - epoch(lag(ts) OVER w), 6) AS gap_sec
        FROM (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    doc="lag/lead analytics per user ordered by event time (unique "
    "event_id tiebreak); inter-event gap in seconds.",
)
def q42_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # ntz → ltz (identity under UTC session) → double epoch seconds; the
    # same correctly-rounded micros/1e6 division DuckDB's epoch() performs.
    ts_sec = F.col("ts").cast("timestamp").cast("double")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(ts_sec - F.lag(ts_sec).over(w), 6).alias("gap_sec"),
    )


@register(
    "q43_running_sum",
    oracle="""
        SELECT
            l_suppkey,
            l_orderkey,
            l_linenumber,
            sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) / 100.0 AS running_revenue
        FROM lineitem
        WHERE l_suppkey < 20
    """,
    doc="Running (cumulative) revenue per supplier with a totally-ordered "
    "ROWS frame.  Terms are cent-quantized to integers before summation: "
    "windowed float sums are association-order-dependent (Spark "
    "accumulates sequentially, other engines use segment trees), so exact "
    "integer accumulation is the only distributed-deterministic form.",
)
def q43_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 20)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(F.col("l_shipdate").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    rev_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(rev_cents).over(w) / 100.0).alias("running_revenue"),
    )


@register(
    "q44_moving_avg",
    oracle="""
        SELECT
            event_id,
            user_id,
            sum(CAST(round(value * 1000000) AS BIGINT)) OVER w
                / count(*) OVER w / 1000000.0 AS mavg4
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        )
    """,
    doc="4-row moving average per user (bounded ROWS frame — O(1) state "
    "per row at any scale).",
)
def q44_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-3, W.currentRow)
    )
    micros = F.round(F.col("value") * 1000000, 0).cast("long")
    return e.select(
        "event_id",
        "user_id",
        (F.sum(micros).over(w) / F.count("*").over(w) / 1000000.0).alias("mavg4"),
    )


@register(
    "q45_range_frame",
    oracle="""
        SELECT
            event_id,
            event_type,
            count(*) OVER w AS n_in_10min,
            sum(CAST(round(value * 1000000) AS BIGINT)) OVER w / 1000000.0 AS sum_in_10min
        FROM (SELECT event_id, event_type, value,
                     epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_sec FROM events)
        WINDOW w AS (
            PARTITION BY event_type
            ORDER BY ts_sec
            RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
        )
    """,
    doc="Time-range frame (10-minute trailing window keyed on epoch "
    "seconds) — value-bounded, so tie order is irrelevant.",
)
def q45_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e = e.withColumn("ts_sec", F.col("ts").cast("timestamp").cast("long"))
    w = W.partitionBy("event_type").orderBy("ts_sec").rangeBetween(-600, W.currentRow)
    micros = F.round(F.col("value") * 1000000, 0).cast("long")
    return e.select(
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_in_10min"),
        (F.sum(micros).over(w) / 1000000.0).alias("sum_in_10min"),
    )


@register(
    "q46_global_topk",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 50
    """,
    doc="Global top-k via orderBy+limit → TakeOrderedAndProject (per-"
    "partition heaps merged on the driver; no full shuffle-sort).",
)
def q46_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(50)
    )


@register(
    "q47_first_last",
    oracle="""
        SELECT DISTINCT
            c_nationkey,
            first_value(c_name) OVER w AS richest,
            last_value(c_name)  OVER w AS poorest,
            round(max(c_acctbal) OVER w, 2) AS max_bal
        FROM customer
        WINDOW w AS (
            PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    doc="first/last over an explicit full frame, reduced with DISTINCT to "
    "one row per nation.",
)
def q47_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = (
        W.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return c.select(
        "c_nationkey",
        F.first("c_name").over(w).alias("richest"),
        F.last("c_name").over(w).alias("poorest"),
        F.round(F.max("c_acctbal").over(w), 2).alias("max_bal"),
    ).distinct()


@register(
    "q45b_interval_range_frame",
    oracle="""
        SELECT
            event_id,
            event_type,
            count(*) OVER w AS n_in_1h,
            sum(CAST(round(value * 1000000) AS BIGINT)) OVER w / 1000000.0
                AS sum_in_1h
        FROM (SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS t
              FROM events)
        WINDOW w AS (
            PARTITION BY event_type
            ORDER BY t
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
    """,
    doc="Calendar-INTERVAL range frame: the trailing-hour window ordered "
    "directly on the timestamp column (RANGE BETWEEN INTERVAL 1 HOUR "
    "PRECEDING), no epoch-seconds projection — q45's twin through the "
    "calendar-aware frame surface both engines share.  Value-bounded "
    "frame ⇒ tie order irrelevant; the summed measure is integer-"
    "quantized for cross-engine accumulation stability.",
)
def q45b_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
            event_id,
            event_type,
            count(*) OVER w AS n_in_1h,
            CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w AS DOUBLE)
                / 1000000.0 AS sum_in_1h
        FROM events
        WINDOW w AS (
            PARTITION BY event_type
            ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
        """
    )


@register(
    "q41b_window_vocabulary",
    oracle="""
        SELECT c_nationkey, c_custkey,
               nth_value(c_acctbal, 3) OVER w AS third_bal,
               lag(c_acctbal, 2, -1.0) OVER w AS lag2_bal,
               lead(c_custkey, 3, -1) OVER w AS lead3_key
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Window-function vocabulary completion beside q41's ranking "
    "suite and q42's unit-offset lag/lead: nth_value over a running "
    "ROWS frame (NULL until the frame holds 3 rows — the "
    "frame-sensitivity that distinguishes it from a plain lag), and "
    "lag/lead with EXPLICIT offsets and defaults (the sentinel "
    "-1/-1.0 instead of NULL at partition edges — the form feature "
    "pipelines use so downstream arithmetic never meets NULL).  No "
    "arithmetic beyond column moves, so parity is value-identity; "
    "ties broken by c_custkey.  Scale: one shuffle on the partition "
    "key, rows frames evaluate streaming-fashion within each "
    "partition.",
)
def q41b_window_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.nth_value("c_acctbal", 3).over(wf).alias("third_bal"),
        F.lag("c_acctbal", 2, -1.0).over(w).alias("lag2_bal"),
        F.lead("c_custkey", 3, -1).over(w).alias("lead3_key"),
    )


@register(
    "q40b_topk_with_ties",
    oracle="""
        SELECT * FROM (
            SELECT
                o_custkey,
                o_orderkey,
                o_totalprice,
                rank() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC
                ) AS rnk
            FROM orders
        ) WHERE rnk <= 3
    """,
    doc="Top-3 orders per customer WITH TIES (FETCH FIRST 3 ROWS WITH "
    "TIES semantics): rank() instead of q40's row_number(), so orders "
    "tied on price at the boundary are ALL kept — the difference "
    "between 'give me 3 rows' and 'give me the top 3 price points', "
    "which matters whenever the ranking key is coarse (grades, "
    "rounded scores, dates).  Deliberately no unique tiebreak in the "
    "ORDER BY: with-ties output is set-deterministic even though a "
    "row_number would not be.  Scale: identical shape to q40 — one "
    "shuffle on the partition key, rank evaluates streaming within "
    "each partition.",
)
def q40b_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "q47b_distinct_count_window",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(count(DISTINCT l_partkey) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS parts_seen
        FROM lineitem
        WHERE l_suppkey < 10
    """,
    doc="RUNNING DISTINCT COUNT per supplier (how many distinct parts "
    "has this supplier shipped as of each line?) — the catalog-growth "
    "curve a supply-chain or dedup monitor tracks incrementally.  "
    "Spark has NO COUNT(DISTINCT) OVER (window distinct aggregates "
    "are unsupported by WindowExec), so the engine re-plans it as the "
    "canonical two-window decomposition: a FIRST-OCCURRENCE flag "
    "(row_number() over (supplier, part) ordered by the total order "
    "== 1) followed by a running SUM of flags over the same total "
    "order — two shuffles on the same supplier key, both running "
    "frames, no whole-partition buffering.  The DuckDB oracle uses "
    "its NATIVE windowed distinct aggregate, so the decomposition is "
    "verified against an independent implementation of the SEMANTICS "
    "rather than a mirrored expression.  The shared total order "
    "(shipdate, orderkey, linenumber) is unique, making every prefix "
    "— and hence every running count — a deterministic set.  Scale: "
    "both windows partition by supplier (bounded per-key state); the "
    "probe slice keeps the wire small, the plan is slice-independent.",
)
def q47b_distinct_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 10)
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_first = W.partitionBy("l_suppkey", "l_partkey").orderBy(*order)
    w_run = (
        W.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = li.withColumn(
        "_new_part",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum("_new_part").over(w_run).cast("bigint").alias("parts_seen"),
    )


@register(
    "q41c_named_window_clause",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(row_number() OVER w AS BIGINT) AS seq,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    OVER wf AS BIGINT) AS running_cents,
               lag(o_orderkey) OVER w AS prev_order
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey),
               wf AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="NAMED WINDOW CLAUSE (SQL:2003 WINDOW w AS ...): three window "
    "functions — sequence number, running exact-cents total, "
    "previous order — share TWO named definitions (same partition/"
    "order; the running sum adds a frame, which lag/row_number may "
    "not carry in Spark), the "
    "spelling that keeps multi-function analytics queries DRY and, "
    "more importantly, guarantees Catalyst sees the definitions as "
    "IDENTICAL and plans a single Window operator over a single "
    "sort+shuffle (hand-copied definitions that drift by one frame "
    "bound silently double the exchanges).  Executed through "
    "spark.sql on a registered view; DuckDB runs the same SQL text "
    "modulo the exact-cents cast.  Scale: one shuffle on the "
    "partition key, running frames only.",
)
def q41c_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "q41c_orders"
    )
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(row_number() OVER w AS BIGINT) AS seq,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    OVER wf AS BIGINT) AS running_cents,
               lag(o_orderkey) OVER w AS prev_order
        FROM q41c_orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey),
               wf AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "q44b_weighted_moving_average",
    oracle="""
        WITH u AS (
            SELECT user_id, event_type, event_id,
                   epoch_us(ts) AS ts_us,
                   CAST(round(value * 1000000, 0) AS BIGINT) AS v_micro
            FROM events
        ),
        lagged AS (
            SELECT user_id, event_type, event_id, ts_us, v_micro,
                   lag(v_micro, 1) OVER w AS v1,
                   lag(v_micro, 2) OVER w AS v2
            FROM u
            WINDOW w AS (PARTITION BY user_id, event_type
                         ORDER BY ts_us, event_id)
        )
        SELECT user_id, event_type, event_id, ts_us,
               round(v_micro / 1000000.0, 6) AS v,
               CASE WHEN v2 IS NULL THEN NULL
                    ELSE round((3 * v_micro + 2 * v1 + v2)
                               / 6000000.0, 6)
               END AS wma3
        FROM lagged
    """,
    doc="Linearly-WEIGHTED moving average (WMA-3: weights 3/2/1 over "
    "the current and two prior observations per user+type series) — "
    "the lag-k vocabulary row the frame-based q44 moving average "
    "can't express, because frame aggregates weight every row "
    "equally; recency-weighted smoothing needs explicit lag() terms "
    "(or q68b's EWMA recurrence when the horizon is unbounded).  "
    "Values are quantized to integer micro-units BEFORE the weighted "
    "sum, so 3v+2v1+v2 is exact BIGINT arithmetic and the single "
    "division at the end is engine-stable; warm-up rows (fewer than "
    "2 predecessors) emit NULL rather than a partially-weighted "
    "value — the convention that keeps downstream averages unbiased. "
    "Scale: one window pass PARTITIONED BY (user, type) — the "
    "natural series key; no global sort.",
)
def q44b_weighted_moving_average(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    u = e.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("v_micro"),
    )
    w = W.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    lagged = u.select(
        "user_id",
        "event_type",
        "event_id",
        "ts_us",
        "v_micro",
        F.lag("v_micro", 1).over(w).alias("v1"),
        F.lag("v_micro", 2).over(w).alias("v2"),
    )
    return lagged.select(
        "user_id",
        "event_type",
        "event_id",
        "ts_us",
        F.round(F.col("v_micro") / 1000000.0, 6).alias("v"),
        F.when(F.col("v2").isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (3 * F.col("v_micro") + 2 * F.col("v1") + F.col("v2"))
                / 6000000.0,
                6,
            )
        )
        .alias("wma3"),
    )


@register(
    "q47c_trailing_error_burst",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                       AS err_in_10
            FROM events
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(err_in_10) AS BIGINT) AS peak_err_in_10,
               CAST(sum(CASE WHEN err_in_10 >= 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_burst_moments
        FROM flagged
        GROUP BY user_id
    """,
    doc="CONDITIONAL trailing-window count — errors among each user's "
    "last 10 events at every moment (sum of a CASE inside a rows "
    "frame: the predicate-in-frame vocabulary q43/q44 leave out), "
    "rolled up to the per-user burst profile: peak trailing error "
    "density and how many moments crossed the >=3-in-10 alert "
    "line.  This is the sliding error-budget / circuit-breaker "
    "computation monitoring systems run per entity; all counts are "
    "exact integers so the alert boundary is engine-stable.  Scale: "
    "one window pass PARTITIONED BY user (bounded 10-row frame "
    "state) + one grouped agg — the shuffle key is the entity key.",
)
def q47c_trailing_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")), "event_id")
        .rowsBetween(-9, 0)
    )
    flagged = e.select(
        "user_id",
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        )
        .over(w)
        .alias("err_in_10"),
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max("err_in_10").cast("bigint").alias("peak_err_in_10"),
        F.sum(F.when(F.col("err_in_10") >= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_burst_moments"),
    )

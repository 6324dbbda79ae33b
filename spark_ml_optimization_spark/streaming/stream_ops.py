"""Structured Streaming twins of the batch event operators.

SURVEY.md §2.9 (streaming column).  Each twin runs a real readStream →
transform → writeStream(memory sink) pipeline to completion
(processAllAvailable over the static fixture directory) and returns the
materialized result as a DataFrame.  The transformations are the same
groupBy(window(...)) / dropDuplicates code paths as operators/events.py —
that equivalence is the point: one declarative plan, two execution modes.

All twins are hash-verified against deterministic batch oracles
(st01-st14, st16-st19 — a single staged file drains in one
micro-batch, making even update/append-mode output batch-equivalent;
st08's INNER stream-stream join qualifies because watermarks bound
state eviction, not same-batch emission).  st09's LEFT-outer NULL
rows surface only on watermark-driven eviction — made deterministic
by sequenced watermark-driver batches (see st09's oracle note), the
last streaming query converted from rows-only to hash-verified.

Scale posture: in production these would read Kafka/cloud storage with
watermarks bounding state; memory sink is test-only — a real deployment
uses foreachBatch → parquet/Delta (st05 append, st13 keyed upsert).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..session import configure
from ..sources.io import normalize_events_ts

#: Explicit read schemas per fixture dir — streaming sources never
#: infer, so derive the schema once from the batch reader's footer read
#: (which also handles the ts precision vintage, see sources/io.py).
_EVENTS_STREAM_SCHEMA: dict[str, T.StructType] = {}


_STAGE_CACHE: dict[str, str] = {}

#: Shuffle/state-store partitions for the streaming demos (see
#: _run_to_memory's sizing note; overridable for experiments).
_STREAM_PARTS = os.environ.get("SPARK_GRAFT_STREAM_PARTS", "4")


def _stage_dir(sf_dir: str) -> str:
    """File stream sources require a *directory*; stage the fixture file
    (hardlink — same bytes, no copy cost) into a scratch dir once."""
    if sf_dir not in _STAGE_CACHE:
        src = os.path.join(sf_dir, "events.parquet")
        dst_dir = tempfile.mkdtemp(prefix="events_stream_")
        dst = os.path.join(dst_dir, "events.parquet")
        try:
            os.link(src, dst)
        except OSError:
            import shutil

            shutil.copyfile(src, dst)
        _STAGE_CACHE[sf_dir] = dst_dir
    return _STAGE_CACHE[sf_dir]


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _EVENTS_STREAM_SCHEMA.get(sf_dir)
    if schema is None:
        # Raw footer schema (pre-normalization) — the stream must read
        # the file exactly as written; ts normalization happens after.
        raw_batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        schema = _EVENTS_STREAM_SCHEMA[sf_dir] = raw_batch.schema
    raw = spark.readStream.schema(schema).parquet(_stage_dir(sf_dir))
    # Watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
    # ntz); session TZ is pinned UTC so the instant matches the batch
    # twins' timestamp_ntz values exactly.
    return normalize_events_ts(raw).withColumn("ts", F.col("ts").cast("timestamp"))


_NO_DATA_KEY = "spark.sql.streaming.noDataMicroBatches.enabled"


def _run_to_memory(
    df: DataFrame, output_mode: str, *, no_data_batches: bool = True
) -> DataFrame:
    """Drive a streaming query over the static fixture to completion and
    return the memory-sink table.

    Stateful operators allocate one state store per shuffle partition and
    AQE never coalesces streaming plans, so partition count is a per-
    stream sizing decision (state volume / partition), not a parallelism
    default.  These demos carry ~1e5 rows of state: 4 partitions (vs the
    batch default 32) cuts wall time 2-3x (measured 13 s -> 6 s going
    32 -> 8 on the stream-stream join, 10.1 s -> 6.2 s for st09 going
    8 -> 4) purely by cutting state-store bring-up; a real deployment
    sizes this to state-bytes-per-partition and must keep it FIXED
    across restarts of the same checkpoint.

    no_data_batches=False (round 11, guide §1/§5): skip the trailing
    watermark-only micro-batches.  ONLY valid for queries whose every
    output row is emitted in a DATA batch (e.g. st08's inner
    stream-stream join — a pair emits in the batch where both rows are
    present; no-data batches there only evict state that is about to be
    thrown away with the stopped query).  Append-mode window aggregates
    MUST keep the default: their final windows emit in exactly those
    no-data batches.
    """
    spark = df.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    prev_nd = spark.conf.get(_NO_DATA_KEY)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set(key, _STREAM_PARTS)  # bound at start(); restored below
        if not no_data_batches:
            spark.conf.set(_NO_DATA_KEY, "false")
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set(key, prev)
        spark.conf.set(_NO_DATA_KEY, prev_nd)
    # Memory-sink tables are session-scoped (they outlive the stopped
    # query), so the table reference is stable as-is — no extra
    # snapshot/view indirection needed.
    return df.sparkSession.table(name)


def _sentinel_scaffold(raw: DataFrame, schema: T.StructType):
    """Bounds + template for the watermark-sentinel scaffolds
    (st09/st21/st22/st24): ONE bounds job + ONE template-row job,
    empty-fixture safe — returns ``(bounds, template)`` with
    ``bounds['max']``/``bounds['min']``, or ``(None, None)`` on an
    empty fixture so callers skip planting driver batches (the stream
    result is empty either way) instead of raising IndexError.

    For a tz-adjusted TimestampType vintage the bounds are collected as
    ``unix_micros`` and shifted as INSTANTS in :func:`_sentinel_shift` —
    ``collect()`` of TimestampType yields a naive local-timezone
    datetime whose ``+ timedelta`` is wall-clock arithmetic across DST
    transitions.  The timestamp_ntz vintage keeps naive datetimes: NTZ
    plus INTERVAL is wall-clock by definition, so naive arithmetic IS
    the in-plan semantics there.
    """
    rows = raw.limit(1).collect()
    if not rows:
        return None, None
    if isinstance(schema["ts"].dataType, T.TimestampType):
        b = raw.agg(
            F.max(F.unix_micros("ts")).alias("_mx"),
            F.min(F.unix_micros("ts")).alias("_mn"),
        ).collect()[0]
    else:
        b = raw.agg(
            F.max("ts").alias("_mx"), F.min("ts").alias("_mn")
        ).collect()[0]
    return {"max": b["_mx"], "min": b["_mn"]}, rows[0].asDict()


def _sentinel_shift(t0, hours: int, schema: T.StructType):
    """``t0 + hours`` in the fixture's ts representation — integer nanos
    (long vintage), tz-aware UTC datetime from epoch micros (instant
    vintage; createDataFrame converts aware datetimes via utctimetuple,
    so the process timezone never enters), or naive + timedelta (ntz
    vintage — wall-clock on both sides).  See :func:`_sentinel_scaffold`."""
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):  # nanos vintage
        return int(t0) + hours * 3600 * 10**9
    import datetime as _dt

    if isinstance(ts_type, T.TimestampType):  # tz-adjusted vintage
        return _dt.datetime.fromtimestamp(
            (int(t0) + hours * 3600 * 10**6) / 1e6, tz=_dt.timezone.utc
        )
    return t0 + _dt.timedelta(hours=hours)  # timestamp_ntz vintage


@register(
    "st01_stream_tumbling",
    oracle="""
        SELECT
            epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)))
                AS window_start_us,
            epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP))
                     + INTERVAL '1 day') AS window_end_us,
            event_type,
            count(*) AS n_events
        FROM events
        GROUP BY 1, 2, 3
    """,
    # Complete-mode streaming agg over the finite fixture is
    # deterministic and batch-equivalent, so the twin is hash-verified
    # like q60 (window bounds emitted as unix micros: the memory sink
    # yields session-TZ timestamps, micros are tz-independent).
    doc="readStream twin of q60: tumbling 1-day window counts per "
    "event_type, complete-mode memory sink — hash-verified against the "
    "batch oracle.",
)
def st01_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                "window_start_us"
            ),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias("window_end_us"),
            "event_type",
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


@register(
    "st02_stream_watermark_sliding",
    oracle="""
        WITH e AS (
            SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        ), assigned AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type
            FROM e
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', ts)
                       - INTERVAL '30 minutes' AS ws,
                   event_type
            FROM e
        )
        SELECT epoch_us(ws) AS window_start_us, event_type,
               count(*) AS n_events
        FROM assigned GROUP BY 1, 2
    """,
    # Deterministic despite update mode: the staged fixture is ONE file
    # and the parquet file source (no maxFilesPerTrigger) drains it in a
    # single micro-batch, whose start-of-batch watermark is epoch 0 — so
    # no window is late, and every (window, event_type) group is emitted
    # exactly once.  That makes the streaming result batch-equivalent to
    # q61's 2-way-UNION sliding-window oracle (micros-encoded starts, the
    # st01 convention).
    doc="readStream twin of q61 with a real watermark: 1h/30min sliding "
    "windows, 10-minute watermark bounding state, update mode — "
    "hash-verified against the shifted-time_bucket batch oracle.",
)
def st02_stream_watermark_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                "window_start_us"
            ),
            "event_type",
            "n_events",
        )
    )
    return _run_to_memory(agg, "update")


@register(
    "st03_stream_session_window",
    oracle="""
        WITH e AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
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
    # Complete-mode session aggregation over the finite fixture is
    # deterministic (all sessions final once the source drains), so the
    # streaming twin shares q62b's gap-and-island oracle.
    doc="readStream twin of q62 using the native session_window operator "
    "(30-min gap) with watermark, complete mode — hash-verified against "
    "the gap-island oracle.",
)
def st03_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("sw.end").cast("timestamp")).alias(
                "session_end_us"
            ),
            "user_id",
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


@register(
    "st04_stream_dedup",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
    """,
    # The KEY SET is deterministic (one row per key, single micro-batch);
    # WHICH survivor row wins is not — within a batch the state op sees
    # shuffle-partition rows in map-output fetch order.  So the twin
    # projects the dedup keys only and hash-verifies them against
    # DISTINCT; survivor-row semantics stay pinned by the batch q64.
    doc="readStream twin of q64: streaming dropDuplicatesWithinWatermark "
    "on (user_id, event_type), append mode.  Unlike plain streaming "
    "dropDuplicates (whose key state grows forever), the within-watermark "
    "variant evicts key state once the watermark passes it — the "
    "state-bounded dedup a 100 TB stream actually runs.  Over the static "
    "fixture (one micro-batch) it emits exactly one row per key, "
    "hash-verified against the DISTINCT key-set oracle.",
)
def st04_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(deduped, "append")


@register(
    "st07_stream_static_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type, h.hist_events
        FROM events e
        JOIN (SELECT user_id, count(*) AS hist_events
              FROM events GROUP BY user_id) h
          USING (user_id)
    """,
    # Append-mode inner stream-static join over the finite fixture emits
    # every matched row exactly once — deterministic, hash-verified.
    doc="Stream-static join: the live event stream enriched against a "
    "static per-user profile computed in batch (historical event counts)."
    "  The static side is re-read per micro-batch by Structured "
    "Streaming; at scale it's a broadcast dim.",
)
def st07_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    # materialize the static side once — streaming re-evaluates static
    # plans per micro-batch otherwise
    static_profile = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("hist_events"))
        .localCheckpoint(eager=True)
    )
    stream = _read_events_stream(spark, sf_dir)
    joined = (
        stream.join(static_profile, "user_id")
        .select("event_id", "user_id", "event_type", "hist_events")
    )
    return _run_to_memory(joined, "append")


@register(
    "st08_stream_stream_join",
    oracle="""
        SELECT p.event_id AS purchase_id,
               c.event_id AS click_id,
               p.user_id AS p_user
        FROM events p
        JOIN events c
          ON p.user_id = c.user_id
         AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
                                        - INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    # Deterministic despite two-sided watermarks: the staged fixture
    # drains in ONE micro-batch (the st02 property), and an INNER
    # stream-stream join emits a pair in the batch where both rows are
    # present — watermarks only bound state EVICTION, which affects
    # what a hypothetical later batch could still match, never what
    # this batch emits.  With every row in batch 0, the memory sink
    # holds exactly the batch-equivalent inner join, so the result is
    # hash-verified against the plain time-range self-join oracle.
    # (st09's LEFT-outer twin stays rows-only: its NULL rows surface
    # on watermark-driven eviction, which IS timing-dependent.)
    doc="Stream-stream inner join with watermarks on both sides and a "
    "time-range condition: purchases joined to the same user's clicks "
    "within the preceding hour — state on both sides is bounded by the "
    "watermark + range (the canonical funnel/attribution join).",
)
def st08_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "click_id", "p_user")
    # Inner-join emission happens in the data batch where both rows are
    # present (the determinism note above); the trailing no-data
    # eviction batches only scan-and-drop state the stopped query
    # discards anyway — skip them (see _run_to_memory).
    return _run_to_memory(joined, "append", no_data_batches=False)


@register(
    "st06_stateful_apply_in_pandas",
    oracle="""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY user_id
    """,
    # Deterministic over the single-micro-batch fixture: with NoTimeout
    # the function fires once per user holding ALL that user's rows, so
    # the emitted running totals ARE the batch group totals.  The 4-dp
    # wire rounding absorbs pandas-pairwise vs DuckDB-sequential
    # summation-order noise (the q95/q96 convention).
    doc="Custom stateful streaming operator via applyInPandasWithState: "
    "per-user running event count + running value sum carried in "
    "GroupState across micro-batches (flatMapGroupsWithState twin).  "
    "Append mode; state schema (count long, total double) — "
    "hash-verified against the per-user batch-total oracle.",
)
def st06_stateful_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = _read_events_stream(spark, sf_dir)

    def running_totals(key, pdfs, state: GroupState):
        (user_id,) = key
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        import pandas as pd_local

        yield pd_local.DataFrame(
            {"user_id": [user_id], "n_events": [count], "total_value": [round(total, 4)]}
        )

    out = (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            running_totals,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="count long, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_memory(out, "append")


@register(
    "st05_stream_foreach_batch_sink",
    oracle="""
        SELECT event_id, user_id, event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
    """,
    # The materialized sink is a pure row-wise projection of the finite
    # source — deterministic, hash-verified against the same projection
    # in DuckDB's JSON functions.
    doc="Exactly-once sink pattern: foreachBatch writing parquet epochs "
    "to a scratch dir, then reading the materialized result back — the "
    "production sink shape (vs the test-only memory sink).",
)
def st05_stream_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    out_dir = os.path.join(tempfile.gettempdir(), f"st05_{uuid.uuid4().hex[:12]}")
    enriched = events.select(
        "event_id", "user_id", "event_type", F.get_json_object("props", "$.k").cast("int").alias("k")
    )

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = enriched.writeStream.foreachBatch(write_epoch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out_dir)


@register(
    "st09_stream_stream_left_join",
    oracle="""
        SELECT p.event_id AS purchase_id,
               c.event_id AS click_id,
               p.user_id AS p_user
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
                                        - INTERVAL 1 HOUR
    """,
    # Hash-verified DESPITE watermark-driven NULL emission (the reason
    # this was the one rows-only streaming holdout through round 4):
    # NULL rows surface only when a LATER batch runs with an advanced
    # watermark, so the construction plants that advance explicitly.
    # The fixture streams from a PRIVATE staged dir (the shared
    # _stage_dir must stay pristine for the other twins); after the
    # main file drains, two sequenced driver files — each one matched
    # purchase+click pair at sentinel user_id -1/-2, max(ts)+2h and
    # +4h — advance BOTH sides' watermarks (the query watermark is the
    # MIN across the two withWatermark nodes, so a click-only driver
    # advances nothing).  Driver batch N+1 runs with driver batch N's
    # watermark, which by +2h/+4h construction clears every fixture
    # purchase's eviction bound — every unmatched purchase emits its
    # NULL row deterministically.  The sentinel pairs inner-match each
    # other (never a fixture row, user_ids >= 0) and are dropped by
    # the p_user >= 0 filter on the drained sink, leaving exactly the
    # batch LEFT-join row set.
    doc="LEFT OUTER stream-stream join with watermarks + time-range "
    "condition: every purchase emits, joined to same-user clicks in "
    "the preceding hour when they exist, with NULL click columns "
    "emitted once the watermark passes the purchase's eviction bound "
    "— the outer-join semantics that require bounded state on both "
    "sides (the inner-join twin is st08).  Deterministic via planted "
    "watermark-driver batches (see the oracle note); hash-verified "
    "against the batch LEFT-join oracle.  Scale: state on both sides "
    "stays watermark-bounded regardless of stream length — the driver "
    "trick is test scaffolding, not a production requirement (real "
    "streams advance watermarks continuously).",
)
def st09_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _watermarked_outer_stream_join(spark, sf_dir, "left_outer")


def _watermarked_outer_stream_join(
    spark: SparkSession, sf_dir: str, how: str
) -> DataFrame:
    """Shared st09/st21 scaffold: watermarked purchases-x-clicks
    stream-stream join with a 1-hour time-range condition, NULL-side
    emission forced deterministically by two sequenced watermark-driver
    batches (matched sentinel pairs at user -1/-2, max(ts)+2h/+4h).
    ``how`` is 'left_outer' (st09) or 'full_outer' (st21)."""
    configure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = os.path.join(tempfile.gettempdir(), f"st09_{uuid.uuid4().hex[:12]}")
    os.makedirs(base)
    src = os.path.join(sf_dir, "events.parquet")
    try:
        os.link(src, os.path.join(base, "events.parquet"))
    except OSError:
        import shutil

        shutil.copyfile(src, os.path.join(base, "events.parquet"))

    raw = spark.read.parquet(src)
    schema = raw.schema

    # ONE bounds job + ONE template-row job up front (optimization
    # round 10, the st24 re-plan): each _driver_frame call re-scanned
    # the fixture for max(ts) and again for a template row — 4
    # full-scan jobs for two 2-row sentinel writes.  The values are
    # constants of the run; build each sentinel frame driver-side
    # (empty-fixture-safe, instant-correct: _sentinel_scaffold).
    _bounds, _template = _sentinel_scaffold(raw, schema)

    def _driver_frame(uid: int, hours: int) -> DataFrame:
        """One matched purchase+click pair at max(ts)+hours, sentinel
        user/event ids, raw footer schema (so the stream reads it)."""
        ts_val = _sentinel_shift(_bounds["max"], hours, schema)
        rows = []
        for ev_id, ev_type in (
            (-uid * 2, "purchase"),
            (-uid * 2 - 1, "click"),
        ):
            row = dict(_template)
            row.update(
                ts=ts_val,
                event_id=ev_id,
                user_id=-uid,
                event_type=ev_type,
            )
            rows.append(tuple(row[f] for f in schema.fieldNames()))
        return spark.createDataFrame(rows, schema)

    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(base)
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    cols = ["purchase_id", "click_id", "p_user"]
    if how == "full_outer":
        cols.append("c_user")
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        how,
    ).select(*cols)

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    prev_nd = spark.conf.get(_NO_DATA_KEY)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set(key, _STREAM_PARTS)
        # No-data micro-batches off (round 11, guide §1/§5): every
        # fixture row — matched AND NULL-side — emits by the drv2 DATA
        # batch (it runs with drv1's +2h watermark, a 30-min margin
        # over every fixture eviction bound; that is the scaffold's
        # design), so the trailing watermark-only batches would only
        # evict the sentinel pairs the final filter drops anyway.
        # Profile r10: 3 of 6 micro-batches were no-data eviction scans.
        spark.conf.set(_NO_DATA_KEY, "false")
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 0: the fixture file
            if _bounds is not None:  # empty fixture: nothing to evict
                for step, (uid, hours) in enumerate(((1, 2), (2, 4)), start=1):
                    _driver_frame(uid, hours).repartition(1).write.parquet(
                        os.path.join(base, f"drv{step}")
                    )
                    q.processAllAvailable()  # batch N applies batch N-1's watermark
        finally:
            q.stop()
    finally:
        spark.conf.set(key, prev)
        spark.conf.set(_NO_DATA_KEY, prev_nd)
        # The result lives in the memory sink; the per-invocation
        # staging dir (fixture link + two driver batches) is dead
        # weight — remove it so suite/bench runs don't leak disk.
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    out = spark.table(name)
    if how == "full_outer":
        # Sentinel driver rows inner-match each other, so both user
        # columns carry the negative sentinel — fixture rows always
        # have a non-negative user on whichever side is non-NULL.
        return out.filter(
            F.coalesce(F.col("p_user"), F.col("c_user")) >= 0
        )
    return out.filter(F.col("p_user") >= 0)


@register(
    "st10_stream_upsert_serving",
    oracle="""
        SELECT user_id, count(*) AS n_events,
               max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_ts_us
        FROM events
        GROUP BY user_id
    """,
    # The converged serving table equals the batch per-user rollup
    # regardless of micro-batch boundaries (count sums and max merges are
    # associative) — deterministic, hash-verified.
    doc="Streaming upsert into a serving table via foreachBatch: each "
    "micro-batch computes per-user latest state (max ts, running count "
    "merged with the table's prior row) and REWRITES the key's row — "
    "the keyed-merge sink pattern (what MERGE INTO does on a "
    "transactional table, expressed against plain parquet by "
    "read-merge-overwrite inside the batch callback; foreachBatch is "
    "exactly-once per epoch id, so replays are idempotent if the merge "
    "is).  Scale: the merge joins batch keys (small) against the "
    "serving table on its key — with a real lakehouse table format "
    "this is a broadcast-probe merge-on-read; here the serving table "
    "is tiny and rewritten whole, documented as the demo shape.  "
    "Output = final serving table (per-user event count + last ts), "
    "which tests pin to the batch groupBy ground truth.",
)
def st10_stream_upsert_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    serve_dir = os.path.join(tempfile.gettempdir(), f"st10_{uuid.uuid4().hex[:12]}")
    per_user = events.select("user_id", "ts")

    def merge_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_state = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.max("ts").alias("last_ts")
        )
        try:
            prior = batch_df.sparkSession.read.parquet(serve_dir)
            merged = (
                prior.unionByName(batch_state)
                .groupBy("user_id")
                .agg(F.sum("n_events").alias("n_events"), F.max("last_ts").alias("last_ts"))
            )
        except Exception:
            merged = batch_state
        # Stage then swap: self-overwrite of a parquet dir being read is
        # not safe, so land the merge beside it and promote atomically.
        staged = serve_dir + f".epoch{epoch_id}"
        merged.coalesce(1).write.mode("overwrite").parquet(staged)
        import shutil

        shutil.rmtree(serve_dir, ignore_errors=True)
        os.rename(staged, serve_dir)

    q = per_user.writeStream.foreachBatch(merge_epoch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(serve_dir).select(
        "user_id",
        "n_events",
        F.unix_micros(F.col("last_ts").cast("timestamp")).alias("last_ts_us"),
    )


@register(
    "st11_checkpoint_exactly_once",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT event_id) AS n_distinct_ids
        FROM events
        GROUP BY event_type
    """,
    doc="Exactly-once across a RESTART, proven by hash: the fixture is "
    "split into two parquet files; run 1 streams file 1 into a "
    "foreachBatch-append sink with a durable checkpointLocation and "
    "stops; file 2 then lands in the source dir and a NEW query — same "
    "checkpoint, same sink — processes it.  The checkpoint's file-"
    "source log guarantees file 1 is NOT re-read on restart, so the "
    "sink holds every event exactly once and the per-type counts "
    "hash-match the batch oracle (a re-delivery would double counts "
    "and a loss would shrink them — both break the hash, so the "
    "exactly-once contract IS the correctness check).  This is the "
    "mechanism a 100 TB ingest relies on to survive restarts without "
    "dedup passes; state here is the source log only — the sink append "
    "is idempotent per epoch.",
)
def st11_checkpoint_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    base = os.path.join(tempfile.gettempdir(), f"st11_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(base, "src")
    ckpt_dir = os.path.join(base, "ckpt")
    sink_dir = os.path.join(base, "sink")
    os.makedirs(src_dir)

    batch = normalize_events_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ).select("event_id", "event_type")
    # Deterministic 2-way split written in ONE pass (round 11, guide
    # §6: the two filtered writes re-scanned the fixture twice); the
    # dynamic-partition write emits one file tree per parity, m=0 is
    # renamed in as phase-1's only visible tree and m=1 staged for the
    # phase-2 restart.
    split_root = os.path.join(base, "split")
    batch.withColumn("m", F.col("event_id") % 2).repartition(1).write.partitionBy(
        "m"
    ).parquet(split_root)
    os.rename(os.path.join(split_root, "m=0"), os.path.join(src_dir, "part1"))
    part2_staging = os.path.join(split_root, "m=1")

    schema = batch.schema

    def append_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink_dir)

    def run_once() -> None:
        q = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
            .writeStream.foreachBatch(append_epoch)
            .option("checkpointLocation", ckpt_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()  # phase 1: file 1 only
    os.rename(part2_staging, os.path.join(src_dir, "part2"))
    run_once()  # phase 2: restart from the same checkpoint
    return (
        spark.read.parquet(sink_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("event_id").alias("n_distinct_ids"),
        )
    )


@register(
    "st12_stream_drift_monitor",
    oracle="""
        WITH ref AS (
            SELECT value FROM events WHERE event_id % 3 = 0
        ),
        edges AS (
            SELECT quantile_cont(value,
                [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
            FROM ref
        ),
        ref_binned AS (
            SELECT 1 + len(list_filter((SELECT e FROM edges), x -> value > x))
                       AS bin
            FROM ref
        ),
        ref_counts AS (
            SELECT bin, count(*) AS n FROM ref_binned GROUP BY bin
        ),
        batches AS (
            SELECT event_id % 3 AS grp, value FROM events WHERE event_id % 3 <> 0
        ),
        cur_binned AS (
            SELECT grp,
                   1 + len(list_filter((SELECT e FROM edges), x -> value > x))
                       AS bin
            FROM batches
        ),
        cur_counts AS (
            SELECT grp, bin, count(*) AS n FROM cur_binned GROUP BY grp, bin
        ),
        joined AS (
            SELECT c.grp,
                   greatest(c.n * 1.0 / sum(c.n) OVER (PARTITION BY c.grp),
                            0.000001) AS p_cur,
                   greatest(r.n * 1.0 / (SELECT count(*) FROM ref),
                            0.000001) AS p_ref
            FROM cur_counts c JOIN ref_counts r USING (bin)
        )
        SELECT CAST(count(*) OVER () AS BIGINT) AS n_batches,
               CAST(n_events AS BIGINT) AS n_events,
               psi_total
        FROM (
            SELECT grp,
                   (SELECT count(*) FROM batches b WHERE b.grp = j.grp) AS n_events,
                   round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 4) AS psi_total
            FROM joined j
            GROUP BY grp
        ) t
    """,
    doc="CONTINUOUS drift monitoring: a real readStream splits the "
    "non-reference events into two parquet files (event_id mod 3 = "
    "1 / 2), maxFilesPerTrigger=1 makes each file one micro-batch, and "
    "foreachBatch computes that batch's PSI against the static "
    "reference slice's decile edges (the qd13 statistic, streaming) — "
    "appending one (n_events, psi_total) monitoring row per batch.  "
    "Batch identity is CONTENT-keyed (its event count), not epoch-"
    "keyed, so the result is deterministic regardless of trigger "
    "timing and hash-verifies against a per-group batch oracle.  "
    "Probabilities clamp at 1e-6 on both engines (empty-bin guard).  "
    "This is the production shape for data-quality gates on ingest: "
    "reference edges broadcast once, per-batch cost is one map-side "
    "binning pass over the batch.",
)
def st12_stream_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    base = os.path.join(tempfile.gettempdir(), f"st12_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(base, "src")
    sink_dir = os.path.join(base, "sink")
    os.makedirs(src_dir)

    ev = normalize_events_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ).select("event_id", "value")
    ref = ev.filter(F.col("event_id") % 3 == 0)
    ev.filter(F.col("event_id") % 3 == 1).write.parquet(os.path.join(src_dir, "b1"))
    ev.filter(F.col("event_id") % 3 == 2).write.parquet(os.path.join(src_dir, "b2"))

    # Reference artifacts materialized ONCE (round 11, guide §5): edges
    # (1 row) and ref_counts (≤10 rows) are lazy plans over the ref
    # scan — each micro-batch's broadcast re-ran the percentile agg and
    # the binning pass (2 batches × 2 rebuilt subtrees).  Eager
    # checkpoints pin them; streaming re-evaluates static plans per
    # batch otherwise (the st19 note).
    edges = ref.agg(
        F.percentile("value", F.array(*[F.lit(x / 10.0) for x in range(1, 10)])).alias(
            "e"
        )
    ).localCheckpoint(eager=True)
    bin_of = lambda: (1 + F.size(F.filter("e", lambda x: F.col("value") > x))).alias(  # noqa: E731
        "bin"
    )
    ref_counts = (
        ref.crossJoin(F.broadcast(edges)).select(bin_of()).groupBy("bin").count()
    ).localCheckpoint(eager=True)
    ref_total = ref.count()  # scalar, computed once outside the stream

    def monitor_batch(batch_df: DataFrame, epoch_id: int) -> None:
        cur = batch_df.crossJoin(F.broadcast(edges)).select(bin_of())
        cur_counts = cur.groupBy("bin").agg(F.count("*").alias("n_cur"))
        tot = cur_counts.agg(F.sum("n_cur").alias("t_cur"))
        j = (
            cur_counts.join(F.broadcast(ref_counts), "bin")
            .crossJoin(F.broadcast(tot))
            .select(
                F.col("t_cur"),
                F.greatest(
                    F.col("n_cur") * 1.0 / F.col("t_cur"), F.lit(1e-6)
                ).alias("p_cur"),
                F.greatest(
                    F.col("count") * 1.0 / float(ref_total), F.lit(1e-6)
                ).alias("p_ref"),
            )
        )
        # n_events = sum over bins of n_cur (every batch row lands in
        # exactly one bin — bin_of is total), read off the aggregate
        # already in hand instead of a second batch_df.count() job.
        out = j.agg(
            F.max("t_cur").cast("long").alias("n_events"),
            F.round(
                F.sum(
                    (F.col("p_cur") - F.col("p_ref"))
                    * F.log(F.col("p_cur") / F.col("p_ref"))
                ),
                4,
            ).alias("psi_total"),
        ).select("n_events", "psi_total")
        out.write.mode("append").parquet(sink_dir)

    schema = ev.schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
        .writeStream.foreachBatch(monitor_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(sink_dir)
    nb = back.agg(F.count("*").alias("n_batches"))
    return back.crossJoin(F.broadcast(nb)).select(
        F.col("n_batches").cast("long").alias("n_batches"),
        "n_events",
        "psi_total",
    )


@register(
    "st13_stream_upsert_sink",
    oracle="""
        SELECT user_id, event_type AS last_event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS last_ts_us,
               n_versions
        FROM (
            SELECT user_id, event_type, ts,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn,
                   CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                       AS n_versions
            FROM events
        ) WHERE rn = 1
    """,
    # Deterministic: the staged fixture drains in one micro-batch, so
    # the final table version is exactly the per-user latest row with
    # (ts, event_id) as the total-order tiebreak — batch-equivalent to
    # the window oracle.  The merge code itself is multi-batch-correct
    # (ts-compared upsert against the previous version), which is what
    # the versioned-directory dance exercises.
    doc="foreachBatch KEYED UPSERT sink — the streaming-CDC apply "
    "pattern st05's append sink doesn't cover: each micro-batch "
    "reduces to per-key latest rows (window, (ts, event_id) tiebreak), "
    "then ts-compared-merges into the previous table version and "
    "writes a NEW versioned directory (copy-on-write snapshot — plain "
    "parquet can't update in place, and a reader must never see a "
    "half-written table; this is q37b's lakehouse emulation fed by a "
    "stream, and on Delta/Iceberg the body of merge_epoch is one "
    "MERGE INTO).  n_versions counts upserts absorbed per key.  At "
    "100 TB: batch sizes are watermark-bounded, the merge join is "
    "keyed (broadcast when the batch is small), and old versions are "
    "qc18-compacted / vacuumed.",
)
def st13_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = _read_events_stream(spark, sf_dir)
    base = os.path.join(tempfile.gettempdir(), f"st13_{uuid.uuid4().hex[:12]}")
    state = {"version": -1}

    def merge_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        w = W.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            batch_df.select(
                "user_id", "event_type", "ts", "event_id",
                F.count("*").over(W.partitionBy("user_id")).alias("n_versions"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("event_type").alias("last_event_type"),
                F.unix_micros(F.col("ts").cast("timestamp")).alias("last_ts_us"),
                F.col("n_versions").cast("long").alias("n_versions"),
            )
        )
        if state["version"] >= 0:
            existing = sess.read.parquet(f"{base}/v{state['version']}")
            b, e = latest.alias("b"), existing.alias("e")
            pick_b = F.col("e.last_ts_us").isNull() | (
                F.col("b.last_ts_us") >= F.col("e.last_ts_us")
            )
            merged = b.join(e, "user_id", "full").select(
                "user_id",
                F.when(F.col("b.last_ts_us").isNull(), F.col("e.last_event_type"))
                .when(pick_b, F.col("b.last_event_type"))
                .otherwise(F.col("e.last_event_type"))
                .alias("last_event_type"),
                F.greatest(
                    F.coalesce(F.col("b.last_ts_us"), F.lit(-(1 << 62))),
                    F.coalesce(F.col("e.last_ts_us"), F.lit(-(1 << 62))),
                ).alias("last_ts_us"),
                (
                    F.coalesce(F.col("b.n_versions"), F.lit(0))
                    + F.coalesce(F.col("e.n_versions"), F.lit(0))
                ).cast("long").alias("n_versions"),
            )
        else:
            merged = latest
        merged.write.mode("overwrite").parquet(f"{base}/v{state['version'] + 1}")
        state["version"] += 1

    q = events.writeStream.foreachBatch(merge_epoch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(f"{base}/v{state['version']}")


_INGEST_STAGE_CACHE: dict[str, str] = {}


def _stage_incoming_docs(spark: SparkSession, sf_dir: str) -> str:
    """Stage the deterministic 'incoming batch' for st14: every document
    re-submitted under doc_id+1e6, with every 10th UPPERCASED (a changed
    digest — genuinely new content); the rest are exact re-crawls of the
    corpus.  Written once per sf_dir."""
    if sf_dir not in _INGEST_STAGE_CACHE:
        from ..sources import load_table

        dst = tempfile.mkdtemp(prefix="incoming_docs_")
        (
            load_table(spark, sf_dir, "documents")
            .select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.when(F.col("doc_id") % 10 == 0, F.upper("text"))
                .otherwise(F.col("text"))
                .alias("text"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(dst)
        )
        _INGEST_STAGE_CACHE[sf_dir] = dst
    return _INGEST_STAGE_CACHE[sf_dir]


@register(
    "st14_stream_ingest_dedup",
    oracle="""
        WITH corpus AS (SELECT DISTINCT md5(text) AS d FROM documents),
        incoming AS (
            SELECT doc_id + 1000000 AS doc_id,
                   CASE WHEN doc_id % 10 = 0 THEN upper(text)
                        ELSE text END AS text
            FROM documents
        )
        SELECT i.doc_id, md5(i.text) AS text_md5
        FROM incoming i
        LEFT JOIN corpus c ON md5(i.text) = c.d
        WHERE c.d IS NULL
    """,
    # Deterministic: append-mode stream-static anti join over one staged
    # micro-batch emits each surviving row exactly once.
    doc="Streaming INGEST DEDUP GATE — the streaming twin of qc11's "
    "incremental batch-vs-corpus dedup and the front door of a "
    "continuously-crawling training-data pipeline: incoming documents "
    "stream in, an md5 content digest is computed map-side, and a "
    "stream-static LEFT ANTI join against the existing corpus digest "
    "dimension drops every already-known text before it costs storage "
    "or downstream compute.  The staged batch re-submits the whole "
    "corpus with every 10th doc uppercased, so exactly the mutated "
    "10% survive — planted ground truth, hash-verified.  Scale: the "
    "static side is a 16-byte-digest dimension (broadcast or "
    "digest-bucketed at 100 TB); the stream side shuffles digests, "
    "never bodies; state is ZERO because anti-join against a static "
    "side needs no watermark bookkeeping.",
)
def st14_stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    configure(spark)
    staged = _stage_incoming_docs(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    incoming = (
        spark.readStream.schema(schema)
        .parquet(staged)
        .withColumn("text_md5", F.md5("text"))
    )
    corpus = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5("text").alias("corpus_md5"))
        .distinct()
    )
    fresh = incoming.join(
        corpus, incoming.text_md5 == corpus.corpus_md5, "left_anti"
    ).select("doc_id", "text_md5")
    return _run_to_memory(fresh, "append")


def transform_with_state_available() -> bool:
    """True iff Spark 4's arbitrary-state API (transformWithStateInPandas)
    can run: its state-server protocol needs protobuf, which this
    container ships without.  Import-probe callable at module import —
    the st15 registration below flips on with ZERO code change the
    moment a future environment ships protobuf (the src16 Avro-gate
    pattern; the older applyInPandasWithState surface is st06,
    hash-verified unconditionally)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if transform_with_state_available():

    @register(
        "st15_transform_with_state",
        oracle="""
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY user_id
        """,
        # Same determinism argument as st06: one micro-batch, NoTimeout
        # equivalent (timeMode="none"), one emission per user holding the
        # whole batch — the running totals ARE the batch totals; 4-dp
        # wire rounding absorbs summation-order noise.
        doc="Spark 4 arbitrary-state streaming operator via "
        "transformWithStateInPandas: a StatefulProcessor with a typed "
        "ValueState carries per-user (count, total) across micro-"
        "batches — the successor API to st06's applyInPandasWithState "
        "(explicit state handle, timers, composite state types).  "
        "Registered ONLY when protobuf is importable (see "
        "transform_with_state_available).",
    )
    def st15_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
        import pandas as pd
        from pyspark.sql.streaming import StatefulProcessor

        class RunningTotals(StatefulProcessor):
            def init(self, handle):
                self.state = handle.getValueState("acc", "cnt BIGINT, total DOUBLE")

            def handleInputRows(self, key, rows, timerValues):
                cnt, total = 0, 0.0
                prev = self.state.get()
                if prev:
                    cnt, total = int(prev[0]), float(prev[1])
                for pdf in rows:
                    cnt += len(pdf)
                    total += float(pdf["value"].sum())
                self.state.update((cnt, total))
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [cnt],
                        "total_value": [round(total, 4)],
                    }
                )

            def close(self):
                pass

        events = _read_events_stream(spark, sf_dir)
        out = (
            events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                RunningTotals(),
                outputStructType="user_id long, n_events long, total_value double",
                outputMode="append",
                timeMode="none",
            )
        )
        return _run_to_memory(out, "append")


@register(
    "st16_stream_topk",
    oracle="""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY user_id
        ORDER BY n_events DESC, user_id ASC
        LIMIT 10
    """,
    # Complete-mode is the one streaming output mode that permits a
    # global sort+limit after aggregation; over the finite one-batch
    # fixture the final emission is the batch answer — deterministic
    # (id tiebreak), hash-verified.
    doc="Streaming TOP-K: complete-mode per-user counts with a global "
    "ORDER BY + LIMIT after the aggregation — the live-leaderboard "
    "shape (top talkers, hottest keys, worst error sources).  Sort is "
    "legal ONLY in complete mode, where every trigger re-emits the "
    "full result; at scale the state is the per-key aggregate (bounded "
    "by key cardinality), and the sort runs over aggregated rows, "
    "never raw events — for unbounded key spaces the production form "
    "swaps in an approx_top_k sketch per trigger (q28b's operator).",
)
def st16_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    top = (
        events.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(10)
    )
    return _run_to_memory(top, "complete")


@register(
    "src18_python_stream_source",
    oracle="""
        WITH sensor AS (
            SELECT i AS reading_id,
                   CAST((i * 2654435761) % 4294967296 % 97 AS INT)
                       AS sensor_id,
                   round(((i * 2654435761) % 4294967296 % 1000) / 10.0, 1)
                       AS temp
            FROM range(0, 6000) t(i)
        )
        SELECT sensor_id % 10 AS sensor_group,
               CAST(count(*) AS BIGINT) AS n_readings,
               round(avg(temp), 4) AS avg_temp,
               round(max(temp), 1) AS max_temp
        FROM sensor
        GROUP BY sensor_id % 10
    """,
    doc="STREAMING Python data source (Spark 4 SimpleDataSourceStream"
    "Reader): src12's deterministic sensor generator re-exposed as an "
    "offset-tracked micro-batch stream — initialOffset/read advance a "
    "checkpointable {'next': n} offset 2000 rows per trigger until "
    "6000, readBetweenOffsets replays any range exactly (the "
    "exactly-once replay contract), and processAllAvailable "
    "terminates because read() reports no progress at end-of-stream.  "
    "Complete-mode per-sensor-group aggregate over the drained "
    "stream equals the batch formula, so the entire path — offset "
    "management, Python micro-batch reader, Arrow transfer, stateful "
    "agg — is hash-verified against the arithmetic oracle.  This is "
    "the extension point for streaming ingest Spark has no built-in "
    "reader for (internal queues, vendor APIs).",
)
def src18_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.pydatasource import register_sensor_stream_source

    configure(spark)
    register_sensor_stream_source(spark)
    readings = spark.readStream.format("sensor_stream").load()
    agg = readings.groupBy((F.col("sensor_id") % 10).alias("sensor_group")).agg(
        F.count("*").cast("long").alias("n_readings"),
        F.round(F.avg("temp"), 4).alias("avg_temp"),
        F.round(F.max("temp"), 1).alias("max_temp"),
    )
    return _run_to_memory(agg, "complete")


@register(
    "st17_dedup_within_watermark",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
    """,
    # Which physical row survives is engine-arbitrary; the KEY SET is
    # not — emit keys only (the st04 key-set-oracle convention), making
    # the dropDuplicatesWithinWatermark surface hash-verifiable.
    doc="dropDuplicatesWithinWatermark (Spark 3.5+): keyed streaming "
    "dedup whose state is bounded by the WATERMARK WINDOW instead of "
    "growing forever — the API for at-least-once sources that can "
    "only replay within a bounded lag (vs plain dropDuplicates, whose "
    "state holds every key ever seen: st04).  Single drained batch, "
    "deduped (user, event_type) key set emitted, hash-verified "
    "against SELECT DISTINCT.  At scale the state store holds one "
    "entry per key seen within the watermark horizon — sized by "
    "rate x lag, not by history.",
)
def st17_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(deduped, "append")


@register(
    "st18_available_now_backfill",
    oracle="""
        WITH agg AS (
            SELECT event_type,
                   count(*) AS n_events,
                   count(DISTINCT event_id) AS n_distinct_ids
            FROM events
            GROUP BY event_type
        )
        SELECT event_type, n_events, n_distinct_ids,
               CAST(3 AS BIGINT) AS n_batches
        FROM agg
    """,
    doc="BOUNDED BACKFILL with Trigger.AvailableNow + maxFilesPerTrigger "
    "— the admission-controlled catch-up mode a production stream uses "
    "after downtime: the fixture lands as SIX single-file partitions, "
    "the query reads them 2 files per micro-batch under availableNow "
    "(which, unlike the legacy Trigger.Once, HONOURS the rate limit) "
    "and stops when the listing is drained.  foreachBatch stamps each "
    "epoch id into the sink, so the result hash-verifies BOTH the "
    "data completeness (per-type counts + distinct ids == the batch "
    "oracle; a dropped or re-read file breaks it) AND the batch "
    "arithmetic (ceil(6/2) = 3 distinct epochs — a rate-limit "
    "regression to one giant batch breaks the n_batches column).  "
    "Scale: this is exactly how a 100 TB directory backfill avoids "
    "one unbounded micro-batch OOMing state/sinks — bounded work per "
    "epoch with source-log exactly-once across the whole drain.",
)
def st18_available_now_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    base = os.path.join(tempfile.gettempdir(), f"st18_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(base, "src")
    ckpt_dir = os.path.join(base, "ckpt")
    sink_dir = os.path.join(base, "sink")
    os.makedirs(src_dir)

    batch = normalize_events_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ).select("event_id", "event_type")
    # Six deterministic single-file splits, written in ONE pass (round
    # 11, guide §6): the per-split filter+write loop re-scanned the
    # fixture six times.  A single-task dynamic-partition write emits
    # exactly one data file per split value (one task holds all rows,
    # the writer opens one file per distinct partition value), so
    # maxFilesPerTrigger=2 must still give 3 epochs; the split column
    # lives only in the directory name, so the streamed file schema is
    # unchanged (recursiveFileLookup reads leaves, no partition
    # discovery).
    batch.withColumn("m", F.col("event_id") % 6).repartition(1).write.mode(
        "overwrite"
    ).partitionBy("m").parquet(src_dir)

    schema = batch.schema

    def append_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(int(epoch_id))).write.mode(
            "append"
        ).parquet(sink_dir)

    q = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
        .writeStream.foreachBatch(append_epoch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sink = spark.read.parquet(sink_dir)
    n_batches = sink.agg(
        F.count_distinct("epoch").cast("long").alias("n_batches")
    )
    return (
        sink.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("event_id").alias("n_distinct_ids"),
        )
        .crossJoin(F.broadcast(n_batches))
        .select("event_type", "n_events", "n_distinct_ids", "n_batches")
    )


@register(
    "st19_stream_proximity_join",
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
    doc="q66c's keyless binned proximity join UNDER readStream — the "
    "streaming twin proving the bucket-replication re-plan carries to "
    "stream-static enrichment: live error events explode to tolerance "
    "buckets {b-1,b,b+1} INSIDE the stream (generators run fine in "
    "micro-batches), equi-join a static bucketed purchase table "
    "(localCheckpoint-ed once — streaming re-evaluates static plans "
    "per batch otherwise), and the exact |Δt|<=tol post-filter keeps "
    "the append-mode inner join emitting every qualifying pair "
    "EXACTLY once (the one-replica-match law proven by the q66c "
    "property test).  The drained sink aggregates to the same per-day "
    "report as q66c and hash-matches the cartesian theta-join oracle "
    "— so batch, streaming, AND oracle agree row-for-row.  Scale: "
    "this is how a live error stream is enriched against a bounded "
    "recent-purchase table without a nested-loop per micro-batch; "
    "the static side broadcasts.",
)
def st19_stream_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    tol = 300 * 1000000
    base = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    # Floor-division buckets (pmod), matching q66c — truncating `div`
    # would collide the b-1 replica with b for 0 < us < tol.
    pur = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("us").alias("pur_us"),
            F.expr(f"(us - pmod(us, {tol})) div {tol}").alias("bucket"),
        )
        .localCheckpoint(eager=True)
    )
    stream = _read_events_stream(spark, sf_dir)
    eb = F.expr(f"(err_us - pmod(err_us, {tol})) div {tol}")
    err = (
        stream.filter(F.col("event_type") == "error")
        .select(
            F.unix_micros(F.col("ts")).alias("err_us"),
        )
        .select(
            "err_us",
            F.explode(F.array(eb - 1, eb, eb + 1)).alias("bucket"),
        )
    )
    gap = F.abs(F.col("pur_us") - F.col("err_us"))
    pairs = err.join(pur, "bucket").filter(gap <= tol).select(
        "err_us", "pur_us", gap.alias("gap_us")
    )
    sink = _run_to_memory(pairs, "append")
    return sink.groupBy(
        F.date_format(F.timestamp_micros(F.col("err_us")), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )


@register(
    "st20_stream_rapid_repeat",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        )
        SELECT a.event_type,
               count(*) AS n_pairs,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users,
               CAST(min(abs(a.us - b.us)) AS BIGINT) AS min_gap_us,
               CAST(max(abs(a.us - b.us)) AS BIGINT) AS max_gap_us
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND a.event_type = b.event_type
         AND a.event_id < b.event_id
         AND abs(a.us - b.us) <= 300000000
        GROUP BY a.event_type
    """,
    doc="qd27's rapid-repeat audit UNDER readStream — the streaming "
    "twin proving the composite-key bucket-replica re-plan works as "
    "live stream-static enrichment: the event stream explodes to "
    "floor-division tolerance buckets {b-1,b,b+1} inside the stream "
    "and equi-joins a static localCheckpoint-ed copy of the SAME "
    "table on (user, type, bucket); the a_id < b_id + exact "
    "|Δt| <= 5 min post-filters keep each unordered pair exactly "
    "once, so the drained append-mode sink aggregates to qd27's "
    "report and hash-matches the quadratic theta oracle — batch, "
    "streaming, and oracle agree row-for-row.  Scale: this is how a "
    "live ingest stream screens itself for double-submits against "
    "the recent-history table without a per-micro-batch nested "
    "loop; state is bounded by the static side's retention window.",
)
def st20_stream_rapid_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    tol = 300 * 1000000
    base = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    static_side = (
        base.select(
            F.col("event_id").alias("b_id"),
            F.col("user_id").alias("b_user"),
            F.col("event_type").alias("b_type"),
            F.col("us").alias("b_us"),
            F.expr(f"(us - pmod(us, {tol})) div {tol}").alias("b_bucket"),
        )
        .localCheckpoint(eager=True)
    )
    stream = _read_events_stream(spark, sf_dir)
    sb = F.expr(f"(a_us - pmod(a_us, {tol})) div {tol}")
    a = (
        stream.select(
            F.col("event_id").alias("a_id"),
            F.col("user_id").alias("a_user"),
            F.col("event_type").alias("a_type"),
            F.unix_micros(F.col("ts")).alias("a_us"),
        )
        .select(
            "a_id",
            "a_user",
            "a_type",
            "a_us",
            F.explode(F.array(sb - 1, sb, sb + 1)).alias("bucket"),
        )
    )
    gap = F.abs(F.col("a_us") - F.col("b_us"))
    pairs = (
        a.join(
            static_side,
            (F.col("bucket") == F.col("b_bucket"))
            & (F.col("a_user") == F.col("b_user"))
            & (F.col("a_type") == F.col("b_type")),
        )
        .filter((F.col("a_id") < F.col("b_id")) & (gap <= tol))
        .select("a_type", "a_user", gap.alias("gap_us"))
    )
    sink = _run_to_memory(pairs, "append")
    return sink.groupBy(F.col("a_type").alias("event_type")).agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_user").cast("long").alias("n_users"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )


@register(
    "st21_stream_stream_full_join",
    oracle="""
        SELECT p.event_id AS purchase_id,
               c.event_id AS click_id,
               p.user_id AS p_user,
               c.user_id AS c_user
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
                                        - INTERVAL 1 HOUR
    """,
    doc="FULL OUTER stream-stream join with watermarks + time-range "
    "condition — the last stream-join mode after st08 (inner) and "
    "st09 (left outer): matched purchase/click pairs emit "
    "immediately, while UNMATCHED rows on BOTH sides emit with NULLs "
    "once the watermark passes their eviction bound (purchases after "
    "wm > p_ts, clicks after wm > c_ts + 1h — the time-range "
    "condition bounds both state stores).  Deterministic and "
    "hash-verified against the batch FULL JOIN oracle via st09's "
    "sequenced watermark-driver recipe (matched sentinel pairs at "
    "user -1/-2, max(ts)+2h/+4h, second driver batch forcing the "
    "eviction emission; sentinels drop on the "
    "coalesce(p_user, c_user) >= 0 gate since they only ever match "
    "each other).  Scale: state on both sides stays "
    "watermark-bounded; the driver trick is test scaffolding — real "
    "streams advance watermarks continuously.",
)
def st21_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _watermarked_outer_stream_join(spark, sf_dir, "full_outer")


@register(
    "st22_stream_chained_windows",
    oracle="""
        WITH buckets AS (
            SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
                       AS w10,
                   event_type,
                   count(*) AS n_events
            FROM events
            GROUP BY 1, 2
        )
        SELECT epoch_us(time_bucket(INTERVAL '1 hour', w10)) AS hour_start_us,
               event_type,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(n_events) AS BIGINT) AS total_events,
               CAST(max(n_events) AS BIGINT) AS max_bucket
        FROM buckets
        GROUP BY 1, 2
    """,
    doc="CHAINED streaming time-window aggregations (Spark 3.4+ "
    "multiple-stateful-operator support): a watermarked 10-minute "
    "tumbling count per event_type feeds a SECOND stateful window "
    "aggregation over window_time() — hourly bucket counts, totals, "
    "and the max 10-minute burst — in ONE append-mode streaming query "
    "with two stateful operators back to back, the shape that pre-3.4 "
    "required two queries glued by a sink.  Append mode only emits "
    "watermark-finalized windows, so determinism uses st09's "
    "sequenced-driver recipe: two sentinel single-event batches at "
    "max(ts)+2h/+4h advance the watermark past every fixture window "
    "(batch N applies batch N-1's watermark), while the sentinels' "
    "own windows stay unfinalized in level-1 state and never reach "
    "the sink — no filter needed.  Both levels hash-verify against "
    "the two-level time_bucket oracle; counts are exact integers.  "
    "Scale: each level's state is windows x types (watermark-bounded) "
    "and level 2's input is already pre-aggregated — the classic "
    "rollup cascade raw -> minutely -> hourly in one plan.",
)
def st22_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = os.path.join(tempfile.gettempdir(), f"st22_{uuid.uuid4().hex[:12]}")
    os.makedirs(base)
    src = os.path.join(sf_dir, "events.parquet")
    try:
        os.link(src, os.path.join(base, "events.parquet"))
    except OSError:
        import shutil

        shutil.copyfile(src, os.path.join(base, "events.parquet"))

    raw = spark.read.parquet(src)
    schema = raw.schema

    # ONE bounds job + ONE template-row job up front (the st24 re-plan):
    # each sentinel previously re-scanned the fixture for max(ts) and a
    # template row; the values are constants of the run
    # (empty-fixture-safe, instant-correct: _sentinel_scaffold).
    _bounds, _template = _sentinel_scaffold(raw, schema)

    def _driver_frame(hours: int) -> DataFrame:
        """One sentinel event at max(ts)+hours — advances the watermark;
        its own 10-min window never finalizes, so it never emits."""
        ts_val = _sentinel_shift(_bounds["max"], hours, schema)
        row = dict(_template)
        row.update(
            ts=ts_val, event_id=-1, user_id=-1, event_type="wm_sentinel"
        )
        return spark.createDataFrame(
            [tuple(row[f] for f in schema.fieldNames())], schema
        )

    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(base)
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    lvl1 = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w10"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    lvl2 = (
        lvl1.groupBy(
            F.window(F.window_time("w10"), "1 hour").alias("wh"), "event_type"
        )
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_events").alias("total_events"),
            F.max("n_events").alias("max_bucket"),
        )
        .select(
            F.unix_micros(F.col("wh.start").cast("timestamp")).alias(
                "hour_start_us"
            ),
            "event_type",
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("total_events").cast("long").alias("total_events"),
            F.col("max_bucket").cast("long").alias("max_bucket"),
        )
    )
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    prev_nd = spark.conf.get(_NO_DATA_KEY)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set(key, _STREAM_PARTS)
        # No-data micro-batches off (round 11): every fixture window —
        # lvl1 10-min and lvl2 1-hour — finalizes by the drv2 DATA batch
        # (wm = drv1's +2h with a ≥50-min margin over the last fixture
        # hour window); the trailing watermark-only batches would only
        # finalize the sentinel's own windows, which the event_type
        # filter drops.
        spark.conf.set(_NO_DATA_KEY, "false")
        q = (
            lvl2.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 0: the fixture file
            if _bounds is not None:  # empty fixture: nothing to finalize
                for step, hours in enumerate((2, 4), start=1):
                    _driver_frame(hours).repartition(1).write.parquet(
                        os.path.join(base, f"drv{step}")
                    )
                    q.processAllAvailable()  # batch N applies batch N-1's wm
        finally:
            q.stop()
    finally:
        spark.conf.set(key, prev)
        spark.conf.set(_NO_DATA_KEY, prev_nd)
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    # Sentinel windows normally never finalize (the watermark trails
    # them), but emission timing is an engine detail — the type key
    # makes them deterministically filterable either way.
    return spark.table(name).filter(F.col("event_type") != "wm_sentinel")


@register(
    "st23_stream_static_left_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type,
               p.vip_cents
        FROM events e
        LEFT JOIN (
            SELECT c_custkey AS user_id,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS vip_cents
            FROM customer
            WHERE c_acctbal > 9000
        ) p USING (user_id)
    """,
    # Append-mode LEFT stream-static join needs no watermark: the
    # static side is complete at every micro-batch, so unmatched
    # stream rows emit their NULLs immediately — unlike st09/st21's
    # stream-stream outers, no eviction wait, no driver trick.
    doc="LEFT OUTER stream-static enrichment — st07's inner twin "
    "completed: every stream event emits exactly once, carrying the "
    "static VIP profile (account balance in exact cents for "
    "customers above a threshold) when the user matches and NULL "
    "otherwise.  The left-outer mode matters operationally: an "
    "enrichment join must NEVER drop events just because the dim is "
    "sparse, and unlike the stream-stream outers (st09/st21) it "
    "needs no watermark — the static side is complete at every "
    "micro-batch, so NULLs emit immediately.  Hash-verified against "
    "the batch LEFT JOIN.  Scale: the static side localCheckpoints "
    "once and broadcasts; state-free join, O(batch) per trigger.",
)
def st23_stream_static_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    vip = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("vip_cents"),
        )
        .localCheckpoint(eager=True)
    )
    stream = _read_events_stream(spark, sf_dir)
    joined = stream.join(F.broadcast(vip), "user_id", "left").select(
        "event_id", "user_id", "event_type", "vip_cents"
    )
    return _run_to_memory(joined, "append")


@register(
    "st24_stream_late_data_drop",
    oracle="""
        SELECT
            epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))
                AS window_start_us,
            event_type,
            count(*) AS n_events
        FROM events
        GROUP BY 1, 2
    """,
    doc="WATERMARK LATE-DATA DROP, proven by hash: an append-mode "
    "hourly count runs over the fixture, a sentinel batch advances "
    "the watermark past every fixture window (st09's sequenced-driver "
    "recipe), and then a third driver batch delivers a LATE fixture "
    "event — same type, same user, timestamp equal to the stream's "
    "MINIMUM — whose window closed long ago.  The oracle counts the "
    "fixture ONLY: the result hash-matches iff the engine DROPPED "
    "the late row (a broken watermark would re-emit or double-count "
    "its window and diverge).  q63 demonstrates the batch-side "
    "filter; THIS pins the streaming engine's actual state-eviction "
    "behavior.  Sentinel rows carry their own event_type and are "
    "filtered; the late plant needs no filter — being dropped IS the "
    "assertion.  Scale: watermark-bounded state regardless of stream "
    "length; the drop is what makes that bound safe to enforce.",
)
def st24_stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = os.path.join(tempfile.gettempdir(), f"st24_{uuid.uuid4().hex[:12]}")
    os.makedirs(base)
    src = os.path.join(sf_dir, "events.parquet")
    try:
        os.link(src, os.path.join(base, "events.parquet"))
    except OSError:
        import shutil

        shutil.copyfile(src, os.path.join(base, "events.parquet"))

    raw = spark.read.parquet(src)
    schema = raw.schema

    # ONE bounds job + ONE template-row job up front (optimization round
    # 10): the three sentinel plants below each re-scanned the fixture
    # for min/max(ts) and again for a template row — 6 full-scan jobs
    # for 3 single-row writes.  The values are constants of the run;
    # compute them once and build each sentinel driver-side
    # (empty-fixture-safe, instant-correct: _sentinel_scaffold).
    _bounds, _template = _sentinel_scaffold(raw, schema)

    def _plant(agg_col: str, hours: int, event_type: str) -> DataFrame:
        """One event at min/max(ts)+hours with the given type; sentinel
        ids.  agg_col: 'max' advances the watermark, 'min' is LATE."""
        ts_val = _sentinel_shift(_bounds[agg_col], hours, schema)
        row = dict(_template)
        row.update(
            ts=ts_val, event_id=-1, user_id=-1, event_type=event_type
        )
        return spark.createDataFrame(
            [tuple(row[f] for f in schema.fieldNames())], schema
        )

    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(base)
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                "window_start_us"
            ),
            "event_type",
            "n_events",
        )
    )
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    prev_nd = spark.conf.get(_NO_DATA_KEY)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set(key, _STREAM_PARTS)
        # No-data micro-batches off (round 11): every fixture hour
        # window emits by the drv2 DATA batch (wm = +2h - 10 min), and
        # the late-row batch 3 drops its row against that same
        # watermark; trailing watermark-only batches would only emit
        # the filtered wm_sentinel windows.
        spark.conf.set(_NO_DATA_KEY, "false")
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 0: fixture (wm still 0)
            # batch 1+2: sentinels at max+2h/+4h — batch N applies batch
            # N-1's watermark, so every fixture window emits by batch 2.
            if _bounds is not None:  # empty fixture: nothing to emit/drop
                for step, hours in enumerate((2, 4), start=1):
                    _plant("max", hours, "wm_sentinel").repartition(
                        1
                    ).write.parquet(os.path.join(base, f"drv{step}"))
                    q.processAllAvailable()
                # batch 3: the LATE row — a duplicate-shaped 'click' at
                # the stream MINIMUM timestamp.  Its hour window closed
                # (and was emitted) batches ago; the watermark drops it.
                # If it were counted, that window's n_events would differ
                # from the fixture-only oracle and the hash would fail.
                _plant("min", 0, "click").repartition(1).write.parquet(
                    os.path.join(base, "late")
                )
                q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set(key, prev)
        spark.conf.set(_NO_DATA_KEY, prev_nd)
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    return spark.table(name).filter(F.col("event_type") != "wm_sentinel")


@register(
    "st25_stateful_restart_recovery",
    oracle="""
        SELECT
            epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)))
                AS window_start_us,
            event_type,
            count(*) AS n_events
        FROM events
        GROUP BY 1, 2
    """,
    doc="STATE-STORE recovery across a restart, proven by hash — the "
    "stateful complement of st11's source-log exactly-once: a "
    "complete-mode 1-day tumbling count runs over HALF the fixture "
    "(even event_ids) with a durable checkpointLocation and stops; "
    "the odd half then lands and a NEW query object — same pipeline, "
    "same checkpoint — processes it.  Complete mode re-emits the "
    "whole aggregate each batch, so the post-restart memory sink "
    "holds full-fixture counts IFF the aggregation state survived "
    "the restart: lost state would leave only the odd half's counts "
    "(hash breaks small), re-read of file 1 would double the even "
    "half (hash breaks big).  Together st11/st25 pin both halves of "
    "streaming fault tolerance — the source log and the state store "
    "— as hash assertions, not docs.  Scale: this is the property "
    "that makes a 100 TB/day stateful pipeline restartable at all; "
    "checkpoint + fixed partitioning are the operational contract.",
)
def st25_stateful_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stateful_restart_recovery(spark, sf_dir, provider=None)


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@register(
    "st26_rocksdb_state_store",
    oracle="""
        SELECT
            epoch_us(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)))
                AS window_start_us,
            event_type,
            count(*) AS n_events
        FROM events
        GROUP BY 1, 2
    """,
    doc="st25's restart-recovery proof re-run on the ROCKSDB state-store "
    "provider (spark.sql.streaming.stateStore.providerClass = "
    "RocksDBStateStoreProvider, rocksdbjni bundled with Spark 4) — the "
    "LARGE-STATE backend: the default HDFS-backed provider keeps every "
    "partition's state map in executor heap, RocksDB spills it to local "
    "SSD with changelog files in the checkpoint, which is what makes "
    "100 GB+ of aggregation/join state per executor survivable.  Same "
    "pipeline, same two-phase stop/restart, same full-fixture oracle: "
    "the hash matches IFF RocksDB's checkpointed state recovers "
    "bit-identically to the in-memory provider's — proving the backend "
    "swap is a pure operational knob, not a semantics change.  The "
    "provider is pinned ONLY for this query's session window (conf "
    "save/restore) because the provider of a checkpoint must never "
    "change across restarts.",
)
def st26_rocksdb_state_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stateful_restart_recovery(spark, sf_dir, provider=_ROCKSDB_PROVIDER)


def _stateful_restart_recovery(
    spark: SparkSession, sf_dir: str, provider: str | None
) -> DataFrame:
    configure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = os.path.join(tempfile.gettempdir(), f"st25_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(base, "src")
    ckpt_dir = os.path.join(base, "ckpt")
    os.makedirs(src_dir)

    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    schema = raw.schema
    raw.filter(F.col("event_id") % 2 == 0).write.parquet(
        os.path.join(src_dir, "part1")
    )
    part2_staging = os.path.join(base, "part2_staging")
    raw.filter(F.col("event_id") % 2 == 1).write.parquet(part2_staging)

    name = f"mem_{uuid.uuid4().hex[:12]}"
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prov_prev = spark.conf.get(prov_key)
    except Exception:
        prov_prev = None

    def run_once(qname: str) -> None:
        stream = normalize_events_ts(
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        agg = (
            stream.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                    "window_start_us"
                ),
                "event_type",
                "n_events",
            )
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        spark.conf.set(key, _STREAM_PARTS)  # MUST stay fixed across restarts
        if provider is not None:  # same rule: fixed for a checkpoint's life
            spark.conf.set(prov_key, provider)
        run_once(name)  # phase 1: even half builds state
        os.rename(part2_staging, os.path.join(src_dir, "part2"))
        run_once(name)  # phase 2: restart recovers state, adds odd half
    finally:
        spark.conf.set(key, prev)
        if provider is not None:
            if prov_prev is None:
                spark.conf.unset(prov_key)
            else:
                spark.conf.set(prov_key, prov_prev)
        # Result lives in the memory sink; source/checkpoint dirs are
        # dead weight after phase 2 (the st09 disk-leak lesson).
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    return spark.table(name)


@register(
    "st27_stream_ann_cell_route",
    oracle="""
        WITH coded AS (
            SELECT vec_id,
                   CAST(embedding[1] >= 0 AS INT) * 8
                   + CAST(embedding[2] >= 0 AS INT) * 4
                   + CAST(embedding[3] >= 0 AS INT) * 2
                   + CAST(embedding[4] >= 0 AS INT) AS cell
            FROM embeddings
        ),
        probes AS (
            SELECT vec_id AS probe_id, cell FROM coded WHERE vec_id % 97 = 1
        ),
        idx AS (
            SELECT cell, count(*) AS n_candidates
            FROM coded WHERE vec_id % 97 <> 1
            GROUP BY cell
        )
        SELECT p.probe_id, p.cell,
               CAST(coalesce(i.n_candidates, 0) AS BIGINT) AS n_candidates
        FROM probes p LEFT JOIN idx i USING (cell)
    """,
    doc="STREAMING ANN admission routing — q86b's bucketed-join front "
    "half under readStream: incoming vectors (the deterministic "
    "vec_id %% 97 == 1 slice, staged as a file stream) are cell-coded "
    "MAP-SIDE with the q92c sign quantizer and stream-static LEFT "
    "joined against the broadcast per-cell index profile (corpus "
    "counts per cell), emitting each probe's routing decision and "
    "candidate-set size in append mode with no stateful operator at "
    "all.  This is the ingest half of a live vector index: route on "
    "arrival, size the shortlist work before running it, flag probes "
    "landing in empty/cold cells (n_candidates = 0 via the LEFT "
    "join).  Scale: per-event cost is one expression + one broadcast "
    "probe — no state store, no watermark, so throughput is scan-"
    "bound; the cell profile refreshes out-of-band exactly like st23's "
    "dimension.",
)
def st27_stream_ann_cell_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import to_double_array
    from ..sources import load_table

    configure(spark)
    e = load_table(spark, sf_dir, "embeddings")
    emb = to_double_array("embedding")
    cell = (
        (F.element_at(emb, 1) >= 0).cast("int") * 8
        + (F.element_at(emb, 2) >= 0).cast("int") * 4
        + (F.element_at(emb, 3) >= 0).cast("int") * 2
        + (F.element_at(emb, 4) >= 0).cast("int")
    )
    idx = (
        e.filter(F.col("vec_id") % 97 != 1)
        .select(cell.alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_candidates"))
        .localCheckpoint(eager=True)
    )
    # Stage the incoming slice once per (app, sf): a real feed delivers
    # files; the stream reads them with the staged footer schema.
    key = f"st27_{sf_dir}"
    if key not in _INGEST_STAGE_CACHE:
        stage = os.path.join(
            tempfile.gettempdir(), f"st27_{uuid.uuid4().hex[:10]}"
        )
        e.filter(F.col("vec_id") % 97 == 1).write.mode("overwrite").parquet(
            stage
        )
        _INGEST_STAGE_CACHE[key] = stage
    stage = _INGEST_STAGE_CACHE[key]
    schema = spark.read.parquet(stage).schema
    stream = spark.readStream.schema(schema).parquet(stage)
    routed = (
        stream.select(F.col("vec_id").alias("probe_id"), cell.alias("cell"))
        .join(F.broadcast(idx), "cell", "left")
        .select(
            "probe_id",
            "cell",
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("long")
            .alias("n_candidates"),
        )
    )
    return _run_to_memory(routed, "append")


@register(
    "st28_dual_sink_fanout",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_serving,
               CAST(count(*) AS BIGINT) AS n_audit,
               TRUE AS digests_match
        FROM events
    """,
    doc="DUAL-SINK FANOUT from one stream: each micro-batch is written "
    "inside a SINGLE foreachBatch to TWO independent parquet sinks "
    "(serving + audit) — the standard way to fan a stream out "
    "without running two streaming queries (two queries = two "
    "checkpoints that can drift apart; one foreachBatch commits both "
    "writes per epoch or neither on retry, and a batch_df.persist() "
    "keeps the two writes from recomputing the source).  The proof "
    "reads BOTH materialized sinks back and compares order-free "
    "content digests (sum of per-row md5-prefix ints, the qd30 "
    "table-checksum pattern) in-plan: the law boolean breaks the "
    "hash if the sinks ever diverge, and the row counts pin "
    "completeness against the batch oracle.  Scale: fanout cost is "
    "one extra write of the already-computed batch; digesting is a "
    "map-side hash + one partial-agg sum per sink.",
)
def st28_dual_sink_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    base = os.path.join(tempfile.gettempdir(), f"st28_{uuid.uuid4().hex[:12]}")
    serving_dir = os.path.join(base, "serving")
    audit_dir = os.path.join(base, "audit")
    proj = events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def fanout(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(serving_dir)
            batch_df.write.mode("append").parquet(audit_dir)
        finally:
            batch_df.unpersist()

    q = proj.writeStream.foreachBatch(fanout).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def digest(path: str, n_alias: str, d_alias: str) -> DataFrame:
        df = spark.read.parquet(path)
        row_hash = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("event_id").cast("string"),
                        F.col("cents").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        return df.agg(
            F.count("*").cast("bigint").alias(n_alias),
            F.sum(row_hash).cast("decimal(38,0)").alias(d_alias),
        )
    s = digest(serving_dir, "n_serving", "d_serving")
    a = digest(audit_dir, "n_audit", "d_audit")
    return s.crossJoin(F.broadcast(a)).select(
        "n_serving",
        "n_audit",
        (F.col("d_serving") == F.col("d_audit")).alias("digests_match"),
    )


@register(
    "st29_stream_ohlc_bars",
    oracle="""
        WITH keyed AS (
            SELECT event_type,
                   epoch_us(time_bucket(INTERVAL '1 hour',
                                        CAST(ts AS TIMESTAMP))) AS bar_hour_us,
                   value,
                   lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                     || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
            FROM events
        )
        SELECT event_type, bar_hour_us,
               arg_min(value, ord_key) AS open_v,
               max(value) AS high_v,
               min(value) AS low_v,
               arg_max(value, ord_key) AS close_v,
               CAST(count(*) AS BIGINT) AS n_events
        FROM keyed
        GROUP BY event_type, bar_hour_us
    """,
    doc="readStream twin of q68l's OHLC bars: hourly open/high/low/"
    "close per event_type as a complete-mode streaming aggregate.  "
    "The interesting bit is that min_by/max_by are MERGEABLE "
    "aggregates, so the open/close picks ride the streaming state "
    "store exactly like count — each micro-batch folds its partial "
    "(value, key) champion into the stored one, which is why this "
    "works incrementally at all (a window-function formulation of "
    "'first value per bar' would be unrunnable on a stream).  The "
    "integer-micro mean is left to the batch twin: complete-mode "
    "re-emission makes sums deterministic here, but keeping the "
    "streaming surface to pick/min/max/count keeps every stored "
    "state O(1) and engine-portable.  Hash-verified against the "
    "batch oracle over the drained fixture (the st01 contract).",
)
def st29_stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    keyed = events.select(
        "event_type",
        F.window("ts", "1 hour").alias("w"),
        "value",
        F.concat(
            F.lpad(
                F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
                20,
                "0",
            ),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("ord_key"),
    )
    agg = (
        keyed.groupBy("event_type", "w")
        .agg(
            F.expr("min_by(value, ord_key)").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.expr("max_by(value, ord_key)").alias("close_v"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                "bar_hour_us"
            ),
            "open_v",
            "high_v",
            "low_v",
            "close_v",
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


@register(
    "st30_offset_replay_sink",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(event_id) AS BIGINT) AS id_sum,
               count(DISTINCT event_id) AS n_distinct_ids
        FROM events
        GROUP BY event_type
    """,
    doc="OFFSET-REPLAY-SAFE STREAMING SINK — the Kafka-producer "
    "exactly-once contract exercised without a broker (round-8 "
    "verdict item #7, completing src18/src20's custom-source pair on "
    "the sink side): a foreachBatch sink that is IDEMPOTENT BY BATCH "
    "ID (each batch overwrites its own out/batch=<id> dir and "
    "re-marks it in a manifest — the moral equivalent of a "
    "transactional producer keyed by (batch, partition)), driven "
    "through a GENUINE replay: after run 1 commits, the newest "
    "checkpoint commits/<n> marker is DELETED while its offsets/<n> "
    "entry stays — exactly the crash window between sink commit and "
    "source-log commit — so the restarted query re-executes batch n "
    "and re-delivers it to the sink.  An append-mode sink would "
    "double that batch's counts and break the hash; the idempotent "
    "overwrite makes the re-delivery invisible, and the final "
    "read-back of every batch dir hash-matches the full-fixture "
    "oracle (count + id_sum + distinct ids — duplication and loss "
    "both break it).  st11 proves the SOURCE log never re-reads a "
    "file; this proves the SINK survives the log losing a commit.  "
    "Scale: per-batch dirs are the partitioned-manifest layout a "
    "100 TB/day producer uses; the replay cost is one batch, never "
    "the stream.",
)
def st30_offset_replay_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    configure(spark)
    base = os.path.join(tempfile.gettempdir(), f"st30_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(base, "src")
    ckpt_dir = os.path.join(base, "ckpt")
    out_dir = os.path.join(base, "out")
    os.makedirs(src_dir)
    os.makedirs(out_dir)

    batch = normalize_events_ts(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ).select("event_id", "event_type")
    # One-pass 2-way split (round 11, guide §6) — the st11 pattern.
    split_root = os.path.join(base, "split")
    batch.withColumn("m", F.col("event_id") % 2).repartition(1).write.partitionBy(
        "m"
    ).parquet(split_root)
    os.rename(os.path.join(split_root, "m=0"), os.path.join(src_dir, "part1"))
    part2_staging = os.path.join(split_root, "m=1")
    schema = batch.schema
    manifest_path = os.path.join(out_dir, "_manifest.json")

    def idempotent_sink(batch_df: DataFrame, batch_id: int) -> None:
        # Phase 1: (re)write THIS batch's dir — overwrite makes a
        # replayed delivery byte-identical, never additive.  Phase 2:
        # record the batch id in the manifest (a set: re-marking a
        # replayed id is a no-op), the driver-side commit point.
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        ids = set()
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                ids = set(json.load(fh)["batch_ids"])
        ids.add(int(batch_id))
        with open(manifest_path, "w") as fh:
            json.dump({"batch_ids": sorted(ids)}, fh)

    def run_once(ckpt: str) -> None:
        q = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .writeStream.foreachBatch(idempotent_sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once(ckpt_dir)  # run 1: part1, >=1 committed batches
    # Simulate the producer crash window: sink committed batch n, but
    # the source log lost commits/<n> (offsets/<n> survives) — the
    # restarted engine MUST re-execute batch n into the sink.  The
    # surgery happens on a CLONED checkpoint (checkpoints are portable
    # directories): Spark 4 caches each checkpoint path's metadata log
    # in-session and reads an external deletion under the same path as
    # a concurrent writer (CONCURRENT_STREAM_LOG_UPDATE) — exactly the
    # cross-run protection a real crash would not trip, because a
    # crashed driver's cache dies with it.  A fresh path IS the fresh
    # driver.
    import shutil

    ckpt2_dir = os.path.join(base, "ckpt_after_crash")
    shutil.copytree(ckpt_dir, ckpt2_dir)
    commits_dir = os.path.join(ckpt2_dir, "commits")
    nums = sorted(
        int(name) for name in os.listdir(commits_dir) if name.isdigit()
    )
    # remove the marker AND its ChecksumFileSystem .crc sidecar — a
    # stale crc alone makes the re-commit's atomic create fail as a
    # phantom concurrent writer
    for name in (str(nums[-1]), f".{nums[-1]}.crc"):
        p = os.path.join(commits_dir, name)
        if os.path.exists(p):
            os.remove(p)
    os.rename(part2_staging, os.path.join(src_dir, "part2"))
    run_once(ckpt2_dir)  # run 2: replays batch n, then processes part2

    with open(manifest_path) as fh:
        committed = json.load(fh)["batch_ids"]  # bounded sink metadata
    dirs = [os.path.join(out_dir, f"batch={b}") for b in committed]
    return (
        spark.read.parquet(*dirs)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
            F.count_distinct("event_id").alias("n_distinct_ids"),
        )
    )


from ..operators.aggregates import (  # noqa: E402  (q28f sketch helpers)
    _HLL_ALPHA,
    _HLL_M,
    _hex_bigint_sql,
    _hll_rho_sql,
    _hll_sum_sql,
)


@register(
    "st31_stream_hll_registers",
    oracle=f"""
        WITH base AS (
            SELECT user_id AS item,
                   md5(CAST(user_id AS VARCHAR)) AS h
            FROM events
        ),
        hashed AS (
            SELECT item,
                   {_hex_bigint_sql('h', 1, 2)} AS bucket,
                   {_hex_bigint_sql('h', 3, 10)} AS v
            FROM base
        ),
        rho AS (
            SELECT item, bucket, {_hll_rho_sql('v')} AS rho FROM hashed
        ),
        built AS (
            SELECT bucket, max(rho) AS reg FROM rho GROUP BY bucket
        ),
        spine AS (
            SELECT unnest(generate_series(0, {_HLL_M - 1})) AS bucket
        ),
        regs AS (
            SELECT s.bucket, coalesce(b.reg, 0) AS reg
            FROM spine s LEFT JOIN built b ON b.bucket = s.bucket
        ),
        agg AS (
            SELECT {_hll_sum_sql('reg')} AS s,
                   CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v_zero,
                   CAST(sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS registers_hit
            FROM regs
        ),
        ex AS (
            SELECT CAST(count(DISTINCT item) AS BIGINT) AS exact_distinct
            FROM base
        )
        SELECT ex.exact_distinct, agg.registers_hit, agg.v_zero,
               round(agg.s, 6) AS harmonic_sum,
               round(CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
                     / agg.s, 4) AS raw_estimate,
               round(abs(CAST({_HLL_ALPHA!r} AS DOUBLE)
                         * {_HLL_M * _HLL_M} / agg.s
                         / ex.exact_distinct - 1) * 100, 4)
                   AS rel_err_pct
        FROM ex CROSS JOIN agg
    """,
    doc=f"STREAMING HyperLogLog — q28f's register file maintained by "
    "Structured Streaming: per-event rho projects map-side, the "
    f"stateful groupBy(bucket).max(rho) carries EXACTLY {_HLL_M} "
    "state rows regardless of stream length — the textbook bounded-"
    "state streaming distinct-count (a streaming countDistinct's "
    "state grows with cardinality; the sketch's never does), and the "
    "same max-merge absorbs micro-batches incrementally exactly as "
    "it merges executors in batch.  Because the register transition "
    "is deterministic (max over a deterministic hash), the FINAL "
    "register file is batch-equivalent, so — unusually for a "
    "streaming op — the estimate is HASH-VERIFIED bit-for-bit "
    "against the relational oracle via the q28f dyadic-rational "
    "argument.  Post-stream arithmetic (spine join, harmonic sum, "
    "alpha*m^2/S) runs batch-side on the 256-row memory-sink table.  "
    "Scale: state is kilobytes at any stream length; complete-mode "
    "re-emission cost is O(m), not O(cardinality).",
)
def st31_stream_hll_registers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = _read_events_stream(spark, sf_dir)
    h = "md5(CAST(user_id AS STRING))"
    rho = events.selectExpr(
        "user_id",
        f"CAST(conv(substr({h}, 1, 2), 16, 10) AS BIGINT) AS bucket",
        f"CAST(conv(substr({h}, 3, 10), 16, 10) AS BIGINT) AS v",
    ).selectExpr("user_id", "bucket", _hll_rho_sql("v") + " AS rho")
    built = _run_to_memory(
        rho.groupBy("bucket").agg(F.max("rho").alias("reg")), "complete"
    )
    spine = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    regs = spine.join(F.broadcast(built), "bucket", "left").select(
        F.coalesce("reg", F.lit(0)).alias("reg")
    )
    agg = regs.agg(
        F.expr(_hll_sum_sql("reg")).alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v_zero"),
        F.sum(F.when(F.col("reg") > 0, 1).otherwise(0))
        .cast("long")
        .alias("registers_hit"),
    )
    ex = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    est = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / F.col("s")
    return ex.crossJoin(F.broadcast(agg)).select(
        "exact_distinct",
        "registers_hit",
        "v_zero",
        F.round(F.col("s"), 6).alias("harmonic_sum"),
        F.round(est, 4).alias("raw_estimate"),
        F.round(
            F.abs(est / F.col("exact_distinct") - 1) * 100, 4
        ).alias("rel_err_pct"),
    )

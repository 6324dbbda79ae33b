"""Streaming-twin semantics: the streaming operators must agree with
their hash-verified batch twins over the static fixture (one logical
plan, two execution modes — SURVEY.md §2.9)."""

from __future__ import annotations

from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_CORRECT


def test_stream_dedup_matches_batch_keys(spark):
    """st04's dropDuplicatesWithinWatermark must emit exactly one row per
    (user_id, event_type) — the same key set q64's batch dedup keeps.
    (Which event survives per key is arbitrary in streaming; the KEY SET
    is the deterministic contract.)"""
    batch = all_queries()["q64_windowed_dedup"].fn(spark, SF_CORRECT).toPandas()
    stream = all_queries()["st04_stream_dedup"].fn(spark, SF_CORRECT).toPandas()
    bkeys = set(zip(batch.user_id, batch.event_type))
    skeys = set(zip(stream.user_id, stream.event_type))
    assert len(stream) == len(skeys), "stream emitted duplicate keys"
    assert skeys == bkeys


def test_stream_tumbling_matches_batch_counts(spark):
    """st01's windowed counts must equal q60's batch tumbling counts."""
    batch = all_queries()["q60_tumbling_window"].fn(spark, SF_CORRECT).toPandas()
    stream = all_queries()["st01_stream_tumbling"].fn(spark, SF_CORRECT).toPandas()
    b = {
        (r.window_start, r.event_type): r.n_events
        for r in batch.itertuples()
    }
    s = {
        (r.window_start, r.event_type): r.n_events
        for r in stream.itertuples()
    }
    assert s == b

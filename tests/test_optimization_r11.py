"""Focused equivalence tests for round-11 optimizations (the
test-per-internal-change rule): emit-once banded candidates, the
one-pass ml17 confusion aggregate, the one-pass streaming splits, and
the sentinel instant arithmetic."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_CORRECT, SF_SMOKE


def test_q72f_emit_once_pairs_match_naive_distinct(spark):
    """q72f's emit-once candidate join (keep the row whose emitting
    hash index is the pair's FIRST agreeing hash) must produce exactly
    the naive join-then-distinct 16x1 superset pair set — same pairs,
    no duplicates.  (The q72b/c/d/qp5 emit-once variants were measured
    slower and REVERTED; q72f is the one kept — see
    OPTIMIZATION_r11.md.)"""
    from spark_ml_optimization_spark.operators.dedup import (
        _PMH_N,
        _pmh_sig_banded,
    )

    _sh, sig, _banded = _pmh_sig_banded(spark, SF_CORRECT)
    b16 = None
    for j in range(_PMH_N):
        one = sig.select(
            "doc_id",
            F.lit(j).alias("band"),
            F.md5(F.concat_ws("|", F.col(f"h{j}"))).alias("band_sig"),
        )
        b16 = one if b16 is None else b16.unionByName(one)
    a, bb = b16.alias("ba"), b16.alias("bb")
    cand = a.join(
        bb,
        (F.col("ba.band") == F.col("bb.band"))
        & (F.col("ba.band_sig") == F.col("bb.band_sig"))
        & (F.col("ba.doc_id") < F.col("bb.doc_id")),
    ).select(
        F.col("ba.doc_id").alias("da"),
        F.col("bb.doc_id").alias("db"),
        F.col("ba.band").alias("eband"),
    )
    naive = {(r.da, r.db) for r in cand.select("da", "db").distinct().collect()}
    first_idx = F.when(F.col("a.h0") == F.col("b.h0"), F.lit(0))
    for i in range(1, _PMH_N):
        first_idx = first_idx.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), F.lit(i))
    emit_once = (
        cand.join(F.broadcast(sig.alias("a")), F.col("da") == F.col("a.doc_id"))
        .join(F.broadcast(sig.alias("b")), F.col("db") == F.col("b.doc_id"))
        .filter(F.col("eband") == first_idx)
        .select("da", "db")
        .collect()
    )
    pairs = [(r.da, r.db) for r in emit_once]
    assert len(pairs) == len(set(pairs)), "emit-once produced duplicate pairs"
    assert set(pairs) == naive


def test_q72f_counts_stable_across_scales(spark):
    """q72f's emit-once restructure must keep every (b, r) config's
    candidate/accepted counts identical to the oracle-pinned values —
    cross-checked here structurally: counts are nested downward
    (cand(2x8) <= cand(4x4) <= cand(8x2) <= cand(16x1)) and acceptance
    never exceeds candidates."""
    rows = all_queries()["q72f_banding_tradeoff"].fn(spark, SF_SMOKE).collect()
    by_bands = {r.bands: r for r in rows}
    assert sorted(by_bands) == [2, 4, 8, 16]
    seq = [by_bands[b].n_candidates for b in (2, 4, 8, 16)]
    assert seq == sorted(seq), f"candidate nesting violated: {seq}"
    for r in rows:
        assert 0 <= r.n_accepted <= r.n_candidates


def test_ml17_confusion_accuracy_matches_evaluator(spark):
    """The one-pass confusion aggregate's accuracy must equal
    MulticlassClassificationEvaluator's on the same predictions."""
    from pyspark.ml.classification import LinearSVC, OneVsRest
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    from spark_ml_optimization_spark.ml.pipelines import _labeled_embeddings

    data = _labeled_embeddings(spark, SF_SMOKE).repartition(2).cache()
    data.count()
    model = OneVsRest(
        classifier=LinearSVC(maxIter=5, regParam=0.01), parallelism=10
    ).fit(data)
    pred = model.transform(data).cache()
    ev_acc = MulticlassClassificationEvaluator(metricName="accuracy").evaluate(pred)
    cm = (
        pred.groupBy(F.col("prediction").cast("int").alias("pc"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("prediction") == F.col("label")).cast("long")).alias(
                "nc"
            ),
        )
        .collect()
    )
    acc = sum(r["nc"] for r in cm) / sum(r["n"] for r in cm)
    pred.unpersist()
    data.unpersist()
    assert round(acc, 10) == round(ev_acc, 10)


def test_st18_one_pass_split_writes_single_file_per_bucket(spark, tmp_path):
    """The dynamic-partition one-pass split must emit exactly ONE data
    file per split value (st18's 3-epoch arithmetic depends on it)."""
    import glob
    import os

    from spark_ml_optimization_spark.sources import load_table
    from spark_ml_optimization_spark.sources.io import normalize_events_ts

    batch = normalize_events_ts(
        load_table(spark, SF_SMOKE, "events")
    ).select("event_id", "event_type")
    out = os.path.join(str(tmp_path), "src")
    batch.withColumn("m", F.col("event_id") % 6).repartition(1).write.mode(
        "overwrite"
    ).partitionBy("m").parquet(out)
    for m in range(6):
        files = glob.glob(os.path.join(out, f"m={m}", "*.parquet"))
        assert len(files) == 1, f"m={m}: {files}"


def test_sentinel_shift_instant_vintage_is_timezone_free():
    """_sentinel_shift on the tz-adjusted vintage must do instant
    arithmetic (epoch micros + h*3600e6 -> aware UTC datetime), never
    naive local wall-clock + timedelta."""
    from pyspark.sql import types as T

    from spark_ml_optimization_spark.streaming.stream_ops import _sentinel_shift

    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    mx_us = 1_700_000_000_000_000
    shifted = _sentinel_shift(mx_us, 2, schema)
    assert shifted.tzinfo is not None
    assert shifted == datetime.datetime.fromtimestamp(
        (mx_us + 2 * 3600 * 10**6) / 1e6, tz=datetime.timezone.utc
    )
    # long vintage: raw nanos
    schema_l = T.StructType([T.StructField("ts", T.LongType())])
    assert _sentinel_shift(10, 1, schema_l) == 10 + 3600 * 10**9
    # ntz vintage: naive wall-clock (both engines treat NTZ as wall time)
    schema_n = T.StructType([T.StructField("ts", T.TimestampNTZType())])
    naive = datetime.datetime(2030, 1, 1, 12, 0, 0)
    assert _sentinel_shift(naive, 3, schema_n) == naive + datetime.timedelta(
        hours=3
    )

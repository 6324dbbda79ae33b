"""Parity and semantics checks for the Python-boundary operators."""

from __future__ import annotations

from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_CORRECT


def test_apply_in_pandas_matches_window_zscore(spark):
    """Grouped-map pandas kernel ≡ window-function z-score within 1e-6."""
    win = all_queries()["q94_zscore_window"].fn(spark, SF_CORRECT).toPandas()
    pdk = all_queries()["q95_zscore_apply_in_pandas"].fn(spark, SF_CORRECT).toPandas()
    m = win.merge(pdk, on="c_custkey", suffixes=("_w", "_p"))
    assert len(m) == len(win)
    assert (m.zscore_w - m.zscore_p).abs().max() < 1e-4


def test_udtf_chunker_covers_all_tokens(spark):
    """Chunk token counts must sum to each doc's whitespace token count."""
    from pyspark.sql import functions as F

    from spark_ml_optimization_spark.sources import load_table

    chunks = all_queries()["q98_python_udtf"].fn(spark, SF_CORRECT)
    per_doc = chunks.groupBy("doc_id").agg(F.sum("n_tokens").alias("n"))
    docs = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("expected")
    )
    bad = per_doc.join(docs, "doc_id").filter(F.col("n") != F.col("expected")).count()
    assert bad == 0


def test_ewma_matches_pandas(spark):
    """q68b's distributed per-group EWMA must equal pandas ewm computed
    driver-side on the same (sorted) data."""
    from spark_ml_optimization_spark.registry import all_queries
    from spark_ml_optimization_spark.sources import load_table

    got = {
        r["user_id"]: (r["n_events"], r["last_ewma"])
        for r in all_queries()["q68b_ewma"].fn(spark, SF_CORRECT).collect()
    }
    pdf = (
        load_table(spark, SF_CORRECT, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    import pandas as pd

    for uid, grp in pdf.groupby("user_id"):
        ewma = grp["value"].ewm(alpha=0.2, adjust=False).mean()
        assert got[uid] == (len(grp), round(float(ewma.iloc[-1]), 6)), uid

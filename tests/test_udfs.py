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

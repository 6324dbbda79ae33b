"""Property tests for the similarity tier: LSH recall vs exact k-NN,
pandas-UDF numeric parity vs the Catalyst dot product."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_CORRECT


def test_ann_lsh_recall_vs_exact(spark):
    """LSH top-3 must recover ≥60% of the exact top-3 neighbor pairs
    across the 20 probes (recall of banded random projections)."""
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in all_queries()["q86_knn_join"].fn(spark, SF_CORRECT).collect()
    }
    ann = {
        (r.probe_id, r.neighbor_id)
        for r in all_queries()["q87_ann_lsh"].fn(spark, SF_CORRECT).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall:.2f}"


def test_pandas_udf_cosine_matches_catalyst(spark):
    """numpy kernel and Catalyst HOF dot product agree to the wire
    precision (q85 rounds to 6 dp, q91's oracle-hashable wire format to
    4 dp; the raw kernels differ only by ~1e-15 summation-order noise)."""
    hof = (
        all_queries()["q85_topk_cosine"].fn(spark, SF_CORRECT).select("vec_id", "score").toPandas()
    )
    udf = all_queries()["q91_cosine_pandas_udf"].fn(spark, SF_CORRECT).toPandas()
    merged = hof.merge(udf, on="vec_id", suffixes=("_hof", "_udf"))
    assert len(merged) == len(hof)
    assert (merged.score_hof - merged.score_udf).abs().max() < 5.1e-5


def test_ivf_recall_vs_exact(spark):
    """IVF with nProbe=4/16 must recover ≥50% of exact top-3 pairs
    (coarse quantization trades recall for the partition-pruning read)."""
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in all_queries()["q86_knn_join"].fn(spark, SF_CORRECT).collect()
    }
    ivf = {
        (r.probe_id, r.neighbor_id)
        for r in all_queries()["q92_ann_ivf"].fn(spark, SF_CORRECT).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_kmeans_covers_all_vectors(spark):
    df = all_queries()["q90_kmeans_clusters"].fn(spark, SF_CORRECT)
    total = df.agg(F.sum("n")).collect()[0][0]
    assert total == 500


def test_pq_recall_vs_exact(spark):
    """PQ-ADC shortlist (top-32) + exact re-rank must recover most exact
    top-3 pairs — the shortlist only needs the true neighbors inside the
    top-32 by approximate score; the exact re-rank then orders them
    correctly (floor set below the measured recall with margin)."""
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in all_queries()["q86_knn_join"].fn(spark, SF_CORRECT).collect()
    }
    pq = {
        (r.probe_id, r.neighbor_id)
        for r in all_queries()["q92b_ann_pq"].fn(spark, SF_CORRECT).collect()
    }
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.5, f"PQ recall too low: {recall:.2f}"

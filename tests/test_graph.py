"""PageRank (q84) invariants: determinism and damping-sum conservation."""

from pyspark.sql import functions as F

from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_CORRECT


def test_pagerank_deterministic_and_positive(spark):
    q = all_queries()["q84_pagerank"].fn
    a = [tuple(r) for r in q(spark, SF_CORRECT).collect()]
    b = [tuple(r) for r in q(spark, SF_CORRECT).collect()]
    assert a == b
    assert len(a) == 25
    assert all(r[2] > 0 for r in a)
    # ranks sorted descending, deterministic tiebreak
    ranks = [r[2] for r in a]
    assert ranks == sorted(ranks, reverse=True)
    # customers receive inbound mass from suppliers; in a bipartite
    # supplier->customer graph every supplier is a source with rank 1-d
    suppliers = [r for r in a if r[1] == "supplier"]
    assert not suppliers or all(abs(r[2] - 0.15) < 1e-6 for r in suppliers)

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


def test_triangle_count_star_graph_is_zero_not_null(tmp_path, spark):
    """Round-9 advice #2: a triangle-free graph whose every oriented
    target is a sink (a star — the hub out-ranks every leaf by degree,
    so all edges orient leaf->hub and the hub never appears as an
    adjacency source) left the intersection join empty and sum(k)
    NULL; the oracle's join-path count is 0.  Three orders sharing
    part 1 with parts 2/3/4 build exactly that star."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(1, 1), (1, 2), (2, 1), (2, 3), (3, 1), (3, 4)]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = all_queries()["q84b_triangle_count"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_triangles"] == 0  # was NULL before the coalesce
    assert r["n_nodes"] == 4 and r["n_edges"] == 3 and r["n_wedges"] == 3
    assert r["global_clustering"] == 0.0


def _toy_edges(spark):
    # 1->2, 2->3, 1->3 (closed triad) and 3->4 (dangling)
    return spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
    )


def test_motif_find_unification_and_negation(spark):
    from spark_ml_optimization_spark.operators.motif import motif_find

    e = _toy_edges(spark)
    closed = motif_find(e, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
    assert sorted(closed.columns) == ["a", "b", "c"]
    assert [tuple(r) for r in closed.collect()] == [(1, 2, 3)]
    open_t = motif_find(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    got = sorted(tuple(r) for r in open_t.collect())
    # wedges: (1,2,3) closed; (2,3,4) and (1,3,4) open
    assert got == [(1, 3, 4), (2, 3, 4)]
    # repeated variable unifies: self-loop pattern matches nothing here
    assert motif_find(e, "(a)-[]->(a)").count() == 0


def test_motif_find_rejects_bad_patterns(spark):
    import pytest

    from spark_ml_optimization_spark.operators.motif import motif_find

    e = _toy_edges(spark)
    with pytest.raises(ValueError, match="disconnected"):
        motif_find(e, "(a)-[]->(b); (c)-[]->(d)")
    with pytest.raises(ValueError, match="unbound"):
        motif_find(e, "(a)-[]->(b); !(a)-[]->(z)")
    with pytest.raises(ValueError, match="unparseable"):
        motif_find(e, "(a)-[e]->(b")
    with pytest.raises(ValueError, match="positive"):
        motif_find(e, "!(a)-[]->(b)")

"""Ground-truth dedup checks against FIXTURES.md's measured planted
duplicates: sf0.1 documents has 5,000 rows / 4,992 distinct texts
(8 dup pairs); sf0.01 has none."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_BENCH, SF_CORRECT


def test_exact_dedup_finds_planted_dups(spark):
    q = all_queries()["q70_exact_dedup"]
    df = q.fn(spark, SF_BENCH)
    dups = df.filter(F.col("n_copies") > 1)
    total_rows = df.agg(F.sum("n_copies")).collect()[0][0]
    n_groups = df.count()
    assert total_rows == 5000
    assert n_groups == 4992
    assert dups.count() == 8
    # survivors keep exactly the distinct-text count
    surv = all_queries()["q71_dedup_keep_first"].fn(spark, SF_BENCH)
    assert surv.count() == 4992


def test_no_dups_at_correctness_scale(spark):
    df = all_queries()["q70_exact_dedup"].fn(spark, SF_CORRECT)
    assert df.filter(F.col("n_copies") > 1).count() == 0


def test_minhash_recall_on_planted_dups(spark):
    """Exact duplicates have Jaccard distance 0 — LSH with any banding
    must recall all 8 planted pairs at sf0.1."""
    pairs = all_queries()["q72_minhash_lsh_neardup"].fn(spark, SF_BENCH)
    exact = pairs.filter(F.col("jaccard_dist") == 0.0).count()
    assert exact >= 8


def test_custom_banded_minhash_recalls_planted_dups(spark):
    """q72b (pure-DataFrame banded MinHash) must contain every planted
    exact-dup pair — identical texts share all 16 min-hashes, so every
    band collides and est_jaccard = 1.0."""
    from spark_ml_optimization_spark.sources import load_table

    docs = load_table(spark, SF_BENCH, "documents")
    dup_pairs = {
        (r.a, r.b)
        for r in docs.alias("x")
        .join(docs.alias("y"), (F.col("x.text") == F.col("y.text")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .collect()
    }
    assert len(dup_pairs) == 8
    got = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["q72b_minhash_banded_custom"].fn(spark, SF_BENCH).collect()
    }
    assert dup_pairs <= got


def test_simhash_deterministic_and_dup_invariant(spark):
    """Identical texts → identical simhash; two runs → identical output."""
    sim = all_queries()["q73_simhash"].fn(spark, SF_CORRECT).toPandas()
    sim2 = all_queries()["q73_simhash"].fn(spark, SF_CORRECT).toPandas()
    assert sim.sort_values("doc_id").reset_index(drop=True).equals(
        sim2.sort_values("doc_id").reset_index(drop=True)
    )


def test_simhash_arrow_matches_pandas_kernel(spark):
    """q73b (mapInArrow) must produce bit-identical signatures to q73
    (mapInPandas) — same hash, different transport."""
    from spark_ml_optimization_spark.registry import all_queries

    a = {
        r["doc_id"]: r["simhash"]
        for r in all_queries()["q73_simhash"].fn(spark, SF_CORRECT).collect()
    }
    b = {
        r["doc_id"]: r["simhash"]
        for r in all_queries()["q73b_simhash_arrow"].fn(spark, SF_CORRECT).collect()
    }
    assert a == b and len(a) == 500

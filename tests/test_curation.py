"""Ground-truth invariants for the curation operators beyond the oracle
hash-match: sketch accuracy, packing budget conservation, sampler
determinism under re-partitioning."""

from __future__ import annotations

from spark_ml_optimization_spark import registry

from .conftest import SF_CORRECT

_Q = registry.all_queries()


def test_hll_estimate_within_5pct(spark):
    rows = _Q["qc07_hll_sketch_union"].fn(spark, SF_CORRECT).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.exact_users > 0
        assert r.rel_err <= 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_packing_conserves_tokens_and_ids_contiguous(spark):
    packed = _Q["qc04_token_budget_pack"].fn(spark, SF_CORRECT).collect()
    from pyspark.sql import functions as F

    from spark_ml_optimization_spark.sources import load_table

    d = load_table(spark, SF_CORRECT, "documents")
    truth = {
        r.lang: r.total
        for r in d.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
        .collect()
    }
    by_lang: dict[str, list] = {}
    for r in packed:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(truth)
    for lang, rows in by_lang.items():
        assert sum(r.seq_tokens for r in rows) == truth[lang]
        ids = sorted(r.seq_id for r in rows)
        assert ids == list(range(len(ids))), f"{lang}: seq ids not contiguous"


def test_samplers_deterministic_under_repartition(spark):
    """Hash samplers must return the identical id set regardless of input
    partitioning — the reproducibility contract rand()-based sampling
    can't give."""
    from pyspark.sql import functions as F

    from spark_ml_optimization_spark.sources import load_table

    base = {r.doc_id for r in _Q["qc03_hash_mod_sample"].fn(spark, SF_CORRECT).collect()}
    d = load_table(spark, SF_CORRECT, "documents").repartition(7, "source")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    again = {
        r.doc_id
        for r in d.select("doc_id", bucket.alias("b")).filter(F.col("b") < "2").collect()
    }
    assert base == again
    frac = len(base) / d.count()
    assert 0.05 < frac < 0.25, frac  # ~12.5% expected

    strat = _Q["qc02_stratified_sample"].fn(spark, SF_CORRECT).collect()
    per_lang: dict[str, int] = {}
    for r in strat:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert all(v == 20 for v in per_lang.values()), per_lang


def test_decontaminate_excludes_benchmark_source(spark):
    rows = _Q["qc01_ngram_decontaminate"].fn(spark, SF_CORRECT).collect()
    assert rows
    from spark_ml_optimization_spark.sources import load_table

    src = {
        r.doc_id: r.source
        for r in load_table(spark, SF_CORRECT, "documents").select("doc_id", "source").collect()
    }
    assert all(src[r.doc_id] != "src0" for r in rows)
    assert all(r.n_shared_grams >= 1 for r in rows)


def test_overflow_packing_law(spark):
    """qc44's defining law: within each language, every sequence holds
    exactly B tokens except the last (which holds total % B, unless the
    total divides evenly), and sequence ids are dense from 0."""
    from spark_ml_optimization_spark.operators.curation import (
        _OVERFLOW_BUDGET as B,
    )
    from spark_ml_optimization_spark.registry import all_queries

    from .conftest import SF_CORRECT

    rows = (
        all_queries()["qc44_overflow_packing"]
        .fn(spark, SF_CORRECT)
        .collect()
    )
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["seq_id"])
        ids = [r["seq_id"] for r in rs]
        assert ids == list(range(len(ids))), f"{lang}: sparse seq ids"
        total = sum(r["seq_tokens"] for r in rs)
        for r in rs[:-1]:
            assert r["seq_tokens"] == B, (lang, r["seq_id"], r["seq_tokens"])
        last = rs[-1]["seq_tokens"]
        assert last == (total % B or B), (lang, last, total)


def test_hamilton_quota_laws(spark):
    """Largest-remainder apportionment laws on the shared helper:
    quotas sum to min(B, N); every quota within 1 of true
    proportionality; quota never exceeds availability."""
    from spark_ml_optimization_spark.operators.curation import hamilton_quota

    counts = spark.createDataFrame(
        [("a", 7), ("b", 13), ("c", 1), ("d", 29), ("e", 50)],
        "lang string, n_docs long",
    )
    for budget in (1, 3, 10, 37, 99, 100, 250):
        rows = hamilton_quota(counts, budget).collect()
        n = sum(r["n_docs"] for r in rows)
        beff = min(budget, n)
        assert sum(r["quota"] for r in rows) == beff
        for r in rows:
            exact = beff * r["n_docs"] / n
            assert abs(r["quota"] - exact) < 1.0 + 1e-9, (budget, r)
            assert r["quota"] <= r["n_docs"] or beff == n

"""The user-facing api module exercised on hand-built DataFrames —
the 'switch to this engine' surface, independent of the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_optimization_spark import api


def test_exact_dedup_and_groups(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "different text")],
        "id long, body string",
    )
    surv = api.exact_dedup(df, "body", "id")
    assert {r.id for r in surv.collect()} == {1, 3}
    groups = api.dup_groups(df, "body", "id")
    assert {(r.keep_id, r.n_copies) for r in groups.collect()} == {(1, 2), (3, 1)}


def test_minhash_pairs_on_synthetic_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base) for i in range(3)] + [
        (10, "completely unrelated words about spark sql engines and shuffles here"),
    ]
    df = spark.createDataFrame(rows, "id long, body string")
    pairs = api.minhash_neardup_pairs(df, "id", "body")
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_sessionize_generic(spark):
    df = spark.createDataFrame(
        [(7, 1, 0), (7, 2, 50), (7, 3, 500)], "u long, eid long, t long"
    )
    out = api.sessionize(df, "u", "t", "eid", gap_micros=100)
    sids = {r.eid: r.session_id for r in out.collect()}
    assert sids == {1: 1, 2: 1, 3: 2}


def test_topk_similar_generic(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])],
        "id long, v array<double>",
    )
    query = spark.createDataFrame([([1.0, 0.0],)], "qvec array<double>")
    top = api.topk_similar(corpus, "id", "v", query, k=2).collect()
    assert [r.id for r in top] == [1, 3]


def test_quality_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten eleven", 56)],
        "id long, body string, n long",
    )
    q = api.quality_signals(df, "body", "n").collect()[0]
    assert q.n_tokens == 11 and bool(q.passes_quality)
    f1 = api.fingerprint(df, "body").collect()[0].fingerprint
    df2 = spark.createDataFrame(
        [(2, "  one two three four five six seven eight nine ten   eleven ", 60)],
        "id long, body string, n long",
    )
    f2 = api.fingerprint(df2, "body").collect()[0].fingerprint
    assert f1 == f2  # whitespace-normalized canonical form


def test_decontaminate_generic(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"),
            (3, "iota kappa lambda mu"),
        ],
        "id long, body string",
    )
    bench = spark.createDataFrame(
        [(100, "zzz epsilon zeta eta yyy")], "id long, body string"
    )
    clean = api.decontaminate(corpus, bench, "body", "id", n=3)
    assert {r.id for r in clean.collect()} == {1, 3}


def test_samplers_generic(spark):
    df = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in range(90)], "id long, stratum string"
    )
    strat = api.stratified_sample(df, "stratum", "id", k=5)
    per = {}
    for r in strat.collect():
        per[r.stratum] = per.get(r.stratum, 0) + 1
    assert per == {"s0": 5, "s1": 5, "s2": 5}

    kept = api.hash_sample(df, "id", buckets_kept=2).collect()
    again = api.hash_sample(df.repartition(5), "id", buckets_kept=2).collect()
    assert {r.id for r in kept} == {r.id for r in again}
    assert 0 < len(kept) < 90


def test_pack_sequences_generic(spark):
    df = spark.createDataFrame(
        [("g", i, 40) for i in range(10)], "g string, pos long, toks long"
    )
    out = api.pack_sequences(df, "g", "pos", "toks", budget=100)
    seqs = {r.pos: r.seq_id for r in out.collect()}
    # 40-token rows into 100-token bins: cum_before 0,40,80,120,...
    assert seqs == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_repetition_signals_generic(spark):
    df = spark.createDataFrame([(1, "a a a b")], "id long, body string")
    r = api.repetition_signals(df, "body").collect()[0]
    assert r.n_tokens == 4 and r.top_freq == 3
    assert abs(r.rep_ratio - 0.75) < 1e-9 and abs(r.ttr - 0.5) < 1e-9


def test_gap_fill_ffill_generic(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1), 10.0),
            ("a", dt.date(2024, 1, 4), 40.0),
            ("b", dt.date(2024, 1, 2), 5.0),
        ],
        "k string, day date, v double",
    )
    out = api.gap_fill_ffill(df, "k", "day", ["v"]).collect()
    rows = {(r.k, r.day.isoformat()): (r.v, r.v_ffill) for r in out}
    assert len(rows) == 8  # 2 keys x 4-day span
    assert rows[("a", "2024-01-02")] == (0.0, 10.0)
    assert rows[("a", "2024-01-03")] == (0.0, 10.0)
    assert rows[("a", "2024-01-04")] == (40.0, 40.0)
    assert rows[("b", "2024-01-01")] == (0.0, 0.0)  # before first obs
    assert rows[("b", "2024-01-03")] == (0.0, 5.0)


def test_decontaminate_survives_short_docs(spark):
    """Docs shorter than n tokens must yield zero grams, not a slice()
    crash (sequence descends through 0 when size < n)."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "x"), (3, "one two three four five six seven "
                                          "eight nine ten eleven twelve thirteen")],
        "id long, body string",
    )
    bench = spark.createDataFrame([(9, "tiny doc")], "id long, body string")
    clean = api.decontaminate(corpus, bench, "body", "id")  # default n=13
    assert {r.id for r in clean.collect()} == {1, 2, 3}


def test_hash_sample_rejects_bucket_overflow(spark):
    df = spark.createDataFrame([(1,)], "id long")
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        api.hash_sample(df, "id", buckets_kept=16)
    with _pytest.raises(AssertionError):
        api.hash_sample(df, "id", buckets_kept=0)


def test_cohort_retention_generic(spark):
    import datetime as dt

    w0, w1 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    df = spark.createDataFrame(
        [("a", w0), ("a", w1), ("b", w0), ("c", w1), ("a", w0)],
        "u string, wk date",
    )
    rows = {(r.cohort_week.isoformat(), r.week_offset): (r.n_active, r.n_cohort, r.retention)
            for r in api.cohort_retention(df, "u", "wk").collect()}
    assert rows == {
        ("2024-01-01", 0): (2, 2, 1.0),   # a, b in week 0
        ("2024-01-01", 1): (1, 2, 0.5),   # only a returns
        ("2024-01-08", 0): (1, 1, 1.0),   # c's cohort
    }


def test_salted_join_equals_plain_join_property(spark):
    """Property: api.salted_join is bit-identical to the plain inner
    join for arbitrary data, including duplicate and absent keys."""
    from spark_ml_optimization_spark.api import salted_join

    big = spark.createDataFrame(
        [(i % 7, f"v{i}") for i in range(500)] + [(99, "orphan")],
        ["k", "payload"],
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(5)] + [(3, "dup_dim")],
        ["sk", "dim"],
    )
    got = sorted(
        map(tuple, salted_join(big, small, "k", "sk", n_salts=4).collect())
    )
    want = sorted(map(tuple, big.join(small, big.k == small.sk).collect()))
    assert got == want and len(got) > 0


def test_priority_sample_generic(spark):
    """k rows out, deterministic across runs, HT estimates >= weights,
    and the HT sum is within a loose unbiasedness band of the total."""
    from spark_ml_optimization_spark import api

    df = spark.range(1, 2001).select(
        F.col("id"), (F.col("id") % 97 + 1.0).alias("w")
    )
    s1 = api.priority_sample(df, "w", "id", k=25).orderBy("id").collect()
    s2 = api.priority_sample(df, "w", "id", k=25).orderBy("id").collect()
    assert [r["id"] for r in s1] == [r["id"] for r in s2]  # deterministic
    assert len(s1) == 25
    assert all(r["ht_estimate"] >= r["w"] for r in s1)
    assert all(r["priority"] >= r["w"] for r in s1)  # q = w/u, u <= 1
    total = df.agg(F.sum("w")).collect()[0][0]
    ht_sum = sum(r["ht_estimate"] for r in s1)
    assert 0.3 * total < ht_sum < 3.0 * total  # loose HT sanity band


def test_priority_sample_small_input_keeps_all(spark):
    """DLT edge: n <= k means NO (k+1)-th priority exists — the sample
    is ALL rows with ht_estimate = w exactly (code-review finding:
    the tau cut used to silently drop the minimum-priority row)."""
    from spark_ml_optimization_spark import api

    df = spark.range(1, 11).select(
        F.col("id"), (F.col("id") * 1.5).alias("w")
    )
    out = api.priority_sample(df, "w", "id", k=20).collect()
    assert len(out) == 10  # every row kept
    assert all(r["ht_estimate"] == r["w"] for r in out)


def test_priority_sample_all_ties_still_returns_k(spark):
    """Round-8 advice pin: when EVERY priority ties at tau (weights
    engineered as w = C * u so q = C for all rows), the old strict
    `priority > tau` cut returned ZERO rows; the rank-based tie break
    must return exactly k — the k smallest ids, per the documented
    (priority DESC, id ASC) order."""
    import hashlib

    from spark_ml_optimization_spark import api

    def u16(i):
        h = hashlib.md5(f"ps:{i}".encode()).hexdigest()[:4]
        return (int(h, 16) + 1) / 65536.0

    C = 100.0
    rows = [(i, C * u16(i)) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = api.priority_sample(df, "w", "id", k=7).orderBy("id").collect()
    assert len(out) == 7, [r["id"] for r in out]
    assert [r["id"] for r in out] == list(range(1, 8))
    # tau equals every priority, so ht = max(w, tau) = tau for all
    assert all(abs(r["priority"] - C) < 1e-9 for r in out)


def test_k_anonymity_report_generic(spark):
    from spark_ml_optimization_spark import api

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", 1, 30), ("b", 2, 10),
         ("b", 2, 10), ("c", 3, 10)],
        "qi1 string, qi2 long, sens long",
    )
    rep = {
        (r["qi1"], r["qi2"]): r
        for r in api.k_anonymity_report(
            df, ["qi1", "qi2"], "sens", k=3, l=2
        ).collect()
    }
    assert rep[("a", 1)]["group_size"] == 3
    assert not rep[("a", 1)]["k_risky"] and not rep[("a", 1)]["l_risky"]
    assert rep[("b", 2)]["k_risky"] and rep[("b", 2)]["l_risky"]
    assert rep[("c", 3)]["group_size"] == 1


def test_pareto_frontier_generic(spark):
    """Hand-built case with dominated rows, an equal-price smaller-size
    dominator, and an exact-duplicate pair (both survive: no strict
    edge)."""
    from spark_ml_optimization_spark import api

    rows = [
        ("g", 1, 10, "keep-cheapest"),
        ("g", 2, 5, "keep-knee"),
        ("g", 3, 5, "dominated-by-knee"),
        ("g", 2, 7, "dominated-same-price"),
        ("g", 4, 1, "keep-smallest"),
        ("g", 4, 1, "keep-duplicate-twin"),
        ("h", 9, 9, "keep-other-group"),
    ]
    df = spark.createDataFrame(rows, "grp string, price long, size long, tag string")
    got = {
        r["tag"]
        for r in api.pareto_frontier(df, "grp", ["price", "size"]).collect()
    }
    assert got == {
        "keep-cheapest",
        "keep-knee",
        "keep-smallest",
        "keep-duplicate-twin",
        "keep-other-group",
    }

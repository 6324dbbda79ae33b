"""Property-based differential tests: curation API operators vs pure-
Python references on random inputs (hypothesis; bounded examples since
each runs a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # doc_id (dups allowed)
        st.sampled_from(["aa bb", "aa bb", "cc dd ee", "ff", "gg hh ii jj"]),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs_strategy)
def test_exact_dedup_survivorship_property(spark_session_holder, data):
    """exact_dedup keeps exactly one row per distinct text — the one
    with the minimum id — for arbitrary inputs."""
    from spark_ml_optimization_spark.api import exact_dedup

    spark = spark_session_holder
    df = spark.createDataFrame(data, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["text"]) for r in exact_dedup(df, "text", "doc_id").collect()
    }
    want = {}
    for doc_id, text in data:
        if text not in want or doc_id < want[text]:
            want[text] = doc_id
    assert got == {(i, t) for t, i in want.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # doc_id
            st.integers(min_value=1, max_value=120),  # n_tokens
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_pack_sequences_budget_property(spark_session_holder, data):
    """pack_sequences contract: per group (one here), rows stream in
    order_col order and each row's seq_id is floor(cumulative tokens
    BEFORE it / budget) — no document lost, ids monotone in order."""
    from spark_ml_optimization_spark.api import pack_sequences

    spark = spark_session_holder
    budget = 64
    df = spark.createDataFrame(data, ["doc_id", "n_tokens"]).withColumn(
        "grp", F.lit(0)
    )
    rows = pack_sequences(df, "grp", "doc_id", "n_tokens", budget).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(d for d, _ in data)
    got = {r["doc_id"]: r["seq_id"] for r in rows}
    cum = 0
    last = -1
    for doc_id, n_tokens in sorted(data):
        want = cum // budget
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
        assert want >= last  # seq ids monotone in pack order
        last = want
        cum += n_tokens

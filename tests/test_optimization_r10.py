"""Focused tests for round-10 optimization internals.

Each test pins the equivalence argument an optimization relies on,
independent of the DuckDB oracle runs that verified the end results:

- q68b's mapInPandas kernel must survive a user being SPLIT across
  Arrow batches (the boundary-carry logic) — forced here with a tiny
  maxRecordsPerBatch.
- _pmh_sig_banded must return identical relations with and without the
  opt-in signature checkpoint (qc39 opts in; everyone else stays lazy).
- api.shingles / api.word_grams lambda-binding must be value-identical
  to the naive Python n-gram construction.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_ml_optimization_spark import api
from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_SMOKE


def test_q68b_user_split_across_arrow_batches(spark):
    """Force Arrow batches far smaller than a user's row count: the
    boundary-user carry must keep every recurrence intact, matching
    pandas ewm computed per user on the driver."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "3")  # users below have 7 rows -> 3+ batches
        fn = all_queries()["q68b_ewma"].fn
        got = {
            int(r["user_id"]): (int(r["n_events"]), float(r["last_ewma"]))
            for r in fn(spark, SF_SMOKE).collect()
        }
    finally:
        spark.conf.set(key, prev)
    import duckdb

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, ts, event_id, value FROM "
        f"'{SF_SMOKE}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchdf()
    for uid, grp in ev.groupby("user_id", sort=False):
        ewma = grp["value"].ewm(alpha=0.2, adjust=False).mean()
        exp = (len(grp), round(float(ewma.iloc[-1]), 6))
        assert got[int(uid)] == exp, f"user {uid}: {got[int(uid)]} != {exp}"
    assert len(got) == ev["user_id"].nunique()


def test_pmh_checkpoint_param_equivalence(spark):
    from spark_ml_optimization_spark.operators.dedup import _pmh_sig_banded

    _, sig_lazy, banded_lazy = _pmh_sig_banded(spark, SF_SMOKE)
    _, sig_ck, banded_ck = _pmh_sig_banded(
        spark, SF_SMOKE, checkpoint_sig=True
    )
    assert sorted(map(tuple, sig_lazy.collect())) == sorted(
        map(tuple, sig_ck.collect())
    )
    assert sorted(map(tuple, banded_lazy.collect())) == sorted(
        map(tuple, banded_ck.collect())
    )


@pytest.mark.parametrize("n", [2, 3])
def test_bound_token_grams_match_naive(spark, n):
    rows = [
        (1, "a b c d e"),
        (2, "one two"),
        (3, ""),
        (4, "x"),
        (5, "p q p q p"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got_sh = {
        r["id"]: list(r["g"])
        for r in df.select("id", api.shingles("text", n).alias("g")).collect()
    }
    got_wg = {
        r["id"]: list(r["g"])
        for r in df.select(
            "id", api.word_grams(F.split("text", " "), n).alias("g")
        ).collect()
    }
    for i, text in rows:
        toks = text.split(" ")
        if len(toks) >= n:
            grams = [
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            ]
            sh = list(dict.fromkeys(
                "_".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            ))
        else:
            grams, sh = [], []
        assert got_wg[i] == grams, f"word_grams id={i}"
        assert got_sh[i] == sh, f"shingles id={i}"

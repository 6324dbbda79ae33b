"""Python-boundary operator surface: vectorized pandas UDFs (scalar +
grouped-agg), applyInPandas grouped-map, and a Python UDTF.

SURVEY.md §2.8.  Rules of engagement (SNIPPETS.md retrieved idioms):
- every Python crossing is Arrow-batched (pandas_udf / applyInPandas /
  mapInPandas / udtf) — never row-at-a-time F.udf;
- Python kernels are the slow path by construction, so each operator here
  also names its pure-Catalyst twin where one exists (q94 ↔ q95), and
  unit tests assert numeric agreement;
- outputs are rows-only checked (float reductions in numpy use pairwise
  summation — deliberately not hash-matched against sequential-order SQL).
"""

from __future__ import annotations

import pandas as pd

# module-level so string annotations (from __future__ import annotations)
# resolve when pandas_udf infers the Iterator[pd.Series] eval type
from typing import Iterator  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q94_zscore_window",
    oracle="""
        SELECT
            c_custkey,
            c_nationkey,
            round((c_acctbal - avg(c_acctbal) OVER w)
                  / stddev_samp(c_acctbal) OVER w, 5) AS zscore
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey)
    """,
    doc="Per-nation z-score via window aggregates — the pure-Catalyst "
    "twin of q95's pandas kernel (shared semantics, hash-verified here).",
)
def q94_zscore_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey")
    z = (F.col("c_acctbal") - F.avg("c_acctbal").over(w)) / F.stddev_samp("c_acctbal").over(w)
    return c.select("c_custkey", "c_nationkey", F.round(z, 5).alias("zscore"))


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["c_acctbal"].mean()
    std = pdf["c_acctbal"].std(ddof=1)
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "c_nationkey": pdf["c_nationkey"],
            "zscore": (pdf["c_acctbal"] - mean) / std,
        }
    )


@register(
    "q95_zscore_apply_in_pandas",
    oracle="""
        SELECT
            c_custkey,
            c_nationkey,
            round((c_acctbal - avg(c_acctbal) OVER w)
                  / stddev_samp(c_acctbal) OVER w, 5) AS zscore
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey)
    """,
    doc="Per-nation z-score via groupBy().applyInPandas: each nation's "
    "rows arrive as one pandas DataFrame (Arrow), the kernel returns the "
    "normalized frame.  The grouped-map escape hatch for per-group logic "
    "Catalyst can't express (per-group model fits etc.).  Oracle is q94's "
    "SQL: numpy's pairwise-summation mean/std agrees with sequential SQL "
    "sums to ~1e-12 at fixture group sizes, and the final round-to-5 is "
    "applied Spark-side (same F.round path q94 hash-verifies).",
)
def q95_zscore_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    normalized = c.groupBy("c_nationkey").applyInPandas(
        _zscore_group, schema="c_custkey long, c_nationkey int, zscore double"
    )
    return normalized.select(
        "c_custkey", "c_nationkey", F.round("zscore", 5).alias("zscore")
    )


@register(
    "q96_grouped_agg_pandas_udf",
    oracle="""
        WITH bounds AS (
            SELECT event_type,
                   quantile_cont(value, 0.1) AS lo,
                   quantile_cont(value, 0.9) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               round(avg(e.value) FILTER (e.value BETWEEN b.lo AND b.hi), 4)
                   AS trimmed_mean_value,
               count(*) AS n_events
        FROM events e JOIN bounds b USING (event_type)
        GROUP BY e.event_type
    """,
    doc="Custom UDAF via a GROUPED_AGG pandas UDF: 10%-trimmed mean of "
    "event value per event_type (robust-statistics aggregate Spark "
    "lacks natively).  Oracle: pandas Series.quantile and DuckDB "
    "quantile_cont share the linear-interpolation definition, so the "
    "trim bounds agree bitwise; the filtered mean is rounded to 4 dp.",
)
def q96_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        lo, hi = v.quantile(0.1), v.quantile(0.9)
        clipped = v[(v >= lo) & (v <= hi)]
        return float(clipped.mean()) if len(clipped) else float("nan")

    e = load_table(spark, sf_dir, "events")
    # GROUPED_AGG pandas UDFs can't mix with built-in aggregates in one
    # agg() — compute each and join on the group key.
    trimmed = e.groupBy("event_type").agg(
        F.round(trimmed_mean("value"), 4).alias("trimmed_mean_value")
    )
    counts = e.groupBy("event_type").agg(F.count("*").alias("n_events"))
    return trimmed.join(counts, "event_type")


@register(
    "q97_scalar_pandas_udf",
    oracle="""
        SELECT
            doc_id,
            round(1.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE) - 300.0) / 100.0)), 6)
                AS length_sigmoid
        FROM documents
    """,
    doc="Scalar vectorized pandas UDF (Series→Series sigmoid): element-"
    "wise float math is order-independent, so this one IS hash-matched — "
    "demonstrating pandas-UDF numeric parity with SQL engines.",
)
def q97_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def length_sigmoid(n_chars: pd.Series) -> pd.Series:
        x = (n_chars.astype("float64") - 300.0) / 100.0
        return 1.0 / (1.0 + np.exp(-x))

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(length_sigmoid("n_chars"), 6).alias("length_sigmoid"))


@register(
    "q99_registered_sql_udf",
    oracle="""
        SELECT doc_id, n_chars * 2 + length(lang) AS score
        FROM documents WHERE doc_id < 200
    """,
    doc="spark.udf.register surface: a Python UDF callable from SQL "
    "text.  Deliberately trivial and integer-only (hash-matchable), and "
    "deliberately the LAST-resort shape — Catalyst can't see through it "
    "(no pushdown/codegen), which is why the engine keeps registered "
    "UDFs off every hot path.",
)
def q99_registered_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    def doc_score(n_chars: int, lang: str) -> int:
        return n_chars * 2 + len(lang)

    spark.udf.register("doc_score", doc_score, T.LongType())
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT doc_id, doc_score(n_chars, lang) AS score FROM documents WHERE doc_id < 200"
    )


@register(
    "q98_python_udtf",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        )
        SELECT
            toks.doc_id,
            CAST(g.chunk_idx AS INT) AS chunk_idx,
            CAST(least(40, len(t) - g.chunk_idx * 40) AS INT) AS n_tokens,
            array_to_string(t[g.chunk_idx * 40 + 1 : g.chunk_idx * 40 + 3], ' ')
                AS head
        FROM toks, LATERAL unnest(
            generate_series(0, CAST(ceil(len(t) / 40.0) AS BIGINT) - 1)
        ) AS g(chunk_idx)
    """,
    doc="Python UDTF (Spark ≥3.5): chunk each document into ≤40-token "
    "windows, one output row per chunk, via LATERAL join in SQL — the "
    "table-function surface (tokenizer/chunker shape for LLM pipelines). "
    "Oracle re-derives the chunk grid with generate_series over the "
    "token-count (fixture text is single-space separated, verified — "
    "Python str.split() ≡ string_split(text, ' ')).",
)
def q98_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, head string")
    class Chunker:
        def eval(self, text: str):
            toks = text.split()
            for i in range(0, len(toks), 40):
                chunk = toks[i : i + 40]
                yield i // 40, len(chunk), " ".join(chunk[:3])

    spark.udtf.register("doc_chunker", Chunker)
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.head
        FROM documents d, LATERAL doc_chunker(d.text) AS c
        """
    )


@register(
    "q98b_polymorphic_udtf",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
        )
        SELECT doc_id,
               CAST(g.i AS INT) AS gram_idx,
               array_to_string(t[g.i + 1 : g.i + 2], '_') AS gram
        FROM toks, LATERAL unnest(
            generate_series(0, CAST(len(t) AS BIGINT) - 2)
        ) AS g(i)
        WHERE lang = 'en'
    """,
    doc="Polymorphic Python UDTF (Spark 4 static analyze()): the output "
    "schema is computed at ANALYSIS time from the literal n argument — "
    "one registered function serves any n-gram width with a properly "
    "typed schema, the metaprogramming surface a generic text toolkit "
    "needs.  Here n=2: one row per bigram position.  Oracle re-derives "
    "the bigram grid with generate_series (single-space fixture text "
    "verified).",
)
def q98b_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            return AnalyzeResult(
                StructType()
                .add("gram_idx", IntegerType())
                .add("gram" if width > 1 else "token", StringType())
            )

        def eval(self, text: str, n: int):
            # split(' '), not split(): must mirror the oracle's
            # string_split(text, ' ') exactly (empties kept) so parity
            # survives a fixture vintage with irregular whitespace.
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield i, "_".join(toks[i : i + n])

    spark.udtf.register("ngrams_udtf", udtf(NGrams))
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, g.gram_idx, g.gram
        FROM documents d, LATERAL ngrams_udtf(d.text, 2) AS g
        WHERE d.lang = 'en'
        """
    )


def _ols_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group closed-form OLS (y = a·x + b) in numpy — the grouped
    model-fit kernel shape.  Moments accumulate in float64; parity with
    the regr_* SQL aggregates holds to ~1e-10 relative at fixture group
    sizes, and rounding to 5 dp happens Spark-side (same path q95
    hash-verifies for z-scores)."""
    import numpy as np

    x = pdf["l_quantity"].to_numpy(dtype=np.float64)
    y = pdf["l_extendedprice"].to_numpy(dtype=np.float64)
    n = len(x)
    xm, ym = x.mean(), y.mean()
    cov = ((x - xm) * (y - ym)).sum()
    var = ((x - xm) ** 2).sum()
    slope = cov / var
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n": [n],
            "slope": [slope],
            "intercept": [ym - slope * xm],
        }
    )


@register(
    "q95b_grouped_ols_pandas",
    oracle="""
        SELECT
            l_returnflag,
            regr_count(l_extendedprice, l_quantity) AS n,
            round(regr_slope(l_extendedprice, l_quantity), 5) AS slope,
            round(regr_intercept(l_extendedprice, l_quantity), 5) AS intercept
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Per-group MODEL FIT via applyInPandas: each group's rows stream "
    "to one Arrow batch and a numpy closed-form OLS returns one "
    "(slope, intercept) row — the grouped-map estimator shape "
    "(per-entity forecasting models, per-segment calibration).  "
    "Hash-verified against the regr_* aggregate family (q20c's oracle), "
    "which is the rare case of an exactly SQL-checkable grouped model "
    "fit.  Scale: the shuffle carries only the two feature columns; a "
    "group must fit one task's Arrow batch — for billion-row groups use "
    "the q20c moment-aggregate form instead (same answer, no "
    "per-group materialization).",
)
def q95b_grouped_ols_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    fitted = li.groupBy("l_returnflag").applyInPandas(
        _ols_group, schema="l_returnflag string, n long, slope double, intercept double"
    )
    return fitted.select(
        "l_returnflag",
        "n",
        F.round("slope", 5).alias("slope"),
        F.round("intercept", 5).alias("intercept"),
    )


def _minmax_arrow_group(tbl):
    """applyInArrow kernel: per-group min-max scaling of c_acctbal,
    computed directly on pyarrow buffers (no pandas materialization)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    bal = tbl.column("c_acctbal")
    lo = pc.min(bal)
    span = pc.subtract(pc.max(bal), lo)
    # Constant group (span 0) → scaled 0.0 for every row, matching the
    # oracle's NULLIF/COALESCE form.
    if pc.equal(span, pa.scalar(0.0)).as_py():
        scaled = pa.array([0.0] * len(tbl), type=pa.float64())
    else:
        scaled = pc.divide(pc.subtract(bal, lo), span)
    return pa.table(
        {
            "c_custkey": tbl.column("c_custkey"),
            "c_nationkey": tbl.column("c_nationkey"),
            "scaled_bal": scaled,
        }
    )


@register(
    "q95c_minmax_apply_in_arrow",
    oracle="""
        SELECT
            c_custkey,
            c_nationkey,
            round(COALESCE(
                (c_acctbal - min(c_acctbal) OVER w)
                    / NULLIF(max(c_acctbal) OVER w - min(c_acctbal) OVER w, 0),
                0.0), 5) AS scaled_bal
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey)
    """,
    doc="Grouped-map via applyInArrow (Spark 4): per-nation min-max "
    "scaling computed with pyarrow.compute kernels straight on the "
    "Arrow RecordBatch — q95's shape without the pandas materialization "
    "(no index, no block manager, no object boxing), the lowest-"
    "overhead Python escape hatch for columnar per-group logic.  "
    "min/max are order-insensitive (exact), division is one vectorized "
    "double op — so unlike mean/std kernels there is NO summation-"
    "order caveat; the 5-dp wire rounding happens JVM-side.  Oracle: "
    "the window-function twin.",
)
def q95c_minmax_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    scaled = c.groupBy("c_nationkey").applyInArrow(
        _minmax_arrow_group,
        schema="c_custkey long, c_nationkey int, scaled_bal double",
    )
    return scaled.select(
        "c_custkey", "c_nationkey", F.round("scaled_bal", 5).alias("scaled_bal")
    )


def _spend_profile_cogroup(key, orders_pdf, cust_pdf):
    """Cogrouped merge kernel, VECTORIZED within a hash bucket: the
    orders-side rollup is a pandas groupby, the customer merge a single
    pandas join — one Python call per bucket, not per entity (a per-
    custkey cogroup pays ~1 ms of call+frame overhead per key: measured
    20.1 s vs 1.3 s at sf0.1 for identical semantics)."""
    import numpy as np

    agg = (
        orders_pdf.groupby("o_custkey")["o_totalprice"]
        .agg(n="count", t="sum")
        .reset_index()
    )
    m = cust_pdf.merge(agg, left_on="c_custkey", right_on="o_custkey", how="left")
    total = m["t"].fillna(0.0)
    acct = m["c_acctbal"]
    ratio = (total / acct).where(acct != 0.0, np.nan).round(4)
    return pd.DataFrame(
        {
            "custkey": m["c_custkey"],
            "n_orders": m["n"].fillna(0).astype("int64"),
            "acctbal": acct,
            "total_spend": total.round(2),
            "spend_ratio": ratio,
        }
    )


@register(
    "q95d_cogrouped_map",
    oracle="""
        SELECT c.c_custkey AS custkey,
               CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders,
               c.c_acctbal AS acctbal,
               round(coalesce(o.t, 0), 2) AS total_spend,
               round(coalesce(o.t, 0) / nullif(c.c_acctbal, 0), 4)
                   AS spend_ratio
        FROM customer c
        LEFT JOIN (SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS t
                   FROM orders GROUP BY o_custkey) o
          ON o.o_custkey = c.c_custkey
    """,
    doc="COGROUPED pandas map — df.groupBy(k).cogroup(other.groupBy(k))"
    ".applyInPandas: both relations are co-shuffled on a 64-way hash "
    "bucket of the entity key and each bucket's two row sets arrive as "
    "a pandas pair in ONE Python call — the Arrow surface for custom "
    "merge logic (as-of matching, per-entity reconciliation) that a "
    "plain grouped map can't see both sides of.  Kernel: vectorized "
    "per-customer order rollup (pandas groupby) merged with customer "
    "attributes (pandas join) inside the bucket; oracle: the "
    "equivalent left-join aggregate (FK orphans measured zero, so the "
    "bucket union == customer keys).  The fixture kernel is "
    "deliberately JOIN-EXPRESSIBLE so the cogroup machinery itself "
    "hash-verifies; production reserves cogroup for kernels that are "
    "not (per-key model scoring against reference curves, trajectory "
    "alignment).  Scale: one co-shuffle of both sides — same exchange "
    "cost as the equivalent join; bucketing the key keeps Python call "
    "count at O(buckets) (per-entity calls: 20.1 s vs 1.3 s measured "
    "at sf0.1) while state stays bounded by bucket size.",
)
def q95d_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cogroup on a HASH BUCKET of the entity key, not the key itself:
    # both sides co-shuffle on 64 buckets and the kernel merges a whole
    # bucket vectorized — the granularity a 100 TB cogroup runs at
    # (per-entity kernel calls serialize on Python call overhead).
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 64).alias("bucket"), "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 64).alias("bucket"), "c_custkey", "c_acctbal"
    )
    return (
        o.groupBy("bucket")
        .cogroup(c.groupBy("bucket"))
        .applyInPandas(
            _spend_profile_cogroup,
            schema=(
                "custkey long, n_orders long, acctbal double, "
                "total_spend double, spend_ratio double"
            ),
        )
    )


@register(
    "q97b_iter_pandas_udf",
    oracle="""
        SELECT doc_id,
               CASE WHEN n_chars < 128 THEN 'xs'
                    WHEN n_chars < 256 THEN 's'
                    WHEN n_chars < 384 THEN 'm'
                    ELSE 'l' END AS size_band
        FROM documents
    """,
    doc="Iterator-of-Series pandas UDF (SCALAR_ITER): the per-PARTITION "
    "init form — the banding table ('the model') is built once before "
    "the batch loop and reused across every Arrow batch of the "
    "partition, which is THE pattern for amortizing expensive state "
    "(tokenizer load, ONNX session, embedding table) over rows "
    "instead of paying it per batch like a plain scalar UDF would.  "
    "The kernel itself is a deterministic np.searchsorted band "
    "lookup, so the whole path is hash-verified against a CASE "
    "ladder.  Scale: same Arrow transfer as q97; init cost is "
    "O(partitions), not O(batches).",
)
def q97b_iter_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def size_band(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-partition init ("model load")
        edges = np.array([128, 256, 384])
        names = np.array(["xs", "s", "m", "l"])
        for s in batches:
            idx = np.searchsorted(edges, s.to_numpy(), side="right")
            yield pd.Series(names[idx])

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", size_band("n_chars").alias("size_band"))


@register(
    "q97c_arrow_python_udf",
    oracle="""
        SELECT doc_id,
               regexp_replace(lower(source), '[aeiou]', '', 'g') AS source_slug
        FROM documents
    """,
    doc="Arrow-optimized Python UDF (Spark 4 useArrow=True): a plain "
    "@udf whose serialization is Arrow columnar batches instead of "
    "pickled rows — the plan shows ArrowEvalPython, not the "
    "row-at-a-time BatchEvalPython the plan sweep bans.  This is the "
    "migration path for legacy row UDFs that can't be vectorized: "
    "same row-wise Python body, ~2-5x cheaper transfer.  Kernel is a "
    "deterministic vowel-stripping slug, hash-verified against the "
    "regex mirror.  (q97/q97b remain the preferred fully-vectorized "
    "forms.)",
)
def q97c_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re as _re

    from pyspark.sql.functions import udf

    @udf(returnType="string", useArrow=True)
    def slug(s: str) -> str:
        return _re.sub(r"[aeiou]", "", s.lower())

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", slug("source").alias("source_slug"))


@register(
    "q98c_table_arg_udtf",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(len(list_filter(string_split(text, ' '),
                                        w -> w <> ''))) AS BIGINT)
                   AS n_tokens,
               CAST(min(doc_id) AS BIGINT) AS min_doc,
               CAST(max(doc_id) AS BIGINT) AS max_doc
        FROM documents GROUP BY lang
    """,
    doc="Python UDTF consuming a TABLE ARGUMENT with PARTITION BY "
    "(Spark 4: `udtf(TABLE(t) PARTITION BY k)`) — the third member of "
    "the UDTF family (q98 lateral scalar-args, q98b polymorphic "
    "analyze()): the engine partitions the input relation BY LANG and "
    "streams each partition's rows through one UDTF instance, which "
    "accumulates per-partition state in eval() and emits the summary "
    "from terminate() — the custom-aggregation escape hatch when "
    "logic doesn't fit SQL aggregates (here it deliberately does: doc "
    "count, non-empty token count with the q73 split-on-space rule, "
    "id bounds — so a plain GROUP BY oracle hash-verifies the "
    "partition-feed plumbing end to end).  Scale: partitions stream "
    "through Arrow batches; state is per-key scalars, parallel across "
    "keys — the applyInPandas shape through the SQL-native TABLE() "
    "surface.",
)
def q98c_table_arg_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n_docs bigint, n_tokens bigint, "
          "min_doc bigint, max_doc bigint")
    class LangSummary:
        def __init__(self):
            self._lang = None
            self._n_docs = 0
            self._n_tokens = 0
            self._min_doc = None
            self._max_doc = None

        def eval(self, row):
            self._lang = row["lang"]
            self._n_docs += 1
            self._n_tokens += sum(
                1 for w in row["text"].split(" ") if w != ""
            )
            d = row["doc_id"]
            self._min_doc = d if self._min_doc is None else min(self._min_doc, d)
            self._max_doc = d if self._max_doc is None else max(self._max_doc, d)

        def terminate(self):
            if self._n_docs:
                yield (
                    self._lang,
                    self._n_docs,
                    self._n_tokens,
                    self._min_doc,
                    self._max_doc,
                )

    spark.udtf.register("lang_summary_udtf", LangSummary)
    # Private view, not the shared register_views() names: the threaded
    # fastlane runs oracle queries concurrently, and a TABLE() argument
    # resolving `documents` mid-re-registration by another thread is the
    # one flake this family can hit (q18/q98b re-register the same
    # shared views; q98c alone owns this name).
    from ..sources import load_table as _lt

    _lt(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).createOrReplaceTempView("q98c_documents")
    return spark.sql(
        "SELECT * FROM lang_summary_udtf("
        "TABLE(SELECT doc_id, lang, text FROM q98c_documents) "
        "PARTITION BY lang)"
    )

"""Aggregation operators: stats, distinct aggs, percentiles, rollup/cube/
grouping sets, collect aggs, pivot.

SURVEY.md §2.4.  All group-bys are hash aggregations with automatic
partial (map-side) aggregation — the 100 TB-relevant property is that
every one of these shuffles only the partially-aggregated keyspace, never
raw rows.  Collected lists are always array_sort-ed (FIXTURES.md gotcha 3:
the driver's hash is order-insensitive across rows, not within a cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table, register_views


@register(
    "q20_agg_stats",
    oracle="""
        SELECT
            l_returnflag,
            round(stddev_samp(l_extendedprice), 4) AS std_price,
            round(var_samp(l_quantity), 4)         AS var_qty,
            round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
            round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_price_qty,
            round(min(l_extendedprice), 2) AS min_price,
            round(max(l_extendedprice), 2) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/correlation/covariance.",
)
def q20_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar_price_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "q21_distinct_agg",
    oracle="""
        SELECT
            l_returnflag,
            count(DISTINCT l_partkey) AS n_parts,
            count(DISTINCT l_suppkey) AS n_supps,
            round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Distinct aggregates — Spark plans these as expand + two-phase agg.",
)
def q21_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
    )


@register(
    "q22_percentiles",
    oracle="""
        SELECT
            l_returnflag,
            round(quantile_cont(l_quantity, 0.25), 4) AS q25,
            round(quantile_cont(l_quantity, 0.50), 4) AS q50,
            round(quantile_cont(l_quantity, 0.75), 4) AS q75,
            round(median(l_extendedprice), 4) AS median_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Exact percentiles (continuous interpolation) — matches DuckDB "
    "quantile_cont; the approx_percentile scale path is q28 (rows-only).  "
    "All three l_quantity quantiles come from ONE percentile(array(...)) "
    "aggregate: a single sorted value buffer per group instead of three "
    "(~20% faster at sf0.1, and 3x less agg-buffer memory at any scale).",
)
def q22_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
            ).alias("qs"),
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias(
                "median_price"
            ),
        )
        .select(
            "l_returnflag",
            F.round(F.col("qs")[0], 4).alias("q25"),
            F.round(F.col("qs")[1], 4).alias("q50"),
            F.round(F.col("qs")[2], 4).alias("q75"),
            "median_price",
        )
    )


@register(
    "q23_rollup",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (flag, flag×status, grand total).",
)
def q23_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q24_cube",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_extendedprice), 2) AS sum_price,
            grouping(l_returnflag) AS g_flag,
            grouping(l_linestatus) AS g_status
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE with grouping() indicator columns distinguishing real NULLs "
    "from subtotal rows.",
)
def q24_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@register(
    "q25_grouping_sets",
    oracle="""
        SELECT
            o_orderstatus,
            o_orderpriority,
            count(*) AS n,
            round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS via the SQL surface (same Catalyst Expand "
    "operator as rollup/cube).",
)
def q25_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
            o_orderstatus,
            o_orderpriority,
            count(*) AS n,
            round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q26_collect_aggs",
    oracle="""
        SELECT
            n_regionkey AS regionkey,
            array_to_string(list_sort(list(n_name)), ',') AS nations,
            array_to_string(list_sort(list(DISTINCT substr(n_name, 1, 1))), ',')
                AS initials
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="collect_list / collect_set wrapped in array_sort for deterministic "
    "cell contents (FIXTURES.md gotcha 3).  Wire format is a ','-joined "
    "string, not array<string>: the driver's canonicalizer sorts result "
    "frames in pandas and cannot hash ndarray cells (round-1 hard fail).",
)
def q26_collect_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.array_join(
            F.array_sort(F.collect_set(F.substring("n_name", 1, 1))), ","
        ).alias("initials"),
    )


@register(
    "q27_pivot",
    oracle="""
        SELECT
            l_returnflag,
            round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
            round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Pivot on l_linestatus with explicit value list (no discovery scan; "
    "at 100 TB pass values explicitly to keep pivot single-pass).",
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "q48_salted_agg",
    oracle="""
        SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Salted two-phase aggregation — the hot-key recipe spelled out: "
    "phase 1 groups on (key, xxhash64(row)%16) so a skewed key spreads "
    "over 16 reducers; phase 2 merges the partials per key.  Result is "
    "hash-identical to the plain groupBy (integer-quantized sums make "
    "the re-aggregation associativity-safe).  Fixture keys are uniform "
    "(FIXTURES.md) — this exists as the verified pattern for skewed "
    "deployments.",
)
def q48_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)).alias("salt")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    partial = (
        li.select("l_returnflag", salt, qty_cents.alias("qty_c"))
        .groupBy("l_returnflag", "salt")
        .agg(F.sum("qty_c").alias("part_qty"), F.count("*").alias("part_n"))
    )
    return partial.groupBy("l_returnflag").agg(
        (F.sum("part_qty") / 100.0).alias("sum_qty"),
        F.sum("part_n").alias("n"),
    )


@register(
    "q29_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, metric, amount
        FROM (
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice AS price, l_discount AS discount, l_tax AS tax
            FROM lineitem WHERE l_orderkey < 2000
        )
        UNPIVOT (amount FOR metric IN (price, discount, tax))
    """,
    doc="Unpivot (wide→long) via stack(): three measure columns become "
    "(metric, amount) rows — the melt operator, fused into the scan "
    "projection (no shuffle).",
)
def q29_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'price', l_extendedprice, 'discount', l_discount, 'tax', l_tax) "
            "AS (metric, amount)"
        ),
    )


@register(
    "q28_approx_aggs",
    oracle=None,  # HLL++/GK sketches are engine-specific — rows-only check;
    # the exact twins (q21/q22) carry the hash-verified semantics.
    doc="Approximate aggregates for the 100 TB path: approx_count_distinct "
    "(HLL++) and approx_percentile (GK) — sketch-based, single-pass, "
    "mergeable across partitions.",
)
def q28_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("approx_median_qty"),
    )


@register(
    "q49_incremental_agg_merge",
    oracle="""
        SELECT
            l_returnflag,
            round(sum(l_quantity), 2) AS sum_qty,
            count(*) AS n,
            round(max(l_extendedprice), 2) AS max_price
        FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Incremental-aggregation pattern: the fact is split into two "
    "halves (old/new), each partially aggregated to (sum, count, max) "
    "state, then the states are MERGED — producing exactly the direct "
    "aggregate (the oracle).  This mergeability is what lets 100 TB "
    "pipelines maintain rollups incrementally instead of rescanning "
    "history (integer-quantized sums make the merge associativity-safe).",
)
def q49_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("long")

    def partial(df):
        return df.groupBy("l_returnflag").agg(
            F.sum(qty_cents).alias("p_qty"),
            F.count("*").alias("p_n"),
            F.max("l_extendedprice").alias("p_max"),
        )

    old = partial(li.filter(F.col("l_orderkey") % 2 == 0))
    new = partial(li.filter(F.col("l_orderkey") % 2 == 1))
    return (
        old.unionByName(new)
        .groupBy("l_returnflag")
        .agg(
            (F.sum("p_qty") / 100.0).alias("sum_qty"),
            F.sum("p_n").alias("n"),
            F.round(F.max("p_max"), 2).alias("max_price"),
        )
    )


@register(
    "q20c_grouped_linreg",
    oracle="""
        SELECT
            l_returnflag,
            regr_count(l_extendedprice, l_quantity) AS n,
            round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
            round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
            round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
            round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
            round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Per-group closed-form OLS via the SQL regr_* aggregate family "
    "(slope/intercept/R²/avgx/avgy) — one hash-agg pass fits a simple "
    "linear model per group with no MLlib iteration and no second scan.  "
    "At 100 TB this is the screening fit before a full LinearRegression: "
    "the aggregation state is six doubles per group, map-side combined, "
    "so the shuffle carries only the partially-merged moment sums.",
)
def q20c_grouped_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


@register(
    "q20b_corr_matrix",
    oracle="""
        SELECT
            round(corr(l_quantity, l_extendedprice), 6) AS qty_price,
            round(corr(l_quantity, l_discount), 6) AS qty_disc,
            round(corr(l_quantity, l_tax), 6) AS qty_tax,
            round(corr(l_extendedprice, l_discount), 6) AS price_disc,
            round(corr(l_extendedprice, l_tax), 6) AS price_tax,
            round(corr(l_discount, l_tax), 6) AS disc_tax
        FROM lineitem
    """,
    doc="Full pairwise Pearson correlation matrix over the fact's four "
    "numeric measures in ONE aggregate pass (6 corr cells share the "
    "scan and the single 1-row shuffle) — the feature-redundancy screen "
    "before model training.  MLlib's Correlation.corr builds the same "
    "matrix via RowMatrix; the SQL form is exact, cheaper, and "
    "oracle-verifiable.",
)
def q20b_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice", "qty_price"),
        ("l_quantity", "l_discount", "qty_disc"),
        ("l_quantity", "l_tax", "qty_tax"),
        ("l_extendedprice", "l_discount", "price_disc"),
        ("l_extendedprice", "l_tax", "price_tax"),
        ("l_discount", "l_tax", "disc_tax"),
    ]
    return li.agg(
        *[F.round(F.corr(a, b), 6).alias(name) for a, b, name in pairs]
    )


@register(
    "q21b_argmax_aggs",
    oracle="""
        SELECT
            o_orderstatus,
            arg_max(o_orderkey, o_totalprice) AS biggest_order,
            round(max(o_totalprice), 2) AS biggest_price,
            arg_min(o_orderkey, o_totalprice) AS smallest_order,
            round(min(o_totalprice), 2) AS smallest_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Argmax/argmin aggregates (max_by / min_by ≡ DuckDB arg_max/"
    "arg_min): the key of the extremal row in ONE hash-agg pass — no "
    "self-join back to the table, no window sort (qa18 shows the "
    "min(struct) equivalent; this is the dedicated SQL-2023 surface).  "
    "Deterministic on the fixture: extremal prices are unique per "
    "status (verified at sf0.01).",
)
def q21b_argmax_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.round(F.max("o_totalprice"), 2).alias("biggest_price"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.round(F.min("o_totalprice"), 2).alias("smallest_price"),
    )


@register(
    "q25b_group_by_all",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            count(*) AS n,
            round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
    """,
    doc="GROUP BY ALL / ORDER BY ALL (the projection-derived grouping "
    "shorthand both Spark 4 and DuckDB share) — same Expand-free hash "
    "agg as an explicit column list; the surface matters for generated "
    "SQL where the grouping set is the non-aggregate projection.",
)
def q25b_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
            l_returnflag,
            l_linestatus,
            count(*) AS n,
            round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "q26b_listagg",
    oracle="""
        SELECT r.r_name,
               string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
               count(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    doc="LISTAGG ... WITHIN GROUP (ORDER BY ...) — the ANSI ordered "
    "string aggregation added in Spark 4.1, the SQL-standard twin of "
    "q26's collect_list+array_sort+array_join composition.  The ORDER "
    "BY inside the aggregate makes the concatenation deterministic "
    "without a global sort; per-group partial aggregation still "
    "applies, so shuffle volume is group-count-sized.  Oracle: "
    "DuckDB's string_agg with ORDER BY (same ANSI semantics).",
)
def q26b_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations,
               count(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@register(
    "q20d_crosstab",
    oracle="""
        SELECT l_returnflag AS flag,
               CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS F,
               CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS O
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="df.stat.crosstab — the DataFrameStatFunctions contingency-table "
    "API (pair frequencies, one row per left value, one column per "
    "right value).  Same single-scan pivot plan as groupBy().pivot() "
    "with an explicit value list; the column set is the right-hand "
    "domain so it must be LOW-cardinality (enum-like) — at 100 TB the "
    "shuffle carries |left|x|right| partial counts, nothing row-"
    "scaled.  NOTE: stat.crosstab MATERIALIZES the (tiny) cell grid "
    "driver-side at call time — bounded by the category product, never "
    "row count; the oracle's CASE-sum pivot is the fully-lazy "
    "relational twin when laziness matters.  The first column is "
    "renamed to a plain name for the wire; column order is value-"
    "sorted by the driver's compare.",
)
def q20d_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    return ct.withColumnRenamed("l_returnflag_l_linestatus", "flag")


@register(
    "q21c_boolean_aggs",
    oracle="""
        SELECT l_returnflag,
               CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT)
                   AS n_high_discount,
               CAST(bool_and(l_quantity > 0) AS INT) AS all_positive_qty,
               CAST(bool_or(l_tax > 0.07) AS INT) AS any_high_tax,
               round(median(l_extendedprice), 3) AS median_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Boolean / conditional aggregate family: count_if, every "
    "(bool_and), any (bool_or), and the median() shorthand (Spark "
    "3.4+) — the predicates-as-aggregates vocabulary that replaces "
    "self-joins for existence questions.  All are single-pass "
    "mergeable aggregates (bool_and/bool_or partial-combine as AND/OR "
    "monoids; median shares the exact-percentile sort buffer), so the "
    "plan is the same partial+final hash agg as q01.  Booleans cast to "
    "INT for the wire (engine-stable hash form); the median rounds to "
    "3 dp, NOT 2 — even-count medians of 2-dp prices are exact "
    "half-cent midpoints, so a 2-dp round would sit ON the rounding "
    "tie boundary every time (observed cross-engine flip at sf0.001).",
)
def q21c_boolean_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_high_discount"),
        F.every(F.col("l_quantity") > 0).cast("int").alias("all_positive_qty"),
        F.some(F.col("l_tax") > 0.07).cast("int").alias("any_high_tax"),
        F.round(F.median("l_extendedprice"), 3).alias("median_price"),
    )


@register(
    "q21d_exchange_reuse",
    oracle="""
        WITH per_supp AS (
            SELECT l_suppkey, count(*) AS n_lines
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey, n_lines
        FROM per_supp
        WHERE n_lines = (SELECT max(n_lines) FROM per_supp)
    """,
    doc="Automatic EXCHANGE REUSE: the per-supplier aggregate feeds both "
    "the result and its own global-max comparison, and Spark plans the "
    "second consumer as a ReusedExchange over the FIRST aggregation's "
    "shuffle output — the fact table is scanned and shuffled exactly "
    "once with no explicit .cache() (tests/test_plans.py pins the "
    "ReusedExchange node in the AQE final plan).  This is the "
    "work-sharing that makes max/avg-comparison queries (qa11-style "
    "HAVING against a global aggregate) cost ONE pass at 100 TB; qp3 "
    "shows the explicit-cache alternative for when the shared stage "
    "must outlive one query.",
)
def q21d_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_suppkey").agg(F.count("*").alias("n_lines"))
    mx = agg.agg(F.max("n_lines").alias("mx"))
    return (
        agg.crossJoin(F.broadcast(mx))
        .filter(F.col("n_lines") == F.col("mx"))
        .select("l_suppkey", "n_lines")
    )


@register(
    "q20e_stat_freq_quantile",
    oracle=None,
    doc="df.stat.freqItems + df.stat.approxQuantile — the last two "
    "DataFrameStatFunctions surfaces (crosstab/corr/cov/sampleBy are "
    "covered elsewhere).  freqItems is the Karp/Papadimitriou/"
    "Shenker one-pass heavy-hitter sketch: guaranteed to CONTAIN every "
    "value with frequency > support, may over-report (false positives) "
    "— so the wire emits the sorted item list and the exact guarantee "
    "is pinned in tests against qc10's exact heavy-hitter twin.  "
    "approxQuantile is Greenwald-Khanna with a rank-error bound of "
    "relativeError * n; the test brackets each estimate between the "
    "exact percentiles at rank ± error (q22's exact twin).  Both are "
    "ACTIONS (they materialize a bounded sketch driver-side at call "
    "time — item set / 3 doubles, never row-scaled), hence rows-only: "
    "approximate sketch internals are engine-specific by design.  At "
    "100 TB both are single-pass mergeable sketches — the sanctioned "
    "way to ask 'what are the hot keys / rough deciles' without a "
    "sort or a second scan.",
)
def q20e_stat_freq_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    freq_row = li.stat.freqItems(["l_returnflag"], support=0.2).collect()[0]
    flags = "|".join(sorted(freq_row["l_returnflag_freqItems"]))
    q25, q50, q75 = li.stat.approxQuantile(
        "l_extendedprice", [0.25, 0.5, 0.75], 0.01
    )
    return spark.createDataFrame(
        [(flags, round(q25, 2), round(q50, 2), round(q75, 2))],
        schema="freq_flags string, approx_q25 double, approx_q50 double, "
        "approx_q75 double",
    )


@register(
    "q28b_approx_top_k",
    oracle="""
        SELECT p_brand AS item, CAST(count(*) AS BIGINT) AS est_count
        FROM part GROUP BY p_brand
    """,
    doc="approx_top_k (Spark 4.1 sketch aggregate): single-pass "
    "frequent-items summary returning (item, count) structs.  With "
    "maxItemsTracked (10000) above the true cardinality (25 brands) "
    "the sketch is EXACT, so the exploded result hash-matches the "
    "plain GROUP BY oracle — the same exactness-window trick as q28's "
    "HLL twin.  k is set above the domain size so no tie can straddle "
    "the top-k boundary (engines may break boundary ties differently; "
    "inside the window the multiset of (item, count) is unique).  At "
    "100 TB this is the mergeable one-pass 'what are the hot values' "
    "primitive — partial sketches combine map-side, the shuffle "
    "carries one bounded buffer per partition, vs the exact twin's "
    "full groupBy shuffle (fine for 25 brands, fatal for 1e9 URLs).",
)
def q28b_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    sk = p.agg(F.expr("approx_top_k(p_brand, 30)").alias("topk"))
    return sk.select(F.explode("topk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").cast("long").alias("est_count"),
    )


@register(
    "q28c_hll_sketch_mergeable",
    oracle="""
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
               TRUE AS merge_agrees_1pct,
               TRUE AS within_2pct
    """
    + "FROM lineitem",
    doc="Apache DataSketches HLL surface (Spark 3.5+ hll_sketch_agg / "
    "hll_union_agg / hll_sketch_estimate) with its MERGEABILITY "
    "contract hash-verified: a corpus-wide one-shot sketch and the "
    "union of 8 per-shard sketches must estimate within 1% of each "
    "other, and both within 2% of the exact distinct count — the "
    "property that lets 100 TB distinct counts roll up from "
    "per-partition sketches without ever shuffling raw values.  "
    "(The two estimates are NOT bit-identical by design: DataSketches "
    "HLL_4 keeps a curMin offset + exception list, and the union "
    "path's HLL_8 accumulator back-converts, so one-shot vs merged "
    "registers can differ at the encoding margin — asserting exact "
    "equality would pin an implementation artifact, measured 2003 vs "
    "2000 on the 2000-part fixture.  The 1%-agreement envelope IS "
    "the portable law.)  The oracle pins the exact count and the two "
    "law booleans; sketch drift, a broken union, or accuracy decay "
    "breaks the hash.  Scale: both arms are single-pass partial "
    "aggregates; the shard arm\'s shuffle carries 8 sketch blobs, "
    "not rows.",
)
def q28c_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    direct = li.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").alias(
            "direct_est"
        ),
        F.count_distinct("l_partkey").cast("bigint").alias("n_exact"),
    )
    shards = (
        li.withColumn("shard", F.col("l_suppkey") % 8)
        .groupBy("shard")
        .agg(F.expr("hll_sketch_agg(l_partkey, 14)").alias("sk"))
    )
    merged = shards.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("merged_est")
    )
    exact_d = F.col("n_exact").cast("double")
    return direct.crossJoin(F.broadcast(merged)).select(
        "n_exact",
        (
            F.abs(
                F.col("direct_est").cast("double")
                - F.col("merged_est").cast("double")
            )
            / exact_d
            <= 0.01
        ).alias("merge_agrees_1pct"),
        (
            (F.abs(F.col("direct_est").cast("double") / exact_d - 1.0) <= 0.02)
            & (F.abs(F.col("merged_est").cast("double") / exact_d - 1.0) <= 0.02)
        ).alias("within_2pct"),
    )


_CM_D = 4    # hash rows
_CM_W = 256  # buckets per row


def _cm_u16(expr: str, row: str) -> str:
    """Engine-portable uniform 16-bit from md5(row:val) — instr digit
    parse of the first 4 hex chars (ml34's derandomization helper)."""
    h = f"md5({row} || ':' || CAST({expr} AS STRING))"
    parts = [
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(parts) + ")"


@register(
    "q28d_countmin_sketch",
    oracle=f"""
        WITH truth AS (
            SELECT l_partkey AS item, CAST(count(*) AS BIGINT) AS freq
            FROM lineitem GROUP BY l_partkey
        ),
        hashed AS (
            SELECT l_partkey AS item, j.j,
                   {_cm_u16('l_partkey', 'CAST(j.j AS VARCHAR)')}
                       % {_CM_W} AS bucket
            FROM lineitem
            CROSS JOIN (SELECT unnest(generate_series(0, {_CM_D - 1}))
                            AS j) j
        ),
        cells AS (
            SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
            FROM hashed GROUP BY j, bucket
        ),
        probes AS (
            SELECT t.item, j.j,
                   {_cm_u16('t.item', 'CAST(j.j AS VARCHAR)')} % {_CM_W}
                       AS bucket
            FROM truth t
            CROSS JOIN (SELECT unnest(generate_series(0, {_CM_D - 1}))
                            AS j) j
        ),
        est AS (
            SELECT p.item, CAST(min(c.c) AS BIGINT) AS est
            FROM probes p
            JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
            GROUP BY p.item
        )
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CASE WHEN e.est < t.freq THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_underestimates,
               CAST(max(e.est - t.freq) AS BIGINT) AS max_overestimate,
               CAST(sum(e.est - t.freq) AS BIGINT) AS total_overestimate
        FROM est e JOIN truth t ON t.item = e.item
    """,
    doc=f"COUNT-MIN SKETCH (Cormode-Muthukrishnan) built relationally "
    f"and audited against exact truth: {_CM_D} hash rows x {_CM_W} "
    "buckets (each bucket assignment an ml34-style md5-uniform mod "
    "w), cell counts from ONE grouped aggregate whose state is the "
    "d*w = 1024-cell grid regardless of data size — the frequency "
    "sketch that answers point queries over 100 TB with kilobytes of "
    "mergeable state (cells add across shards like q28c's HLL "
    "registers).  The audit hash-verifies CM's HARD guarantee — "
    "est >= true for EVERY item, n_underestimates must be 0 (min of "
    "counters that each over-count can never under-count) — plus the "
    "measured max/total overestimate, which the oracle reproduces "
    "exactly because the hash family is deterministic.  Scale: the "
    "{_CM_D}x row expansion is map-side; the sketch aggregate and "
    "the probe join both touch only the 1024-cell table.",
)
def q28d_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("item")
    )
    truth = li.groupBy("item").agg(
        F.count("*").cast("bigint").alias("freq")
    )
    # Spark parses the hash span with conv() (single JVM hex parse);
    # the oracle uses the instr() digit ladder — identical integers
    # (the ml34 convention).
    spark_u16 = (
        "CAST(conv(substr(md5(CAST(j AS STRING) || ':'"
        " || CAST(item AS STRING)), 1, 4), 16, 10) AS BIGINT)"
    )
    # Hash the ITEM DOMAIN once (domain x d rows), not the corpus: the
    # bucket depends only on (j, item), so the sketch cell count
    # count(*) over corpus occurrences == sum(freq) over the domain —
    # identical integers, ~|corpus|/|domain| fewer md5 calls (30x at
    # sf0.1: 2.4M -> 80k).  The oracle keeps the corpus-side count(*)
    # formulation; both reduce to the same 1024-cell grid.  One
    # domain-side relation feeds BOTH the cells aggregate and the
    # probe join (eager localCheckpoint: tiny, read twice).
    dom = (
        truth.selectExpr(
            "item", "freq", f"explode(sequence(0, {_CM_D - 1})) AS j"
        )
        .selectExpr(
            "item",
            "freq",
            "j",
            spark_u16 + f" % {_CM_W} AS bucket",
        )
        .localCheckpoint(eager=True)
    )
    cells = dom.groupBy("j", "bucket").agg(
        F.sum("freq").cast("bigint").alias("c")
    )
    est = (
        dom.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("item", "freq")
        .agg(F.min("c").cast("bigint").alias("est"))
    )
    return est.agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum(F.when(F.col("est") < F.col("freq"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_underestimates"),
        F.max(F.col("est") - F.col("freq"))
        .cast("bigint")
        .alias("max_overestimate"),
        F.sum(F.col("est") - F.col("freq"))
        .cast("bigint")
        .alias("total_overestimate"),
    )


@register(
    "q22b_percentile_within_group",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(CAST(round(l_extendedprice * 100)
                                        AS BIGINT), 0.50), 6) AS p50_cont,
               round(quantile_cont(CAST(round(l_extendedprice * 100)
                                        AS BIGINT), 0.90), 6) AS p90_cont,
               CAST(quantile_disc(CAST(round(l_extendedprice * 100)
                                       AS BIGINT), 0.50) AS BIGINT)
                   AS p50_disc,
               CAST(quantile_disc(CAST(round(l_extendedprice * 100)
                                       AS BIGINT), 0.90) AS BIGINT)
                   AS p90_disc
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="ANSI inverse-distribution functions — percentile_cont / "
    "percentile_disc WITHIN GROUP (ORDER BY ...) (SQL:2008 syntax, "
    "Spark 3.4+) — with the CONT-vs-DISC boundary pinned on exact "
    "cents: cont INTERPOLATES between the two straddling values "
    "(fractional cents appear), disc returns the first actual value "
    "at-or-above the position (always a real data point) — the "
    "distinction that silently shifts SLA percentiles when a "
    "dashboard migrates between engines or from approx to exact.  "
    "q22 pins the percentile() numerics; THIS pins the standard "
    "syntax surface and the disc selection rule against DuckDB's "
    "quantile_cont/quantile_disc.  Scale: exact percentiles sort "
    "within group partitions; the approx_percentile swap (q28) is "
    "the 100 TB path.",
)
def q22b_percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.selectExpr(
        "l_returnflag",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents",
    ).createOrReplaceTempView("q22b_cents")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(percentile_cont(0.50) WITHIN GROUP (ORDER BY cents),
                     6) AS p50_cont,
               round(percentile_cont(0.90) WITHIN GROUP (ORDER BY cents),
                     6) AS p90_cont,
               CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS p50_disc,
               CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS p90_disc
        FROM q22b_cents GROUP BY l_returnflag
        """
    )


@register(
    "q20f_weighted_stats",
    oracle="""
        WITH base AS (
            SELECT n.n_name,
                   CAST(round(l.l_quantity) AS BIGINT) AS w,
                   CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                       AS cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        sums AS (
            SELECT n_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(w) AS BIGINT) AS tot_w,
                   CAST(sum(w * cents) AS BIGINT) AS swx,
                   CAST(sum(CAST(w AS HUGEINT) * cents * cents)
                        AS HUGEINT) AS swxx,
                   CAST(sum(cents) AS BIGINT) AS sx
            FROM base GROUP BY n_name
        )
        SELECT n_name, n_rows, tot_w,
               round(sx * 1.0 / n_rows, 6) AS unweighted_mean,
               round(swx * 1.0 / tot_w, 6) AS weighted_mean,
               CAST((CAST(tot_w AS HUGEINT) * swxx
                     - CAST(swx AS HUGEINT) * swx)
                    // (CAST(tot_w AS HUGEINT) * tot_w)
                    AS BIGINT) AS weighted_var_cents2,
               round(swx * 1.0 / tot_w - sx * 1.0 / n_rows, 6)
                   AS size_bias
        FROM sums
    """,
    doc="WEIGHTED statistics — the family q20's unweighted moments "
    "leave out: per nation, the quantity-weighted mean/variance of "
    "line price next to the unweighted mean, and their gap "
    "(size_bias: positive means big orders run expensive — the "
    "volume-weighted-vs-simple-average divergence every 'average "
    "price' dashboard silently hides).  All accumulations are exact "
    "integer sums (weights are integer units, prices integer cents; "
    "the weighted second moment sums w*x^2 in HUGEINT/DECIMAL(38) "
    "because cents^2 crosses the BIGINT line past ~90k rows per "
    "group — the qd45 tight-cast rule); each output divides exact "
    "integers once or twice, so both engines emit identical doubles "
    "with no Welford merge-order dependence anywhere; the variance is "
    "emitted as an exact INTEGER of cents^2 via integral division of "
    "the exact numerator W*Swx2 - (Swx)^2 — converting the 21-digit "
    "second moment to double first diverges, because DuckDB's "
    "hugeint->double is a two-step (hi<<64 + lo) conversion that "
    "double-rounds while Spark's BigDecimal path rounds once, and the "
    "E[wx^2] - mean^2 cancellation amplifies that last ULP into the "
    "rounded output (measured: one nation flipped at sf0.1).  Scale: one "
    "star join feeding one map-side-combinable aggregate; the "
    "second-moment trick (E[wx^2]/W - mean^2) keeps it single-pass.",
)
def q20f_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_name",
            F.round("l_quantity").cast("long").alias("w"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    sums = base.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("w").cast("bigint").alias("tot_w"),
        F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("swx"),
        F.sum(
            F.col("w").cast("decimal(10,0)")
            * (F.col("cents").cast("decimal(14,0)") * F.col("cents")).cast(
                "decimal(26,0)"
            )
        ).alias("swxx"),
        F.sum("cents").cast("bigint").alias("sx"),
    )
    wmean = F.col("swx") * 1.0 / F.col("tot_w")
    return sums.select(
        "n_name",
        "n_rows",
        "tot_w",
        F.round(F.col("sx") * 1.0 / F.col("n_rows"), 6).alias(
            "unweighted_mean"
        ),
        F.round(wmean, 6).alias("weighted_mean"),
        F.expr(
            "CAST((CAST(tot_w AS DECIMAL(8,0))"
            " * CAST(swxx AS DECIMAL(22,0))"
            " - CAST(swx AS DECIMAL(15,0)) * CAST(swx AS DECIMAL(15,0)))"
            " div (CAST(tot_w AS DECIMAL(13,0)) * tot_w) AS BIGINT)"
        ).alias("weighted_var_cents2"),
        F.round(wmean - F.col("sx") * 1.0 / F.col("n_rows"), 6).alias(
            "size_bias"
        ),
    )


#: q28e digest geometry: 16 md5-hex shards x <=64 kept points per shard.
#: Shard count stands in for cluster width (one digest per executor at
#: 100 TB); 64 points bounds the merged summary at ~1k rows.
_QD_SHARDS = 16
_QD_K = 64


@register(
    "q28e_mergeable_quantile_digest",
    oracle=f"""
        WITH base AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                   l_orderkey * 10 + l_linenumber AS k,
                   substr(md5(CAST(l_orderkey * 10 + l_linenumber
                                   AS VARCHAR)), 1, 1) AS shard
            FROM lineitem
        ),
        ranked AS (
            SELECT shard, cents, k,
                   row_number() OVER (PARTITION BY shard
                                      ORDER BY cents, k) AS i,
                   count(*) OVER (PARTITION BY shard) AS n_s
            FROM base
        ),
        stepped AS (
            SELECT *, greatest(1, (n_s + {_QD_K - 1}) // {_QD_K}) AS step
            FROM ranked
        ),
        kept AS (
            SELECT shard, cents, i, step,
                   i - coalesce(lag(i) OVER (PARTITION BY shard
                                             ORDER BY i), 0) AS wt
            FROM stepped
            WHERE i % step = 0 OR i = n_s
        ),
        merged AS (
            SELECT cents,
                   sum(wt) OVER (ORDER BY cents, shard, i) AS cw
            FROM kept
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        bound AS (
            SELECT CAST(sum(step - 1) AS BIGINT) AS rank_bound
            FROM (SELECT DISTINCT shard, step FROM stepped)
        ),
        ps AS (SELECT unnest([25, 50, 75, 90, 99]) AS p),
        est AS (
            SELECT ps.p,
                   CAST(min(CASE WHEN 100 * m.cw >= ps.p * t.n
                                 THEN m.cents END) AS BIGINT) AS est_cents
            FROM ps CROSS JOIN tot t CROSS JOIN merged m
            GROUP BY ps.p
        ),
        audit AS (
            SELECT e.p, e.est_cents,
                   CAST(sum(CASE WHEN b.cents < e.est_cents
                                 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_lt,
                   CAST(sum(CASE WHEN b.cents <= e.est_cents
                                 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_le
            FROM est e CROSS JOIN base b
            GROUP BY e.p, e.est_cents
        )
        SELECT a.p, t.n AS n_rows, a.est_cents,
               CAST((a.p * t.n + 99) // 100 AS BIGINT) AS target_rank,
               bd.rank_bound, a.cnt_lt, a.cnt_le,
               CAST(CASE WHEN a.cnt_le >= (a.p * t.n + 99) // 100
                                           - bd.rank_bound
                          AND a.cnt_lt < (a.p * t.n + 99) // 100
                                          + bd.rank_bound
                         THEN 1 ELSE 0 END AS BIGINT) AS within_bound
        FROM audit a CROSS JOIN tot t CROSS JOIN bound bd
    """,
    doc=f"MERGEABLE equi-depth quantile digest with a PROVEN rank-error "
    f"envelope — the missing middle of the quantile family: q22/q22b "
    "are exact per-group sorts (bounded groups), qd25 is the exact "
    "distributed rank (audit-grade, two shuffles of the full "
    "keyspace), q28's approx_percentile is a black-box sketch.  This "
    "one is the WHITE-BOX sketch: rows land in "
    f"{_QD_SHARDS} deterministic md5-hex shards (the per-executor "
    "digest stand-in), each shard keeps every step-th order statistic "
    f"(step = ceil(n_shard/{_QD_K})) tagged with the exact row weight "
    "it summarizes, and merging shards is a plain UNION of the "
    f"~{_QD_SHARDS}x{_QD_K}-point summaries — the same union works "
    "hierarchically across 1000 executors because weights are "
    "additive (the q72e/q28c mergeability discipline).  Percentile "
    "estimates read off the merged cumulative weight, and the AUDIT "
    "verifies the digest's hard law against the raw data: the "
    "estimate's true rank must sit within sum_shards(step-1) of the "
    "target — every comparison integer-exact, so the oracle "
    "reproduces estimate, bound, and verdict bit-for-bit.  Scale: "
    "the only full-data pass is the shard-partitioned rank (each "
    "shard is one task-sized sort at cluster width); everything "
    "downstream touches the ~1k-row merged summary, and the audit "
    "join broadcasts 5 estimate rows.",
)
def q28e_mergeable_quantile_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    # Eagerly checkpointed (optimization round 10): base feeds the
    # ranked window, the total count, AND the audit pass — without the
    # checkpoint the scan + per-row md5 shard assignment re-executes
    # three times in one plan.
    base = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("k"),
    ).withColumn(
        "shard", F.substring(F.md5(F.col("k").cast("string")), 1, 1)
    ).localCheckpoint(eager=True)
    ranked = base.select(
        "shard",
        "cents",
        F.row_number()
        .over(W.partitionBy("shard").orderBy("cents", "k"))
        .alias("i"),
        F.count("*").over(W.partitionBy("shard")).alias("n_s"),
    )
    stepped = ranked.withColumn(
        "step",
        F.greatest(F.lit(1).cast("long"), F.expr(f"(n_s + {_QD_K - 1}) div {_QD_K}")),
    )
    # kept is the bounded sketch (<= shards * (K+1) rows); checkpoint it
    # so the 600k-row rank window above runs ONCE — both the merged
    # cumulative window and the step bound below read from it.
    kept = stepped.filter(
        (F.col("i") % F.col("step") == 0) | (F.col("i") == F.col("n_s"))
    ).select(
        "shard",
        "cents",
        "i",
        "step",
        (
            F.col("i")
            - F.coalesce(
                F.lag("i").over(W.partitionBy("shard").orderBy("i")),
                F.lit(0),
            )
        ).alias("wt"),
    ).localCheckpoint(eager=True)
    # merged summary is <= _QD_SHARDS * (_QD_K + 1) rows — the global
    # cumulative-weight window runs over a BOUNDED sketch relation
    # (allowlisted in tests/test_plan_sweep.py).
    merged = kept.select(
        "cents",
        F.sum("wt").over(W.orderBy("cents", "shard", "i")).alias("cw"),
    )
    tot = base.agg(F.count("*").cast("long").alias("n"))
    # step is constant per shard and every shard emits at least its
    # last row into kept, so distinct (shard, step) over the tiny kept
    # sketch equals the same distinct over the 600k-row stepped.
    bound = (
        kept.select("shard", "step")
        .distinct()
        .agg(F.sum(F.col("step") - 1).cast("long").alias("rank_bound"))
    )
    ps = spark.createDataFrame([(p,) for p in (25, 50, 75, 90, 99)], "p int")
    est = (
        merged.crossJoin(F.broadcast(ps))
        .crossJoin(F.broadcast(tot))
        .groupBy("p")
        .agg(
            F.min(
                F.when(
                    100 * F.col("cw") >= F.col("p") * F.col("n"),
                    F.col("cents"),
                )
            )
            .cast("long")
            .alias("est_cents")
        )
    )
    audit = (
        base.crossJoin(F.broadcast(est))
        .groupBy("p", "est_cents")
        .agg(
            F.sum(F.when(F.col("cents") < F.col("est_cents"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_lt"),
            F.sum(
                F.when(F.col("cents") <= F.col("est_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("cnt_le"),
        )
    )
    target = F.expr("(p * n + 99) div 100")
    return (
        audit.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(bound))
        .select(
            "p",
            F.col("n").alias("n_rows"),
            "est_cents",
            target.cast("long").alias("target_rank"),
            "rank_bound",
            "cnt_lt",
            "cnt_le",
            F.when(
                (F.col("cnt_le") >= target - F.col("rank_bound"))
                & (F.col("cnt_lt") < target + F.col("rank_bound")),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("within_bound"),
        )
    )


#: q28f geometry: 256 registers (8 bucket bits) x 40 value bits.  The
#: harmonic-mean sum is EXACT in IEEE doubles by construction: each
#: term 2^-reg is a dyadic rational with reg <= 41, so every partial
#: sum is an integer multiple of 2^-41 bounded by 256 < 2^9 — numerator
#: always < 2^50 < 2^53 — hence order-independent and bit-identical
#: across engines.  alpha is precomputed HERE and embedded as the same
#: literal in both engines so no float expression is ever re-derived.
_HLL_M = 256
_HLL_W = 40
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_SHARDS = 4


def _hex_bigint_sql(hexpr: str, start: int, n: int) -> str:
    """Engine-portable BIGINT from n hex chars of a digest expression
    (the q28d instr digit-ladder, generalized to arbitrary spans)."""
    parts = [
        f"(instr('0123456789abcdef', substr({hexpr}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(parts) + ")"


def _hll_rho_sql(v: str) -> str:
    """rho = leading zeros of the 40-bit value + 1 (41 when v = 0), as
    a fixed integer comparison ladder (the q84l discipline): rho =
    40 - #{j in 1..39 : v >= 2^j} — no log2 ever evaluated."""
    ladder = " + ".join(
        f"(CASE WHEN {v} >= {2 ** j} THEN 1 ELSE 0 END)"
        for j in range(1, _HLL_W)
    )
    return f"(CASE WHEN {v} = 0 THEN {_HLL_W + 1} ELSE {_HLL_W} - ({ladder}) END)"


@register(
    "q28f_hyperloglog_whitebox",
    oracle=f"""
        WITH base AS (
            SELECT l_partkey AS item,
                   md5(CAST(l_partkey AS VARCHAR)) AS h
            FROM lineitem
        ),
        hashed AS (
            SELECT item,
                   {_hex_bigint_sql('h', 1, 2)} AS bucket,
                   {_hex_bigint_sql('h', 3, 10)} AS v
            FROM base
        ),
        rho AS (
            SELECT item, bucket, {_hll_rho_sql('v')} AS rho,
                   item % {_HLL_SHARDS} AS shard
            FROM hashed
        ),
        oneshot AS (
            SELECT bucket, max(rho) AS reg FROM rho GROUP BY bucket
        ),
        pershard AS (
            SELECT shard, bucket, max(rho) AS reg
            FROM rho GROUP BY shard, bucket
        ),
        merged AS (
            SELECT bucket, max(reg) AS reg FROM pershard GROUP BY bucket
        ),
        spine AS (
            SELECT unnest(generate_series(0, {_HLL_M - 1})) AS bucket
        ),
        regs AS (
            SELECT s.bucket,
                   coalesce(o.reg, 0) AS reg,
                   coalesce(m.reg, 0) AS regm
            FROM spine s
            LEFT JOIN oneshot o ON o.bucket = s.bucket
            LEFT JOIN merged m ON m.bucket = s.bucket
        ),
        agg AS (
            SELECT sum(CAST(1 AS DOUBLE)
                       / CAST((CAST(1 AS BIGINT) << reg) AS DOUBLE))
                       AS s,
                   CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v_zero,
                   bool_and(reg = regm) AS merge_equals_oneshot
            FROM regs
        ),
        ex AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT item) AS BIGINT) AS exact_distinct
            FROM base
        )
        SELECT ex.n_rows, ex.exact_distinct, agg.v_zero,
               agg.merge_equals_oneshot,
               round(agg.s, 6) AS harmonic_sum,
               round(CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
                     / agg.s, 4) AS raw_estimate,
               round(abs(CAST({_HLL_ALPHA!r} AS DOUBLE)
                         * {_HLL_M * _HLL_M} / agg.s
                         / ex.exact_distinct - 1) * 100, 4)
                   AS rel_err_pct
        FROM ex CROSS JOIN agg
    """,
    doc=f"WHITE-BOX HyperLogLog (Flajolet et al. 2007) — completes the "
    "sketch family's glass-box tier (q28d count-min for frequency, "
    "q28e digest for quantiles, THIS for cardinality; q28c is the "
    f"black-box DataSketches twin): {_HLL_M} registers keyed by the "
    "first md5 byte, register = max rank of the first 1-bit in the "
    f"next {_HLL_W} hash bits — rho computed as an integer comparison "
    "ladder (the q84l discipline), never a log2.  Duplicates are free "
    "by construction (same key -> same register/rho -> max absorbs), "
    "so the input is the RAW lineitem scan, no distinct ever "
    "shuffled.  Union-mergeability is exercised, not asserted: "
    f"registers built on {_HLL_SHARDS} disjoint key shards and merged "
    "by max must equal the one-shot registers bucket-for-bucket "
    "(merge_equals_oneshot, hash-pinned TRUE) — the same max-merge "
    "works hierarchically across 1000 executors on kilobytes of "
    "state.  The harmonic estimate is hash-verified BIT-FOR-BIT, "
    "which no float sketch normally allows: every term 2^-reg is "
    "dyadic with reg <= 41, so all partial sums are exact multiples "
    "of 2^-41 below 2^50 — order-independent, engine-independent — "
    "and alpha*m^2/S is one correctly-rounded expression from "
    "identical inputs (alpha embedded as the same Python-computed "
    "literal in both engines).  Accuracy lands inside the theoretical "
    f"1.04/sqrt({_HLL_M}) = 6.5% band (rel_err_pct, hash-pinned).  "
    f"Scale: one map-side projection + a {_HLL_M}-row grouped max; "
    "everything downstream is O(m).",
)
def q28f_hyperloglog_whitebox(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("item")
    )
    h = "md5(CAST(item AS STRING))"
    # Hash the DISTINCT item domain, not every corpus row (the q28d
    # re-plan): bucket/rho/shard are functions of item alone and the
    # register is a MAX, so max over occurrences == max over the
    # domain — identical registers, ~30x fewer md5+conv evaluations,
    # and the distinct is a cheap integer shuffle with map-side
    # partial aggregation.
    rho = li.distinct().selectExpr(
        "item",
        f"CAST(conv(substr({h}, 1, 2), 16, 10) AS BIGINT) AS bucket",
        f"CAST(conv(substr({h}, 3, 10), 16, 10) AS BIGINT) AS v",
    ).selectExpr(
        "bucket",
        _hll_rho_sql("v") + " AS rho",
        f"item % {_HLL_SHARDS} AS shard",
    )
    oneshot = rho.groupBy("bucket").agg(F.max("rho").alias("reg"))
    merged = (
        rho.groupBy("shard", "bucket")
        .agg(F.max("rho").alias("reg"))
        .groupBy("bucket")
        .agg(F.max("reg").alias("regm"))
    )
    spine = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    regs = (
        spine.join(F.broadcast(oneshot), "bucket", "left")
        .join(F.broadcast(merged), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("reg", F.lit(0)).alias("reg"),
            F.coalesce("regm", F.lit(0)).alias("regm"),
        )
    )
    agg = regs.agg(
        F.sum(
            F.expr(
                "CAST(1 AS DOUBLE)"
                " / CAST(shiftleft(CAST(1 AS BIGINT), reg) AS DOUBLE)"
            )
        ).alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v_zero"),
        F.expr("bool_and(reg = regm)").alias("merge_equals_oneshot"),
    )
    ex = li.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("item").cast("long").alias("exact_distinct"),
    )
    est = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M) / F.col("s")
    return ex.crossJoin(F.broadcast(agg)).select(
        "n_rows",
        "exact_distinct",
        "v_zero",
        "merge_equals_oneshot",
        F.round(F.col("s"), 6).alias("harmonic_sum"),
        F.round(est, 4).alias("raw_estimate"),
        F.round(
            F.abs(est / F.col("exact_distinct") - 1) * 100, 4
        ).alias("rel_err_pct"),
    )


def _hll_sum_sql(reg: str) -> str:
    """Exact dyadic harmonic term for one register (see q28f: sums of
    2^-reg with reg <= 41 are order-independent in IEEE doubles)."""
    return (
        f"sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << {reg})"
        " AS DOUBLE))"
    )


@register(
    "q28g_hll_set_algebra",
    oracle=f"""
        WITH base AS (
            SELECT l_partkey AS item,
                   CAST(year(l_shipdate) AS INTEGER) AS yr,
                   md5(CAST(l_partkey AS VARCHAR)) AS h
            FROM lineitem
            WHERE year(l_shipdate) IN (1994, 1995)
        ),
        hashed AS (
            SELECT item, yr,
                   {_hex_bigint_sql('h', 1, 2)} AS bucket,
                   {_hex_bigint_sql('h', 3, 10)} AS v
            FROM base
        ),
        rho AS (
            SELECT item, yr, bucket, {_hll_rho_sql('v')} AS rho
            FROM hashed
        ),
        per_year AS (
            SELECT bucket,
                   max(CASE WHEN yr = 1994 THEN rho ELSE 0 END) AS ra,
                   max(CASE WHEN yr = 1995 THEN rho ELSE 0 END) AS rb
            FROM rho GROUP BY bucket
        ),
        spine AS (
            SELECT unnest(generate_series(0, {_HLL_M - 1})) AS bucket
        ),
        regs AS (
            SELECT s.bucket,
                   coalesce(p.ra, 0) AS ra,
                   coalesce(p.rb, 0) AS rb,
                   greatest(coalesce(p.ra, 0), coalesce(p.rb, 0)) AS ru
            FROM spine s LEFT JOIN per_year p ON p.bucket = s.bucket
        ),
        sums AS (
            SELECT {_hll_sum_sql('ra')} AS sa,
                   {_hll_sum_sql('rb')} AS sb,
                   {_hll_sum_sql('ru')} AS su
            FROM regs
        ),
        est AS (
            SELECT CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
                       / sa AS ea,
                   CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
                       / sb AS eb,
                   CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
                       / su AS eu
            FROM sums
        ),
        ex AS (
            SELECT CAST(count(DISTINCT CASE WHEN yr = 1994 THEN item END)
                        AS BIGINT) AS da,
                   CAST(count(DISTINCT CASE WHEN yr = 1995 THEN item END)
                        AS BIGINT) AS db,
                   CAST(count(DISTINCT item) AS BIGINT) AS du
            FROM base
        ),
        ix AS (
            SELECT CAST(count(*) AS BIGINT) AS di
            FROM (SELECT item FROM base GROUP BY item
                  HAVING count(DISTINCT yr) = 2)
        )
        SELECT ex.da AS exact_a, ex.db AS exact_b, ex.du AS exact_union,
               ix.di AS exact_intersection,
               round(est.ea, 4) AS est_a,
               round(est.eb, 4) AS est_b,
               round(est.eu, 4) AS est_union,
               round(est.ea + est.eb - est.eu, 4) AS est_intersection,
               round(abs((est.ea + est.eb - est.eu) / ix.di - 1) * 100, 4)
                   AS intersection_err_pct
        FROM ex CROSS JOIN ix CROSS JOIN est
    """,
    doc="HLL SET ALGEBRA (theta-sketch-style distinct-count algebra "
    "over q28f's white-box registers): the 100 TB question 'how many "
    "part keys did period A and period B SHARE?' answered from two "
    "kilobyte register files instead of a distinct-intersect shuffle "
    "of both periods.  One scan builds BOTH years' register files "
    "(grouped conditional max — never two passes); the union sketch "
    "is greatest(ra, rb) per register — the well-known LOSSLESS HLL "
    "union (max of first-1-bit ranks commutes with set union), so "
    "|A n B| falls out by inclusion-exclusion ea + eb - eu.  Every "
    "estimate is hash-verified bit-for-bit via the q28f dyadic-"
    "rational argument (exact harmonic sums, alpha embedded as one "
    "Python-computed literal), and the audit carries the EXACT "
    "a/b/union/intersection cardinalities beside the estimates with "
    "the measured intersection error — honest about the method's "
    "known weakness (inclusion-exclusion error compounds when the "
    "intersection is small relative to the union).  Scale: register "
    "files merge hierarchically by max; the exact audit is the only "
    "full-shuffle pass and exists to grade the sketch, not to serve "
    "the query.",
)
def q28g_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("item"),
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .filter(F.col("yr").isin(1994, 1995))
    )
    h = "md5(CAST(item AS STRING))"
    # Hash the DISTINCT (item, yr) domain (the q28d/q28f re-plan):
    # bucket/rho are functions of item alone and the per-year register
    # is a conditional MAX, so the registers from distinct pairs are
    # identical to those from every corpus occurrence — ~30x fewer
    # md5+conv evaluations after a cheap two-int distinct.
    rho = li.distinct().selectExpr(
        "item",
        "yr",
        f"CAST(conv(substr({h}, 1, 2), 16, 10) AS BIGINT) AS bucket",
        f"CAST(conv(substr({h}, 3, 10), 16, 10) AS BIGINT) AS v",
    ).selectExpr("item", "yr", "bucket", _hll_rho_sql("v") + " AS rho")
    per_year = rho.groupBy("bucket").agg(
        F.max(F.when(F.col("yr") == 1994, F.col("rho")).otherwise(0)).alias("ra"),
        F.max(F.when(F.col("yr") == 1995, F.col("rho")).otherwise(0)).alias("rb"),
    )
    spine = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    regs = spine.join(F.broadcast(per_year), "bucket", "left").select(
        F.coalesce("ra", F.lit(0)).alias("ra"),
        F.coalesce("rb", F.lit(0)).alias("rb"),
        F.greatest(
            F.coalesce("ra", F.lit(0)), F.coalesce("rb", F.lit(0))
        ).alias("ru"),
    )
    sums = regs.agg(
        F.expr(_hll_sum_sql("ra")).alias("sa"),
        F.expr(_hll_sum_sql("rb")).alias("sb"),
        F.expr(_hll_sum_sql("ru")).alias("su"),
    )
    ex = li.agg(
        F.countDistinct(F.when(F.col("yr") == 1994, F.col("item")))
        .cast("long")
        .alias("exact_a"),
        F.countDistinct(F.when(F.col("yr") == 1995, F.col("item")))
        .cast("long")
        .alias("exact_b"),
        F.countDistinct("item").cast("long").alias("exact_union"),
    )
    ix = (
        li.groupBy("item")
        .agg(F.countDistinct("yr").alias("ny"))
        .filter(F.col("ny") == 2)
        .agg(F.count("*").cast("long").alias("exact_intersection"))
    )
    a = F.lit(_HLL_ALPHA) * F.lit(_HLL_M * _HLL_M)
    ea, eb, eu = a / F.col("sa"), a / F.col("sb"), a / F.col("su")
    return (
        ex.crossJoin(F.broadcast(ix))
        .crossJoin(F.broadcast(sums))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_intersection",
            F.round(ea, 4).alias("est_a"),
            F.round(eb, 4).alias("est_b"),
            F.round(eu, 4).alias("est_union"),
            F.round(ea + eb - eu, 4).alias("est_intersection"),
            F.round(
                F.abs((ea + eb - eu) / F.col("exact_intersection") - 1)
                * 100,
                4,
            ).alias("intersection_err_pct"),
        )
    )

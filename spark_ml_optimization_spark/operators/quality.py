"""Data-quality audit operators: column profiling, referential-integrity
checks, constraint/rule audits, and key-uniqueness verification.

A 100 TB corpus or warehouse ingest pipeline runs these continuously —
they are the "is the data sane" gate that precedes any analytics or
training-data build.  All four are deterministic aggregations with exact
DuckDB oracles.

100 TB posture:
- Profiling is a single full scan with partial aggregation per column;
  the only shuffle carries one row per (aggregate, column) pair.  Exact
  countDistinct becomes `approx_count_distinct` at scale (same plan
  shape, no extra expand); the q28 twin documents the swap.
- Referential-integrity anti-joins broadcast the parent key set when the
  parent is a dim (nation, region, supplier); fact-vs-fact edges
  (lineitem→orders) shuffle on the join key like any equi-join and AQE
  handles skew.  Orphan COUNTING never materializes orphan rows.
- Constraint audits are map-side predicates folded into one pass —
  adding a rule adds a conditional-sum column, not a scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "qd01_column_profile",
    oracle="""
        SELECT 'l_quantity' AS col_name,
               count(*) AS n_rows,
               count(*) - count(l_quantity) AS n_null,
               count(DISTINCT l_quantity) AS n_distinct,
               CAST(min(l_quantity) AS VARCHAR) AS min_s,
               CAST(max(l_quantity) AS VARCHAR) AS max_s
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', count(*), count(*) - count(l_discount),
               count(DISTINCT l_discount),
               CAST(min(l_discount) AS VARCHAR), CAST(max(l_discount) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
        FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
               count(DISTINCT l_linestatus), min(l_linestatus), max(l_linestatus)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
               count(DISTINCT l_shipdate),
               strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S'),
               strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')
        FROM lineitem
    """,
    doc="Column profiling: null count, exact distinct count, min/max per "
    "column of the fact table, long format (one row per column).  Two "
    "plans share one scan each: (a) min/max/null for every column in a "
    "single plain aggregate (no Expand), and (b) exact distinct counts "
    "via the two-level trick — explode each row to (col, value) pairs, "
    "groupBy(col, value) with map-side partial agg, then count per col.  "
    "N countDistinct in ONE aggregate would make Catalyst Expand the "
    "fact N× through a single exchange (measured 6.0 s vs 1.9 s at "
    "sf0.1); the pair plan's shuffle carries only distinct pairs.  At "
    "100 TB the exact pass swaps for approx_count_distinct (plain agg, "
    "no Expand, one scan total).",
)
def qd01_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    fmt = "yyyy-MM-dd HH:mm:ss"
    specs = {
        "l_quantity": (F.min("l_quantity").cast("string"), F.max("l_quantity").cast("string")),
        "l_discount": (F.min("l_discount").cast("string"), F.max("l_discount").cast("string")),
        "l_returnflag": (F.min("l_returnflag"), F.max("l_returnflag")),
        "l_linestatus": (F.min("l_linestatus"), F.max("l_linestatus")),
        "l_shipdate": (
            F.date_format(F.min("l_shipdate"), fmt),
            F.date_format(F.max("l_shipdate"), fmt),
        ),
    }
    cols = list(specs)
    one = li.agg(
        n.alias("n_rows"),
        *[
            agg
            for c, (min_s, max_s) in specs.items()
            for agg in (
                (n - F.count(c)).alias(f"{c}__null"),
                min_s.alias(f"{c}__min"),
                max_s.alias(f"{c}__max"),
            )
        ],
    )
    stack = ", ".join(f"'{c}', {c}__null, {c}__min, {c}__max" for c in cols)
    base = one.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_null, min_s, max_s)",
        "n_rows",
    )
    pair_entries = [e for c in cols for e in (F.lit(c), F.col(c).cast("string"))]
    distinct_counts = (
        li.select(F.explode(F.create_map(*pair_entries)).alias("col_name", "v"))
        .filter(F.col("v").isNotNull())
        .groupBy("col_name", "v")
        .count()
        .groupBy("col_name")
        .agg(F.count("*").alias("n_distinct"))
    )
    # LEFT join: an all-NULL column yields zero (col,value) pairs, so it
    # has no distinct-counts row — it must still profile (n_distinct=0),
    # matching countDistinct semantics and the oracle.
    return (
        base.join(F.broadcast(distinct_counts), "col_name", "left")
        .withColumn("n_distinct", F.coalesce("n_distinct", F.lit(0)))
        .select("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
    )


#: FK edges of the star schema + LLM tables: (edge name, child table,
#: child key, parent table, parent key, parent is a broadcastable dim).
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey", True),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey", True),
)


@register(
    "qd02_referential_integrity",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{edge}' AS fk_edge,
               count(*) AS n_child,
               count(*) FILTER (WHERE NOT EXISTS (
                   SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey}
               )) AS n_orphans
        FROM {child} c
        """
        for edge, child, ckey, parent, pkey, _ in _FK_EDGES
    ),
    doc="Referential-integrity audit over every FK edge in the schema: "
    "child row count + orphan count (child keys with no parent).  All "
    "edges sharing a child table fold into ONE scan of that child: each "
    "parent key set left-joins on (dims broadcast, the lineitem->orders "
    "fact edge shuffles once and AQE can skew-split it), and orphans "
    "are conditional sums over the joined row — the naive per-edge "
    "anti-join probe scans the fact 2x per edge (6x total for "
    "lineitem; measured 4.8 s vs 1.9 s at sf0.1).  Orphans are "
    "counted, never materialized.",
)
def qd02_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    by_child: dict[str, list[tuple[str, str, str, str, bool]]] = {}
    for edge, child, ckey, parent, pkey, is_dim in _FK_EDGES:
        by_child.setdefault(child, []).append((edge, ckey, parent, pkey, is_dim))
    parts = []
    for child, edges in by_child.items():
        c = load_table(spark, sf_dir, child)
        joined = c.select([F.col(ckey) for _, ckey, *_ in edges])
        markers = []
        for i, (edge, ckey, parent, pkey, is_dim) in enumerate(edges):
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pkey).alias(f"__p{i}"))
                .distinct()
            )
            if is_dim:
                p = F.broadcast(p)
            joined = joined.join(p, joined[ckey] == p[f"__p{i}"], "left")
            markers.append((edge, f"__p{i}"))
        stats = joined.agg(
            F.count(F.lit(1)).alias("n_child"),
            *[
                F.sum(F.col(m).isNull().cast("long")).alias(f"orph_{i}")
                for i, (_, m) in enumerate(markers)
            ],
        )
        stack = ", ".join(
            f"'{edge}', orph_{i}" for i, (edge, _) in enumerate(markers)
        )
        parts.append(
            stats.selectExpr(
                f"stack({len(markers)}, {stack}) AS (fk_edge, n_orphans)",
                "n_child",
            ).select("fk_edge", "n_child", "n_orphans")
        )
    return reduce(DataFrame.unionByName, parts)


@register(
    "qd03_constraint_audit",
    oracle="""
        SELECT 'discount_range' AS rule, count(*) AS n_checked,
               count(*) FILTER (WHERE l_discount NOT BETWEEN 0.0 AND 0.10) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'tax_range', count(*),
               count(*) FILTER (WHERE l_tax NOT BETWEEN 0.0 AND 0.08)
        FROM lineitem
        UNION ALL
        SELECT 'quantity_range', count(*),
               count(*) FILTER (WHERE l_quantity NOT BETWEEN 1.0 AND 50.0)
        FROM lineitem
        UNION ALL
        SELECT 'price_positive', count(*),
               count(*) FILTER (WHERE l_extendedprice <= 0.0)
        FROM lineitem
        UNION ALL
        SELECT 'ship_not_before_order', count(*),
               count(*) FILTER (WHERE l_shipdate < o_orderdate)
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    doc="Constraint/rule audit: four single-pass map-side range rules "
    "over the fact table (one scan, one conditional-sum per rule — "
    "adding a rule adds a column, not a scan) plus one cross-table rule "
    "(ship date not before order date) as a shuffled equi-join.  Output "
    "is (rule, n_checked, n_violations).",
)
def qd03_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = F.count(F.lit(1))

    def viol(cond):  # count of rows violating the rule
        return F.sum(F.when(cond, 1).otherwise(0))

    single = li.agg(
        n.alias("n_checked"),
        viol(~F.col("l_discount").between(0.0, 0.10)).alias("v_discount"),
        viol(~F.col("l_tax").between(0.0, 0.08)).alias("v_tax"),
        viol(~F.col("l_quantity").between(1.0, 50.0)).alias("v_qty"),
        viol(F.col("l_extendedprice") <= 0.0).alias("v_price"),
    ).selectExpr(
        "stack(4, 'discount_range', v_discount, 'tax_range', v_tax, "
        "'quantity_range', v_qty, 'price_positive', v_price) AS (rule, n_violations)",
        "n_checked",
    )
    joined = (
        li.select("l_orderkey", "l_shipdate")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(
            F.lit("ship_not_before_order").alias("rule"),
            n.alias("n_checked"),
            viol(F.col("l_shipdate") < F.col("o_orderdate")).alias("n_violations"),
        )
    )
    cols = ["rule", "n_checked", "n_violations"]
    return single.select(*cols).unionByName(joined.select(*cols))


#: (table, primary-key expression for uniqueness check).
_PK = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


@register(
    "qd04_key_uniqueness",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{t}' AS tbl, count(*) AS n_rows,
               count(DISTINCT {k}) AS n_distinct_keys,
               count(*) - count(DISTINCT {k}) AS n_dup_keys
        FROM {t}
        """
        for t, k in _PK
    )
    + """
        UNION ALL
        SELECT 'lineitem', count(*),
               count(DISTINCT (l_orderkey, l_linenumber)),
               count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        FROM lineitem
    """,
    doc="Primary-key uniqueness audit for all ten tables (composite key "
    "for lineitem): row count vs distinct-key count.  Each table is one "
    "partial-agg scan; the union of ten one-row frames is driver-cheap "
    "at any scale because only the counts move.",
)
def qd04_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for t, k in _PK:
        df = load_table(spark, sf_dir, t)
        parts.append(
            df.agg(
                F.lit(t).alias("tbl"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(k).alias("n_distinct_keys"),
                (F.count(F.lit(1)) - F.countDistinct(k)).alias("n_dup_keys"),
            )
        )
    li = load_table(spark, sf_dir, "lineitem")
    parts.append(
        li.agg(
            F.lit("lineitem").alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_orderkey", "l_linenumber").alias("n_distinct_keys"),
            (F.count(F.lit(1)) - F.countDistinct("l_orderkey", "l_linenumber")).alias(
                "n_dup_keys"
            ),
        )
    )
    return reduce(DataFrame.unionByName, parts)


@register(
    "qd05_iqr_outliers",
    oracle="""
        WITH bounds AS (
            SELECT event_type,
                   percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
                   percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
            FROM events
            GROUP BY event_type
        )
        SELECT e.event_type,
               count(*) AS n_events,
               count(*) FILTER (
                   WHERE e.value < b.q1 - 1.5 * (b.q3 - b.q1)
                      OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
               ) AS n_outliers,
               round(count(*) FILTER (
                   WHERE e.value < b.q1 - 1.5 * (b.q3 - b.q1)
                      OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
               ) * 100.0 / count(*), 4) AS outlier_pct,
               round(max(b.q3 - b.q1), 6) AS iqr
        FROM events e
        JOIN bounds b ON e.event_type = b.event_type
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    doc="Tukey-fence outlier audit: per-group exact quartiles (one "
    "shuffle, percentile in the agg), bounds broadcast back onto the "
    "stream of events (5-row dim — no second fact shuffle), conditional "
    "count.  The per-group IQR fence is the standard numeric-column "
    "screen in data-quality gates before training-data export.",
)
def qd05_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy(F.col("event_type").alias("bt")).agg(
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.75).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    is_out = (F.col("value") < lo) | (F.col("value") > hi)
    return (
        e.join(F.broadcast(bounds), e.event_type == F.col("bt"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
            F.round(
                F.sum(is_out.cast("long")) * 100.0 / F.count("*"), 4
            ).alias("outlier_pct"),
            F.round(F.max(F.col("q3") - F.col("q1")), 6).alias("iqr"),
        )
        .orderBy("event_type")
    )


@register(
    "qd06_winsorize",
    oracle="""
        WITH bounds AS (
            SELECT event_type,
                   percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS p05,
                   percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS p95
            FROM events
            GROUP BY event_type
        )
        SELECT e.event_type,
               count(*) AS n_events,
               round(avg(e.value), 6) AS avg_raw,
               round(avg(greatest(b.p05, least(b.p95, e.value))), 6)
                   AS avg_winsorized,
               count(*) FILTER (WHERE e.value < b.p05 OR e.value > b.p95)
                   AS n_clipped
        FROM events e
        JOIN bounds b ON e.event_type = b.event_type
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    doc="Winsorization: clamp each group's numeric tail to its exact "
    "[p05, p95] band — the outlier-robust normalization used before "
    "aggregating reward/score columns.  Same two-phase shape as the "
    "qd05 fence audit: one percentile shuffle over the facts, bounds "
    "rebroadcast (group-cardinality rows), clamp + aggregate map-side.",
)
def qd06_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy(F.col("event_type").alias("bt")).agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    wins = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value")))
    clipped = (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))
    return (
        e.join(F.broadcast(bounds), e.event_type == F.col("bt"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_raw"),
            F.round(F.avg(wins), 6).alias("avg_winsorized"),
            F.sum(clipped.cast("long")).alias("n_clipped"),
        )
        .orderBy("event_type")
    )


@register(
    "qd07_histogram",
    oracle="""
        WITH params AS (
            SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
            FROM orders
        )
        SELECT CAST(least(floor((o_totalprice - p.lo) / ((p.hi - p.lo) / 20.0)),
                           19) AS INT) AS bucket,
               count(*) AS n_orders,
               round(min(o_totalprice), 2) AS bucket_min,
               round(max(o_totalprice), 2) AS bucket_max
        FROM orders, params p
        GROUP BY 1
        ORDER BY bucket
    """,
    doc="Equi-width histogram (20 buckets over the o_totalprice domain): "
    "min/max via a 1-row broadcast scalar aggregate, bucket index as "
    "map-side arithmetic, one count shuffle of bucket ids only — the "
    "distribution-drift panel behind every data-quality dashboard.  "
    "The top edge folds into the last bucket (least(...,19)), matching "
    "width_bucket semantics without its off-by-one final bound.",
)
def qd07_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    params = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / width), F.lit(19)
    ).cast("int")
    return (
        o.crossJoin(F.broadcast(params))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
        .orderBy("bucket")
    )


@register(
    "qd08_mad_outliers",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS m
            FROM events GROUP BY event_type
        ), dev AS (
            SELECT e.event_type, e.value, m.m,
                   abs(e.value - m.m) AS adev
            FROM events e JOIN med m ON e.event_type = m.event_type
        ), mad AS (
            SELECT event_type,
                   max(m) AS m,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               count(*) AS n_events,
               round(max(a.mad), 6) AS mad,
               count(*) FILTER (
                   WHERE abs(d.value - a.m) > 3.0 * 1.4826 * a.mad
               ) AS n_outliers
        FROM dev d JOIN mad a ON d.event_type = a.event_type
        GROUP BY d.event_type
        ORDER BY d.event_type
    """,
    doc="Robust (median/MAD) outlier screen: |x - median| > 3·1.4826·MAD "
    "per group — the heavy-tail-immune twin of the qd05 IQR fence "
    "(mean/stddev z-scores break when the outliers ARE the "
    "contamination).  Two exact-percentile phases (median, then median "
    "absolute deviation), each a fact shuffle + group-cardinality "
    "broadcast back; the 1.4826 constant scales MAD to σ under "
    "normality.",
)
def qd08_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy(F.col("event_type").alias("mt")).agg(
        F.percentile("value", 0.5).alias("m")
    )
    dev = e.join(F.broadcast(med), e.event_type == F.col("mt")).select(
        "event_type", "value", "m", F.abs(F.col("value") - F.col("m")).alias("adev")
    )
    mad = dev.groupBy(F.col("event_type").alias("at")).agg(
        F.max("m").alias("m2"), F.percentile("adev", 0.5).alias("mad")
    )
    is_out = F.abs(F.col("value") - F.col("m2")) > 3.0 * 1.4826 * F.col("mad")
    return (
        dev.join(F.broadcast(mad), dev.event_type == F.col("at"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(is_out.cast("long")).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "qd09_benford_drift",
    oracle="""
        WITH digits AS (
            SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                       AS digit
            FROM orders
            WHERE o_totalprice > 0
        ),
        obs AS (
            SELECT digit, count(*) AS n_obs FROM digits GROUP BY digit
        ),
        tot AS (SELECT sum(n_obs) AS n FROM obs)
        SELECT
            o.digit,
            o.n_obs,
            round(o.n_obs * 1.0 / t.n, 6) AS obs_share,
            round(log10(1.0 + 1.0 / CAST(o.digit AS INTEGER)), 6) AS benford_share,
            round(abs(o.n_obs * 1.0 / t.n
                      - log10(1.0 + 1.0 / CAST(o.digit AS INTEGER))), 6) AS abs_gap
        FROM obs o CROSS JOIN tot t
    """,
    doc="Benford's-law first-significant-digit audit over order totals — "
    "the classic drift/fabrication screen for financial measures.  The "
    "first digit is extracted through integer cents (CAST(round(x*100) "
    "AS BIGINT) → string head), never through float log10 buckets, so "
    "both engines agree bitwise at digit boundaries.  One scan, one "
    "9-row agg, and the 1-row total joins back as a broadcast — the "
    "same shape at any scale.  Reading: abs_gap per digit vs the "
    "log10(1+1/d) expectation; a uniform fixture generator shows large "
    "gaps (the audit firing), organically-priced data shows small ones.",
)
def qd09_benford_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
            1,
            1,
        ).alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    share = F.col("n_obs") / F.col("n")
    benford = F.log10(1.0 + 1.0 / F.col("digit").cast("int"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        F.round(share, 6).alias("obs_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(F.abs(share - benford), 6).alias("abs_gap"),
    )


@register(
    "qd10_functional_dependency",
    oracle="""
        WITH checks AS (
            SELECT 'orderkey->custkey' AS dependency,
                   count(*) AS n_keys,
                   count(*) FILTER (n_rhs > 1) AS n_violating_keys
            FROM (
                SELECT o_orderkey, count(DISTINCT o_custkey) AS n_rhs
                FROM orders GROUP BY o_orderkey
            )
            UNION ALL
            SELECT 'custkey->nationkey',
                   count(*),
                   count(*) FILTER (n_rhs > 1)
            FROM (
                SELECT c_custkey, count(DISTINCT c_nationkey) AS n_rhs
                FROM customer GROUP BY c_custkey
            )
            UNION ALL
            SELECT 'orderkey->orderdate(lineitem-join)',
                   count(*),
                   count(*) FILTER (n_rhs > 1)
            FROM (
                SELECT l.l_orderkey, count(DISTINCT o.o_orderdate) AS n_rhs
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                GROUP BY l.l_orderkey
            )
        )
        SELECT * FROM checks
    """,
    doc="Functional-dependency audit: does X→Y actually hold in the "
    "data?  Each declared dependency becomes one groupBy(X) counting "
    "distinct Y — a key with >1 RHS value is a violation (silent "
    "denormalization drift / bad joins upstream).  Violation counts "
    "are 0 on the healthy fixture; the operator's value is the shape: "
    "per-dependency one partial-agged shuffle on X, unioned into a "
    "single small report — at 100 TB each check is one pass over the "
    "child table, and dependencies sharing an X key share a scan "
    "(qd02's fold applies).",
)
def qd10_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    def check(df: DataFrame, x: str, y: str, name: str) -> DataFrame:
        per_key = df.groupBy(x).agg(F.count_distinct(y).alias("n_rhs"))
        return per_key.agg(
            F.lit(name).alias("dependency"),
            F.count("*").alias("n_keys"),
            F.sum((F.col("n_rhs") > 1).cast("long")).alias("n_violating_keys"),
        )

    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_orderdate"
    )
    return (
        check(o, "o_orderkey", "o_custkey", "orderkey->custkey")
        .unionByName(check(c, "c_custkey", "c_nationkey", "custkey->nationkey"))
        .unionByName(
            check(joined, "l_orderkey", "o_orderdate", "orderkey->orderdate(lineitem-join)")
        )
    )


@register(
    "qd11_temporal_consistency",
    oracle="""
        WITH j AS (
            SELECT l.l_orderkey,
                   l.l_shipdate,
                   o.o_orderdate,
                   date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT
            count(*) AS n_lines,
            CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_ship_before_order,
            CAST(sum(CASE WHEN lag_days > 120 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_over_120d,
            min(lag_days) AS min_lag_days,
            max(lag_days) AS max_lag_days,
            round(avg(lag_days), 4) AS avg_lag_days
        FROM j
    """,
    doc="Cross-table temporal-consistency audit: every lineitem must "
    "ship on/after its order date and within a 120-day SLA — the "
    "event-ordering rule class that single-table constraint audits "
    "(qd03) can't see.  One fact-fact equi-join on the shared key "
    "(orders is the smaller side; at driver scale AQE picks broadcast, "
    "at 100 TB both sides co-partition on orderkey — same plan as "
    "qa-family joins) then a single global agg over day-lag "
    "expressions.  Emits violation counts + the lag distribution "
    "envelope, one row.",
)
def qd11_temporal_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_shipdate",
        "o_orderdate",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lag_days"),
    )
    return j.agg(
        F.count("*").alias("n_lines"),
        F.sum((F.col("l_shipdate") < F.col("o_orderdate")).cast("long")).alias(
            "n_ship_before_order"
        ),
        F.sum((F.col("lag_days") > 120).cast("long")).alias("n_over_120d"),
        F.min("lag_days").cast("long").alias("min_lag_days"),
        F.max("lag_days").cast("long").alias("max_lag_days"),
        F.round(F.avg("lag_days"), 4).alias("avg_lag_days"),
    )


@register(
    "qd12_chi_square_contingency",
    oracle="""
        WITH t AS (
            SELECT CAST(lang = 'en' AS INT) AS is_en,
                   CAST(length(source) % 2 AS INT) AS label
            FROM documents
        ),
        obs AS (
            SELECT is_en, label, count(*) AS o FROM t GROUP BY is_en, label
        ),
        rt AS (SELECT is_en, sum(o) AS r FROM obs GROUP BY is_en),
        ct AS (SELECT label, sum(o) AS c FROM obs GROUP BY label),
        tot AS (SELECT sum(o) AS n FROM obs),
        grid AS (
            SELECT rt.is_en, ct.label,
                   CAST(rt.r AS DOUBLE) AS r, CAST(ct.c AS DOUBLE) AS c,
                   CAST(tot.n AS DOUBLE) AS n,
                   CAST(coalesce(obs.o, 0) AS DOUBLE) AS o
            FROM rt CROSS JOIN ct CROSS JOIN tot
            LEFT JOIN obs ON obs.is_en = rt.is_en AND obs.label = ct.label
        )
        SELECT
            round(sum(pow(o - r * c / n, 2) / (r * c / n)), 4) AS statistic,
            CAST((count(DISTINCT is_en) - 1) * (count(DISTINCT label) - 1)
                 AS BIGINT) AS dof,
            CAST(max(n) AS BIGINT) AS n_rows
        FROM grid
    """,
    doc="Pearson chi-square independence statistic computed PURELY "
    "relationally (the SQL-verified twin of ml16's MLlib ChiSquareTest; "
    "parity on the shared (is_en, label) pair is unit-pinned in "
    "tests/test_ml_shapes.py): observed contingency cells from one "
    "group-by, expected r*c/n from broadcast row/col margins, "
    "sum((O-E)^2/E) over the FULL margin grid so zero cells still "
    "contribute their expectation.  Scale shape: cell count is the "
    "product of category cardinalities (tiny), so everything after the "
    "first corpus-sized group-by is broadcast arithmetic — the "
    "feature-screening statistic for a 100 TB corpus at the cost of "
    "one scan.",
)
def qd12_chi_square_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").cast("int").alias("is_en"),
        (F.length("source") % 2).cast("int").alias("label"),
    )
    obs = d.groupBy("is_en", "label").agg(F.count("*").alias("o"))
    rt = obs.groupBy("is_en").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("label").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(obs), ["is_en", "label"], "left")
        .select(
            "is_en",
            "label",
            F.col("r").cast("double").alias("r"),
            F.col("c").cast("double").alias("c"),
            F.col("n").cast("double").alias("n"),
            F.coalesce(F.col("o"), F.lit(0)).cast("double").alias("o"),
        )
    )
    e = F.col("r") * F.col("c") / F.col("n")
    return grid.agg(
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 4).alias("statistic"),
        (
            (F.count_distinct("is_en") - 1) * (F.count_distinct("label") - 1)
        ).cast("long").alias("dof"),
        F.max("n").cast("long").alias("n_rows"),
    )


@register(
    "qd13_psi_drift",
    oracle="""
        WITH ref AS (
            SELECT o_totalprice FROM orders WHERE year(o_orderdate) <= 1997
        ),
        cur AS (
            SELECT o_totalprice FROM orders WHERE year(o_orderdate) > 1997
        ),
        edges AS (
            SELECT quantile_cont(o_totalprice,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
            FROM ref
        ),
        binned AS (
            SELECT 'ref' AS side,
                   1 + len(list_filter((SELECT e FROM edges),
                                       x -> o_totalprice > x)) AS bin
            FROM ref
            UNION ALL
            SELECT 'cur',
                   1 + len(list_filter((SELECT e FROM edges),
                                       x -> o_totalprice > x))
            FROM cur
        ),
        counts AS (
            SELECT bin,
                   count(CASE WHEN side = 'ref' THEN 1 END) AS n_ref,
                   count(CASE WHEN side = 'cur' THEN 1 END) AS n_cur
            FROM binned GROUP BY bin
        ),
        tot AS (
            SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts
        )
        SELECT bin,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               round((greatest(n_cur * 1.0 / t_cur, 0.000001)
                      - greatest(n_ref * 1.0 / t_ref, 0.000001))
                     * ln(greatest(n_cur * 1.0 / t_cur, 0.000001)
                          / greatest(n_ref * 1.0 / t_ref, 0.000001)),
                     6) AS psi_term
        FROM counts CROSS JOIN tot
        ORDER BY bin
    """,
    doc="Population Stability Index (PSI) drift audit — THE standard "
    "production monitor for feature/score drift: the reference slice "
    "(orders through 1997) defines 10 equi-depth bins via exact "
    "deciles, both slices histogram against those SAME edges, and "
    "each bin contributes (p_cur - p_ref) * ln(p_cur/p_ref).  Emits "
    "per-bin terms (sum > 0.2 = actionable drift by the usual rule of "
    "thumb); per-bin output keeps every value a single two-double "
    "expression — no cross-engine summation-order concern at all.  "
    "Scale shape: one percentile pass on the reference (at 100 TB: "
    "approx_percentile, same plan), then ONE scan of each slice "
    "binned map-side against the broadcast 9-edge array; the shuffle "
    "carries 10 bin counts.  Bin membership uses the HOF count-of-"
    "edges-below trick — identical expression in both engines, no "
    "searchsorted UDF.",
)
def qd13_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..api import psi_drift

    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.year("o_orderdate") <= 1997, "ref").otherwise("cur").alias("side"),
        "o_totalprice",
    )
    return psi_drift(o, "o_totalprice", "side")


@register(
    "qd14_ks_drift",
    oracle="""
        WITH labeled AS (
            SELECT CASE WHEN year(o_orderdate) <= 1997 THEN 'ref' ELSE 'cur' END
                       AS side,
                   o_totalprice AS v
            FROM orders
        ),
        edges AS (
            SELECT quantile_cont(v, [
                0.01,0.02,0.03,0.04,0.05,0.06,0.07,0.08,0.09,0.10,
                0.15,0.20,0.25,0.30,0.35,0.40,0.45,0.50,0.55,0.60,
                0.65,0.70,0.75,0.80,0.85,0.90,0.91,0.92,0.93,0.94,
                0.95,0.96,0.97,0.98,0.99]) AS e
            FROM labeled
        ),
        binned AS (
            SELECT side,
                   len(list_filter((SELECT e FROM edges), x -> v > x)) AS bin
            FROM labeled
        ),
        counts AS (
            SELECT bin,
                   count(CASE WHEN side = 'ref' THEN 1 END) AS n_ref,
                   count(CASE WHEN side = 'cur' THEN 1 END) AS n_cur
            FROM binned GROUP BY bin
        ),
        cdf AS (
            SELECT bin,
                   sum(n_ref) OVER (ORDER BY bin) * 1.0
                       / (SELECT sum(n_ref) FROM counts) AS cdf_ref,
                   sum(n_cur) OVER (ORDER BY bin) * 1.0
                       / (SELECT sum(n_cur) FROM counts) AS cdf_cur
            FROM counts
        )
        SELECT CAST((SELECT sum(n_ref) FROM counts) AS BIGINT) AS n_ref,
               CAST((SELECT sum(n_cur) FROM counts) AS BIGINT) AS n_cur,
               round(max(abs(cdf_ref - cdf_cur)), 6) AS ks_stat
        FROM cdf
    """,
    doc="Kolmogorov-Smirnov drift statistic on a quantile grid: both "
    "slices' empirical CDFs are evaluated at 35 combined-distribution "
    "percentile edges (denser in the tails) and KS = max |CDF_ref - "
    "CDF_cur| over the grid — the scale-sane KS: the textbook statistic "
    "needs a GLOBAL sort of all values (single-reducer at 100 TB), "
    "while the grid form is one percentile pass (approx_percentile at "
    "scale) + one map-side HOF binning scan + a 36-row window.  "
    "Complements qd13's PSI (which weights by probability mass; KS "
    "catches location shifts PSI's coarse bins can smear).  All "
    "arithmetic is integer-count ratios computed identically in both "
    "engines; max() is order-insensitive, so no summation caveat.",
)
def qd14_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..api import ks_drift

    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.year("o_orderdate") <= 1997, "ref").otherwise("cur").alias("side"),
        F.col("o_totalprice").alias("v"),
    )
    return ks_drift(o, "v", "side")


@register(
    "qd15_key_skew_gini",
    oracle="""
        WITH per_key AS (
            SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey
        ),
        ranked AS (
            SELECT n,
                   row_number() OVER (ORDER BY n, l_suppkey) AS i,
                   count(*) OVER () AS k,
                   sum(n) OVER () AS tot
            FROM per_key
        )
        SELECT 'lineitem.l_suppkey' AS key_col,
               CAST(max(k) AS BIGINT) AS n_keys,
               CAST(max(tot) AS BIGINT) AS n_rows,
               round(CAST(max(tot) AS DOUBLE) / max(k), 4) AS mean_rows_per_key,
               CAST(max(mx) AS BIGINT) AS max_rows_per_key,
               round(sum((2.0 * i - k - 1) * n)
                     / (CAST(max(k) AS DOUBLE) * max(tot)), 6) AS gini
        FROM (SELECT *, max(n) OVER () AS mx FROM ranked)
    """,
    doc="Join-key SKEW audit via the Gini coefficient of the per-key row "
    "distribution: 0 = perfectly uniform partitions, ->1 = a few keys "
    "hold everything (the shape that melts a shuffle).  Computed "
    "relationally with the sorted-rank formula sum((2i-k-1)·n_i)/(k·N) "
    "over the KEYSPACE (one fact-scan agg, then a keyspace-sized "
    "window — suppliers, not lineitems, get sorted; deterministic "
    "(n, key) tiebreak).  This is the quantitative trigger for the "
    "engine's skew toolbox: Gini above ~0.6 on a join key is the cue "
    "to reach for q48's salting or AQE skew-join before the 100 TB "
    "run, not after it spills.  Max-rows-per-key rides along as the "
    "absolute hot-key bound.  The keyspace rank is DISTRIBUTED "
    "(dist_rank.distributed_row_number — range exchange + "
    "pid-partitioned rank + broadcast offsets), so even a ~1e9-key "
    "fact table never funnels one WindowExec task; the numerator is "
    "algebraically decomposed (sum((2i-k-1)n) = 2·sum(i·n) − "
    "(k+1)·sum(n), exact integers) so the per-row k broadcast the "
    "oracle uses is unnecessary.  The bounded-histogram sketch twin "
    "is qd15b (digit-binned counts).",
)
def qd15_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dist_rank import distributed_row_number

    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count("*").alias("n"))
    # One materialization of the narrow per-key relation (the qa24
    # lesson: the range-sampling job recomputes the fact scan otherwise).
    per_key = per_key.localCheckpoint(eager=True)
    ranked = distributed_row_number(
        per_key, [F.col("n").asc(), F.col("l_suppkey").asc()], "i"
    ).select("n", "i")
    return ranked.agg(
        F.lit("lineitem.l_suppkey").alias("key_col"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.round(F.sum("n").cast("double") / F.count("*"), 4).alias(
            "mean_rows_per_key"
        ),
        F.max("n").cast("long").alias("max_rows_per_key"),
        F.round(
            (
                2.0 * F.sum(F.col("i") * F.col("n"))
                - (F.count("*") + 1).cast("double") * F.sum("n")
            )
            / (F.count("*").cast("double") * F.sum("n")),
            6,
        ).alias("gini"),
    )


@register(
    "qd15b_key_skew_gini_binned",
    oracle="""
        WITH per_key AS (
            SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey
        ),
        bins AS (
            SELECT length(CAST(n AS VARCHAR)) AS d,
                   count(*) AS k_b,
                   sum(n) AS tot_b,
                   max(n) AS mx_b
            FROM per_key GROUP BY d
        ),
        ranked AS (
            SELECT d, k_b, tot_b, mx_b,
                   COALESCE(sum(k_b) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS keys_before
            FROM bins
        ),
        tot AS (
            SELECT sum(k_b) AS k, sum(tot_b) AS nrows, count(*) AS nb,
                   max(mx_b) AS mx,
                   sum(tot_b * (keys_before + (k_b + 1) / 2.0)) AS grank_sum
            FROM ranked
        )
        SELECT 'lineitem.l_suppkey' AS key_col,
               CAST(k AS BIGINT) AS n_keys,
               CAST(nrows AS BIGINT) AS n_rows,
               CAST(nb AS BIGINT) AS n_bins,
               CAST(mx AS BIGINT) AS max_rows_per_key,
               round((2.0 * grank_sum - (k + 1) * nrows) / (k * nrows), 6)
                   AS gini_binned
        FROM tot
    """,
    doc="BINNED-HISTOGRAM key-skew Gini — qd15's executable 100 TB "
    "sketch path: per-key counts collapse to a DECIMAL-DIGIT-COUNT "
    "histogram (length(CAST(n AS VARCHAR)) — exact in both engines, "
    "<= 19 bins for any BIGINT count), so nothing keyspace-sized is "
    "ever ranked: one map-side fact agg, one <= 19-row bounded "
    "window.  Within a bin every key is treated as holding the bin "
    "mean, which makes the grouped rank-sum closed-form — "
    "sum_bin(tot_b * (keys_before + (k_b+1)/2)), exact half-integers "
    "— and the grouped Gini a LOWER bound of qd15's exact Gini "
    "(within-bin inequality is ignored); tests/test_ml_shapes.py "
    "pins both the bound and closeness on the fixture.  The trigger "
    "semantics survive binning: a hot key inflates the top digit "
    "bin's mass, which is what the salting decision needs.",
)
def qd15b_key_skew_gini_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count("*").alias("n"))
    bins = per_key.groupBy(
        F.length(F.col("n").cast("string")).alias("d")
    ).agg(
        F.count("*").alias("k_b"),
        F.sum("n").alias("tot_b"),
        F.max("n").alias("mx_b"),
    )
    # Bounded spine: <= 19 digit bins (allowlisted as bounded-domain).
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    ranked = bins.select(
        "d",
        "k_b",
        "tot_b",
        "mx_b",
        F.coalesce(F.sum("k_b").over(w), F.lit(0)).alias("keys_before"),
    )
    tot = ranked.agg(
        F.sum("k_b").alias("k"),
        F.sum("tot_b").alias("nrows"),
        F.count("*").alias("nb"),
        F.max("mx_b").alias("mx"),
        F.sum(
            F.col("tot_b") * (F.col("keys_before") + (F.col("k_b") + 1) / 2.0)
        ).alias("grank_sum"),
    )
    return tot.select(
        F.lit("lineitem.l_suppkey").alias("key_col"),
        F.col("k").cast("long").alias("n_keys"),
        F.col("nrows").cast("long").alias("n_rows"),
        F.col("nb").cast("long").alias("n_bins"),
        F.col("mx").cast("long").alias("max_rows_per_key"),
        F.round(
            (2.0 * F.col("grank_sum") - (F.col("k") + 1) * F.col("nrows"))
            / (F.col("k").cast("double") * F.col("nrows")),
            6,
        ).alias("gini_binned"),
    )


@register(
    "qd16_volume_anomaly",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS day,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        stats AS (
            SELECT avg(n_orders) AS mu, stddev_samp(n_orders) AS sd
            FROM daily
        )
        SELECT CAST(day AS VARCHAR) AS day,
               CAST(n_orders AS BIGINT) AS n_orders,
               round((n_orders - mu) / sd, 6) AS z,
               CAST(abs(n_orders - mu) > 2 * sd AS INT) AS is_anomaly
        FROM daily CROSS JOIN stats
    """,
    doc="Ingest-volume anomaly audit: daily arrival counts z-scored "
    "against the table's own mean/stddev, |z| > 2 flagged — the "
    "pipeline-health monitor that catches a dropped feed or a "
    "double-delivery BEFORE value-level audits (qd05/qd08 outliers, "
    "qd13 drift) even run, because it needs only counts.  One scan to "
    "a day-keyed partial agg (the shuffle carries one row per day), "
    "one broadcast of the two-number stats row.  Day is emitted as an "
    "ISO string (the repo's date wire form); at 100 TB the daily "
    "counts come free from partition-level metadata when the table is "
    "date-partitioned (src03's layout) — the audit then reads ZERO "
    "data files.",
)
def qd16_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.count("*").alias("n_orders"))
    stats = daily.agg(
        F.avg("n_orders").alias("mu"),
        F.stddev_samp("n_orders").alias("sd"),
    )
    return daily.crossJoin(F.broadcast(stats)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round((F.col("n_orders") - F.col("mu")) / F.col("sd"), 6).alias("z"),
        (F.abs(F.col("n_orders") - F.col("mu")) > 2 * F.col("sd"))
        .cast("int")
        .alias("is_anomaly"),
    )


@register(
    "qd17_profile_drift",
    oracle="""
        WITH prof AS (
            SELECT
                CASE WHEN year(o_orderdate) <= 1997 THEN 'ref' ELSE 'cur' END
                    AS side,
                count(*) AS n_rows,
                round(1.0 - count(o_totalprice) * 1.0 / count(*), 6)
                    AS price_null_rate,
                round(sum(o_totalprice) / count(o_totalprice), 4)
                    AS price_mean,
                count(DISTINCT o_custkey) AS custkey_distinct,
                count(DISTINCT o_orderstatus) AS status_distinct,
                count(DISTINCT o_orderpriority) AS priority_distinct
            FROM orders GROUP BY 1
        )
        SELECT m.metric,
               round(CASE m.metric
                   WHEN 'n_rows' THEN r.n_rows
                   WHEN 'price_null_rate' THEN r.price_null_rate
                   WHEN 'price_mean' THEN r.price_mean
                   WHEN 'custkey_distinct' THEN r.custkey_distinct
                   WHEN 'status_distinct' THEN r.status_distinct
                   ELSE r.priority_distinct END, 6) AS ref_val,
               round(CASE m.metric
                   WHEN 'n_rows' THEN c.n_rows
                   WHEN 'price_null_rate' THEN c.price_null_rate
                   WHEN 'price_mean' THEN c.price_mean
                   WHEN 'custkey_distinct' THEN c.custkey_distinct
                   WHEN 'status_distinct' THEN c.status_distinct
                   ELSE c.priority_distinct END, 6) AS cur_val,
               round(CASE m.metric
                   WHEN 'n_rows' THEN c.n_rows - r.n_rows
                   WHEN 'price_null_rate' THEN c.price_null_rate - r.price_null_rate
                   WHEN 'price_mean' THEN c.price_mean - r.price_mean
                   WHEN 'custkey_distinct' THEN c.custkey_distinct - r.custkey_distinct
                   WHEN 'status_distinct' THEN c.status_distinct - r.status_distinct
                   ELSE c.priority_distinct - r.priority_distinct END, 6)
                   AS delta
        FROM (VALUES ('n_rows'), ('price_null_rate'), ('price_mean'),
                     ('custkey_distinct'), ('status_distinct'),
                     ('priority_distinct')) AS m(metric)
        CROSS JOIN (SELECT * FROM prof WHERE side = 'ref') r
        CROSS JOIN (SELECT * FROM prof WHERE side = 'cur') c
    """,
    doc="Snapshot-to-snapshot PROFILE drift audit — the schema-level "
    "companion to qd13's value-level PSI: row volume, null rates, "
    "column means, and per-column distinct cardinalities are profiled "
    "on the reference slice (orders through 1997) and the current "
    "slice, emitted as long-form (metric, ref, cur, delta) rows — the "
    "table a data-contract monitor diffs per ingest batch to catch "
    "upstream schema/population changes (new enum value, nulls "
    "appearing, cardinality explosion) before they poison training "
    "data.  Scale shape: ONE scan of each slice aggregated to a "
    "single profile row per side (distinct counts become "
    "approx_count_distinct at 100 TB — same plan, documented "
    "estimate), then a 6-row metric spine unpivots the comparison "
    "driver-side-free; the shuffle carries two profile rows total.",
)
def qd17_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    prof = (
        o.select(
            F.when(F.year("o_orderdate") <= 1997, "ref").otherwise("cur").alias(
                "side"
            ),
            "o_totalprice",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
        )
        .groupBy("side")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                1.0 - F.count("o_totalprice") * 1.0 / F.count("*"), 6
            ).alias("price_null_rate"),
            F.round(
                F.sum("o_totalprice") / F.count("o_totalprice"), 4
            ).alias("price_mean"),
            F.countDistinct("o_custkey").alias("custkey_distinct"),
            F.countDistinct("o_orderstatus").alias("status_distinct"),
            F.countDistinct("o_orderpriority").alias("priority_distinct"),
        )
    )
    metrics = (
        "n_rows",
        "price_null_rate",
        "price_mean",
        "custkey_distinct",
        "status_distinct",
        "priority_distinct",
    )
    r = prof.filter(F.col("side") == "ref").alias("r")
    c = prof.filter(F.col("side") == "cur").alias("c")
    pairs = F.array(
        *[
            F.struct(
                F.lit(m).alias("metric"),
                F.col(f"r.{m}").cast("double").alias("ref_val"),
                F.col(f"c.{m}").cast("double").alias("cur_val"),
            )
            for m in metrics
        ]
    )
    return (
        r.crossJoin(F.broadcast(c))
        .select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.metric").alias("metric"),
            F.round("p.ref_val", 6).alias("ref_val"),
            F.round("p.cur_val", 6).alias("cur_val"),
            F.round(F.col("p.cur_val") - F.col("p.ref_val"), 6).alias("delta"),
        )
    )


@register(
    "qd18_key_churn_audit",
    oracle="""
        WITH ref AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE year(o_orderdate) <= 1997
        ),
        cur AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE year(o_orderdate) > 1997
        )
        SELECT
            CAST((SELECT count(*) FROM ref) AS BIGINT) AS n_ref_keys,
            CAST((SELECT count(*) FROM cur) AS BIGINT) AS n_cur_keys,
            CAST((SELECT count(*) FROM cur
                  WHERE o_custkey IN (SELECT o_custkey FROM ref)) AS BIGINT)
                AS n_retained,
            CAST((SELECT count(*) FROM cur
                  WHERE o_custkey NOT IN (SELECT o_custkey FROM ref))
                 AS BIGINT) AS n_new,
            CAST((SELECT count(*) FROM ref
                  WHERE o_custkey NOT IN (SELECT o_custkey FROM cur))
                 AS BIGINT) AS n_churned,
            round((SELECT count(*) FROM cur
                   WHERE o_custkey IN (SELECT o_custkey FROM ref)) * 1.0
                  / (SELECT count(*) FROM ref), 6) AS retention_rate
        FROM (SELECT 1)
    """,
    doc="Entity KEY CHURN between snapshots — the set-level companion "
    "to qd17's value-profile drift: distinct customer keys in the "
    "reference slice (orders through 1997) vs the current slice, "
    "split into retained / new / churned with a retention rate.  A "
    "sudden key-churn spike is the classic silent upstream-rekeying "
    "incident (ids re-minted, joins silently emptying) that value "
    "profiles miss entirely.  Scale shape: two distinct-aggregations "
    "(digest-width keys) + one semi/anti join pair on the distinct "
    "key sets — never row-level; at 100 TB both key sets also have "
    "HLL twins (qc07) when exactness can yield to one pass.",
)
def qd18_key_churn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ref = (
        o.filter(F.year("o_orderdate") <= 1997)
        .select("o_custkey")
        .distinct()
        .cache()  # read by three counting branches
    )
    cur = (
        o.filter(F.year("o_orderdate") > 1997)
        .select("o_custkey")
        .distinct()
        .cache()
    )
    n_ref = ref.agg(F.count("*").cast("long").alias("n_ref_keys"))
    n_cur = cur.agg(F.count("*").cast("long").alias("n_cur_keys"))
    retained = cur.join(ref, "o_custkey", "left_semi").agg(
        F.count("*").cast("long").alias("n_retained")
    )
    new = cur.join(ref, "o_custkey", "left_anti").agg(
        F.count("*").cast("long").alias("n_new")
    )
    churned = ref.join(cur, "o_custkey", "left_anti").agg(
        F.count("*").cast("long").alias("n_churned")
    )
    return (
        n_ref.crossJoin(F.broadcast(n_cur))
        .crossJoin(F.broadcast(retained))
        .crossJoin(F.broadcast(new))
        .crossJoin(F.broadcast(churned))
        .select(
            "n_ref_keys",
            "n_cur_keys",
            "n_retained",
            "n_new",
            "n_churned",
            F.round(F.col("n_retained") * 1.0 / F.col("n_ref_keys"), 6).alias(
                "retention_rate"
            ),
        )
    )


@register(
    "qd19_calibration_audit",
    oracle="""
        WITH scored AS (
            SELECT CAST(n_chars AS DOUBLE) / (n_chars + 256) AS score,
                   CAST(lang = 'en' AS INT) AS y
            FROM documents
        ),
        binned AS (
            SELECT CAST(floor(score * 10) AS BIGINT) AS bin, score, y
            FROM scored
        )
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(score), 4) AS avg_score,
               round(sum(y) * 1.0 / count(*), 6) AS pos_rate,
               round(abs(avg(score) - sum(y) * 1.0 / count(*)), 4)
                   AS calibration_gap
        FROM binned
        GROUP BY bin
    """,
    doc="Classifier CALIBRATION audit (reliability diagram) — the "
    "ML-ops check beside ml23's PR curve: scores bucketed into "
    "confidence deciles, each bin reporting mean predicted score vs "
    "empirical positive rate and their gap (the per-bin term of "
    "expected calibration error).  A quality/toxicity filter whose "
    "0.9-bin is right 60% of the time silently mis-prunes a corpus — "
    "this is the table that catches it.  The score here is a "
    "DETERMINISTIC monotone length-based proxy x/(x+256) (pure "
    "rational arithmetic — bit-identical across engines, so bin "
    "edges can't flake; a real model's scores arrive as a column and "
    "the audit is unchanged), labels = the 'en' indicator.  Scale: "
    "one map-side score expression + one 10-group agg; the shuffle "
    "carries 10 rows.  avg(score) is 4-dp-rounded on both sides (the "
    "aggregate-double summation-order convention); pos_rate is exact "
    "int/int.",
)
def qd19_calibration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    score = F.col("n_chars").cast("double") / (F.col("n_chars") + 256)
    y = (F.col("lang") == "en").cast("int")
    binned = d.select(
        F.floor(score * 10).cast("long").alias("bin"),
        score.alias("score"),
        y.alias("y"),
    )
    pos_rate = F.sum("y") * 1.0 / F.count("*")
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("score"), 4).alias("avg_score"),
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(F.abs(F.avg("score") - pos_rate), 4).alias("calibration_gap"),
    )


@register(
    "qd20_anomaly_episodes",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS day,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        stats AS (
            SELECT avg(n_orders) AS mu, stddev_samp(n_orders) AS sd
            FROM daily
        ),
        flagged AS (
            SELECT day, n_orders,
                   (n_orders - mu) / sd AS z
            FROM daily CROSS JOIN stats
            WHERE abs(n_orders - mu) > 2 * sd
        ),
        runs AS (
            SELECT *,
                   CASE WHEN lag(day) OVER (ORDER BY day) IS NULL
                             OR date_diff('day', lag(day) OVER (ORDER BY day),
                                          day) > 3
                        THEN 1 ELSE 0 END AS is_new
            FROM flagged
        ),
        episodes AS (
            SELECT *,
                   sum(is_new) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS ep
            FROM runs
        )
        SELECT CAST(min(day) AS VARCHAR) AS start_day,
               CAST(max(day) AS VARCHAR) AS end_day,
               CAST(count(*) AS BIGINT) AS n_anomalous_days,
               round(max(abs(z)), 6) AS peak_abs_z
        FROM episodes GROUP BY ep
    """,
    doc="Anomaly EPISODE grouping — the alerting unit above qd16's "
    "per-day flags: anomalous days (same |z| > 2 rule, same stats) "
    "are clustered into episodes by a gap-and-island pass (a new "
    "episode starts when >3 calendar days separate anomalies), each "
    "reporting its span, length, and peak |z|.  One page-duty alert "
    "per INCIDENT instead of one per day is the difference between a "
    "monitor people read and one they mute; the 3-day bridge absorbs "
    "weekends/holidays inside one incident.  Scale: daily counts are "
    "one partial agg (or free from partition metadata, qd16); the "
    "island pass windows over DAYS — a few thousand rows per decade "
    "regardless of corpus size.",
)
def qd20_anomaly_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("timestamp").cast("date").alias("day")
    ).agg(F.count("*").alias("n_orders"))
    stats = daily.agg(
        F.avg("n_orders").alias("mu"), F.stddev_samp("n_orders").alias("sd")
    )
    flagged = (
        daily.crossJoin(F.broadcast(stats))
        .filter(F.abs(F.col("n_orders") - F.col("mu")) > 2 * F.col("sd"))
        .select("day", "n_orders", ((F.col("n_orders") - F.col("mu")) / F.col("sd")).alias("z"))
    )
    w = W.orderBy("day")
    runs = flagged.select(
        "*",
        F.when(
            F.lag("day").over(w).isNull()
            | (F.datediff(F.col("day"), F.lag("day").over(w)) > 3),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    ep = runs.select(
        "*",
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("ep"),
    )
    return ep.groupBy("ep").agg(
        F.min(F.col("day").cast("string")).alias("start_day"),
        F.max(F.col("day").cast("string")).alias("end_day"),
        F.count("*").cast("long").alias("n_anomalous_days"),
        F.round(F.max(F.abs("z")), 6).alias("peak_abs_z"),
    ).drop("ep")


@register(
    "qd21_order_reconciliation",
    oracle="""
        WITH line_tot AS (
            SELECT l_orderkey,
                   sum(CAST(round(l_extendedprice * (1 + l_tax)
                                  * (1 - l_discount) * 1e6, 0) AS BIGINT))
                       AS line_micros
            FROM lineitem GROUP BY l_orderkey
        ),
        j AS (
            SELECT o.o_orderstatus,
                   CAST(round(o.o_totalprice * 1e6, 0) AS BIGINT)
                       AS order_micros,
                   lt.line_micros
            FROM orders o LEFT JOIN line_tot lt
              ON o.o_orderkey = lt.l_orderkey
        )
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN line_micros IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_lineless,
               CAST(sum(CASE WHEN line_micros IS NOT NULL
                              AND abs(line_micros - order_micros) * 100
                                  > order_micros
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_mismatched,
               round(sum(COALESCE(line_micros, 0)) / 1e6, 2)
                   AS total_line_revenue,
               round(sum(order_micros) / 1e6, 2) AS total_header_revenue
        FROM j GROUP BY o_orderstatus
    """,
    doc="Cross-TABLE reconciliation audit — the header-vs-detail "
    "consistency check every warehouse ingest runs (does the order "
    "header total equal the sum of its lines?): per-order lineitem "
    "revenue (price x (1+tax) x (1-discount)) vs o_totalprice, "
    "reported per order status as lineless-header counts, >1% "
    "mismatch counts, and both revenue totals.  Complements qd02 "
    "(key-level referential integrity) with VALUE-level integrity.  "
    "All money arithmetic runs in integer MICROS (each line's product "
    "is one identical IEEE expression, then exact BIGINT sums), so "
    "per-order totals and the 1% threshold are bit-identical in both "
    "engines regardless of summation order — the qa23 rule.  Scale: "
    "one partial agg on the fact keyed by orderkey (the join key it "
    "already shares with orders), one status-keyed rollup; counts "
    "and two BIGINTs shuffle.",
)
def qd21_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    line_micros = F.round(
        F.col("l_extendedprice")
        * (1 + F.col("l_tax"))
        * (1 - F.col("l_discount"))
        * 1e6,
        0,
    ).cast("long")
    line_tot = li.groupBy("l_orderkey").agg(
        F.sum(line_micros).alias("line_micros")
    )
    j = o.select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 1e6, 0).cast("long").alias("order_micros"),
        "o_orderkey",
    ).join(line_tot, o.o_orderkey == line_tot.l_orderkey, "left")
    mismatched = (
        F.col("line_micros").isNotNull()
        & (F.abs(F.col("line_micros") - F.col("order_micros")) * 100 > F.col("order_micros"))
    )
    return j.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("line_micros").isNull().cast("int")).cast("long").alias("n_lineless"),
        F.sum(mismatched.cast("int")).cast("long").alias("n_mismatched"),
        F.round(F.sum(F.coalesce("line_micros", F.lit(0))) / 1e6, 2).alias(
            "total_line_revenue"
        ),
        F.round(F.sum("order_micros") / 1e6, 2).alias("total_header_revenue"),
    )


@register(
    "qd22_seasonal_naive_backtest",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        joined AS (
            SELECT c.event_type, c.n, p.n AS fcst
            FROM daily c JOIN daily p
              ON p.event_type = c.event_type AND p.day + 7 = c.day
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(abs(n - fcst)) AS BIGINT) AS total_abs_err,
               round(sum(abs(n - fcst)) * 1.0 / sum(n), 6) AS wape,
               round(avg(abs(n - fcst) * 1.0 / n), 4) AS mape
        FROM joined GROUP BY event_type
    """,
    doc="SEASONAL-NAIVE volume backtest — the pipeline-health "
    "forecasting baseline (M-competition folklore: beat lag-7 before "
    "shipping a fancier model): per event type, forecast each day's "
    "ingest count with the count 7 days earlier (integer-day date "
    "arithmetic join, no window-lag-over-possibly-gapped-rows "
    "trap), and report WAPE = sum|err|/sum(actual) — integer sums, "
    "ONE division, 6-dp exact — plus per-day MAPE (avg of doubles, "
    "4-dp report per the qc27 rule).  Complements qd16's z-score "
    "anomaly flags with a quantified 'how predictable is this feed' "
    "number that alert thresholds calibrate against.  Scale: counts "
    "roll up from partition metadata on a date-partitioned table "
    "(the qd16 posture); the self-join touches one row per "
    "(type, day) — dimension-sized however large the event stream.",
)
def qd22_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    cur = daily.select("event_type", "day", "n")
    prev = daily.select(
        F.col("event_type").alias("p_type"),
        F.date_add("day", 7).alias("p_day"),
        F.col("n").alias("fcst"),
    )
    joined = cur.join(
        prev,
        (F.col("event_type") == F.col("p_type")) & (F.col("day") == F.col("p_day")),
    )
    ae = F.abs(F.col("n") - F.col("fcst"))
    return joined.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(ae).cast("long").alias("total_abs_err"),
        F.round(F.sum(ae) * 1.0 / F.sum("n"), 6).alias("wape"),
        F.round(F.avg(ae * 1.0 / F.col("n")), 4).alias("mape"),
    )


@register(
    "qd23_cusum_changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   count(*) AS x
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT event_type, count(*) AS d, sum(x) AS sx
            FROM daily GROUP BY 1
        ),
        scaled AS (
            SELECT daily.event_type, day, x, d, sx,
                   sum(d * x - sx) OVER (
                       PARTITION BY daily.event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS rs
            FROM daily JOIN tot USING (event_type)
        ),
        cus AS (
            SELECT event_type, day, x, sx,
                   rs - least(0, min(rs) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )) AS s
            FROM scaled
        )
        SELECT event_type,
               CAST(day AS VARCHAR) AS day,
               CAST(x AS BIGINT) AS n_events,
               CAST(s AS BIGINT) AS cusum_scaled,
               CAST(2 * s > sx AS INT) AS flag
        FROM cus
    """,
    doc="CUSUM changepoint detection (Page 1954 — the sequential "
    "drift detector that catches a sustained small shift long before "
    "qd16's per-day z-score fires), computed ENTIRELY in integers: "
    "the textbook recurrence S_t = max(0, S_{t-1} + (x_t - mu)) has "
    "the closed form S_t = RS_t - min(0, min_{j<=t} RS_j) over the "
    "running sum RS of deviations, and multiplying through by the "
    "day count d turns every term into exact integer arithmetic "
    "(d*x_t - sum_x), so the statistic, the running min, AND the "
    "alarm gate (2*S'_t > sum_x, i.e. S_t > mu/2) are "
    "engine-exact with zero float compares anywhere.  Scale: one "
    "day-keyed count rollup (partition-metadata-sized, the qd16 "
    "posture), then two windows over ~days-per-type rows — the "
    "monitor costs nothing regardless of event volume.",
)
def qd23_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("x"))
    tot = daily.groupBy("event_type").agg(
        F.count("*").alias("d"), F.sum("x").alias("sx")
    )
    run = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    scaled = daily.join(F.broadcast(tot), "event_type").withColumn(
        "rs", F.sum(F.col("d") * F.col("x") - F.col("sx")).over(run)
    )
    s = F.col("rs") - F.least(F.lit(0), F.min("rs").over(run))
    return scaled.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").cast("long").alias("n_events"),
        s.cast("long").alias("cusum_scaled"),
        (2 * s > F.col("sx")).cast("int").alias("flag"),
    )


@register(
    "qd24_emd_drift",
    oracle="""
        WITH vals AS (
            SELECT event_type,
                   CAST(round(value * 1000000) AS BIGINT) AS v,
                   CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref
            FROM events
        ),
        grid AS (
            SELECT event_type, v,
                   sum(is_ref) AS c_ref,
                   sum(1 - is_ref) AS c_cur
            FROM vals GROUP BY event_type, v
        ),
        tot AS (
            SELECT event_type,
                   sum(c_ref) AS n_ref, sum(c_cur) AS n_cur
            FROM grid GROUP BY event_type
        ),
        steps AS (
            SELECT g.event_type, t.n_ref, t.n_cur,
                   abs(sum(g.c_ref) OVER w * t.n_cur
                       - sum(g.c_cur) OVER w * t.n_ref)
                     * (lead(g.v) OVER w2 - g.v) AS term
            FROM grid g JOIN tot t USING (event_type)
            WINDOW w AS (PARTITION BY g.event_type ORDER BY g.v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w2 AS (PARTITION BY g.event_type ORDER BY g.v)
        )
        SELECT event_type,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               CAST(sum(term) AS BIGINT) AS emd_scaled,
               round(CAST(sum(term) AS DOUBLE) / (n_ref * n_cur) / 1000000.0, 6)
                   AS emd
        FROM steps
        WHERE term IS NOT NULL
        GROUP BY event_type, n_ref, n_cur
    """,
    doc="EARTH-MOVER (1-Wasserstein) distribution drift, computed "
    "EXACTLY in integers — the third drift lens beside qd13's PSI "
    "(density-ratio, bin-quantized) and qd14's KS (max CDF gap, "
    "outlier-blind): EMD integrates |F_ref - F_cur| over the value "
    "axis and so sees BOTH shape and location shifts.  Trick: on "
    "micro-quantized values the integral is a sum over distinct-value "
    "steps of |cumref*n_cur - cumcur*n_ref| * gap — cross-multiplied "
    "integer CDFs (the mm05 rule: never compare ratios in doubles) "
    "times integer gaps, summed exactly (bounded by n_ref*n_cur*range "
    "— fits BIGINT per event type with 40x headroom); the only "
    "float ops are the final division and 6-dp wire rounding, "
    "identical in both engines.  Split = even/odd event ids (the "
    "qd13/st12 ref/cur convention).  Scale: one hash-agg to the "
    "distinct-value grid (value-cardinality-sized), two windows over "
    "it, one tiny agg — the monitor never rescans raw rows.",
)
def qd24_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    vals = e.select(
        "event_type",
        F.round(F.col("value") * 1000000).cast("long").alias("v"),
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("is_ref"),
    )
    grid = vals.groupBy("event_type", "v").agg(
        F.sum("is_ref").alias("c_ref"),
        F.sum(1 - F.col("is_ref")).alias("c_cur"),
    )
    tot = grid.groupBy("event_type").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w2 = W.partitionBy("event_type").orderBy("v")
    steps = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n_ref",
        "n_cur",
        (
            F.abs(
                F.sum("c_ref").over(w) * F.col("n_cur")
                - F.sum("c_cur").over(w) * F.col("n_ref")
            )
            * (F.lead("v").over(w2) - F.col("v"))
        ).alias("term"),
    )
    return (
        steps.filter(F.col("term").isNotNull())
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(F.sum("term").alias("emd_scaled"))
        .select(
            "event_type",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.col("emd_scaled").cast("long").alias("emd_scaled"),
            F.round(
                F.col("emd_scaled").cast("double")
                / (F.col("n_ref") * F.col("n_cur"))
                / 1000000.0,
                6,
            ).alias("emd"),
        )
    )


@register(
    "qd25_exact_quantiles_distributed",
    oracle="""
        WITH c AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   o_orderkey
            FROM orders
        ),
        ranked AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents ASC, o_orderkey ASC)
                       AS i,
                   count(*) OVER () AS n
            FROM c
        )
        SELECT CAST(max(n) AS BIGINT) AS n_rows,
               CAST(min(CASE WHEN 100 * i >= 25 * n THEN cents END)
                    AS BIGINT) AS p25,
               CAST(min(CASE WHEN 100 * i >= 50 * n THEN cents END)
                    AS BIGINT) AS p50,
               CAST(min(CASE WHEN 100 * i >= 75 * n THEN cents END)
                    AS BIGINT) AS p75,
               CAST(min(CASE WHEN 100 * i >= 99 * n THEN cents END)
                    AS BIGINT) AS p99
        FROM ranked
    """,
    doc="EXACT global quantiles WITHOUT a single-task sort — the "
    "distributed-rank answer to 'approx_percentile is not enough for "
    "this SLA': order-price cents ranked by dist_rank.py's "
    "range-partitioned exact row_number (the qa24/qc26 machinery), "
    "then percentile_disc semantics by the INTEGER gate "
    "100*i >= p*n — the smallest value whose rank reaches ceil(p*n); "
    "no float interpolation, no dialect luck (verified equal to "
    "DuckDB's own quantile_disc at build time).  Contrast family: "
    "q22 exact per-group percentile agg (bounded groups), q28 "
    "approx_percentile sketch (the 100 TB default), qd25 exact AND "
    "distributed (the audit-grade path when the number must be "
    "right).  Scale: two shuffles of (cents, key) pairs — wall-clock "
    "scales with cluster width; the fact table's values move once.",
)
def qd25_exact_quantiles_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .dist_rank import distributed_row_number

    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked = distributed_row_number(
        cents, [F.col("cents").asc(), F.col("o_orderkey").asc()], "i"
    ).select("cents", "i")
    tot = ranked.agg(F.count("*").alias("n"))
    r = ranked.crossJoin(F.broadcast(tot))
    return r.groupBy().agg(
        F.max("n").cast("long").alias("n_rows"),
        *[
            F.min(F.when(100 * F.col("i") >= p * F.col("n"), F.col("cents")))
            .cast("long")
            .alias(f"p{p}")
            for p in (25, 50, 75, 99)
        ],
    )


@register(
    "qd27_rapid_repeat_audit",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        )
        SELECT a.event_type,
               count(*) AS n_pairs,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users,
               CAST(min(abs(a.us - b.us)) AS BIGINT) AS min_gap_us,
               CAST(max(abs(a.us - b.us)) AS BIGINT) AS max_gap_us
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND a.event_type = b.event_type
         AND a.event_id < b.event_id
         AND abs(a.us - b.us) <= 300000000
        GROUP BY a.event_type
    """,
    doc="RAPID-REPEAT ingestion audit (double-submit / duplicate-"
    "delivery detector): pairs of SAME-user SAME-type events within 5 "
    "minutes — the pipeline-health screen that catches retry storms "
    "and at-least-once re-deliveries before they skew downstream "
    "counts.  The oracle is the quadratic theta self-join; the Spark "
    "plan is the q66c bucket-replica re-plan EXTENDED with a composite "
    "equi-key: join on (user_id, event_type, bucket) where one side "
    "replicates to floor-division buckets {b-1, b, b+1} — a "
    "within-tolerance pair has bucket distance <= 1, so it matches "
    "exactly one replica; event_id < event_id keeps each unordered "
    "pair once.  Gap bounds are exact integer microseconds.  Scale: "
    "the shuffle is keyed by (user, type, bucket) — at 100 TB this is "
    "O(n) by key, never all-pairs-per-user, and the key spreading "
    "means no single hot user melts a partition unless one user+type "
    "floods a single 5-minute bucket (the q48 salting cue).",
)
def qd27_rapid_repeat_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tol = 300 * 1000000
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    b = F.expr(f"(us - pmod(us, {tol})) div {tol}")
    left = e.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("event_type").alias("a_type"),
        F.col("us").alias("a_us"),
        F.explode(F.array(b - 1, b, b + 1)).alias("bucket"),
    )
    right = e.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("event_type").alias("b_type"),
        F.col("us").alias("b_us"),
        b.alias("b_bucket"),
    )
    gap = F.abs(F.col("a_us") - F.col("b_us"))
    pairs = (
        left.join(
            right,
            (F.col("bucket") == F.col("b_bucket"))
            & (F.col("a_user") == F.col("b_user"))
            & (F.col("a_type") == F.col("b_type")),
        )
        .filter((F.col("a_id") < F.col("b_id")) & (gap <= tol))
    )
    return pairs.groupBy(F.col("a_type").alias("event_type")).agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("a_user").cast("long").alias("n_users"),
        F.min(gap).cast("long").alias("min_gap_us"),
        F.max(gap).cast("long").alias("max_gap_us"),
    )


@register(
    "qd29_late_arrival_audit",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        lagged AS (
            SELECT event_type, us,
                   max(us) OVER (PARTITION BY user_id ORDER BY event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prior_max
            FROM e
        )
        SELECT event_type,
               count(*) AS n_events,
               CAST(count(*) FILTER (WHERE prior_max IS NOT NULL
                                       AND us < prior_max) AS BIGINT)
                   AS n_late,
               round(count(*) FILTER (WHERE prior_max IS NOT NULL
                                        AND us < prior_max)
                     * 1.0 / count(*), 6) AS late_frac,
               CAST(coalesce(max(CASE WHEN us < prior_max
                                      THEN prior_max - us END), 0)
                    AS BIGINT) AS max_lateness_us,
               CAST(coalesce(sum(CASE WHEN us < prior_max
                                      THEN prior_max - us END), 0)
                    AS BIGINT) AS total_lateness_us
        FROM lagged GROUP BY event_type
    """,
    doc="LATE-ARRIVAL audit — the measurement that SIZES every "
    "watermark in the streaming family (st02/st04/st08/st09's '30 "
    "minutes' is a guess until this runs): treating event_id as "
    "arrival order (the ingestion-sequence proxy; a real pipeline "
    "uses the ingest offset/commit time), an event is LATE when its "
    "event time sits below the running per-user maximum seen so far "
    "— max() over a user-partitioned ROWS frame, never a global "
    "window.  Reports per type: late count/fraction and exact "
    "integer-microsecond lateness mass + worst case — max_lateness "
    "IS the principled withWatermark delay.  Scale: one keyed window "
    "over (user, 2 longs), one small agg; this is the query you run "
    "on a day's sample before setting state-eviction policy on a "
    "100 TB/day stream.",
)
def qd29_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    lagged = e.select(
        "event_type", "us", F.max("us").over(w).alias("prior_max")
    )
    is_late = F.col("prior_max").isNotNull() & (
        F.col("us") < F.col("prior_max")
    )
    lateness = F.when(
        F.col("us") < F.col("prior_max"), F.col("prior_max") - F.col("us")
    )
    return lagged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(is_late.cast("int")).cast("long").alias("n_late"),
        F.round(
            F.sum(is_late.cast("int")) * 1.0 / F.count("*"), 6
        ).alias("late_frac"),
        F.coalesce(F.max(lateness), F.lit(0)).cast("long").alias(
            "max_lateness_us"
        ),
        F.coalesce(F.sum(lateness), F.lit(0)).cast("long").alias(
            "total_lateness_us"
        ),
    )


@register(
    "qd28_staleness_profile",
    oracle="""
        WITH e AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        per_user AS (
            SELECT user_id, max(us) AS last_us FROM e GROUP BY user_id
        ),
        ref AS (SELECT max(us) AS now_us FROM e)
        SELECT CAST((r.now_us - p.last_us) // 86400000000 AS BIGINT)
                   AS staleness_days,
               count(*) AS n_users
        FROM per_user p CROSS JOIN ref r
        GROUP BY (r.now_us - p.last_us) // 86400000000
    """,
    doc="Entity STALENESS profile — the freshness/decay histogram an "
    "activation or retention pipeline reads daily: days since each "
    "user's last event, relative to the corpus high-water mark "
    "(broadcast one-row max — the deterministic stand-in for wall "
    "clock, so the hash never depends on run time).  Floor day "
    "arithmetic on non-negative integer microsecond gaps (truncating "
    "// == floor).  Complements qd18's snapshot churn (which users "
    "LEFT between snapshots) with the continuous how-stale-now view.  "
    "Scale: one user-keyed agg + a broadcast scalar; output is "
    "days-distribution-sized.",
)
def qd28_staleness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    per_user = e.groupBy("user_id").agg(F.max("us").alias("last_us"))
    ref = e.agg(F.max("us").alias("now_us"))
    day = 86400000000
    return (
        per_user.crossJoin(F.broadcast(ref))
        .groupBy(
            F.expr(f"(now_us - last_us) div {day}")
            .cast("long")
            .alias("staleness_days")
        )
        .agg(F.count("*").alias("n_users"))
    )


#: (table, key expr, value expr) triples for the qd30 manifest — the
#: key column plus one value column per fixture table, checksummed via
#: the first two md5 hex chars as an engine-portable integer.
_CHECKSUM_COLS = (
    ("region", "r_regionkey", "r_name"),
    ("nation", "n_nationkey", "n_name"),
    ("customer", "c_custkey", "c_name"),
    ("supplier", "s_suppkey", "s_name"),
    ("part", "p_partkey", "p_name"),
    ("orders", "o_orderkey", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("events", "event_id", "event_type"),
    ("documents", "doc_id", "lang"),
    ("embeddings", "vec_id", "label"),
)


def _md5_pair_int_sql(expr: str) -> str:
    """Engine-portable integer from a value: first two hex chars of its
    md5, as ascii(c1)*256 + ascii(c2) — both engines agree on md5 text
    and ascii(), avoiding hex-parse dialect differences."""
    m = f"md5(CAST({expr} AS VARCHAR))"
    return f"(ascii(substr({m}, 1, 1)) * 256 + ascii(substr({m}, 2, 1)))"


@register(
    "qd30_table_checksums",
    oracle="\n        UNION ALL\n".join(
        f"""
        SELECT '{t}' AS table_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum({_md5_pair_int_sql(k)}) AS BIGINT) AS key_checksum,
               CAST(sum({_md5_pair_int_sql(v)}) AS BIGINT) AS value_checksum
        FROM {t}"""
        for t, k, v in _CHECKSUM_COLS
    ),
    doc="CROSS-ENGINE table-checksum MANIFEST — the data-contract "
    "fingerprint a migration / replication / backfill signs off "
    "against: for every fixture table, the row count plus "
    "order-insensitive integer checksums of the key column and one "
    "value column (per row: ascii-pair of the md5's first two hex "
    "chars — md5 text and ascii() agree across engines, so no "
    "hex-parse dialect trap; the SUM is an exact integer, "
    "commutative, partition-order-free).  Any dropped / duplicated / "
    "mutated row moves a checksum; the manifest travels as 10 tiny "
    "rows.  This is how you verify THIS engine against the system it "
    "replaces, table by table, without shipping data.  Scale: one "
    "map-side-combinable agg per table, no shuffle beyond the "
    "one-row partials.",
)
def qd30_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, k, v in _CHECKSUM_COLS:
        df = load_table(spark, sf_dir, t)

        def pair_int(col: str):
            m = F.md5(F.col(col).cast("string"))
            return F.ascii(F.substring(m, 1, 1)) * 256 + F.ascii(
                F.substring(m, 2, 1)
            )

        one = df.agg(
            F.lit(t).alias("table_name"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(pair_int(k)).cast("long").alias("key_checksum"),
            F.sum(pair_int(v)).cast("long").alias("value_checksum"),
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "qd31_session_gap_sizing",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events
        ),
        gaps AS (
            SELECT event_type,
                   us - lag(us) OVER (PARTITION BY user_id
                       ORDER BY us, event_id) AS gap_us
            FROM e
        ),
        g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               round(quantile_cont(gap_us, 0.50), 4) AS p50_gap_us,
               round(quantile_cont(gap_us, 0.90), 4) AS p90_gap_us,
               round(quantile_cont(gap_us, 0.99), 4) AS p99_gap_us,
               CAST(max(gap_us) AS BIGINT) AS max_gap_us,
               CAST(ceil(quantile_cont(gap_us, 0.99) / 60000000.0)
                    AS BIGINT) AS suggested_gap_min
        FROM g GROUP BY event_type
    """,
    doc="SESSION-GAP sizing quantiles — the measurement behind "
    "q62/st03's '30 minutes' session window (and st17's dedup "
    "horizon): per event type, the exact p50/p90/p99 of per-user "
    "inter-event gaps (continuous interpolation — the q22 "
    "percentile<->quantile_cont parity recipe), the worst case, and "
    "the SUGGESTED session gap = ceil(p99 / 1 minute), i.e. a "
    "timeout that merges 99%% of genuine within-session gaps and "
    "splits the tail — the classic inactivity-threshold elbow, now "
    "a query instead of folklore.  Gaps order by (ts, event_id) so "
    "ties cannot flake; one percentile(array(...)) aggregate per "
    "type — a single sorted mergeable buffer, no window over gap "
    "values.  Scale: one keyed lag frame over (user, 2 longs), one "
    "types-sized agg — run it on a day sample before committing "
    "session semantics on a 100 TB/day stream.",
)
def qd31_session_gap_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gaps = e.select(
        "event_type", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    pct = F.percentile("gap_us", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.round(pct[0], 4).alias("p50_gap_us"),
        F.round(pct[1], 4).alias("p90_gap_us"),
        F.round(pct[2], 4).alias("p99_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.ceil(pct[2] / 60000000.0).cast("long").alias("suggested_gap_min"),
    )


#: (table, column) pairs profiled by qd32 — low-cardinality categoricals
#: where value-distribution entropy is a meaningful balance signal.
_ENTROPY_COLS = (
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("events", "event_type"),
    ("documents", "lang"),
    ("customer", "c_mktsegment"),
)


@register(
    "qd32_categorical_entropy",
    oracle="\n        UNION ALL\n".join(
        f"""
        SELECT '{t}.{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_values,
               CAST(sum(n) AS BIGINT) AS n_rows,
               round(-sum((n * 1.0 / tot) * ln(n * 1.0 / tot)), 4)
                   AS entropy_nats,
               round(-sum((n * 1.0 / tot) * ln(n * 1.0 / tot))
                     / ln(count(*)), 4) AS balance
        FROM (
            SELECT {c} AS v, count(*) AS n,
                   sum(count(*)) OVER () AS tot
            FROM {t} GROUP BY {c}
        )"""
        for t, c in _ENTROPY_COLS
    ),
    doc="CATEGORICAL value-distribution ENTROPY profile — the balance "
    "signal qd01's null/distinct counts miss: per profiled column, "
    "Shannon entropy of the value distribution in nats and the "
    "normalized BALANCE = H / ln(k) (1.0 = perfectly uniform, -> 0 = "
    "one value dominates — the column a stratified sampler or a "
    "partition key should NOT trust).  The q83 entropy recipe: the "
    "inner per-value p*ln(p) terms are per-row double arithmetic, "
    "the outer sum runs over <= tens of category rows, and the 4-dp "
    "wire absorbs summation order — hash-verified like q83.  Scale: "
    "one map-side-combinable count agg per column; the entropy math "
    "runs on the category-sized result (the window in the oracle is "
    "over category rows, not data — the Spark side broadcasts the "
    "total instead).",
)
def qd32_categorical_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, c in _ENTROPY_COLS:
        counts = (
            load_table(spark, sf_dir, t)
            .groupBy(F.col(c).alias("v"))
            .agg(F.count("*").alias("n"))
        )
        tot = counts.agg(F.sum("n").alias("tot"))
        p = F.col("n") * 1.0 / F.col("tot")
        one = (
            counts.crossJoin(F.broadcast(tot))
            .agg(
                F.lit(f"{t}.{c}").alias("col_name"),
                F.count("*").cast("long").alias("n_values"),
                F.sum("n").cast("long").alias("n_rows"),
                F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats"),
                F.round(
                    -F.sum(p * F.log(p)) / F.log(F.count("*").cast("double")), 4
                ).alias("balance"),
            )
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "qd33_embedding_drift",
    oracle="""
        WITH q AS (
            SELECT label,
                   vec_id % 2 AS half,
                   generate_subscripts(embedding, 1) AS dim,
                   CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                       AS BIGINT) AS qv
            FROM embeddings
        ),
        per_dim AS (
            SELECT label, dim,
                   sum(CASE WHEN half = 0 THEN qv ELSE 0 END) AS sa,
                   sum(CASE WHEN half = 1 THEN qv ELSE 0 END) AS sb
            FROM q GROUP BY label, dim
        ),
        per_label AS (
            SELECT label,
                   CAST(sum(sa * sb) AS DOUBLE) AS dot_ab,
                   CAST(sum(sa * sa) AS DOUBLE) AS na2,
                   CAST(sum(sb * sb) AS DOUBLE) AS nb2
            FROM per_dim GROUP BY label
        ),
        counts AS (
            SELECT label,
                   CAST(count(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT)
                       AS n_ref,
                   CAST(count(*) FILTER (WHERE vec_id % 2 = 1) AS BIGINT)
                       AS n_cur
            FROM embeddings GROUP BY label
        )
        SELECT c.label, c.n_ref, c.n_cur,
               round(p.dot_ab / (sqrt(p.na2) * sqrt(p.nb2)), 6)
                   AS centroid_cos
        FROM counts c JOIN per_label p USING (label)
    """,
    doc="EMBEDDING-SPACE drift audit — the vector-column counterpart of "
    "qd13/qd17's scalar drift panels: per label, split the corpus into "
    "reference (even vec_id) and current (odd vec_id) snapshots and "
    "compare their CENTROIDS by cosine.  A re-embedded batch (new "
    "encoder version, silent preprocessing change) moves the per-label "
    "mean vector; centroid_cos < ~0.95 is the canary that retrieval "
    "indexes and similarity thresholds trained on the old space are "
    "stale.  Determinism recipe: q88's micro-quantization — each "
    "component rounds to an int (x*1e6) BEFORE summing, so per-dim "
    "sums are exact integers in both engines, the dot/norm reductions "
    "stay in exact integer space, and the single final "
    "divide-and-sqrt is computed from identical integers (6-dp wire).  "
    "Scale: one posexplode shuffle of (label, dim) pairs — 64 rows per "
    "vector, ~linear — then a labels x dims aggregate; at 100 TB the "
    "per-dim partial sums combine map-side exactly like any sum.",
)
def qd33_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import to_double_array

    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(to_double_array("embedding")).alias("dim0", "v"),
    ).select(
        "label",
        "half",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("v") * 1000000, 0).cast("long").alias("qv"),
    )
    per_dim = q.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("qv")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("half") == 1, F.col("qv")).otherwise(0)).alias("sb"),
    )
    per_label = per_dim.groupBy("label").agg(
        F.sum(F.col("sa") * F.col("sb")).cast("double").alias("dot_ab"),
        F.sum(F.col("sa") * F.col("sa")).cast("double").alias("na2"),
        F.sum(F.col("sb") * F.col("sb")).cast("double").alias("nb2"),
    )
    counts = e.groupBy("label").agg(
        F.count_if(F.col("vec_id") % 2 == 0).cast("long").alias("n_ref"),
        F.count_if(F.col("vec_id") % 2 == 1).cast("long").alias("n_cur"),
    )
    return counts.join(per_label, "label").select(
        "label",
        "n_ref",
        "n_cur",
        F.round(
            F.col("dot_ab") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))), 6
        ).alias("centroid_cos"),
    )


@register(
    "qd34_holt_trend_backtest",
    oracle="""
        WITH RECURSIVE daily AS (
            SELECT event_type,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(count(*) AS DOUBLE) AS y
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type, y,
                   row_number() OVER (PARTITION BY event_type ORDER BY day)
                       AS i
            FROM daily
        ),
        rec AS (
            SELECT event_type, i, y AS l, 0.0::DOUBLE AS b,
                   0.0::DOUBLE AS sae, 0.0::DOUBLE AS sy
            FROM idx WHERE i = 1
            UNION ALL
            SELECT x.event_type, x.i,
                   0.5 * x.y + 0.5 * (r.l + r.b),
                   0.3 * ((0.5 * x.y + 0.5 * (r.l + r.b)) - r.l)
                       + 0.7 * r.b,
                   r.sae + abs(x.y - (r.l + r.b)),
                   r.sy + x.y
            FROM rec r
            JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
        ),
        last AS (
            SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY i DESC) AS rn
            FROM rec
        )
        SELECT event_type,
               CAST(i AS BIGINT) AS n_days,
               CASE WHEN sy = 0 THEN NULL
                    ELSE round(sae / sy, 6) END AS wape,
               round(l, 6) AS final_level,
               round(b, 6) AS final_trend
        FROM last WHERE rn = 1
    """,
    doc="HOLT LINEAR-TREND one-step backtest per event type (double "
    "exponential smoothing, alpha=0.5 beta=0.3) — the next rung above "
    "qd22's seasonal-naive baseline on the forecasting ladder a "
    "pipeline-health monitor climbs: level and trend update "
    "sequentially over the daily-count series, each day is forecast "
    "from the PREVIOUS state (l+b, honest one-step-ahead), and the "
    "report is WAPE over the forecasted days plus the final state.  "
    "The recurrence is computed as a pure-Catalyst aggregate() FOLD "
    "over the per-type day array (the day spine is BOUNDED — calendar "
    "days — so collect+fold is the q68b-approved shape for sequential "
    "state without Python), written with the EXACT expression tree "
    "the oracle's recursive CTE uses, so both engines walk identical "
    "IEEE operations to identical doubles (6-dp wire).  sy=0 (a "
    "single-day type) is CASE-guarded to NULL in both engines.  "
    "Scale: the heavy stage is the daily count rollup; per-type folds "
    "are day-spine-sized and partition-parallel across types.",
)
def qd34_holt_trend_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("y")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("s")
    )
    fold = F.expr(
        """
        aggregate(
            s,
            named_struct('l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE),
                         'sae', CAST(0.0 AS DOUBLE), 'sy', CAST(0.0 AS DOUBLE),
                         'n', 0),
            (acc, x) -> CASE WHEN acc.n = 0 THEN
                named_struct('l', x.y, 'b', CAST(0.0 AS DOUBLE),
                             'sae', CAST(0.0 AS DOUBLE),
                             'sy', CAST(0.0 AS DOUBLE), 'n', 1)
            ELSE
                named_struct(
                    'l', 0.5 * x.y + 0.5 * (acc.l + acc.b),
                    'b', 0.3 * ((0.5 * x.y + 0.5 * (acc.l + acc.b)) - acc.l)
                         + 0.7 * acc.b,
                    'sae', acc.sae + abs(x.y - (acc.l + acc.b)),
                    'sy', acc.sy + x.y,
                    'n', acc.n + 1)
            END
        )
        """
    ).alias("h")
    folded = series.select("event_type", fold)
    return folded.select(
        "event_type",
        F.col("h.n").cast("long").alias("n_days"),
        F.when(F.col("h.sy") == 0, F.lit(None))
        .otherwise(F.round(F.col("h.sae") / F.col("h.sy"), 6))
        .alias("wape"),
        F.round("h.l", 6).alias("final_level"),
        F.round("h.b", 6).alias("final_trend"),
    )


@register(
    "qd35_mann_whitney_u",
    oracle="""
        WITH pop AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                       AS is_a
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        ranked AS (
            SELECT is_a,
                   2 * rank() OVER (ORDER BY cents)
                       + count(*) OVER (PARTITION BY cents) - 1 AS mr2
            FROM pop
        ),
        ties AS (
            SELECT COALESCE(sum(c * c * c - c), 0) AS t
            FROM (SELECT CAST(count(*) AS BIGINT) AS c
                  FROM pop GROUP BY cents)
        ),
        agg AS (
            SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
                   CAST(count(*) - sum(is_a) AS BIGINT) AS n_b,
                   CAST(sum(CASE WHEN is_a = 1 THEN mr2 ELSE 0 END)
                        AS BIGINT) AS r2
            FROM ranked
        )
        SELECT n_a, n_b,
               round((r2 - n_a * (n_a + 1)) / 2.0, 6) AS u_stat,
               CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                    ELSE round(((r2 - n_a * (n_a + 1)) / 2.0
                                 - CAST(n_a AS DOUBLE) * n_b / 2.0)
                               / sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0)
                                      * ((n_a + n_b + 1)
                                         - CAST((SELECT t FROM ties)
                                                AS DOUBLE)
                                           / (CAST(n_a + n_b AS DOUBLE)
                                              * (n_a + n_b - 1)))),
                               6)
               END AS z_stat
        FROM agg
    """,
    doc="MANN-WHITNEY U rank-sum test (two-sided z with midranks and "
    "the tie correction) comparing URGENT vs LOW order totals — the "
    "non-parametric two-sample location test a data-quality monitor "
    "runs when distributions are skewed and a t-test's normality "
    "assumption fails (is the urgent-order revenue distribution "
    "actually different?).  Ranking 30 k (and at 100 TB, billions of) "
    "rows needs NO global sort window: values collapse to exact-cents "
    "groups first (groupBy cents -> per-value count + group-A count), "
    "then the rank prefix sums ride dist_rank.distributed_cumsum "
    "(range exchange over the value domain).  Doubled midranks "
    "(2*rank + tiecount - 1) keep every rank statistic in BIGINT — "
    "the only doubles are the final mu/sigma/z divisions, mirrored "
    "expression-for-expression against the oracle.  The tie term "
    "sum(t^3 - t) falls out of the same per-value aggregate for free.",
)
def qd35_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dist_rank import distributed_cumsum

    o = load_table(spark, sf_dir, "orders")
    pop = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_a"),
    )
    # distributed_cumsum's range exchange re-traverses its input
    # lineage (sample pass + local pass + totals pass): flatten the
    # scan+agg behind a lazy localCheckpoint (qa24 policy) so the
    # orders scan happens once, not three times.
    by_val = pop.groupBy("cents").agg(
        F.count("*").alias("n_v"), F.sum("is_a").alias("a_v")
    ).localCheckpoint(eager=True)
    with_cum = distributed_cumsum(
        by_val, [F.col("cents")], [("n_v", "cum_excl", False)]
    )
    # doubled midrank of every row in value-group v:
    #   2*(cum_excl+1) + n_v - 1  ==  2*cum_excl + n_v + 1  (all BIGINT)
    stats = with_cum.agg(
        F.sum("a_v").cast("bigint").alias("n_a"),
        (F.sum("n_v") - F.sum("a_v")).cast("bigint").alias("n_b"),
        F.sum(
            F.col("a_v")
            * (2 * F.col("cum_excl") + F.col("n_v") + 1)
        )
        .cast("bigint")
        .alias("r2"),
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        )
        .cast("bigint")
        .alias("t"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    u = (F.col("r2") - n_a * (n_a + 1)) / 2.0
    mu = n_a.cast("double") * n_b / 2.0
    sig2 = (n_a.cast("double") * n_b / 12.0) * (
        (n_a + n_b + 1)
        - F.col("t").cast("double")
        / ((n_a + n_b).cast("double") * (n_a + n_b - 1))
    )
    return stats.select(
        "n_a",
        "n_b",
        F.round(u, 6).alias("u_stat"),
        F.when((n_a == 0) | (n_b == 0), F.lit(None))
        .otherwise(F.round((u - mu) / F.sqrt(sig2), 6))
        .alias("z_stat"),
    )


@register(
    "qd36_anova_f",
    oracle="""
        WITH g AS (
            SELECT
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN l_returnflag = 'A'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(sum(CASE WHEN l_returnflag = 'N'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                CAST(sum(CASE WHEN l_returnflag = 'R'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n3,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS DOUBLE) AS s,
                CAST(sum(CASE WHEN l_returnflag = 'A'
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) AS s1,
                CAST(sum(CASE WHEN l_returnflag = 'N'
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) AS s2,
                CAST(sum(CASE WHEN l_returnflag = 'R'
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) AS s3,
                CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS HUGEINT)) AS DOUBLE) AS q
            FROM lineitem
        )
        SELECT n, n1, n2, n3,
               round(((s1 * s1 / n1
                       + s2 * s2 / n2
                       + s3 * s3 / n3)
                      - s * s / n) / 1e4, 4) AS ssb_dollars2,
               round((q
                      - (s1 * s1 / n1
                         + s2 * s2 / n2
                         + s3 * s3 / n3)) / 1e4, 4)
                   AS ssw_dollars2,
               round((((s1 * s1 / n1
                        + s2 * s2 / n2
                        + s3 * s3 / n3)
                       - s * s / n) / 2.0)
                     / ((q
                         - (s1 * s1 / n1
                            + s2 * s2 / n2
                            + s3 * s3 / n3))
                        / (n - 3)), 6) AS f_stat
        FROM g
    """,
    doc="One-way ANOVA F-statistic of revenue across the three return "
    "flags — the 'does this categorical column explain this metric' "
    "screen a feature-audit pipeline runs before keeping a column.  "
    "Everything reduces to ONE map-side conditional aggregate over a "
    "single scan (the fixed 3-value flag domain is pivoted into "
    "columns, q25-style): per-group counts and exact-cents sums in "
    "BIGINT/DECIMAL(38,0) (sum of squared cents crosses 2^63 at "
    "sf>=0.1, hence decimal accumulators), with the algebraic "
    "identities SSB = sum(s_g^2/n_g) - S^2/N and SSW = Q - "
    "sum(s_g^2/n_g).  The double divisions happen once, in a FIXED "
    "textual order mirrored by the oracle, so no float summation "
    "order exists to diverge.  Scale: partial aggregation handles "
    "everything; zero shuffled rows beyond one combiner row per task.",
)
def qd36_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    flag = F.col("l_returnflag")

    def grp(v, col):
        return F.sum(F.when(flag == v, col).otherwise(F.lit(0)))

    g = li.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(flag == "A", 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(flag == "N", 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(flag == "R", 1).otherwise(0)).cast("bigint").alias("n3"),
        F.sum(cents).cast("double").alias("s"),
        grp("A", cents).cast("double").alias("s1"),
        grp("N", cents).cast("double").alias("s2"),
        grp("R", cents).cast("double").alias("s3"),
        F.sum((cents * cents).cast("decimal(38,0)"))
        .cast("double")
        .alias("q"),
    )
    within = (
        F.col("s1") * F.col("s1") / F.col("n1")
        + F.col("s2") * F.col("s2") / F.col("n2")
        + F.col("s3") * F.col("s3") / F.col("n3")
    )
    ssb = within - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - within
    return g.select(
        "n",
        "n1",
        "n2",
        "n3",
        F.round(ssb / 1e4, 4).alias("ssb_dollars2"),
        F.round(ssw / 1e4, 4).alias("ssw_dollars2"),
        F.round((ssb / 2.0) / (ssw / (F.col("n") - 3)), 6).alias("f_stat"),
    )


@register(
    "qd37_mahalanobis_outliers",
    oracle="""
        WITH pts AS (
            SELECT l_orderkey, l_linenumber,
                   CAST(round(l_quantity) AS BIGINT) AS xi,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS yi
            FROM lineitem
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(xi) AS DOUBLE) / count(*) AS mx,
                   CAST(sum(yi) AS DOUBLE) / count(*) AS my,
                   CAST(sum(xi * xi) AS DOUBLE) / count(*) AS sxx,
                   CAST(sum(CAST(yi * yi AS HUGEINT)) AS DOUBLE) / count(*)
                       AS syy,
                   CAST(sum(xi * yi) AS DOUBLE) / count(*) AS sxy
            FROM pts
        ),
        cov AS (
            SELECT n, mx, my,
                   sxx - mx * mx AS vx,
                   syy - my * my AS vy,
                   sxy - mx * my AS cxy
            FROM m
        ),
        scored AS (
            SELECT p.l_orderkey, p.l_linenumber,
                   ((p.xi - mx) * (p.xi - mx) * vy
                    - 2 * (p.xi - mx) * (p.yi - my) * cxy
                    + (p.yi - my) * (p.yi - my) * vx)
                   / (vx * vy - cxy * cxy) AS d2
            FROM pts p CROSS JOIN cov
        )
        SELECT l_orderkey, l_linenumber, round(d2, 6) AS mahalanobis_sq
        FROM scored
        ORDER BY round(d2, 6) DESC, l_orderkey, l_linenumber
        LIMIT 20
    """,
    doc="MAHALANOBIS-DISTANCE bivariate outlier screen over "
    "(quantity, price): the covariance-aware distance that catches "
    "points plausible on each axis but impossible JOINTLY (high "
    "price at low quantity), which per-column z-scores (qd04's "
    "family) cannot see.  The 2x2 covariance matrix inverts in "
    "CLOSED FORM (d^2 = (dx^2*vy - 2*dx*dy*cxy + dy^2*vx)/det), so "
    "the whole screen is one stats aggregate + one broadcast of a "
    "1-row matrix + a map-side per-row expression — no linear-"
    "algebra library, no iteration, and the exact same arithmetic "
    "in both engines.  Moments come from exact integer sums (cents, "
    "integer quantities) divided once, making the doubles "
    "deterministic; the top-20 cut rounds BEFORE ranking so the "
    "boundary is stable.  Scale: one pass for moments, one "
    "broadcast-join pass for scoring; TakeOrdered for the top-k — "
    "nothing shuffles the fact table.",
)
def qd37_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity")).cast("bigint").alias("xi"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("yi"),
    )
    n = F.count(F.lit(1))
    xi, yi = F.col("xi"), F.col("yi")
    m = pts.agg(
        n.cast("bigint").alias("n"),
        (F.sum(xi).cast("double") / n).alias("mx"),
        (F.sum(yi).cast("double") / n).alias("my"),
        (F.sum(xi * xi).cast("double") / n).alias("sxx"),
        (F.sum((yi * yi).cast("decimal(38,0)")).cast("double") / n).alias(
            "syy"
        ),
        (F.sum(xi * yi).cast("double") / n).alias("sxy"),
    ).select(
        "mx",
        "my",
        (F.col("sxx") - F.col("mx") * F.col("mx")).alias("vx"),
        (F.col("syy") - F.col("my") * F.col("my")).alias("vy"),
        (F.col("sxy") - F.col("mx") * F.col("my")).alias("cxy"),
    )
    dx = F.col("xi") - F.col("mx")
    dy = F.col("yi") - F.col("my")
    d2 = (
        dx * dx * F.col("vy") - 2 * dx * dy * F.col("cxy") + dy * dy * F.col("vx")
    ) / (F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy"))
    return (
        pts.crossJoin(F.broadcast(m))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(d2, 6).alias("mahalanobis_sq"),
        )
        .orderBy(F.col("mahalanobis_sq").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@register(
    "qd38_ab_proportion_ztest",
    oracle="""
        WITH assigned AS (
            SELECT user_id, user_id % 2 AS variant,
                   max(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT
                CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN variant = 0 THEN converted
                         ELSE 0 END) AS BIGINT) AS x_a,
                CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_b,
                CAST(sum(CASE WHEN variant = 1 THEN converted
                         ELSE 0 END) AS BIGINT) AS x_b
            FROM assigned
        )
        SELECT n_a, x_a, n_b, x_b,
               round(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a,
               round(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b,
               round((CAST(x_a AS DOUBLE) / n_a
                      - CAST(x_b AS DOUBLE) / n_b)
                     / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                            * (1.0 - CAST(x_a + x_b AS DOUBLE)
                                     / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat
        FROM arms
    """,
    doc="TWO-PROPORTION z-TEST (pooled) — the A/B-test readout every "
    "experimentation pipeline computes: users hash into two variants "
    "(user_id parity as the deterministic assignment), conversion = "
    "did the user ever purchase, and the pooled z compares the two "
    "conversion rates.  Two aggregates total: per-user conversion "
    "flags (max of a predicate — one shuffle on user_id), then the "
    "2x2 cell counts as ONE conditional aggregate (no second "
    "shuffle), with the z expression mirrored from exact BIGINT "
    "cells.  The same shape serves guardrail metrics at 100 TB: the "
    "per-user stage is the only data-sized pass, partial-agg "
    "combinable, and adding metrics adds conditional-sum columns, "
    "not passes.  (qd35 is this test's nonparametric sibling on "
    "continuous outcomes.)",
)
def qd38_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    assigned = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn("variant", F.col("user_id") % 2)
    arms = assigned.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("x_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    n_a, x_a = F.col("n_a"), F.col("x_a")
    n_b, x_b = F.col("n_b"), F.col("x_b")
    p_a = x_a.cast("double") / n_a
    p_b = x_b.cast("double") / n_b
    pool = (x_a + x_b).cast("double") / (n_a + n_b)
    z = (p_a - p_b) / F.sqrt(
        pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)
    )
    return arms.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 6).alias("z_stat"),
    )


@register(
    "qd39_ks_exact_twosample",
    oracle="""
        WITH pop AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                       AS is_a
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        by_val AS (
            SELECT cents,
                   CAST(sum(is_a) AS BIGINT) AS a_v,
                   CAST(count(*) - sum(is_a) AS BIGINT) AS b_v
            FROM pop GROUP BY cents
        ),
        tot AS (
            SELECT CAST(sum(a_v) AS BIGINT) AS n_a,
                   CAST(sum(b_v) AS BIGINT) AS n_b
            FROM by_val
        ),
        cum AS (
            SELECT sum(a_v) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS ca,
                   sum(b_v) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cb
            FROM by_val
        )
        SELECT (SELECT n_a FROM tot) AS n_a,
               (SELECT n_b FROM tot) AS n_b,
               round(max(abs(CAST(ca AS DOUBLE) / (SELECT n_a FROM tot)
                             - CAST(cb AS DOUBLE) / (SELECT n_b FROM tot))),
                     6) AS d_stat
        FROM cum
    """,
    doc="EXACT two-sample KOLMOGOROV-SMIRNOV D statistic (urgent vs "
    "low order totals): max ECDF gap over the FULL value domain — the "
    "exactness upgrade of qd13/qd24's fixed-grid drift panels, and "
    "qd35's distribution-shape sibling (Mann-Whitney sees location; "
    "KS sees any shape difference).  Ranks collapse to exact-cents "
    "value groups first (the qd35 recipe), cumulative group counts "
    "ride dist_rank.distributed_cumsum (range exchange — NO "
    "single-task global window), and D is a max over per-value "
    "rationals computed from exact BIGINT prefix sums, one mirrored "
    "double division per value.  The oracle's global window IS "
    "single-task — fine for DuckDB's in-process executor, the Spark "
    "side is the distributed re-plan.  Scale: the spine is the "
    "distinct-value domain (sublinear); everything else is map-side.",
)
def qd39_ks_exact_twosample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dist_rank import distributed_cumsum

    o = load_table(spark, sf_dir, "orders")
    pop = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("is_a"),
    )
    by_val = pop.groupBy("cents").agg(
        F.sum("is_a").cast("bigint").alias("a_v"),
        (F.count("*") - F.sum("is_a")).cast("bigint").alias("b_v"),
    ).localCheckpoint(eager=True)
    tot = by_val.agg(
        F.sum("a_v").cast("bigint").alias("n_a"),
        F.sum("b_v").cast("bigint").alias("n_b"),
    )
    cum = distributed_cumsum(
        by_val,
        [F.col("cents")],
        [("a_v", "ca", True), ("b_v", "cb", True)],
    )
    gap = F.abs(
        F.col("ca").cast("double") / F.col("n_a")
        - F.col("cb").cast("double") / F.col("n_b")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.round(F.max(gap), 6).alias("d_stat"),
        )
    )


@register(
    "qd41_market_concentration_hhi",
    oracle="""
        WITH rev AS (
            SELECT s.s_nationkey AS nation, l.l_suppkey,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT nation, CAST(sum(cents) AS BIGINT) AS n_cents
            FROM rev GROUP BY nation
        )
        SELECT r.nation,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(CAST(round(
                   1e8 * (CAST(r.cents AS DOUBLE) / t.n_cents)
                       * (CAST(r.cents AS DOUBLE) / t.n_cents)
               ) AS BIGINT)) AS BIGINT) AS hhi_e8
        FROM rev r JOIN tot t ON t.nation = r.nation
        GROUP BY r.nation
    """,
    doc="HERFINDAHL-HIRSCHMAN market concentration per nation: the sum "
    "of squared supplier revenue shares — the antitrust-grade 'is this "
    "market a monopoly' number, and in data-pipeline terms the "
    "skew-early-warning for any partition key (HHI of key frequencies "
    "says whether a salted join is needed before the job runs; qd32's "
    "entropy is the log-scale sibling).  Shares come from exact-cents "
    "sums; each squared share is ONE deterministic double expression "
    "quantized to integer 1e-8 units before the per-market sum, so "
    "no float summation order exists (1e8 = the HHI's natural 0-10000 "
    "scale at 4 extra digits).  Scale: one fact aggregate (suppkey "
    "is the shuffle key), a broadcastable per-nation total join, and "
    "a 25-row output.",
)
def qd41_market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("nation")
    )
    rev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("nation", "l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("cents").cast("bigint").alias("n_cents")
    )
    share = F.col("cents").cast("double") / F.col("n_cents")
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum(F.round(F.lit(1e8) * share * share).cast("bigint"))
            .cast("bigint")
            .alias("hhi_e8"),
        )
    )


@register(
    "qd42_theil_inequality",
    oracle="""
        WITH spend AS (
            SELECT c.c_nationkey AS nation,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY o.o_custkey, c.c_nationkey
        ),
        grp AS (
            SELECT nation,
                   CAST(count(*) AS BIGINT) AS n_g,
                   CAST(sum(x) AS BIGINT) AS x_g
            FROM spend GROUP BY nation
        ),
        tot AS (
            SELECT CAST(sum(n_g) AS BIGINT) AS n,
                   CAST(sum(x_g) AS BIGINT) AS x
            FROM grp
        ),
        within AS (
            SELECT s.nation,
                   CAST(sum(CAST(round(
                       1e9 * (CAST(s.x AS DOUBLE) / g.x_g)
                           * ln(CAST(s.x AS DOUBLE) * g.n_g / g.x_g)
                   ) AS BIGINT)) AS BIGINT) AS theil_nano
            FROM spend s JOIN grp g ON g.nation = s.nation
            GROUP BY s.nation
        )
        SELECT 'within:' || CAST(w.nation AS VARCHAR) AS component,
               g.n_g AS n_units,
               w.theil_nano
        FROM within w JOIN grp g ON g.nation = w.nation
        UNION ALL
        SELECT 'between' AS component,
               (SELECT n FROM tot) AS n_units,
               (SELECT CAST(sum(CAST(round(
                    1e9 * (CAST(g.x_g AS DOUBLE) / t.x)
                        * ln((CAST(g.x_g AS DOUBLE) / g.n_g)
                             / (CAST(t.x AS DOUBLE) / t.n))
                ) AS BIGINT)) AS BIGINT)
                FROM grp g CROSS JOIN tot t) AS theil_nano
    """,
    doc="THEIL INEQUALITY DECOMPOSITION of customer spend: the "
    "entropy-based inequality index split into WITHIN-nation terms "
    "(each nation's own spend concentration) and one BETWEEN-nations "
    "term (how unequal the nation averages are) — the decomposition "
    "property Gini lacks and the reason Theil is the inequality "
    "audit of choice for hierarchical populations (for a pipeline: "
    "is skew coming from inside partitions or between them — the "
    "drill-down qd41's flat HHI can't answer).  Each per-customer "
    "term (x_i/X_g)*ln(x_i*N_g/X_g) is one deterministic double "
    "expression from exact BIGINT cents, quantized to integer 1e-9 "
    "units before summation — no float summation order on any of "
    "the 26 output rows.  Scale: one orders aggregate (custkey "
    "shuffle), then nation-sized joins; the between term touches 25 "
    "rows.",
)
def qd42_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nation")
    )
    spend = (
        o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .groupBy("o_custkey", "nation")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
    ).localCheckpoint(eager=True)
    grp = spend.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("x").cast("bigint").alias("x_g"),
    ).localCheckpoint(eager=True)
    tot = grp.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("x_g").cast("bigint").alias("x_t"),
    )
    term = F.round(
        F.lit(1e9)
        * (F.col("x").cast("double") / F.col("x_g"))
        * F.log(F.col("x").cast("double") * F.col("n_g") / F.col("x_g"))
    ).cast("bigint")
    within = (
        spend.join(F.broadcast(grp), "nation")
        .groupBy("nation")
        .agg(F.sum(term).cast("bigint").alias("theil_nano"))
        .join(F.broadcast(grp), "nation")
        .select(
            F.concat(F.lit("within:"), F.col("nation").cast("string")).alias(
                "component"
            ),
            F.col("n_g").alias("n_units"),
            "theil_nano",
        )
    )
    bterm = F.round(
        F.lit(1e9)
        * (F.col("x_g").cast("double") / F.col("x_t"))
        * F.log(
            (F.col("x_g").cast("double") / F.col("n_g"))
            / (F.col("x_t").cast("double") / F.col("n"))
        )
    ).cast("bigint")
    between = (
        grp.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").cast("bigint").alias("n_units"),
            F.sum(bterm).cast("bigint").alias("theil_nano"),
        )
        .select(
            F.lit("between").alias("component"), "n_units", "theil_nano"
        )
    )
    return within.unionByName(between)


@register(
    "qd43_robust_zscore_outliers",
    oracle="""
        WITH pts AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        med AS (
            SELECT quantile_cont(cents, 0.5) AS m FROM pts
        ),
        mad AS (
            SELECT quantile_cont(abs(cents - (SELECT m FROM med)), 0.5)
                       AS mad_v
            FROM pts
        )
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               round((SELECT m FROM med) / 1e2, 6) AS median_dollars,
               round((SELECT mad_v FROM mad) / 1e2, 6) AS mad_dollars,
               CAST(sum(CASE WHEN
                   abs(0.6745 * (cents - (SELECT m FROM med))
                       / (SELECT mad_v FROM mad)) > 3.5
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM pts
    """,
    doc="ROBUST Z-SCORE outlier screen (median/MAD, the Iglewicz-"
    "Hoaglin modified z with the 0.6745 consistency constant and the "
    "canonical 3.5 cut): unlike mean/stddev screens (qd05's IQR "
    "sibling), the median and MAD are UNPOLLUTED by the outliers "
    "they're hunting — the difference between a screen that works "
    "once and one that still works after the first data incident "
    "doubles the tail.  Two exact-percentile passes (median, then "
    "median absolute deviation about it — quantile parity pinned by "
    "q22/q22b) feed one broadcast scalar pair and a map-side "
    "modified-z predicate; output is the corpus profile + outlier "
    "count.  All inputs exact cents; the z expression is one "
    "mirrored double chain.  Scale: percentiles are the only sorts "
    "(approx_percentile is the documented 100 TB swap, identical "
    "plan otherwise); counting never materializes outlier rows.",
)
def qd43_robust_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    ).localCheckpoint(eager=True)
    med = pts.agg(F.expr("percentile(cents, 0.5)").alias("m"))
    mad = (
        pts.crossJoin(F.broadcast(med))
        .agg(
            F.expr("percentile(abs(cents - m), 0.5)").alias("mad_v"),
            F.max("m").alias("m"),
        )
    )
    z = 0.6745 * (F.col("cents") - F.col("m")) / F.col("mad_v")
    return (
        pts.crossJoin(F.broadcast(mad))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.max("m") / 1e2, 6).alias("median_dollars"),
            F.round(F.max("mad_v") / 1e2, 6).alias("mad_dollars"),
            F.sum(F.when(F.abs(z) > 3.5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "qd44_mcnemar_paired_test",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   (lang = 'en') AS truth,
                   (contains(text, ' the ')) AS pred_a,
                   (contains(text, ' and ')) AS pred_b
            FROM documents
        ),
        cells AS (
            SELECT
                count(*) AS n,
                sum(CASE WHEN (pred_a = truth) THEN 1 ELSE 0 END) AS a_correct,
                sum(CASE WHEN (pred_b = truth) THEN 1 ELSE 0 END) AS b_correct,
                sum(CASE WHEN (pred_a = truth) AND (pred_b <> truth)
                         THEN 1 ELSE 0 END) AS a_only,
                sum(CASE WHEN (pred_a <> truth) AND (pred_b = truth)
                         THEN 1 ELSE 0 END) AS b_only
            FROM scored
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(a_correct AS BIGINT) AS a_correct,
               CAST(b_correct AS BIGINT) AS b_correct,
               CAST(a_only AS BIGINT) AS a_only_correct,
               CAST(b_only AS BIGINT) AS b_only_correct,
               CASE WHEN a_only + b_only = 0 THEN NULL
                    ELSE round(
                        (abs(a_only - b_only) - 1)
                        * (abs(a_only - b_only) - 1) * 1.0
                        / (a_only + b_only), 6)
               END AS mcnemar_chi2_cc
        FROM cells
    """,
    doc="McNemar's paired test — the right significance test when two "
    "classifiers score the SAME examples (comparing raw accuracies "
    "ignores the pairing and wastes power): only the discordant pairs "
    "matter, b = A-right/B-wrong and c = A-wrong/B-right, and the "
    "continuity-corrected statistic (|b-c|-1)^2/(b+c) is chi-square(1) "
    "under the null that both models err at the same rate.  The two "
    "models here are deterministic stopword rules (contains ' the ' "
    "vs ' and ' predicting lang='en') so both engines reproduce the "
    "predictions bit-identically; every cell is an exact integer and "
    "the statistic is one division, NULL-guarded when no discordant "
    "pairs exist (the qc46 zero-expectation convention).  Completes "
    "the paired-data corner of the stats-test family (qd35 "
    "Mann-Whitney, qd36 ANOVA, qd38 two-proportion z, qd39 exact KS).  "
    "Scale: single scan, one map-side-combinable aggregate, five "
    "integer cells of state.",
)
def qd44_mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        (F.col("lang") == "en").alias("truth"),
        F.col("text").contains(" the ").alias("pred_a"),
        F.col("text").contains(" and ").alias("pred_b"),
    )
    cells = scored.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pred_a") == F.col("truth"), 1).otherwise(0)).alias(
            "a_correct"
        ),
        F.sum(F.when(F.col("pred_b") == F.col("truth"), 1).otherwise(0)).alias(
            "b_correct"
        ),
        F.sum(
            F.when(
                (F.col("pred_a") == F.col("truth"))
                & (F.col("pred_b") != F.col("truth")),
                1,
            ).otherwise(0)
        ).alias("a_only"),
        F.sum(
            F.when(
                (F.col("pred_a") != F.col("truth"))
                & (F.col("pred_b") == F.col("truth")),
                1,
            ).otherwise(0)
        ).alias("b_only"),
    )
    disc = F.col("a_only") + F.col("b_only")
    gap = F.abs(F.col("a_only") - F.col("b_only")) - 1
    return cells.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("a_correct").cast("bigint").alias("a_correct"),
        F.col("b_correct").cast("bigint").alias("b_correct"),
        F.col("a_only").cast("bigint").alias("a_only_correct"),
        F.col("b_only").cast("bigint").alias("b_only_correct"),
        F.when(disc == 0, F.lit(None).cast("double"))
        .otherwise(F.round(gap * gap * 1.0 / disc, 6))
        .alias("mcnemar_chi2_cc"),
    )


@register(
    "qd45_simpson_paradox_audit",
    oracle="""
        WITH base AS (
            SELECT n.n_name,
                   CAST(round(l.l_discount * 100, 0) AS BIGINT) AS x_pct,
                   CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS y_cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        per_nation AS (
            SELECT n_name,
                   count(*) AS n,
                   sum(x_pct) AS sx, sum(y_cents) AS sy,
                   sum(x_pct * y_cents) AS sxy
            FROM base GROUP BY n_name
        ),
        global_row AS (
            SELECT count(*) AS n, sum(x_pct) AS sx, sum(y_cents) AS sy,
                   sum(x_pct * y_cents) AS sxy
            FROM base
        ),
        signed AS (
            SELECT p.n_name,
                   CAST(p.n AS BIGINT) AS n_rows,
                   CAST(sign(CAST(p.n AS HUGEINT) * p.sxy
                             - CAST(p.sx AS HUGEINT) * p.sy) AS BIGINT)
                       AS nation_trend,
                   CAST(sign(CAST(g.n AS HUGEINT) * g.sxy
                             - CAST(g.sx AS HUGEINT) * g.sy) AS BIGINT)
                       AS global_trend
            FROM per_nation p CROSS JOIN global_row g
        )
        SELECT n_name, n_rows, nation_trend, global_trend,
               (nation_trend <> 0 AND global_trend <> 0
                AND nation_trend <> global_trend) AS trend_reversal
        FROM signed
    """,
    doc="Simpson's-paradox audit: does the discount-revenue trend "
    "WITHIN each nation disagree with the pooled global trend?  The "
    "aggregate-vs-stratified sign flip is the classic way a pooled "
    "dashboard metric lies, and the audit belongs beside every "
    "segmented KPI.  The trend sign is the covariance numerator "
    "n*Sxy - Sx*Sy computed in EXACT integer arithmetic — discount "
    "as integer percent units, price as integer cents, the two "
    "products cast up (HUGEINT in DuckDB, DECIMAL(38,0) in Spark — "
    "tight operand casts per the SCALE.md decimal rule so neither "
    "engine rounds) — so the sign is bit-trustworthy where a float "
    "regr_slope near zero would jitter across engines.  Scale: one "
    "star join feeding two map-side-combinable aggregates (per-"
    "nation + global), a broadcast of the single global row, and "
    "integer compares.",
)
def qd45_simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.round(F.col("l_discount") * 100, 0).cast("long").alias("x_pct"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("y_cents"),
        )
    )
    def _stats(df, keys):
        return df.groupBy(*keys).agg(
            F.count("*").alias("n"),
            F.sum("x_pct").alias("sx"),
            F.sum("y_cents").alias("sy"),
            F.sum(F.col("x_pct") * F.col("y_cents")).alias("sxy"),
        )
    per_nation = _stats(base, ["n_name"])
    global_row = _stats(base, []).select(
        F.col("n").alias("gn"),
        F.col("sx").alias("gsx"),
        F.col("sy").alias("gsy"),
        F.col("sxy").alias("gsxy"),
    )
    def _sign(nn, sxy, sx, sy):
        num = nn.cast("decimal(12,0)") * sxy.cast("decimal(25,0)") - sx.cast(
            "decimal(15,0)"
        ) * sy.cast("decimal(22,0)")
        return F.signum(num.cast("double")).cast("bigint")
    signed = per_nation.crossJoin(F.broadcast(global_row)).select(
        "n_name",
        F.col("n").cast("bigint").alias("n_rows"),
        _sign(F.col("n"), F.col("sxy"), F.col("sx"), F.col("sy")).alias(
            "nation_trend"
        ),
        _sign(F.col("gn"), F.col("gsxy"), F.col("gsx"), F.col("gsy")).alias(
            "global_trend"
        ),
    )
    return signed.select(
        "n_name",
        "n_rows",
        "nation_trend",
        "global_trend",
        (
            (F.col("nation_trend") != 0)
            & (F.col("global_trend") != 0)
            & (F.col("nation_trend") != F.col("global_trend"))
        ).alias("trend_reversal"),
    )


@register(
    "qd46_rolling_origin_backtest",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
            FROM events
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        folds AS (
            SELECT * FROM (VALUES
                (1, DATE '2024-01-15'),
                (2, DATE '2024-01-19'),
                (3, DATE '2024-01-23'),
                (4, DATE '2024-01-27')
            ) AS f(fold_id, cutoff)
        ),
        test AS (
            SELECT f.fold_id, a.event_type, a.d, a.cnt AS actual,
                   coalesce(p.cnt, 0) AS forecast
            FROM folds f
            JOIN daily a
              ON a.d >= f.cutoff AND a.d < f.cutoff + INTERVAL 4 DAY
            LEFT JOIN daily p
              ON p.event_type = a.event_type
             AND p.d = a.d - INTERVAL 7 DAY
        )
        SELECT fold_id, event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(actual) AS BIGINT) AS total_actual,
               CAST(sum(abs(actual - forecast)) AS BIGINT) AS abs_err,
               round(sum(abs(actual - forecast)) * 1.0 / sum(actual), 6)
                   AS wape
        FROM test
        GROUP BY fold_id, event_type
    """,
    doc="ROLLING-ORIGIN backtest (time-series cross-validation): four "
    "expanding-origin folds, each forecasting its next 4 days with "
    "the seasonal-naive lag-7 model and scoring WAPE per event type — "
    "qd22 backtests ONE origin; this is the honest protocol (k-fold "
    "shuffling leaks the future, rolling origins don't), and the "
    "fold-to-fold WAPE spread is the model-stability signal a single "
    "backtest can't show.  The fold spine is a 4-row literal VALUES "
    "table joined against the daily-count rollup; forecasts join at "
    "d-7 (always before every cutoff by construction, so no fold "
    "ever reads its own test window); counts are exact integers with "
    "one WAPE division per output row.  Scale: the daily rollup is "
    "the only data-sized stage (map-side combinable); folds multiply "
    "the BOUNDED daily table by 4, not the corpus.",
)
def qd46_rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("cnt"))
    folds = spark.createDataFrame(
        [(1, "2024-01-15"), (2, "2024-01-19"), (3, "2024-01-23"),
         (4, "2024-01-27")],
        "fold_id INT, cutoff STRING",
    ).select("fold_id", F.col("cutoff").cast("date").alias("cutoff"))
    a = daily.alias("a")
    p = daily.select(
        F.col("event_type").alias("p_type"),
        F.col("d").alias("p_d"),
        F.col("cnt").alias("p_cnt"),
    )
    test = (
        F.broadcast(folds)
        .join(
            a,
            (F.col("a.d") >= F.col("cutoff"))
            & (F.col("a.d") < F.date_add(F.col("cutoff"), 4)),
        )
        .join(
            p,
            (F.col("p_type") == F.col("a.event_type"))
            & (F.col("p_d") == F.date_sub(F.col("a.d"), 7)),
            "left",
        )
        .select(
            "fold_id",
            F.col("a.event_type").alias("event_type"),
            F.col("a.cnt").alias("actual"),
            F.coalesce("p_cnt", F.lit(0)).alias("forecast"),
        )
    )
    return test.groupBy("fold_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("actual").cast("bigint").alias("total_actual"),
        F.sum(F.abs(F.col("actual") - F.col("forecast")))
        .cast("bigint")
        .alias("abs_err"),
        F.round(
            F.sum(F.abs(F.col("actual") - F.col("forecast")))
            * 1.0
            / F.sum("actual"),
            6,
        ).alias("wape"),
    )


@register(
    "qd47_outlier_consensus",
    oracle="""
        WITH base AS (
            SELECT o_orderpriority AS grp,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders
        ),
        stats AS (
            SELECT grp,
                   quantile_cont(cents, 0.25) AS q1,
                   quantile_cont(cents, 0.75) AS q3,
                   quantile_cont(cents, 0.5) AS med,
                   quantile_cont(cents, 0.01) AS p01,
                   quantile_cont(cents, 0.99) AS p99
            FROM base GROUP BY grp
        ),
        mad AS (
            SELECT b.grp,
                   quantile_cont(abs(b.cents - s.med), 0.5) AS mad_v
            FROM base b JOIN stats s ON b.grp = s.grp
            GROUP BY b.grp
        ),
        votes AS (
            SELECT b.grp,
                   CASE WHEN b.cents < s.q1 - 1.5 * (s.q3 - s.q1)
                          OR b.cents > s.q3 + 1.5 * (s.q3 - s.q1)
                        THEN 1 ELSE 0 END
                 + CASE WHEN m.mad_v > 0 AND
                        abs(b.cents - s.med) > 3.5 * m.mad_v / 0.6745
                        THEN 1 ELSE 0 END
                 + CASE WHEN b.cents < s.p01 OR b.cents > s.p99
                        THEN 1 ELSE 0 END AS n_votes
            FROM base b
            JOIN stats s ON b.grp = s.grp
            JOIN mad m ON b.grp = m.grp
        )
        SELECT grp, CAST(n_votes AS BIGINT) AS n_votes,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM votes
        GROUP BY grp, n_votes
    """,
    doc="ENSEMBLE outlier consensus — three deterministic screens the "
    "repo ships individually (qd05 IQR fence, qd08/qd43 median/MAD "
    "modified z, and the P1/P99 tail-quantile cut) voting on the "
    "same points, rolled up to a per-group vote histogram: points "
    "all three flag are actionable, 1-of-3 flags are method "
    "artifacts (the tail cut flags a FIXED 2%% by construction; the "
    "robust screens flag by distance — the disagreement IS the "
    "distribution-shape signal).  A classic mean/stddev z-screen is "
    "deliberately NOT in the ensemble: Welford-merge stddev doubles "
    "depend on partial-aggregation order, so its 3-sigma boundary "
    "is not engine-stable — the three screens here compare exact "
    "integer cents against interpolated percentiles that both "
    "engines compute with the same closed formula (the qd05/qd06 "
    "parity precedent).  Scale: two grouped percentile passes + one "
    "broadcast scalar table + a map-side vote — shared, not tripled.",
)
def qd47_outlier_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    stats = base.groupBy("grp").agg(
        F.expr("percentile(cents, 0.25)").alias("q1"),
        F.expr("percentile(cents, 0.75)").alias("q3"),
        F.expr("percentile(cents, 0.5)").alias("med"),
        F.expr("percentile(cents, 0.01)").alias("p01"),
        F.expr("percentile(cents, 0.99)").alias("p99"),
    )
    mad = (
        base.join(F.broadcast(stats.select("grp", "med")), "grp")
        .groupBy("grp")
        .agg(F.expr("percentile(abs(cents - med), 0.5)").alias("mad_v"))
    )
    iqr = F.col("q3") - F.col("q1")
    votes = (
        base.join(F.broadcast(stats), "grp")
        .join(F.broadcast(mad), "grp")
        .select(
            "grp",
            (
                F.when(
                    (F.col("cents") < F.col("q1") - 1.5 * iqr)
                    | (F.col("cents") > F.col("q3") + 1.5 * iqr),
                    1,
                ).otherwise(0)
                + F.when(
                    (F.col("mad_v") > 0)
                    & (
                        F.abs(F.col("cents") - F.col("med"))
                        > 3.5 * F.col("mad_v") / 0.6745
                    ),
                    1,
                ).otherwise(0)
                + F.when(
                    (F.col("cents") < F.col("p01"))
                    | (F.col("cents") > F.col("p99")),
                    1,
                ).otherwise(0)
            ).alias("n_votes"),
        )
    )
    return (
        votes.groupBy("grp", "n_votes")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
        .select(
            "grp",
            F.col("n_votes").cast("bigint").alias("n_votes"),
            "n_rows",
        )
    )


@register(
    "qd48_scd2_validity_audit",
    oracle="""
        WITH versions AS (
            SELECT o_custkey AS k, o_orderkey AS vid,
                   CAST(o_orderdate AS DATE) AS v_start,
                   lead(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS v_end_clean
            FROM orders
        ),
        corrupted AS (
            SELECT k, vid, v_start,
                   CASE WHEN v_end_clean IS NULL THEN NULL
                        WHEN k % 97 = 0 THEN v_end_clean + INTERVAL 10 DAY
                        WHEN k % 89 = 0 THEN v_end_clean - INTERVAL 5 DAY
                        ELSE v_end_clean END AS v_end
            FROM versions
        ),
        seq AS (
            SELECT k, v_start, v_end,
                   lead(v_start) OVER (
                       PARTITION BY k ORDER BY v_start, vid
                   ) AS next_start
            FROM corrupted
        ),
        per_key AS (
            SELECT k,
                   count(*) AS n_versions,
                   sum(CASE WHEN next_start IS NOT NULL
                             AND CAST(v_end AS DATE) > next_start
                            THEN 1 ELSE 0 END) AS n_overlaps,
                   sum(CASE WHEN next_start IS NOT NULL
                             AND CAST(v_end AS DATE) < next_start
                            THEN 1 ELSE 0 END) AS n_gaps,
                   sum(CASE WHEN v_end IS NULL THEN 1 ELSE 0 END)
                       AS n_open
            FROM seq GROUP BY k
        )
        SELECT CASE WHEN n_overlaps > 0 THEN 'overlap'
                    WHEN n_gaps > 0 THEN 'gap'
                    WHEN n_open <> 1 THEN 'bad_current_count'
                    ELSE 'clean' END AS verdict,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n_versions) AS BIGINT) AS n_versions,
               CAST(sum(n_overlaps) AS BIGINT) AS n_overlaps,
               CAST(sum(n_gaps) AS BIGINT) AS n_gaps
        FROM per_key
        GROUP BY 1
    """,
    doc="SCD2 VALIDITY audit — the invariant checker every slowly-"
    "changing-dimension pipeline (q37's MERGE emulation included) "
    "must run: per key, consecutive version intervals must tile time "
    "exactly (no overlaps, no gaps) and exactly ONE current (open-"
    "ended) row must exist.  The audited table is built from the "
    "orders history and then deterministically CORRUPTED (keys "
    "divisible by 97 get +10-day ends -> overlaps; by 89 get -5-day "
    "ends -> gaps — the src15 planted-pattern convention), so the "
    "audit's recall is proven by construction, not assumed: clean "
    "keys come out 'clean', every planted class lands in its "
    "verdict bucket.  Detection is one lead() window per key "
    "(adjacent-interval compare — never a self-join) and all "
    "comparisons are DATE-exact.  Scale: window partitions by the "
    "dimension key; the audit costs one pass over the dimension, "
    "which is always the small side of a warehouse.",
)
def qd48_scd2_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w_lead = W.partitionBy("k").orderBy("o_orderdate", "o_orderkey")
    versions = o.select(
        F.col("o_custkey").alias("k"),
        "o_orderkey",
        "o_orderdate",
        F.col("o_orderdate").cast("date").alias("v_start"),
        F.lead(F.col("o_orderdate").cast("date"))
        .over(W.partitionBy(F.col("o_custkey")).orderBy("o_orderdate", "o_orderkey"))
        .alias("v_end_clean"),
    )
    corrupted = versions.select(
        "k",
        F.col("o_orderkey").alias("vid"),
        "v_start",
        F.when(F.col("v_end_clean").isNull(), F.lit(None).cast("date"))
        .when(F.col("k") % 97 == 0, F.date_add("v_end_clean", 10))
        .when(F.col("k") % 89 == 0, F.date_sub("v_end_clean", 5))
        .otherwise(F.col("v_end_clean"))
        .alias("v_end"),
    )
    # The interval sequence must be ordered by a UNIQUE key: ordering
    # tied v_starts by v_end would put the NULL-ended current row at
    # engine-dependent positions (Spark sorts NULLs first, DuckDB
    # last) and flip one overlap flag per affected key.
    seq = corrupted.select(
        "k",
        "v_start",
        "v_end",
        F.lead("v_start")
        .over(W.partitionBy("k").orderBy("v_start", "vid"))
        .alias("next_start"),
    )
    per_key = seq.groupBy("k").agg(
        F.count("*").alias("n_versions"),
        F.sum(
            F.when(
                F.col("next_start").isNotNull()
                & (F.col("v_end") > F.col("next_start")),
                1,
            ).otherwise(0)
        ).alias("n_overlaps"),
        F.sum(
            F.when(
                F.col("next_start").isNotNull()
                & (F.col("v_end") < F.col("next_start")),
                1,
            ).otherwise(0)
        ).alias("n_gaps"),
        F.sum(F.when(F.col("v_end").isNull(), 1).otherwise(0)).alias(
            "n_open"
        ),
    )
    return (
        per_key.select(
            F.when(F.col("n_overlaps") > 0, "overlap")
            .when(F.col("n_gaps") > 0, "gap")
            .when(F.col("n_open") != 1, "bad_current_count")
            .otherwise("clean")
            .alias("verdict"),
            "n_versions",
            "n_overlaps",
            "n_gaps",
        )
        .groupBy("verdict")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n_versions").cast("bigint").alias("n_versions"),
            F.sum("n_overlaps").cast("bigint").alias("n_overlaps"),
            F.sum("n_gaps").cast("bigint").alias("n_gaps"),
        )
    )


@register(
    "qd49_forecast_interval_coverage",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        paired AS (
            SELECT a.event_type, a.d, a.cnt AS actual, p.cnt AS fc
            FROM daily a
            JOIN daily p ON p.event_type = a.event_type
                        AND p.d = a.d - INTERVAL 7 DAY
        ),
        train_resid AS (
            SELECT event_type, actual - fc AS resid
            FROM paired WHERE d < DATE '2024-01-22'
        ),
        pi AS (
            SELECT event_type,
                   count(*) AS n_train,
                   quantile_cont(resid, 0.05) AS r05,
                   quantile_cont(resid, 0.95) AS r95
            FROM train_resid GROUP BY event_type
        )
        SELECT t.event_type,
               CAST(pi.n_train AS BIGINT) AS n_train_resid,
               CAST(count(*) AS BIGINT) AS n_test_days,
               CAST(sum(CASE WHEN t.actual >= t.fc + pi.r05
                              AND t.actual <= t.fc + pi.r95
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
               round(sum(CASE WHEN t.actual >= t.fc + pi.r05
                               AND t.actual <= t.fc + pi.r95
                              THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                   AS coverage,
               round(pi.r95 - pi.r05, 6) AS pi_width
        FROM paired t
        JOIN pi ON t.event_type = pi.event_type
        WHERE t.d >= DATE '2024-01-22'
        GROUP BY t.event_type, pi.n_train, pi.r05, pi.r95
    """,
    doc="Forecast PREDICTION-INTERVAL coverage — the uncertainty leg "
    "the point backtests (qd22 single-origin, qd46 rolling-origin) "
    "leave open: train-period residuals of the lag-7 seasonal-naive "
    "model yield an empirical [P5, P95] band, and the test period "
    "measures how often actuals land inside forecast+band — the "
    "number an alerting threshold is actually tuned against "
    "(nominal 90%%; the gap between nominal and measured IS the "
    "calibration verdict, same logic as ml33's probability "
    "calibration but for forecasts).  Counts are exact integers; "
    "the band endpoints are interpolated percentiles both engines "
    "compute with the same closed formula (qd05/qd06 precedent); "
    "coverage divides two integers once.  Scale: one daily rollup, "
    "one self-join at lag 7 (date equi-join), one bounded "
    "per-type percentile pass — the band table broadcasts.",
)
def qd49_forecast_interval_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("cnt"))
    p = daily.select(
        F.col("event_type").alias("p_type"),
        F.col("d").alias("p_d"),
        F.col("cnt").alias("fc"),
    )
    paired = daily.join(
        p,
        (F.col("p_type") == F.col("event_type"))
        & (F.col("p_d") == F.date_sub(F.col("d"), 7)),
    ).select("event_type", "d", F.col("cnt").alias("actual"), "fc")
    cutoff = F.lit("2024-01-22").cast("date")
    train = paired.filter(F.col("d") < cutoff).select(
        "event_type", (F.col("actual") - F.col("fc")).alias("resid")
    )
    pi = train.groupBy("event_type").agg(
        F.count("*").alias("n_train"),
        F.expr("percentile(resid, 0.05)").alias("r05"),
        F.expr("percentile(resid, 0.95)").alias("r95"),
    )
    test = paired.filter(F.col("d") >= cutoff).join(
        F.broadcast(pi), "event_type"
    )
    covered = F.when(
        (F.col("actual") >= F.col("fc") + F.col("r05"))
        & (F.col("actual") <= F.col("fc") + F.col("r95")),
        1,
    ).otherwise(0)
    return (
        test.groupBy("event_type", "n_train", "r05", "r95")
        .agg(
            F.count("*").cast("bigint").alias("n_test_days"),
            F.sum(covered).cast("bigint").alias("n_covered"),
            F.round(F.sum(covered) * 1.0 / F.count("*"), 6).alias(
                "coverage"
            ),
        )
        .select(
            "event_type",
            F.col("n_train").cast("bigint").alias("n_train_resid"),
            "n_test_days",
            "n_covered",
            "coverage",
            F.round(F.col("r95") - F.col("r05"), 6).alias("pi_width"),
        )
    )


@register(
    "qd51_weekday_seasonal_index",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        keyed AS (
            SELECT event_type,
                   CAST(datediff('day', DATE '1970-01-01', d) % 7
                        AS BIGINT) AS dow,
                   cnt
            FROM daily
        ),
        per_dow AS (
            SELECT event_type, dow,
                   count(*) AS n_days,
                   sum(cnt) AS total
            FROM keyed GROUP BY event_type, dow
        ),
        grand AS (
            SELECT event_type,
                   sum(n_days) AS g_days,
                   sum(total) AS g_total
            FROM per_dow GROUP BY event_type
        )
        SELECT p.event_type, p.dow,
               CAST(p.n_days AS BIGINT) AS n_days,
               CAST(p.total AS BIGINT) AS total_events,
               round(p.total * 1.0 / p.n_days, 6) AS dow_mean,
               round((p.total * 1.0 / p.n_days)
                     / (g.g_total * 1.0 / g.g_days), 6) AS seasonal_index
        FROM per_dow p JOIN grand g ON p.event_type = g.event_type
    """,
    doc="WEEKDAY seasonal-index profile — the multiplicative seasonality "
    "table behind qd22/qd46's lag-7 forecasts: per event type, each "
    "day-of-week's mean daily volume as a ratio to the type's grand "
    "daily mean (index 1.3 = 'this weekday runs 30%% hot'), which is "
    "both the classical decomposition's seasonal component and the "
    "sanity check on WHY lag-7 beats lag-1.  Day-of-week comes from "
    "pure integer arithmetic (days since epoch mod 7) — deliberately "
    "NOT dayofweek(), whose 0-vs-1-based Sunday differs across "
    "engines (the q52c dialect trap, sidestepped rather than "
    "re-normalized).  Counts are exact integers; each index is two "
    "divisions of identical integers.  Scale: one daily rollup, one "
    "7-row-per-type fold, one broadcastable grand-mean join.",
)
def qd51_weekday_seasonal_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").alias("cnt"))
    keyed = daily.select(
        "event_type",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7
        )
        .cast("long")
        .alias("dow"),
        "cnt",
    )
    per_dow = keyed.groupBy("event_type", "dow").agg(
        F.count("*").alias("n_days"), F.sum("cnt").alias("total")
    )
    grand = per_dow.groupBy("event_type").agg(
        F.sum("n_days").alias("g_days"), F.sum("total").alias("g_total")
    )
    dow_mean = F.col("total") * 1.0 / F.col("n_days")
    grand_mean = F.col("g_total") * 1.0 / F.col("g_days")
    return per_dow.join(F.broadcast(grand), "event_type").select(
        "event_type",
        "dow",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("total").cast("bigint").alias("total_events"),
        F.round(dow_mean, 6).alias("dow_mean"),
        F.round(dow_mean / grand_mean, 6).alias("seasonal_index"),
    )


@register(
    "qd52_poisson_fit_audit",
    oracle="""
        WITH sizes AS (
            SELECT l_orderkey, count(*) AS k
            FROM lineitem GROUP BY l_orderkey
        ),
        lam AS (
            SELECT count(*) AS n_orders,
                   sum(k) AS n_lines,
                   sum(k) * 1.0 / count(*) AS lambda
            FROM sizes
        ),
        obs AS (
            SELECT k, count(*) AS observed FROM sizes GROUP BY k
        )
        SELECT o.k,
               CAST(o.observed AS BIGINT) AS observed,
               round(l.n_orders * exp(-l.lambda)
                     * (CASE CAST(o.k AS INT)
                          WHEN 1 THEN l.lambda
                          WHEN 2 THEN l.lambda * l.lambda
                          WHEN 3 THEN l.lambda * l.lambda * l.lambda
                          WHEN 4 THEN l.lambda * l.lambda * l.lambda
                                      * l.lambda
                          WHEN 5 THEN l.lambda * l.lambda * l.lambda
                                      * l.lambda * l.lambda
                          WHEN 6 THEN l.lambda * l.lambda * l.lambda
                                      * l.lambda * l.lambda * l.lambda
                          WHEN 7 THEN l.lambda * l.lambda * l.lambda
                                      * l.lambda * l.lambda * l.lambda
                                      * l.lambda
                          ELSE NULL END)
                     / (CASE CAST(o.k AS INT)
                          WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 6
                          WHEN 4 THEN 24 WHEN 5 THEN 120 WHEN 6 THEN 720
                          WHEN 7 THEN 5040 ELSE NULL END), 4)
                   AS poisson_expected,
               round(l.lambda, 6) AS lambda
        FROM obs o CROSS JOIN lam l
    """,
    doc="Count-distribution FIT audit (the qd09 Benford idea applied "
    "to basket sizes): observed orders-with-k-lines vs the Poisson(λ) "
    "expectation at the fitted mean — systematic deviation (zero "
    "inflation, a truncated tail, an operational cap) shows up as "
    "observed/expected divergence per k, the standard count-data "
    "sanity screen.  λ is ONE division of exact integers, λ^k is an "
    "explicit multiplication ladder (never pow(), whose libm last-ULP "
    "differs across engines), k! is a literal integer table, and the "
    "single exp(-λ) call is the only transcendental — applied to the "
    "same double in both engines with its result rounded at 4dp, "
    "orders of magnitude above ULP noise (the q84h quantized-ln "
    "precedent).  Scale: one per-order rollup + a |k|-row fit table; "
    "the distribution never leaves aggregate space.",
)
def qd52_poisson_fit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    sizes = l.groupBy("l_orderkey").agg(F.count("*").alias("k"))
    lam = sizes.agg(
        F.count("*").alias("n_orders"),
        F.sum("k").alias("n_lines"),
        (F.sum("k") * 1.0 / F.count("*")).alias("lambda"),
    )
    obs = sizes.groupBy("k").agg(F.count("*").alias("observed"))
    lamc = F.col("lambda")
    pow_expr = (
        F.when(F.col("k") == 1, lamc)
        .when(F.col("k") == 2, lamc * lamc)
        .when(F.col("k") == 3, lamc * lamc * lamc)
        .when(F.col("k") == 4, lamc * lamc * lamc * lamc)
        .when(F.col("k") == 5, lamc * lamc * lamc * lamc * lamc)
        .when(F.col("k") == 6, lamc * lamc * lamc * lamc * lamc * lamc)
        .when(
            F.col("k") == 7,
            lamc * lamc * lamc * lamc * lamc * lamc * lamc,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    fact_expr = (
        F.when(F.col("k") == 1, 1)
        .when(F.col("k") == 2, 2)
        .when(F.col("k") == 3, 6)
        .when(F.col("k") == 4, 24)
        .when(F.col("k") == 5, 120)
        .when(F.col("k") == 6, 720)
        .when(F.col("k") == 7, 5040)
        .otherwise(F.lit(None).cast("int"))
    )
    return obs.crossJoin(F.broadcast(lam)).select(
        "k",
        F.col("observed").cast("bigint").alias("observed"),
        F.round(
            F.col("n_orders") * F.exp(-lamc) * pow_expr / fact_expr, 4
        ).alias("poisson_expected"),
        F.round(lamc, 6).alias("lambda"),
    )


@register(
    "qd53_k_anonymity_audit",
    oracle="""
        SELECT c_nationkey,
               c_mktsegment,
               CAST(count(*) AS BIGINT) AS group_size,
               CAST(count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS
                                        BIGINT)) AS BIGINT) AS l_diversity,
               count(*) < 5 AS k5_risky,
               count(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) < 3
                   AS l3_risky
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
    doc="K-ANONYMITY / L-DIVERSITY privacy audit (Sweeney; Machanavajjhala "
    "et al.) over the quasi-identifier pair (nation, market segment): a "
    "release is k-anonymous iff every QI group holds >= k individuals, "
    "and l-diverse iff each group spans >= l distinct values of the "
    "sensitive attribute (account-balance band, floor(acctbal/2000) — "
    "one IEEE division + floor, identical across engines).  Groups "
    "below k=5 re-identify members by linkage; groups below l=3 leak "
    "the sensitive value even when k holds (the homogeneity attack).  "
    "Everything is exact integers over one grouped aggregate.  Scale: "
    "one groupBy on the QI key — the group count is the QI domain "
    "(bounded: |nations| x |segments|), distinct-band state is a "
    "per-group set of at most a few dozen bands; at 100 TB the same "
    "plan runs with approx_count_distinct if the sensitive domain "
    "ever grows unbounded (the qd01 swap convention).",
)
def qd53_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Thin binding over api.k_anonymity_report (single home for the
    # privacy-flag semantics); only the wire column names are local.
    from .. import api

    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 2000.0).cast("bigint")
    rep = api.k_anonymity_report(
        c, ["c_nationkey", "c_mktsegment"], band, k=5, l=3
    )
    return rep.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        "l_diversity",
        F.col("k_risky").alias("k5_risky"),
        F.col("l_risky").alias("l3_risky"),
    )


@register(
    "qd54_join_fanout_preflight",
    oracle="""
        WITH per_key AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_partkey
        ),
        tot AS (
            SELECT sum(n_rows * (n_rows - 1) / 2) AS total_pairs
            FROM per_key
        )
        SELECT p.l_partkey,
               p.n_rows,
               CAST(p.n_rows * (p.n_rows - 1) / 2 AS BIGINT) AS pairs,
               round(p.n_rows * (p.n_rows - 1) / 2.0 / t.total_pairs, 6)
                   AS pct_of_total_pairs
        FROM per_key p CROSS JOIN tot t
        WHERE p.n_rows > 1
        ORDER BY p.n_rows DESC, p.l_partkey ASC
        LIMIT 15
    """,
    doc="JOIN FAN-OUT PREFLIGHT — the cardinality-explosion estimator a "
    "planner (or an engineer) runs BEFORE submitting a key-equality "
    "self-join (candidate-pair generation, dedup blocking, sessionized "
    "co-visits): per join key k the output contributes n_k*(n_k-1)/2 "
    "pairs, so the total and its top contributors are computable from "
    "ONE per-key count — thousands of times cheaper than running the "
    "join.  Emits the 15 heaviest keys with their pair mass and share "
    "of the total; one hot key owning double-digit share is the "
    "signature of a skew blow-up that needs salting (q48) or an AQE "
    "skew split (q48c) before the real join runs.  Exact integers; "
    "the share is one division rounded at 6dp.  Scale: one map-side "
    "combine groupBy + a broadcast 1-row total + TakeOrdered(15) — "
    "never materializes a single joined pair.",
)
def qd54_join_fanout_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_rows")
    )
    pairs = (F.col("n_rows") * (F.col("n_rows") - 1) / 2).cast("bigint")
    tot = per_key.agg(
        F.sum(F.col("n_rows") * (F.col("n_rows") - 1) / 2).alias(
            "total_pairs"
        )
    )
    return (
        per_key.filter(F.col("n_rows") > 1)
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "n_rows",
            pairs.alias("pairs"),
            F.round(
                F.col("n_rows")
                * (F.col("n_rows") - 1)
                / 2.0
                / F.col("total_pairs"),
                6,
            ).alias("pct_of_total_pairs"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("l_partkey").asc())
        .limit(15)
    )


@register(
    "qd55_zonemap_skipping_audit",
    oracle="""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(datediff('day', DATE '1995-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT)
                       AS day
            FROM orders
        ),
        laid AS (
            SELECT 'insertion' AS layout, o_orderkey // 500 AS file_id, day
            FROM base
            UNION ALL
            SELECT 'clustered' AS layout, day // 80 AS file_id, day
            FROM base
        ),
        files AS (
            SELECT layout, file_id,
                   min(day) AS min_day, max(day) AS max_day,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN day BETWEEN 365 AND 729
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_matching
            FROM laid GROUP BY layout, file_id
        )
        SELECT layout,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN max_day < 365 OR min_day > 729
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
               CAST(sum(CASE WHEN max_day < 365 OR min_day > 729
                             THEN 0 ELSE n_rows END) AS BIGINT)
                   AS rows_scanned,
               CAST(sum(n_matching) AS BIGINT) AS rows_matching,
               round(sum(CASE WHEN max_day < 365 OR min_day > 729
                              THEN n_rows ELSE 0 END) * 1.0
                     / sum(n_rows), 6) AS row_skip_fraction
        FROM files GROUP BY layout
    """,
    doc="ZONE-MAP DATA-SKIPPING AUDIT — the measurement behind every "
    "file-layout decision (Iceberg/Delta min-max manifests, parquet "
    "row-group stats, qc12's Z-order): simulate the SAME orders table "
    "under two physical layouts — insertion order (files cut by "
    "arrival key, dates scattered) vs date-clustered (files cut by "
    "date range) — build each file's [min_day, max_day] zone map, and "
    "evaluate a one-year predicate against the maps.  A file is "
    "skippable iff its interval misses the predicate entirely; the "
    "audit reports files skipped, rows actually scanned vs rows "
    "matching, and the row-skip fraction — the number that says "
    "'clustering turns a full scan into a 1/6th scan', which at "
    "100 TB is the difference between minutes and hours.  Everything "
    "is exact integer day arithmetic; the fraction is one division "
    "at 6dp.  Scale: one map-side layout tag + one (layout, file) "
    "rollup + one per-layout rollup — zone maps are metadata-sized "
    "(2 rows per simulated file), never a data shuffle.",
)
def qd55_zonemap_skipping_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("day"),
    )
    laid = base.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("insertion").alias("layout"),
                    (F.col("o_orderkey") / 500)
                    .cast("bigint")
                    .alias("file_id"),
                ),
                F.struct(
                    F.lit("clustered").alias("layout"),
                    (F.col("day") / 80).cast("bigint").alias("file_id"),
                ),
            )
        ).alias("l"),
        "day",
    ).select("l.layout", "l.file_id", "day")
    hit = F.col("day").between(365, 729)
    files = laid.groupBy("layout", "file_id").agg(
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_matching"),
    )
    skipped = (F.col("max_day") < 365) | (F.col("min_day") > 729)
    return files.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum(F.when(skipped, 1).otherwise(0))
        .cast("bigint")
        .alias("n_skipped"),
        F.sum(F.when(skipped, 0).otherwise(F.col("n_rows")))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum("n_matching").cast("bigint").alias("rows_matching"),
        F.round(
            F.sum(F.when(skipped, F.col("n_rows")).otherwise(0))
            * 1.0
            / F.sum("n_rows"),
            6,
        ).alias("row_skip_fraction"),
    )


@register(
    "qd56_generalization_ladder",
    oracle="""
        WITH widths AS (
            SELECT unnest([500, 1000, 2000, 4000, 8000]) AS width
        ),
        grouped AS (
            SELECT w.width,
                   c.c_nationkey,
                   CAST(floor(c.c_acctbal / w.width) AS BIGINT) AS band,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer c CROSS JOIN widths w
            GROUP BY w.width, c.c_nationkey,
                     CAST(floor(c.c_acctbal / w.width) AS BIGINT)
        )
        SELECT width,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(min(n) AS BIGINT) AS min_group_size,
               CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_risky_groups,
               CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                   AS n_exposed_individuals,
               min(n) >= 5 AS k5_anonymous
        FROM grouped GROUP BY width
    """,
    doc="K-ANONYMITY GENERALIZATION LADDER (the Incognito/Mondrian "
    "search, evaluated relationally): qd53 DETECTS risky "
    "quasi-identifier groups; this finds the MINIMAL coarsening that "
    "removes them — the balance band is widened through a 5-step "
    "ladder (500 -> 8000) against the nation QI, and each rung "
    "reports group count, smallest group, risky-group count, and "
    "exposed individuals.  The first rung with min_group_size >= 5 "
    "is the release policy: publish bands no finer than that width.  "
    "Monotonicity (risk never increases up the ladder) is the "
    "lattice property the Incognito pruning relies on — visible in "
    "the output and asserted in tests.  One IEEE division + floor "
    "per (row, rung), exact integers after.  Scale: the rung fan-out "
    "is a 5x map-side explode feeding ONE grouped aggregate whose "
    "state is |rungs| x |QI domain| — aggregate-space, no data "
    "shuffle beyond the group keys.",
)
def qd56_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    laid = c.select(
        "c_nationkey",
        "c_acctbal",
        F.explode(
            F.array(*[F.lit(w) for w in (500, 1000, 2000, 4000, 8000)])
        ).alias("width"),
    )
    grouped = laid.groupBy(
        "width",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.col("width"))
        .cast("bigint")
        .alias("band"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    return grouped.groupBy("width").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.min("n").cast("bigint").alias("min_group_size"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_risky_groups"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_exposed_individuals"),
        (F.min("n") >= 5).alias("k5_anonymous"),
    )


@register(
    "qd57_ab_power_sizing",
    oracle="""
        WITH tot AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS u
            FROM events
        ),
        per_type AS (
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type
        )
        SELECT p.event_type,
               p.n_users,
               round(CAST(p.n_users AS DOUBLE) / t.u, 6) AS baseline_rate,
               CAST(ceil(
                   ((1.959964 + 0.841621) * (1.959964 + 0.841621))
                   * (2.0 * (CAST(p.n_users AS DOUBLE) / t.u)
                          * (1.0 - CAST(p.n_users AS DOUBLE) / t.u))
                   / ((0.1 * (CAST(p.n_users AS DOUBLE) / t.u))
                      * (0.1 * (CAST(p.n_users AS DOUBLE) / t.u)))
               ) AS BIGINT) AS n_per_arm,
               CAST(ceil(
                   ((1.959964 + 0.841621) * (1.959964 + 0.841621))
                   * (2.0 * (CAST(p.n_users AS DOUBLE) / t.u)
                          * (1.0 - CAST(p.n_users AS DOUBLE) / t.u))
                   / ((0.1 * (CAST(p.n_users AS DOUBLE) / t.u))
                      * (0.1 * (CAST(p.n_users AS DOUBLE) / t.u)))
               ) AS BIGINT) * 2 <= t.u AS feasible
        FROM per_type p CROSS JOIN tot t
    """,
    doc="A/B TEST POWER SIZING — the pre-registration step qp14's "
    "analysis pipeline assumes has already happened: per event type, "
    "the baseline adoption rate p (distinct adopters / distinct "
    "users) sets the required per-arm sample size for detecting a "
    "10% RELATIVE lift at alpha=0.05 two-sided, power=0.80 — "
    "n = (z_a + z_b)^2 * 2p(1-p) / (0.1p)^2, the standard "
    "two-proportion formula with the z constants as literals "
    "(1.959964, 0.841621 — never a quantile function, whose "
    "implementations differ across engines).  The feasible flag "
    "answers the question that kills most experiment plans: does "
    "the population even contain 2n users?  Every double op is the "
    "IDENTICAL expression tree in both engines, then one ceil to "
    "exact integers.  Scale: two distinct-count aggregates (exact "
    "here, approx_count_distinct at 100 TB per the qd01 swap) and a "
    "broadcast scalar — aggregate space end to end.",
)
def qd57_ab_power_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tot = e.agg(
        F.countDistinct("user_id").cast("bigint").alias("u")
    )
    per_type = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    p = F.col("n_users").cast("double") / F.col("u")
    z2 = (1.959964 + 0.841621) * (1.959964 + 0.841621)
    n_per_arm = F.ceil(
        F.lit(z2) * (2.0 * p * (1.0 - p)) / ((0.1 * p) * (0.1 * p))
    ).cast("bigint")
    return per_type.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_users",
        F.round(p, 6).alias("baseline_rate"),
        n_per_arm.alias("n_per_arm"),
        (n_per_arm * 2 <= F.col("u")).alias("feasible"),
    )


@register(
    "qd58_seasonal_anomaly_screen",
    oracle="""
        WITH daily AS (
            SELECT CAST(datediff('day', DATE '2024-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        dow_mean AS (
            SELECT day % 7 AS dow,
                   CAST(sum(n) AS BIGINT) AS tot,
                   CAST(count(*) AS BIGINT) AS k
            FROM daily GROUP BY day % 7
        ),
        resid AS (
            SELECT d.day, d.n, d.day % 7 AS dow,
                   d.n - CAST(m.tot AS DOUBLE) / m.k AS r
            FROM daily d JOIN dow_mean m ON d.day % 7 = m.dow
        ),
        sigma AS (
            SELECT stddev_samp(r) AS s FROM resid
        )
        SELECT r.day, r.n, r.dow,
               round(r.r, 6) AS residual,
               round(r.r / s.s, 6) AS z,
               abs(round(r.r / s.s, 6)) > 2.0 AS is_anomaly
        FROM resid r CROSS JOIN sigma s
    """,
    doc="SEASONALLY-ADJUSTED volume anomaly screen — the pipeline-"
    "health monitor that does NOT page on every weekend dip: daily "
    "event counts are residualized against their day-of-week mean "
    "(epoch-day % 7, the qd51 calendar-dialect sidestep), "
    "standardized by the residual stddev, and |z| > 2 flags the days "
    "that are anomalous FOR THEIR WEEKDAY — a quiet Saturday stays "
    "quiet, a quiet Tuesday pages.  The dow means are exact-integer "
    "ratios; the z boundary tests the ROUNDED z in both engines so "
    "the flag can never straddle a ULP.  Scale: one daily rollup "
    "(the only data-sized stage), a 7-row profile join, a broadcast "
    "1-row sigma — the anomaly table is calendar-sized.",
)
def qd58_seasonal_anomaly_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    dow_mean = daily.groupBy((F.col("day") % 7).alias("dow")).agg(
        F.sum("n").cast("bigint").alias("tot"),
        F.count("*").cast("bigint").alias("k"),
    )
    resid = daily.join(
        F.broadcast(dow_mean), daily["day"] % 7 == dow_mean["dow"]
    ).select(
        "day",
        "n",
        "dow",
        (F.col("n") - F.col("tot").cast("double") / F.col("k")).alias("r"),
    )
    sigma = resid.agg(F.stddev_samp("r").alias("s"))
    z = F.round(F.col("r") / F.col("s"), 6)
    return resid.crossJoin(F.broadcast(sigma)).select(
        "day",
        "n",
        "dow",
        F.round("r", 6).alias("residual"),
        z.alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@register(
    "qd61_key_discovery",
    oracle="""
        WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
        cands AS (
            SELECT 'o_orderkey' AS candidate,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
            FROM orders
            UNION ALL
            SELECT 'o_custkey',
                   CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
            UNION ALL
            SELECT 'o_orderdate',
                   CAST(count(DISTINCT o_orderdate) AS BIGINT) FROM orders
            UNION ALL
            SELECT 'o_totalprice_cents',
                   CAST(count(DISTINCT CAST(round(o_totalprice * 100)
                                            AS BIGINT)) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'custkey_x_orderdate',
                   CAST(count(DISTINCT (CAST(o_custkey AS VARCHAR) || ':'
                        || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)))
                        AS BIGINT)
            FROM orders
        )
        SELECT c.candidate, t.n, c.n_distinct,
               c.n_distinct = t.n AS is_key,
               round(CAST(c.n_distinct AS DOUBLE) / t.n, 6)
                   AS uniqueness_ratio
        FROM cands c CROSS JOIN tot t
    """,
    doc="CANDIDATE-KEY DISCOVERY — the profiling step schema inference "
    "and CDC tooling both depend on: for each candidate column (and "
    "one composite), its distinct count vs the row count decides "
    "whether it can serve as a primary key (is_key) and how close it "
    "comes (uniqueness_ratio — a 0.999 ratio is the classic "
    "almost-key that breaks a MERGE at 3 a.m.).  The composite "
    "candidate is a delimiter-joined string (the portable composite-"
    "distinct form; a ':' can't appear in either part).  Exact "
    "distinct counts, one division at the wire.  Scale: all "
    "candidates share ONE scan via grouped distinct aggregates; at "
    "100 TB the exact distincts swap to approx_count_distinct with "
    "an exactness pass only for ratio-=-1 survivors (the qd01 "
    "two-phase convention).",
)
def qd61_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    composite = F.concat(
        F.col("o_custkey").cast("string"),
        F.lit(":"),
        F.col("o_orderdate").cast("date").cast("string"),
    )
    # ONE scan: every candidate's distinct count plus the row count in
    # a single aggregate, unpivoted with stack() — the plan the doc
    # promises (6 scans of a 100 TB fact vs 1 is the whole point).
    prof = o.agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("o_orderkey").cast("bigint").alias("d1"),
        F.countDistinct("o_custkey").cast("bigint").alias("d2"),
        F.countDistinct("o_orderdate").cast("bigint").alias("d3"),
        F.countDistinct(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("d4"),
        F.countDistinct(composite).cast("bigint").alias("d5"),
    )
    cands = prof.selectExpr(
        "n",
        "stack(5, 'o_orderkey', d1, 'o_custkey', d2, 'o_orderdate', d3,"
        " 'o_totalprice_cents', d4, 'custkey_x_orderdate', d5)"
        " AS (candidate, n_distinct)",
    )
    return cands.select(
        "candidate",
        "n",
        "n_distinct",
        (F.col("n_distinct") == F.col("n")).alias("is_key"),
        F.round(
            F.col("n_distinct").cast("double") / F.col("n"), 6
        ).alias("uniqueness_ratio"),
    )

"""End-to-end LLM training-data pipeline as ONE declarative plan.

The composition showcase: the full preparation flow a training-data
pipeline runs — exact dedup → quality gate → language filter → token
budgeting → embedding join — expressed as a single DataFrame chain, so
Catalyst sees (and optimizes) the whole thing: one plan, filters pushed
to the scan, one window, one broadcast-able join, partial aggs.

At 100 TB this single-plan property is the difference between five
materialized intermediate datasets (5× write+read of the corpus) and one
streaming pass per stage boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "qp1_training_data_pipeline",
    oracle="""
        WITH deduped AS (
            SELECT * FROM (
                SELECT *,
                       row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1
        ), gated AS (
            SELECT
                doc_id, lang, source, text, n_chars,
                len(string_split(text, ' ')) AS n_tokens
            FROM deduped
            WHERE n_chars BETWEEN 100 AND 500
              AND lang IN ('en', 'de', 'fr')
              AND len(string_split(text, ' ')) >= 15
        ), budgeted AS (
            SELECT *,
                   CAST(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM gated
        )
        SELECT
            b.doc_id,
            b.lang,
            b.source,
            b.n_tokens,
            b.cum_tokens,
            e.vec_id IS NOT NULL AS has_embedding,
            coalesce(e.label, -1) AS label
        FROM budgeted b
        LEFT JOIN embeddings e ON b.doc_id = e.vec_id
        WHERE b.cum_tokens <= 20000
    """,
    doc="The flagship LLM-data composition: dedup (keep-first) → quality "
    "gate (length/token thresholds) → language allowlist → per-language "
    "token budget (running-sum cutoff at 20k tokens) → multimodal "
    "embedding join.  One logical plan end-to-end; every stage is an "
    "operator family verified standalone elsewhere (q71, q77, q76, q43, "
    "q89).",
)
def qp1_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. exact dedup, deterministic survivor
    w_dedup = W.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    deduped = docs.withColumn("rn", F.row_number().over(w_dedup)).filter(F.col("rn") == 1)

    # 2+3. quality gate + language allowlist (pushable predicates)
    n_tokens = F.size(F.split("text", " ")).cast("long")
    gated = (
        deduped.withColumn("n_tokens", n_tokens)
        .filter(
            F.col("n_chars").between(100, 500)
            & F.col("lang").isin("en", "de", "fr")
            & (F.col("n_tokens") >= 15)
        )
    )

    # 4. per-language token budget: running sum in doc_id order, cut at 20k
    w_budget = (
        W.partitionBy("lang")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    budgeted = gated.withColumn("cum_tokens", F.sum("n_tokens").over(w_budget)).filter(
        F.col("cum_tokens") <= 20000
    )

    # 5. multimodal join (broadcast-able dim side at this cardinality)
    return budgeted.join(emb, budgeted.doc_id == emb.vec_id, "left").select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        "cum_tokens",
        F.col("vec_id").isNotNull().alias("has_embedding"),
        F.coalesce("label", F.lit(-1)).cast("int").alias("label"),
    )


@register(
    "qp2_rag_indexing_pipeline",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        ),
        sized AS (
            SELECT doc_id, lang, w, len(w) AS n,
                   CASE WHEN len(w) <= 24 THEN 1
                        ELSE ((len(w) - 24) + 16 - 1) // 16 + 1
                   END AS n_chunks
            FROM toks WHERE len(w) >= 1
        ),
        chunks AS (
            SELECT
                doc_id, lang,
                i AS chunk_idx,
                least(1 + i * 16 + 24 - 1, n) - (1 + i * 16) + 1 AS n_tokens,
                md5(array_to_string(
                    w[1 + i * 16 : least(1 + i * 16 + 24 - 1, n)], ' '))
                    AS digest
            FROM sized CROSS JOIN UNNEST(generate_series(0, n_chunks - 1)) AS t(i)
        ),
        deduped AS (
            SELECT * FROM (
                SELECT *,
                       row_number() OVER (PARTITION BY digest
                                          ORDER BY doc_id, chunk_idx) AS rn
                FROM chunks
            ) WHERE rn = 1
        ),
        routed AS (
            SELECT *,
                   (ascii(substr(digest, 1, 1)) * 256
                    + ascii(substr(digest, 2, 1))) % 16 AS cell
            FROM deduped
        )
        SELECT
            r.cell,
            count(*) AS n_chunks,
            count(DISTINCT r.doc_id) AS n_docs,
            round(sum(r.n_tokens) * 1.0 / count(*), 4) AS avg_tokens,
            count(e.vec_id) AS n_embedded
        FROM routed r
        LEFT JOIN embeddings e ON r.doc_id = e.vec_id
        GROUP BY r.cell
    """,
    doc="End-to-end RAG corpus indexing: overlapping chunker (q83b "
    "geometry) → chunk fingerprint (md5) → cross-document chunk dedup "
    "(keep-first survivor; overlap-heavy corpora dedup hardest at the "
    "chunk level) → embedding availability join → deterministic "
    "digest-bucket routing into 16 index cells → per-cell layout "
    "summary.  One logical plan; at 100 TB the routed relation is "
    "WRITTEN partitioned by cell (the IVF layout q92 queries), the "
    "digest bucket becomes the KMeans cell id, and every stage before "
    "the final rollup is map-side except the dedup window and one "
    "broadcast-able join.",
)
def qp2_rag_indexing_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")

    sized = docs.select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("w"),
        F.size(F.split("text", " ")).alias("n"),
    ).where(F.col("n") >= 1)
    sized = sized.withColumn(
        "n_chunks",
        F.when(F.col("n") <= 24, F.lit(1)).otherwise(
            F.expr("((n - 24) + 16 - 1) div 16 + 1").cast("int")
        ),
    )
    start = F.lit(1) + F.col("chunk_idx") * 16
    end = F.least(start + 24 - 1, F.col("n"))
    chunks = sized.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        "w",
        "n",
    ).select(
        "doc_id",
        "lang",
        "chunk_idx",
        (end - start + 1).alias("n_tokens"),
        F.md5(F.array_join(F.slice(F.col("w"), start, end - start + 1), " ")).alias(
            "digest"
        ),
    )
    w_dedup = W.partitionBy("digest").orderBy(
        F.col("doc_id").asc(), F.col("chunk_idx").asc()
    )
    deduped = chunks.withColumn("rn", F.row_number().over(w_dedup)).filter(
        F.col("rn") == 1
    )
    cell = (
        F.ascii(F.substring("digest", 1, 1)) * 256
        + F.ascii(F.substring("digest", 2, 1))
    ) % 16
    routed = deduped.withColumn("cell", cell)
    return (
        routed.join(F.broadcast(emb), routed.doc_id == emb.vec_id, "left")
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.round(F.sum("n_tokens") / F.count("*"), 4).alias("avg_tokens"),
            F.count("vec_id").alias("n_embedded"),
        )
    )


@register(
    "qp3_cached_stage_reuse",
    oracle="""
        WITH base AS (
            SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        ),
        by_flag AS (
            SELECT 'by_flag' AS grp, l_returnflag AS key,
                   count(*) AS n, round(sum(l_quantity), 2) AS metric
            FROM base GROUP BY l_returnflag
        ),
        by_status AS (
            SELECT 'by_status' AS grp, l_linestatus AS key,
                   count(*) AS n, round(avg(l_extendedprice), 2) AS metric
            FROM base GROUP BY l_linestatus
        )
        SELECT * FROM by_flag UNION ALL SELECT * FROM by_status
    """,
    doc="Materialized-stage reuse: one filtered projection of the fact "
    "table is .cache()'d and TWO downstream aggregations consume it — "
    "the second reads InMemoryTableScan instead of re-scanning parquet "
    "(plan-pinned in tests/test_plans.py).  The intra-pipeline "
    "dedup-of-work primitive: at 100 TB a multi-output curation "
    "pipeline (stats + gate + sample from one cleaned corpus) persists "
    "the cleaned stage once — with MEMORY_AND_DISK it degrades "
    "gracefully instead of recomputing the whole lineage per output.  "
    "Cache columns are pruned to exactly what the consumers need "
    "before caching, so the cached bytes are the projection, not the "
    "table.",
)
def qp3_cached_stage_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.filter(F.col("l_shipdate") >= "1996-01-01")
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .cache()
    )
    by_flag = base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("metric")
    ).select(
        F.lit("by_flag").alias("grp"),
        F.col("l_returnflag").alias("key"),
        "n",
        "metric",
    )
    by_status = base.groupBy("l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.avg("l_extendedprice"), 2).alias("metric")
    ).select(
        F.lit("by_status").alias("grp"),
        F.col("l_linestatus").alias("key"),
        "n",
        "metric",
    )
    return by_flag.unionByName(by_status)


@register(
    "qp4_audit_suite",
    oracle="""
        WITH orphans AS (
            SELECT count(*) FILTER (WHERE NOT EXISTS (
                       SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
                   )) AS v
            FROM lineitem l
        ),
        temporal AS (
            SELECT count(*) FILTER (WHERE l.l_shipdate < o.o_orderdate) AS v
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        dup_keys AS (
            SELECT count(*) - count(DISTINCT o_orderkey) AS v FROM orders
        ),
        null_prices AS (
            SELECT count(*) FILTER (WHERE o_totalprice IS NULL) AS v FROM orders
        )
        SELECT 'fk_orphans' AS check_name,
               CAST(v AS BIGINT) AS value, 0 AS threshold,
               CAST(v > 0 AS INT) AS breach
        FROM orphans
        UNION ALL
        SELECT 'ship_before_order', CAST(v AS BIGINT), 0, CAST(v > 0 AS INT)
        FROM temporal
        UNION ALL
        SELECT 'duplicate_order_keys', CAST(v AS BIGINT), 0, CAST(v > 0 AS INT)
        FROM dup_keys
        UNION ALL
        SELECT 'null_total_prices', CAST(v AS BIGINT), 0, CAST(v > 0 AS INT)
        FROM null_prices
    """,
    doc="One-shot data-quality audit SUITE (the qd-family capstone): "
    "four canary indicators — FK orphans (lineitem→orders anti-join "
    "count), temporal rule violations (ship before order), duplicate "
    "primary keys, null prices — emitted as a uniform (check, value, "
    "threshold, breach) scorecard, the table an ingest gate alerts "
    "on.  Each indicator is count-only (orphans/violations are never "
    "materialized) and the whole card costs two scans of orders and "
    "two of lineitem; at 100 TB the indicators run as conditional "
    "aggregates over joins that AQE plans like the qa-family.  "
    "Thresholds are literal zeros here; production parameterizes them "
    "per check (q18b's named-arg binding is the surface for that).",
)
def qp4_audit_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )

    def card(name: str, value_col, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(name).alias("check_name"),
            value_col.cast("long").alias("value"),
            F.lit(0).alias("threshold"),
            (value_col > 0).cast("int").alias("breach"),
        )

    orphans = card(
        "fk_orphans",
        F.count("*"),
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti"),
    )
    temporal = card(
        "ship_before_order",
        F.sum((F.col("l_shipdate") < F.col("o_orderdate")).cast("long")),
        li.join(o, li.l_orderkey == o.o_orderkey),
    )
    dup_keys = card(
        "duplicate_order_keys",
        F.count("*") - F.count_distinct("o_orderkey"),
        o,
    )
    null_prices = card(
        "null_total_prices",
        F.count(F.when(F.col("o_totalprice").isNull(), 1)),
        o,
    )
    return (
        orphans.unionByName(temporal)
        .unionByName(dup_keys)
        .unionByName(null_prices)
    )

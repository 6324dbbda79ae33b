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

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


def _qp5_oracle() -> str:
    """Render qp5's funnel oracle: q71's keep-first CTE + q72c's portable
    min-hash family (generated, 16 hashes) + q75b's survivor rule, each
    restricted to the previous stage's survivors."""
    mins = ",\n                   ".join(
        f"min(substr(md5(s || '#{i}'), 1, 16)) AS h{i}" for i in range(16)
    )
    bands = "\n            UNION ALL\n            ".join(
        f"SELECT doc_id, {b} AS band, md5(h{b*4} || '|' || h{b*4+1} || '|' "
        f"|| h{b*4+2} || '|' || h{b*4+3}) AS band_sig FROM sig"
        for b in range(4)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(16)
    )
    return f"""
        WITH s1 AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       row_number() OVER (
                           PARTITION BY md5(text) ORDER BY doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn = 1
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(w[i:i+2], '_') AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM s1) t
            CROSS JOIN UNNEST(generate_series(1, len(w) - 2)) AS u(i)
        ),
        sig AS (
            SELECT doc_id,
                   {mins}
            FROM sh GROUP BY doc_id
        ),
        banded AS (
            {bands}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
        ),
        lex_dropped AS (
            SELECT DISTINCT c.db AS doc_id
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db
            WHERE ({agree}) / 16.0 >= 0.5
        ),
        s2 AS (
            SELECT * FROM s1
            WHERE doc_id NOT IN (SELECT doc_id FROM lex_dropped)
        ),
        s2e AS (
            SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v
            FROM embeddings e JOIN s2 ON s2.doc_id = e.vec_id
        ),
        sem_dropped AS (
            SELECT DISTINCT b.vec_id AS doc_id
            FROM s2e a JOIN s2e b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) >= 0.35
        ),
        s3 AS (
            SELECT * FROM s2
            WHERE doc_id NOT IN (SELECT doc_id FROM sem_dropped)
        )
        SELECT 0 AS stage_idx, 'all' AS stage,
               CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs
        UNION ALL SELECT 1, 'exact',
               CAST((SELECT count(*) FROM s1) AS BIGINT)
        UNION ALL SELECT 2, 'lexical',
               CAST((SELECT count(*) FROM s2) AS BIGINT)
        UNION ALL SELECT 3, 'semantic',
               CAST((SELECT count(*) FROM s3) AS BIGINT)
    """


@register(
    "qp5_dedup_funnel",
    oracle=_qp5_oracle(),
    doc="The layered dedup FUNNEL a production corpus actually runs, "
    "end-to-end and hash-verified at every stage boundary: exact "
    "(md5 keep-first, q70/q71) → lexical near-dup (q72c's portable "
    "banded MinHash over 3-gram shingles, est-Jaccard >= 0.5, "
    "higher-id member of each pair dropped) → semantic (q75b's "
    "SemDeDup rule over embedding cosine within blocks), each stage "
    "restricted to the previous stage's survivors.  Output = docs "
    "surviving each stage — the funnel report a data lead reads.  "
    "Ordering matters and is the cheap-to-expensive schedule: exact "
    "dedup costs one digest shuffle and typically removes the bulk; "
    "LSH banding only signatures the survivors; the embedding join "
    "touches only what lexical dedup kept.  At 100 TB each arrow is "
    "the same plan shape as its standalone query — digests/signatures "
    "shuffle, text bodies and vectors stay columnar at rest.",
)
def qp5_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..api import shingles
    from ..functions.vector import dot, to_double_array
    from ..sources import spread

    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), 32
    )
    n_all = d.select(F.count("*").alias("n"))
    # Stage 1: exact keep-first.
    w_exact = W.partitionBy(F.md5("text")).orderBy("doc_id")
    s1 = (
        d.withColumn("rn", F.row_number().over(w_exact))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # Stage 2: portable banded MinHash over survivors (q72c's family —
    # distinct-shingle vocabulary memoization + broadcast-back).
    sh = s1.select("doc_id", F.explode(shingles("text", 3)).alias("s"))
    vocab = sh.select("s").distinct().select(
        "s",
        *[
            F.substring(
                F.md5(F.concat(F.col("s"), F.lit(f"#{i}"))), 1, 16
            ).alias(f"v{i}")
            for i in range(16)
        ],
    )
    sig = (
        sh.join(F.broadcast(vocab), "s")
        .groupBy("doc_id")
        .agg(*[F.min(f"v{i}").alias(f"h{i}") for i in range(16)])
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws("|", *[F.col(f"h{b * 4 + r}") for r in range(4)])
            ).alias("band_sig"),
        )
        for b in range(4)
    ]
    banded = sig.select(
        "doc_id",
        *[F.col(f"h{i}") for i in range(16)],
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select(
        "doc_id",
        *[F.col(f"h{i}") for i in range(16)],
        F.col("bb.band").alias("band"),
        F.col("bb.band_sig").alias("band_sig"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    agree = sum(
        (F.col(f"a.h{i}") == F.col(f"b.h{i}")).cast("int") for i in range(16)
    )
    # Emit-once first-agreeing-band predicate REJECTED here (round 11,
    # measured): flat at sf0.1 and the same shape regressed 26% at 10x
    # content scale on q72c — the predicate re-compares all 16
    # h-columns per fanned row while the surviving .distinct() (which
    # also dedups the SAME doc_b dropped via different partners) is
    # already exchange-free on the doc_id-partitioned banded side.
    lex_dropped = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(agree / 16.0 >= 0.5)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
        .cache()  # narrow id set, read by BOTH stage-2 and the funnel flags
    )
    s2 = s1.join(lex_dropped, "doc_id", "left_anti")
    # Stage 3: SemDeDup over the lexical survivors' embeddings.
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    s2e = e.join(s2.select(F.col("doc_id").alias("vec_id")), "vec_id")
    ea = s2e.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"),
        F.col("v").alias("va"),
    )
    eb = s2e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"),
        F.col("v").alias("vb"),
    )
    sem_dropped = (
        ea.join(
            eb,
            (F.col("label_a") == F.col("label_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(dot(F.col("va"), F.col("vb")) >= 0.35)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    # Single-pass funnel accounting: a union of four per-stage aggregates
    # would recompute every upstream stage per branch (the signature
    # pipeline twice, the window thrice — measured 14.2 s vs 8 s at
    # sf0.1); instead, flag every doc with its drop stage via two
    # left joins and take all four counts from ONE scan of the flags.
    flags = (
        d.select("doc_id")
        .join(s1.select("doc_id", F.lit(1).alias("s1")), "doc_id", "left")
        .join(lex_dropped.select("doc_id", F.lit(1).alias("ld")), "doc_id", "left")
        .join(sem_dropped.select("doc_id", F.lit(1).alias("sd")), "doc_id", "left")
    )
    survives_s1 = F.col("s1").isNotNull()
    survives_s2 = survives_s1 & F.col("ld").isNull()
    survives_s3 = survives_s2 & F.col("sd").isNull()
    counts = flags.agg(
        F.count("*").cast("long").alias("n0"),
        F.sum(survives_s1.cast("long")).alias("n1"),
        F.sum(survives_s2.cast("long")).alias("n2"),
        F.sum(survives_s3.cast("long")).alias("n3"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col(f"n{i}").alias("n_docs"),
            )
            for i, name in enumerate(("all", "exact", "lexical", "semantic"))
        ]
    )
    return counts.select(F.explode(stages).alias("s")).select(
        "s.stage_idx", "s.stage", "s.n_docs"
    )


def _qp6_oracle() -> str:
    return """
        WITH base AS (SELECT * FROM documents WHERE n_chars > 0),
        s1 AS (
            SELECT * FROM base
            WHERE len(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
                  / n_chars >= 0.815
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(w[i:i+2], '_') AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM s1) t
            CROSS JOIN UNNEST(generate_series(1, len(w) - 2)) AS u(i)
        ),
        firsts AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY s),
        nov AS (
            SELECT sh.doc_id,
                   sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) * 1.0
                       / count(*) AS novelty
            FROM sh JOIN firsts f USING (s) GROUP BY sh.doc_id
        ),
        s2 AS (
            SELECT s1.* FROM s1 JOIN nov USING (doc_id)
            WHERE nov.novelty >= 0.4
        ),
        bgrams AS (
            SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS g
            FROM (SELECT string_split(text, ' ') AS w
                  FROM base WHERE source = 'src0') t
            CROSS JOIN UNNEST(generate_series(1, len(w) - 2)) AS u(i)
        ),
        contaminated AS (
            SELECT DISTINCT doc_id
            FROM (
                SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
                FROM (SELECT doc_id, string_split(text, ' ') AS w
                      FROM s2 WHERE source <> 'src0') t
                CROSS JOIN UNNEST(generate_series(1, len(w) - 2)) AS u(i)
            ) c JOIN bgrams b USING (g)
        ),
        s3 AS (
            SELECT * FROM s2
            WHERE source <> 'src0'
              AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        ),
        packed AS (
            SELECT lang,
                   floor(COALESCE(sum(len(string_split(text, ' '))) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 512) AS seq_id
            FROM s3
        ),
        seqs AS (
            SELECT count(*) AS n FROM (
                SELECT DISTINCT lang, seq_id FROM packed
            )
        )
        SELECT 'p0_ingested' AS stage,
               CAST((SELECT count(*) FROM base) AS BIGINT) AS n
        UNION ALL
        SELECT 'p1_script_gate', CAST((SELECT count(*) FROM s1) AS BIGINT)
        UNION ALL
        SELECT 'p2_novelty_gate', CAST((SELECT count(*) FROM s2) AS BIGINT)
        UNION ALL
        SELECT 'p3_decontaminated', CAST((SELECT count(*) FROM s3) AS BIGINT)
        UNION ALL
        SELECT 'p4_train_sequences', CAST((SELECT n FROM seqs) AS BIGINT)
    """


@register(
    "qp6_quality_gate_pipeline",
    oracle=_qp6_oracle(),
    doc="The QUALITY-GATE pipeline composing the round-4 operator "
    "family end-to-end, hash-verified at every stage boundary: "
    "character-class script gate (q80c's arithmetic, lowercase ratio "
    ">= 0.815 — drops mojibake/table-like rows) → n-gram novelty "
    "gate (q83c's first-owner attribution over the survivors, "
    "novelty >= 0.4 — drops recombined boilerplate) → benchmark "
    "decontamination (qc01's broadcast gram anti-join, benchmark = "
    "source 'src0' from the RAW corpus — an eval suite does not "
    "shrink because training docs were filtered) → token-budget "
    "packing (qc04, 512-token sequences).  Output = the funnel "
    "report: docs surviving each gate + final trainable sequence "
    "count.  Ordering is cheap-to-expensive: the script gate is one "
    "map-side regexp pass and runs FIRST so the shingle/gram stages "
    "only pay for plausible text — same discipline as qp5's dedup "
    "funnel (exact before LSH before embeddings).  Every per-stage "
    "plan is its standalone query's plan; gate thresholds compare "
    "bit-identical int/int divisions, so no boundary can flake.",
)
def qp6_quality_gate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..api import shingles, word_grams

    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    lower_ratio = (
        F.length(F.regexp_replace("text", "[^a-z]", "")) * 1.0 / F.col("n_chars")
    )
    s1 = base.filter(lower_ratio >= 0.815)
    # The shingle relation feeds BOTH the first-owner agg and the join
    # back; the surviving-id sets feed every later stage AND the funnel
    # counts (which would otherwise recompute the whole upstream subtree
    # per count) — cache exactly these NARROW relations (the BASELINE.md
    # rule; measured 8.3 s → 1.3 s best-of-2 at sf0.1).
    sh = s1.select("doc_id", F.explode(shingles("text", 3)).alias("s")).cache()
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("fd"))
    nov = (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0))
                * 1.0
                / F.count("*")
            ).alias("novelty")
        )
    )
    s2_ids = (
        nov.filter(F.col("novelty") >= 0.4).select("doc_id").cache()
    )
    s2 = s1.join(s2_ids, "doc_id")
    bench = (
        base.filter(F.col("source") == "src0")
        .select(F.explode(word_grams(F.split("text", " "), 3, distinct=True)).alias("g"))
        .distinct()
    )
    corpus_grams = s2.filter(F.col("source") != "src0").select(
        "doc_id", F.explode(word_grams(F.split("text", " "), 3, distinct=True)).alias("g")
    )
    contaminated = corpus_grams.join(F.broadcast(bench), "g").select("doc_id").distinct()
    s3_ids = (
        s2.filter(F.col("source") != "src0")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id")
        .cache()
    )
    s3 = base.join(s3_ids, "doc_id")
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seqs = (
        s3.select(
            "lang",
            F.floor(
                F.coalesce(
                    F.sum(F.size(F.split("text", " "))).over(w), F.lit(0)
                )
                / 512
            ).alias("seq_id"),
        )
        .select("lang", "seq_id")
        .distinct()
        .agg(F.count("*").alias("n"))
    )

    def stage(name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count("*").cast("long").alias("n")).select(
            F.lit(name).alias("stage"), "n"
        )

    return (
        stage("p0_ingested", base)
        .unionByName(stage("p1_script_gate", s1))
        .unionByName(stage("p2_novelty_gate", s2))
        .unionByName(stage("p3_decontaminated", s3))
        .unionByName(
            seqs.select(
                F.lit("p4_train_sequences").alias("stage"),
                F.col("n").cast("long").alias("n"),
            )
        )
    )


def _qp7_oracle() -> str:
    from .multimodal import _PHASH_ORACLE_CTES, _PPM_PAD

    return f"""
        WITH {_PHASH_ORACLE_CTES},
        dropped AS (
            SELECT DISTINCT b.doc_id AS drop_id
            FROM ph a JOIN ph b
              ON a.bucket = b.bucket AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 8
        ),
        cat AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                        WHEN doc_id % 3 = 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS media_type,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        ),
        surv AS (
            SELECT c.doc_id, c.media_type
            FROM cat c
            WHERE c.doc_id NOT IN (SELECT drop_id FROM dropped)
        ),
        dims AS (
            SELECT s.doc_id, s.media_type,
                   CAST(4 + s.doc_id % 5 AS INT) AS width,
                   CAST(3 + s.doc_id % 4 AS INT) AS height,
                   rpad(d.text, {_PPM_PAD}, '.') AS padded
            FROM surv s JOIN documents d USING (doc_id)
        ),
        px AS (
            SELECT d.doc_id, d.media_type,
                   ascii(substr(d.padded, i, 1)) AS v,
                   d.width * d.height * 3 AS n_px
            FROM dims d
            CROSS JOIN UNNEST(generate_series(1, d.width * d.height * 3)) u(i)
        ),
        means AS (
            -- Exact-integer per-doc mean, scaled by 151200 = lcm of
            -- every possible pixel count 3*w*h (w in 4..8, h in 3..6):
            -- n_px divides the scale, so the integer division is exact
            -- and the cross-doc aggregate below is an associative
            -- int64 sum — deterministic under any partitioning (the
            -- mm07 half-boundary lesson).
            SELECT doc_id, media_type,
                   (CAST(sum(v) AS BIGINT) * 151200) // any_value(n_px)
                       AS scaled_mi
            FROM px GROUP BY doc_id, media_type
        )
        SELECT c.media_type,
               CAST(count(*) AS BIGINT) AS n_media,
               CAST(sum(c.n_bytes) AS BIGINT) AS total_bytes,
               CAST(count(m.doc_id) AS BIGINT) AS n_survivors,
               round(CAST(sum(m.scaled_mi) AS DOUBLE)
                     / (151200.0 * count(m.doc_id)), 4) AS avg_intensity
        FROM cat c LEFT JOIN means m USING (doc_id)
        GROUP BY c.media_type
    """


@register(
    "qp7_media_pipeline",
    oracle=_qp7_oracle(),
    doc="The MULTIMODAL e2e pipeline — catalog → perceptual near-dup "
    "prune → decode — composing the mm family the way a media corpus "
    "build runs it, hash-verified at every boundary: (1) catalog "
    "stats per media type over raw payload bytes (mm01/mm04); (2) "
    "near-duplicate pruning by mm05's aHash kernel + 16-bit-prefix "
    "bucket join, dropping the higher id of each Hamming<=8 pair "
    "(keep-first survivorship, the qp5 rule); (3) REAL PPM decode of "
    "only the survivors (mm03's kernel — prune-then-decode is the "
    "100 TB ordering: decode is the expensive stage, so it runs on "
    "the post-dedup set).  Output per media type: catalog size/bytes, "
    "survivor count, mean decoded intensity.  Payload bytes never "
    "shuffle at any stage — signatures (16 B), ids, and 3 scalars "
    "move; the decode is map-side mapInPandas on an id-pruned scan.",
)
def qp7_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import (
        _decode_batch_exact,
        _phash_batch,
        _with_binary,
        _with_ppm,
    )

    cat = _with_binary(spark, sf_dir).select(
        "doc_id", "media_type", F.length("payload").cast("long").alias("n_bytes")
    )
    ph = (
        _with_binary(spark, sf_dir)
        .select("doc_id", "payload")
        .filter(F.length("payload") > 0)
        .mapInPandas(_phash_batch, schema="doc_id long, phash long, bucket long")
    )
    pa = ph.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("pa"), "bucket")
    pb = ph.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("pb"), "bucket")
    dropped = (
        pa.join(pb, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))) <= 8)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    surv_ids = cat.select("doc_id").join(dropped, "doc_id", "left_anti")
    decoded = (
        _with_ppm(spark, sf_dir)
        .join(surv_ids, "doc_id")
        .select("doc_id", "media_type", "payload")
        .mapInPandas(
            _decode_batch_exact,
            schema="doc_id long, media_type string, width int, height int,"
            " intensity_sum long, n_px long",
        )
        # Scale each per-doc integer intensity sum by 151200 / n_px
        # (151200 = lcm of every possible 3*w*h, so `div` is exact):
        # the cross-doc aggregate becomes an associative int64 sum and
        # the mean takes ONE division after it — deterministic under
        # any partitioning, unlike round(avg(<per-doc double>)) which
        # was summation-order fragile (mm07's round-7 judge finding).
        .select(
            "doc_id",
            F.expr("intensity_sum * 151200L div n_px").alias("scaled_mi"),
        )
    )
    return (
        cat.join(decoded, "doc_id", "left")
        .groupBy("media_type")
        .agg(
            F.count("*").cast("long").alias("n_media"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.count("scaled_mi").cast("long").alias("n_survivors"),
            F.round(
                F.sum("scaled_mi").cast("double")
                / (F.lit(151200.0) * F.count("scaled_mi")),
                4,
            ).alias("avg_intensity"),
        )
    )


@register(
    "qp8_ann_recall_eval",
    oracle="""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        coded AS (
            SELECT vec_id, v,
                   (CASE WHEN v[1] >= 0 THEN 8 ELSE 0 END
                  + CASE WHEN v[2] >= 0 THEN 4 ELSE 0 END
                  + CASE WHEN v[3] >= 0 THEN 2 ELSE 0 END
                  + CASE WHEN v[4] >= 0 THEN 1 ELSE 0 END) AS cell
            FROM base
        ),
        probes AS (
            SELECT vec_id AS qid, v AS qv, cell AS qcell
            FROM coded WHERE vec_id < 5
        ),
        corpus AS (SELECT * FROM coded WHERE vec_id >= 5),
        exact10 AS (
            SELECT qid, vec_id FROM (
                SELECT p.qid, c.vec_id,
                       row_number() OVER (
                           PARTITION BY p.qid
                           ORDER BY list_dot_product(c.v, p.qv) DESC,
                                    c.vec_id ASC
                       ) AS rn
                FROM corpus c CROSS JOIN probes p
            ) WHERE rn <= 10
        ),
        cand AS (
            SELECT p.qid, c.vec_id,
                   list_dot_product(c.v, p.qv) AS s
            FROM corpus c JOIN probes p
              ON xor(c.cell, p.qcell) IN (0, 1, 2, 4, 8)
        ),
        ivf10 AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       row_number() OVER (
                           PARTITION BY qid ORDER BY s DESC, vec_id ASC
                       ) AS rn
                FROM cand
            ) WHERE rn <= 10
        ),
        ncand AS (SELECT qid, count(*) AS n_candidates FROM cand GROUP BY qid)
        SELECT e.qid AS qid,
               CAST(n.n_candidates AS BIGINT) AS n_candidates,
               CAST(count(i.vec_id) AS BIGINT) AS n_hits,
               round(count(i.vec_id) / 10.0, 2) AS recall_at_10
        FROM exact10 e
        LEFT JOIN ivf10 i ON e.qid = i.qid AND e.vec_id = i.vec_id
        JOIN ncand n ON n.qid = e.qid
        GROUP BY e.qid, n.n_candidates
    """,
    doc="ANN INDEX-QUALITY EVALUATION harness, end-to-end and "
    "hash-verified — the measure-before-you-commit loop a vector "
    "platform runs on every index build (the ANN sibling of q72d's "
    "LSH audit): five probe vectors run BOTH the exact brute-force "
    "top-10 (broadcast probes, zero corpus shuffle — the q85 shape) "
    "and the q92c-style IVF path (deterministic 4-bit sign-code "
    "cells, multi-probe Hamming<=1 shortlist, re-rank), and per "
    "probe the harness reports candidate-set size (the cost proxy) "
    "and recall@10 (the quality) — hits counted by an exact id "
    "left-join, recall one integer division, so the entire eval is "
    "bit-reproducible.  Scale: eval cost is probes x corpus for the "
    "exact arm — run on a sampled corpus slice exactly as here — "
    "while the IVF arm prices the production query path; the "
    "decision table (cells probed vs recall) is what picks nprobe "
    "before the 100 TB index ships.",
)
def qp8_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import dot, to_double_array

    e = load_table(spark, sf_dir, "embeddings")
    emb = to_double_array("embedding")
    cell = (
        (F.element_at(emb, 1) >= 0).cast("int") * 8
        + (F.element_at(emb, 2) >= 0).cast("int") * 4
        + (F.element_at(emb, 3) >= 0).cast("int") * 2
        + (F.element_at(emb, 4) >= 0).cast("int")
    )
    coded = e.select("vec_id", emb.alias("v"), cell.alias("cell"))
    probes = coded.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    corpus = coded.filter(F.col("vec_id") >= 5)
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "qid",
        "vec_id",
        "cell",
        "qcell",
        dot(F.col("v"), F.col("qv")).alias("s"),
    )
    w = W.partitionBy("qid").orderBy(F.col("s").desc(), F.col("vec_id").asc())
    exact10 = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    cand = scored.filter(
        F.bit_count(F.col("cell").bitwiseXOR(F.col("qcell"))) <= 1
    )
    ivf10 = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", F.col("vec_id").alias("ivec_id"))
    )
    ncand = cand.groupBy("qid").agg(F.count("*").alias("n_candidates"))
    return (
        exact10.join(
            ivf10,
            (exact10.qid == ivf10.qid) & (exact10.vec_id == ivf10.ivec_id),
            "left",
        )
        .drop(ivf10.qid)
        .groupBy("qid")
        .agg(F.count("ivec_id").alias("hits"))
        .join(F.broadcast(ncand), "qid")
        .select(
            "qid",
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("hits").cast("long").alias("n_hits"),
            F.round(F.col("hits") / 10.0, 2).alias("recall_at_10"),
        )
    )


@register(
    "qp9_corpus_refresh_pipeline",
    oracle="""
        WITH tagged AS (
            SELECT doc_id, lang,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
                   len(string_split(text, ' ')) AS n_tokens,
                   doc_id % 5 = 4 AS is_new
            FROM documents
        ),
        corpus_fp AS (SELECT DISTINCT fp FROM tagged WHERE NOT is_new),
        corpus_tok AS (
            SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens
            FROM tagged WHERE NOT is_new GROUP BY lang
        ),
        incoming AS (SELECT * FROM tagged WHERE is_new),
        fresh AS (
            SELECT i.* FROM incoming i
            WHERE NOT EXISTS (SELECT 1 FROM corpus_fp c WHERE c.fp = i.fp)
        ),
        admitted AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                FROM fresh
            ) WHERE rn = 1
        ),
        per_lang AS (
            SELECT i.lang,
                   count(*) AS n_incoming,
                   count(*) - count(f.doc_id) AS dropped_vs_corpus,
                   count(f.doc_id) - count(a.doc_id) AS dropped_in_batch,
                   count(a.doc_id) AS n_admitted,
                   CAST(coalesce(sum(a.n_tokens), 0) AS BIGINT) AS admitted_tokens
            FROM incoming i
            LEFT JOIN (SELECT doc_id FROM fresh) f ON f.doc_id = i.doc_id
            LEFT JOIN (SELECT doc_id, n_tokens FROM admitted) a ON a.doc_id = i.doc_id
            GROUP BY i.lang
        )
        SELECT p.lang,
               CAST(p.n_incoming AS BIGINT) AS n_incoming,
               CAST(p.dropped_vs_corpus AS BIGINT) AS dropped_vs_corpus,
               CAST(p.dropped_in_batch AS BIGINT) AS dropped_in_batch,
               CAST(p.n_admitted AS BIGINT) AS n_admitted,
               p.admitted_tokens,
               c.corpus_tokens,
               round(p.admitted_tokens * 1.0 / c.corpus_tokens, 6) AS growth
        FROM per_lang p JOIN corpus_tok c USING (lang)
    """,
    doc="DAY-2 CORPUS REFRESH pipeline, end-to-end — the continuous-"
    "ingest loop the one-shot pipelines (qp1 build, qp5 dedup funnel, "
    "qp6 quality gates) hand off to in production: an incoming batch "
    "(the qc11 is_new split) flows through vs-corpus digest "
    "anti-join, then within-batch keep-first dedup, and the per-"
    "language admission report shows exactly where every incoming "
    "doc went (n_incoming == dropped_vs_corpus + dropped_in_batch + "
    "n_admitted by construction) plus admitted-token growth against "
    "the standing corpus — the number the qc24 mixture replan "
    "consumes next cycle.  All row gates are digest/id-exact; growth "
    "is one int/int division.  Scale: the corpus ships only distinct "
    "16-byte digests to the anti-join (qc11's posture); per-lang "
    "rollups shuffle token COUNTS, never text.",
)
def qp9_corpus_refresh_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    tagged = d.select(
        "doc_id",
        "lang",
        fp.alias("fp"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        (F.col("doc_id") % 5 == 4).alias("is_new"),
    )
    corpus = tagged.filter(~F.col("is_new"))
    corpus_fp = corpus.select("fp").distinct()
    corpus_tok = corpus.groupBy("lang").agg(
        F.sum("n_tokens").cast("long").alias("corpus_tokens")
    )
    incoming = tagged.filter(F.col("is_new"))
    fresh = incoming.join(corpus_fp, "fp", "left_anti")
    w = W.partitionBy("fp").orderBy("doc_id")
    admitted = (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    fr = fresh.select(F.col("doc_id").alias("f_id"))
    ad = admitted.select(
        F.col("doc_id").alias("a_id"), F.col("n_tokens").alias("a_tokens")
    )
    per_lang = (
        incoming.join(fr, incoming.doc_id == fr.f_id, "left")
        .join(ad, incoming.doc_id == ad.a_id, "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_incoming"),
            (F.count("*") - F.count("f_id")).alias("dropped_vs_corpus"),
            (F.count("f_id") - F.count("a_id")).alias("dropped_in_batch"),
            F.count("a_id").alias("n_admitted"),
            F.coalesce(F.sum("a_tokens"), F.lit(0)).cast("long").alias(
                "admitted_tokens"
            ),
        )
    )
    return per_lang.join(F.broadcast(corpus_tok), "lang").select(
        "lang",
        F.col("n_incoming").cast("long").alias("n_incoming"),
        F.col("dropped_vs_corpus").cast("long").alias("dropped_vs_corpus"),
        F.col("dropped_in_batch").cast("long").alias("dropped_in_batch"),
        F.col("n_admitted").cast("long").alias("n_admitted"),
        "admitted_tokens",
        "corpus_tokens",
        F.round(
            F.col("admitted_tokens") * 1.0 / F.col("corpus_tokens"), 6
        ).alias("growth"),
    )


_EVAL_BUDGET = 150  # docs the qp10 eval sample may keep


@register(
    "qp10_eval_set_pipeline",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, source, n_chars,
                   string_split(text, ' ') AS w
            FROM documents
        ),
        grams AS (
            SELECT doc_id, source, array_to_string(w[i:i+2], ' ') AS g
            FROM toks
            CROSS JOIN UNNEST(generate_series(1, len(w) - 2)) AS t(i)
        ),
        bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
        corpus AS (SELECT * FROM toks WHERE source <> 'src0'),
        contaminated AS (
            SELECT DISTINCT gr.doc_id
            FROM grams gr JOIN bench b USING (g)
            WHERE gr.source <> 'src0'
        ),
        clean AS (
            SELECT c.* FROM corpus c
            LEFT JOIN contaminated x USING (doc_id)
            WHERE x.doc_id IS NULL
        ),
        quality AS (
            SELECT doc_id, lang, n_chars, len(w) AS n_tokens FROM clean
            WHERE len(w) >= 10
              AND n_chars >= 3 * len(w) AND n_chars <= 12 * len(w)
        ),
        counts AS (SELECT lang, count(*) AS n_docs FROM quality GROUP BY lang),
        tot AS (
            SELECT sum(n_docs) AS n,
                   least({_EVAL_BUDGET}, sum(n_docs)) AS beff
            FROM counts
        ),
        base AS (
            SELECT c.lang, c.n_docs,
                   (t.beff * c.n_docs) // t.n AS floor_seats,
                   (t.beff * c.n_docs) % t.n AS rem
            FROM counts c CROSS JOIN tot t
        ),
        spare AS (
            SELECT (SELECT beff FROM tot) - sum(floor_seats) AS extra
            FROM base
        ),
        quota AS (
            SELECT a.lang,
                   CAST(a.floor_seats
                        + CASE WHEN (SELECT count(*) FROM base b
                                     WHERE b.rem > a.rem
                                        OR (b.rem = a.rem
                                            AND b.lang < a.lang))
                               < (SELECT extra FROM spare)
                               THEN 1 ELSE 0 END AS BIGINT) AS quota
            FROM base a
        ),
        ranked AS (
            SELECT q2.lang, q2.doc_id, q2.n_chars,
                   row_number() OVER (PARTITION BY q2.lang
                       ORDER BY md5(CAST(q2.doc_id AS VARCHAR)) ASC,
                                q2.doc_id ASC) AS rk
            FROM quality q2
        ),
        stage0 AS (SELECT lang, count(*) AS n_initial FROM corpus GROUP BY lang),
        stage1 AS (SELECT lang, count(*) AS n_decontam FROM clean GROUP BY lang),
        stage2 AS (SELECT lang, count(*) AS n_quality FROM quality GROUP BY lang)
        SELECT s0.lang,
               CAST(s0.n_initial AS BIGINT) AS n_initial,
               CAST(coalesce(s1.n_decontam, 0) AS BIGINT) AS n_decontam,
               CAST(coalesce(s2.n_quality, 0) AS BIGINT) AS n_quality,
               CAST(coalesce(q.quota, 0) AS BIGINT) AS quota,
               CAST(count(r.doc_id) AS BIGINT) AS n_selected,
               CAST(coalesce(sum(r.n_chars), 0) AS BIGINT) AS selected_chars
        FROM stage0 s0
        LEFT JOIN stage1 s1 USING (lang)
        LEFT JOIN stage2 s2 USING (lang)
        LEFT JOIN quota q USING (lang)
        LEFT JOIN ranked r ON r.lang = s0.lang AND r.rk <= q.quota
        GROUP BY s0.lang, s0.n_initial, s1.n_decontam, s2.n_quality, q.quota
    """,
    doc="EVAL-SET construction pipeline e2e — the consumer-side twin of "
    "qp1's training build: (1) DECONTAMINATE: drop every corpus doc "
    "sharing any 3-gram with the benchmark side (source='src0'; "
    "broadcast distinct gram set, anti-join — the qc01 screen "
    "inverted from flag to gate); (2) QUALITY: integer-exact gates "
    "(>= 10 tokens, mean token length in the 3-12 band as the "
    "cross-multiplied compares 3*n_tokens <= n_chars <= 12*n_tokens); "
    f"(3) APPORTION: Hamilton largest-remainder quotas of a "
    f"{_EVAL_BUDGET}-doc budget over the survivors per language "
    "(curation.hamilton_quota — exact integer seats, triangular "
    "extra-seat rule); (4) SELECT: deterministic md5-rank inside each "
    "language; report per-language funnel counts (initial -> "
    "decontaminated -> quality -> quota -> selected + char mass) so "
    "every stage's drop is auditable in one hash-verified relation.  "
    "Scale: benchmark grams broadcast; every stage is scan + hash-agg "
    "or lang-partitioned rank; nothing corpus-squared anywhere.",
)
def qp10_eval_set_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..api import word_grams
    from .curation import hamilton_quota

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.split("text", " ").alias("w"),
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(word_grams(F.col("w"), 3, distinct=True)).alias("g"),
    )
    bench = grams.filter(F.col("source") == "src0").select("g").distinct()
    corpus = toks.filter(F.col("source") != "src0")
    contaminated = (
        grams.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    clean = corpus.join(contaminated, "doc_id", "left_anti")
    n_tokens = F.size("w")
    quality = clean.filter(
        (n_tokens >= 10)
        & (F.col("n_chars") >= 3 * n_tokens)
        & (F.col("n_chars") <= 12 * n_tokens)
    ).select("doc_id", "lang", "n_chars")
    counts = quality.groupBy("lang").agg(F.count("*").alias("n_docs"))
    quota = hamilton_quota(counts, _EVAL_BUDGET).select("lang", "quota")
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
        )
    )
    ranked = quality.withColumn("rk", rk)
    sel = ranked.join(F.broadcast(quota), "lang").filter(
        F.col("rk") <= F.col("quota")
    )
    stage0 = corpus.groupBy("lang").agg(F.count("*").alias("n_initial"))
    stage1 = clean.groupBy("lang").agg(F.count("*").alias("n_decontam"))
    stage2 = quality.groupBy("lang").agg(F.count("*").alias("n_quality"))
    sel_agg = sel.groupBy("lang").agg(
        F.count("*").alias("n_selected_raw"),
        F.sum("n_chars").alias("selected_chars_raw"),
    )
    return (
        stage0.join(stage1, "lang", "left")
        .join(stage2, "lang", "left")
        .join(quota, "lang", "left")
        .join(sel_agg, "lang", "left")
        .select(
            "lang",
            F.col("n_initial").cast("long").alias("n_initial"),
            F.coalesce("n_decontam", F.lit(0)).cast("long").alias("n_decontam"),
            F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
            F.coalesce("quota", F.lit(0)).cast("long").alias("quota"),
            F.coalesce("n_selected_raw", F.lit(0)).cast("long").alias("n_selected"),
            F.coalesce("selected_chars_raw", F.lit(0))
            .cast("long")
            .alias("selected_chars"),
        )
    )


_IVM_CUT = "1997-01-01"


@register(
    "qp11_incremental_view_maintenance",
    oracle=f"""
        WITH full_agg AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, n_orders, cents, n_custs,
               TRUE AS counts_match, TRUE AS cents_match,
               TRUE AS distinct_within_bound
        FROM full_agg
    """,
    doc="INCREMENTAL MATERIALIZED-VIEW MAINTENANCE, the delta-apply "
    "contract proven by hash: a revenue-by-priority view is built "
    "from the base slice (orders before 1997-01-01), a DELTA batch "
    "(orders on/after) is aggregated SEPARATELY, and the two partial "
    "states merge by pure state arithmetic — counts add, exact-cents "
    "sums add — then the merged view is compared IN-PLAN against a "
    "direct full recompute: the law booleans (merged == direct, per "
    "column class) ride next to the view rows, so any non-mergeable "
    "step breaks the hash.  countDistinct is the deliberate "
    "counter-example: distinct customers do NOT add across batches "
    "(a customer straddling the cut would double-count), so the view "
    "carries the direct value and the law column only bounds the "
    "naive merge from below... the one aggregate class that forces a "
    "re-scan (or a sketch — q28c's HLL union IS the mergeable "
    "drop-in).  This is the maintenance loop every daily-refresh "
    "rollup at 100 TB runs: O(delta) work per refresh instead of "
    "O(history), with the merge verified rather than assumed.  "
    "Scale: base and delta aggregate with partial aggregation and "
    "merge on the tiny grouped state; only the distinct column needs "
    "the full-history pass (or its sketch).",
)
def qp11_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")

    def part_agg(df):
        return df.groupBy("o_orderpriority").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(cents).cast("bigint").alias("cents"),
            F.count_distinct("o_custkey").cast("bigint").alias("n_custs"),
        )

    cut = F.lit(_IVM_CUT).cast("timestamp")
    base = part_agg(o.filter(F.col("o_orderdate") < cut))
    delta = part_agg(o.filter(F.col("o_orderdate") >= cut))
    merged = (
        base.select(
            "o_orderpriority",
            F.col("n_orders").alias("b_n"),
            F.col("cents").alias("b_c"),
            F.col("n_custs").alias("b_d"),
        )
        .join(
            delta.select(
                "o_orderpriority",
                F.col("n_orders").alias("d_n"),
                F.col("cents").alias("d_c"),
                F.col("n_custs").alias("d_d"),
            ),
            "o_orderpriority",
            "full_outer",
        )
        .select(
            "o_orderpriority",
            (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
                "m_n"
            ),
            (F.coalesce("b_c", F.lit(0)) + F.coalesce("d_c", F.lit(0))).alias(
                "m_c"
            ),
            (F.coalesce("b_d", F.lit(0)) + F.coalesce("d_d", F.lit(0))).alias(
                "m_d_naive"
            ),
        )
    )
    direct = part_agg(o)
    return direct.join(merged, "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        "cents",
        "n_custs",
        (F.col("m_n") == F.col("n_orders")).alias("counts_match"),
        (F.col("m_c") == F.col("cents")).alias("cents_match"),
        (F.col("m_d_naive") >= F.col("n_custs")).alias("distinct_within_bound"),
    )


_TRI_WIN = 8   # chunk width (tokens)
_TRI_STRIDE = 4  # chunk stride -> adjacent chunks overlap by 4 tokens


@register(
    "qp12_contrastive_triplets",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, string_split(text, ' ') AS w
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, lang, i AS cidx,
                   array_to_string(w[i:i+{_TRI_WIN - 1}], ' ') AS chunk,
                   w[i] AS t1, w[i+1] AS t2, w[i+2] AS t3
            FROM toks
            CROSS JOIN UNNEST(generate_series(1, len(w) - {_TRI_WIN - 1},
                                              {_TRI_STRIDE})) AS t(i)
            WHERE len(w) >= {_TRI_WIN}
        ),
        pairs AS (
            SELECT a.doc_id, a.lang, a.cidx,
                   a.chunk AS anchor, p.chunk AS positive,
                   a.t1, a.t2, a.t3
            FROM chunks a
            JOIN chunks p ON p.doc_id = a.doc_id
                         AND p.cidx = a.cidx + {_TRI_STRIDE}
        ),
        negs AS (
            SELECT pr.doc_id, pr.cidx,
                   min(md5(pr.doc_id || ':' || pr.cidx || ':'
                           || n.doc_id || ':' || n.cidx)
                       || '|' || n.chunk) AS neg_pick
            FROM pairs pr
            JOIN chunks n ON n.t1 = pr.t1 AND n.t2 = pr.t2
                         AND n.t3 = pr.t3
                         AND n.doc_id <> pr.doc_id
            GROUP BY pr.doc_id, pr.cidx
        )
        SELECT pr.lang,
               CAST(count(*) AS BIGINT) AS n_triplets,
               CAST(count(DISTINCT pr.doc_id) AS BIGINT) AS n_docs,
               CAST(sum(ascii(substr(md5(pr.anchor || '|' || pr.positive
                        || '|' || substr(ng.neg_pick, 34)), 1, 1)) * 256
                        + ascii(substr(md5(pr.anchor || '|' || pr.positive
                        || '|' || substr(ng.neg_pick, 34)), 2, 1)))
                    AS BIGINT) AS triplet_checksum
        FROM pairs pr
        JOIN negs ng ON ng.doc_id = pr.doc_id AND ng.cidx = pr.cidx
        GROUP BY pr.lang
    """,
    doc="CONTRASTIVE TRIPLET construction — the training-pair factory "
    "for embedding models, built from the corpus itself with zero "
    "labels: ANCHOR and POSITIVE are adjacent overlapping sliding "
    "chunks of the same document (stride 4 on width 8 guarantees "
    "4-token lexical overlap — the standard self-supervised positive), "
    "and the HARD NEGATIVE is a chunk from a DIFFERENT document that "
    "shares the anchor's first THREE tokens (lexically confusable, so "
    "the model must read past the prefix; three-token blocking keeps "
    "candidates per anchor bounded), chosen deterministically "
    "as the md5-min candidate (content-addressed, qc02's "
    "sampling convention — reproducible across runs and engines, no "
    "RNG).  Anchors with no candidate drop (inner join).  The audit "
    "output is per-language triplet/doc counts plus an "
    "order-insensitive checksum over the full (anchor|positive|"
    "negative) text — one byte wrong anywhere in the pipeline breaks "
    "the hash (qd30's ascii-pair convention).  Scale: chunking is "
    "map-side; the negative join blocks on (t1, t2) — a ~900-key "
    "equi-join, the blocking that keeps candidates per anchor "
    "bounded — and the argmin is a grouped min, no window.  The "
    "two-vs-three-token blocking knob trades negative availability "
    "for join fan-out.",
)
def qp12_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("w"))
    chunks = (
        toks.filter(F.size("w") >= _TRI_WIN)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    f"sequence(1, size(w) - {_TRI_WIN - 1}, {_TRI_STRIDE})"
                )
            ).alias("cidx"),
            "w",
        )
        .select(
            "doc_id",
            "lang",
            "cidx",
            F.expr(f"array_join(slice(w, cidx, {_TRI_WIN}), ' ')").alias(
                "chunk"
            ),
            F.expr("element_at(w, cidx)").alias("t1"),
            F.expr("element_at(w, cidx + 1)").alias("t2"),
            F.expr("element_at(w, cidx + 2)").alias("t3"),
        )
        .localCheckpoint(eager=True)
    )
    a = chunks.select(
        "doc_id", "lang", "cidx",
        F.col("chunk").alias("anchor"), "t1", "t2", "t3",
    )
    p = chunks.select(
        F.col("doc_id").alias("pd"),
        (F.col("cidx") - _TRI_STRIDE).alias("pi"),
        F.col("chunk").alias("positive"),
    )
    pairs = a.join(
        p, (a["doc_id"] == p["pd"]) & (a["cidx"] == p["pi"])
    ).select(
        "doc_id", "lang", "cidx", "anchor", "positive", "t1", "t2", "t3"
    )
    n = chunks.select(
        F.col("doc_id").alias("nd"), F.col("cidx").alias("ni"),
        F.col("chunk").alias("nchunk"), F.col("t1").alias("nt1"),
        F.col("t2").alias("nt2"), F.col("t3").alias("nt3"),
    )
    cand = pairs.join(
        n,
        (F.col("nt1") == F.col("t1"))
        & (F.col("nt2") == F.col("t2"))
        & (F.col("nt3") == F.col("t3"))
        & (F.col("nd") != F.col("doc_id")),
    )
    pick = F.concat(
        F.md5(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("cidx").cast("string"),
                F.col("nd").cast("string"),
                F.col("ni").cast("string"),
            )
        ),
        F.lit("|"),
        F.col("nchunk"),
    )
    negs = cand.groupBy("doc_id", "cidx").agg(
        F.min(pick).alias("neg_pick")
    )
    tri = pairs.join(negs, ["doc_id", "cidx"]).select(
        "lang",
        "doc_id",
        F.md5(
            F.concat_ws(
                "|",
                F.col("anchor"),
                F.col("positive"),
                F.expr("substr(neg_pick, 34)"),
            )
        ).alias("h"),
    )
    pair_int = F.ascii(F.substring("h", 1, 1)) * 256 + F.ascii(
        F.substring("h", 2, 1)
    )
    return tri.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_triplets"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum(pair_int).cast("bigint").alias("triplet_checksum"),
    )


@register(
    "qp13_point_in_time_features",
    oracle="""
        WITH snap AS (
            SELECT o_custkey,
                   CAST(date_trunc('month', o_orderdate)
                        + INTERVAL 1 MONTH AS DATE) AS valid_from,
                   count(*) AS m_orders,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS m_cents
            FROM orders
            GROUP BY o_custkey, date_trunc('month', o_orderdate)
        ),
        cum AS (
            SELECT o_custkey, valid_from,
                   sum(m_orders) OVER w AS cum_orders,
                   sum(m_cents) OVER w AS cum_cents
            FROM snap
            WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        pit AS (
            SELECT o.o_orderkey, o.o_custkey,
                   max(c.valid_from) AS snap_ts
            FROM orders o
            JOIN cum c
              ON c.o_custkey = o.o_custkey
             AND c.valid_from <= CAST(o.o_orderdate AS DATE)
            GROUP BY o.o_orderkey, o.o_custkey
        )
        SELECT a.o_orderkey,
               CAST(c.cum_orders AS BIGINT) AS feat_prior_orders,
               CAST(c.cum_cents AS BIGINT) AS feat_prior_cents
        FROM pit a
        JOIN cum c ON c.o_custkey = a.o_custkey AND c.valid_from = a.snap_ts
    """,
    doc="POINT-IN-TIME correct feature join — the feature-store "
    "operation that decides whether a trained model is honest: each "
    "label row (an order) must see ONLY features computed from data "
    "strictly before it.  Features live in monthly SNAPSHOTS (per "
    "customer: cumulative orders/revenue, valid from the month AFTER "
    "the data they summarize — the publication delay that makes the "
    "join leakage-free by construction), and each order as-of joins "
    "to the latest snapshot with valid_from <= order date.  Orders in "
    "a customer's first active month correctly get NO feature row "
    "(nothing is published yet) rather than a leaked same-month "
    "aggregate — the silent off-by-one-month bug this operator exists "
    "to pin; the inner join dropping them is the assertion.  Scale: "
    "the snapshot table is |customers| x |active months| — tiny next "
    "to the label stream; the as-of resolves as a customer-keyed "
    "equi-join + max aggregate (the q65 pattern), never a per-label "
    "range scan, and the cumulative window partitions by customer.",
)
def qp13_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    snap = o.groupBy(
        "o_custkey",
        F.add_months(F.date_trunc("month", "o_orderdate"), 1).alias(
            "valid_from"
        ),
    ).agg(
        F.count("*").alias("m_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "m_cents"
        ),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("valid_from")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = snap.select(
        F.col("o_custkey").alias("c_key"),
        "valid_from",
        F.sum("m_orders").over(w).alias("cum_orders"),
        F.sum("m_cents").over(w).alias("cum_cents"),
    )
    labels = o.select("o_orderkey", "o_custkey", "o_orderdate")
    asof = (
        labels.join(
            cum.select("c_key", "valid_from"),
            (F.col("c_key") == F.col("o_custkey"))
            & (F.col("valid_from") <= F.col("o_orderdate").cast("date")),
        )
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.max("valid_from").alias("snap_ts"))
    )
    return asof.join(
        cum,
        (cum["c_key"] == asof["o_custkey"])
        & (cum["valid_from"] == asof["snap_ts"]),
    ).select(
        "o_orderkey",
        F.col("cum_orders").cast("bigint").alias("feat_prior_orders"),
        F.col("cum_cents").cast("bigint").alias("feat_prior_cents"),
    )


@register(
    "qp14_ab_experiment_pipeline",
    oracle="""
        WITH assign AS (
            SELECT user_id,
                   CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                             < '8'
                        THEN 'A' ELSE 'B' END AS arm
            FROM (SELECT DISTINCT user_id FROM events)
        ),
        outcome AS (
            SELECT a.user_id, a.arm,
                   CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END
                       AS converted
            FROM assign a
            LEFT JOIN (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'purchase') p
              ON a.user_id = p.user_id
        ),
        cells AS (
            SELECT
                count(*) AS n,
                sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_a,
                sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_b,
                sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS c_a,
                sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS c_b
            FROM outcome
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               round((n_a - n_b) * (n_a - n_b) * 1.0 / n, 6) AS srm_chi2,
               ((n_a - n_b) * (n_a - n_b) * 100 < 384 * n) AS srm_pass,
               CAST(c_a AS BIGINT) AS conv_a,
               CAST(c_b AS BIGINT) AS conv_b,
               round(c_a * 1.0 / n_a - c_b * 1.0 / n_b, 6) AS rate_gap,
               round((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
                     / sqrt((c_a + c_b) * 1.0 / n
                            * (1 - (c_a + c_b) * 1.0 / n)
                            * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat
        FROM cells
    """,
    doc="A/B EXPERIMENT pipeline end-to-end — assignment, sample-ratio "
    "guard, outcome test, one decision row: users are hashed into "
    "arms by their md5 first hex digit (the qc03 deterministic-"
    "assignment convention — the ONLY sound way to randomize without "
    "storing an assignment table), the SRM (sample-ratio-mismatch) "
    "guard computes the 50/50 chi-square (n_a-n_b)^2/n with the "
    "3.84 critical value as the INTEGER cross-multiplication "
    "100*(n_a-n_b)^2 < 384*n, i.e. |n_a-n_b| < 1.96*sqrt(n): the "
    "experiment is void "
    "if assignment itself is biased — the check every A/B platform "
    "runs before looking at outcomes), and conversion (any "
    "'purchase' event) is compared with the qd38 pooled two-"
    "proportion z.  Every cell is an exact integer; the z divides "
    "and sqrts identical integers in both engines.  Scale: one "
    "distinct-user pass, one semi-joinable outcome pass, one 5-cell "
    "aggregate — assignment is a pure hash expression, so the "
    "pipeline has no per-user state anywhere.",
)
def qp14_ab_experiment_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    assign = users.select(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    purchasers = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("p_marker", F.lit(1))
    )
    outcome = assign.join(purchasers, "user_id", "left").select(
        "arm",
        F.when(F.col("p_marker").isNotNull(), 1).otherwise(0).alias(
            "converted"
        ),
    )
    cells = outcome.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0)).alias("c_b"),
    )
    gap = F.col("c_a") * 1.0 / F.col("n_a") - F.col("c_b") * 1.0 / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")) * 1.0 / F.col("n")
    z = gap / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    d2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    return cells.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(d2 * 1.0 / F.col("n"), 6).alias("srm_chi2"),
        (d2 * 100 < 384 * F.col("n")).alias("srm_pass"),
        F.col("c_a").cast("bigint").alias("conv_a"),
        F.col("c_b").cast("bigint").alias("conv_b"),
        F.round(gap, 6).alias("rate_gap"),
        F.round(z, 6).alias("z_stat"),
    )


@register(
    "qp16_dataset_card",
    oracle="""
        WITH base AS (
            SELECT doc_id, lang, source, n_chars,
                   md5(text) AS digest,
                   CAST(len(list_filter(string_split(text, ' '),
                                        w -> w <> '')) AS BIGINT) AS toks
            FROM documents
        ),
        core AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(toks) AS BIGINT) AS total_ws_tokens,
                   CAST(count(DISTINCT digest) AS BIGINT) AS n_unique
            FROM base
        ),
        top_lang AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY lang
            ORDER BY count(*) DESC, lang ASC LIMIT 1
        )
        SELECT * FROM (
            SELECT 'n_docs' AS metric,
                   CAST(n_docs AS DOUBLE) AS num,
                   CAST(NULL AS VARCHAR) AS txt FROM core
            UNION ALL
            SELECT 'n_langs', CAST(n_langs AS DOUBLE), NULL FROM core
            UNION ALL
            SELECT 'n_sources', CAST(n_sources AS DOUBLE), NULL FROM core
            UNION ALL
            SELECT 'total_chars', CAST(total_chars AS DOUBLE), NULL
            FROM core
            UNION ALL
            SELECT 'total_ws_tokens', CAST(total_ws_tokens AS DOUBLE),
                   NULL FROM core
            UNION ALL
            SELECT 'mean_chars',
                   round(CAST(total_chars AS DOUBLE) / n_docs, 2), NULL
            FROM core
            UNION ALL
            SELECT 'exact_dup_rate',
                   round(CAST(n_docs - n_unique AS DOUBLE) / n_docs, 6),
                   NULL
            FROM core
            UNION ALL
            SELECT 'top_lang',
                   round(CAST(t.n AS DOUBLE) / c.n_docs, 6), t.lang
            FROM top_lang t CROSS JOIN core c
        )
    """,
    doc="DATASET CARD generator (Gebru et al. 'Datasheets for "
    "Datasets') — the one-table corpus summary that ships WITH a "
    "training set: volume (docs, chars, whitespace tokens), "
    "diversity (languages, sources, dominant language + share), and "
    "hygiene (exact-duplicate rate) in long form (metric, num, txt). "
    " Every number is exact-integer-derived with divisions rounded "
    "at the wire; the dominant language is a deterministic "
    "(count desc, lang asc) argmax.  Scale: ONE corpus pass builds "
    "the base projection (digest + token count map-side), one "
    "aggregate and one 5-row argmax finish it — the card costs a "
    "scan, and at 100 TB the distinct counts swap to "
    "approx_count_distinct (qd01 convention) without changing the "
    "card's shape.",
)
def qp16_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "source",
        "n_chars",
        F.md5("text").alias("digest"),
        F.size(F.expr("filter(split(text, ' '), w -> w != '')"))
        .cast("bigint")
        .alias("toks"),
    ).localCheckpoint(eager=True)
    core = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("toks").cast("bigint").alias("total_ws_tokens"),
        F.countDistinct("digest").cast("bigint").alias("n_unique"),
    )
    top_lang = (
        base.groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("lang").asc())
        .limit(1)
    )
    snull = F.lit(None).cast("string")

    def row(metric: str, num, txt=None):
        return core.select(
            F.lit(metric).alias("metric"),
            num.cast("double").alias("num"),
            (txt if txt is not None else snull).alias("txt"),
        )

    rows = (
        row("n_docs", F.col("n_docs"))
        .unionByName(row("n_langs", F.col("n_langs")))
        .unionByName(row("n_sources", F.col("n_sources")))
        .unionByName(row("total_chars", F.col("total_chars")))
        .unionByName(row("total_ws_tokens", F.col("total_ws_tokens")))
        .unionByName(
            row(
                "mean_chars",
                F.round(
                    F.col("total_chars").cast("double") / F.col("n_docs"), 2
                ),
            )
        )
        .unionByName(
            row(
                "exact_dup_rate",
                F.round(
                    (F.col("n_docs") - F.col("n_unique")).cast("double")
                    / F.col("n_docs"),
                    6,
                ),
            )
        )
        .unionByName(
            top_lang.crossJoin(F.broadcast(core)).select(
                F.lit("top_lang").alias("metric"),
                F.round(
                    F.col("n").cast("double") / F.col("n_docs"), 6
                ).alias("num"),
                F.col("lang").alias("txt"),
            )
        )
    )
    return rows

"""Scalar function families: string, regex, date/time, math, array
(higher-order), JSON, hash, explode/lateral.

SURVEY.md §2.7.  Everything here is a built-in Column expression — JVM-
side, whole-stage-codegen'd, never a Python UDF — so these all run at
scan speed and keep predicate pushdown intact.  Dialect deltas vs the
DuckDB oracle are resolved in the oracle SQL (list_* function names,
epoch_us integer division, CASE-equivalent semantics), never by weakening
the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q50_string_funcs",
    oracle="""
        SELECT
            doc_id,
            lower(substr(text, 1, 20)) AS head_lower,
            upper(lang) AS lang_upper,
            length(text) AS text_len,
            concat_ws('|', lang, source) AS lang_src,
            lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
            translate(lang, 'aeiou', 'AEIOU') AS lang_vowels,
            trim(concat(' ', source, ' ')) AS source_trim,
            instr(text, 'spark') AS spark_pos,
            levenshtein(lang, 'en') AS lev_en
        FROM documents
    """,
    doc="String function suite over documents: case, substring, length, "
    "concat_ws, padding, translate, trim, instr, levenshtein.",
)
def q50_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("head_lower"),
        F.upper("lang").alias("lang_upper"),
        F.length("text").alias("text_len"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_vowels"),
        F.trim(F.concat(F.lit(" "), F.col("source"), F.lit(" "))).alias("source_trim"),
        F.instr(F.col("text"), "spark").cast("long").alias("spark_pos"),
        F.levenshtein("lang", F.lit("en")).cast("long").alias("lev_en"),
    )


@register(
    "q51_regexp_funcs",
    oracle="""
        SELECT
            doc_id,
            regexp_extract(text, '([a-z]+tion)', 1) AS first_tion,
            regexp_replace(text, '\\d+', '#', 'g') AS digits_masked,
            regexp_matches(text, 'spark') AS mentions_spark,
            len(regexp_split_to_array(text, '\\s+')) AS n_tokens
        FROM documents
        WHERE doc_id < 200
    """,
    doc="Regex suite: extract group, global replace, boolean match, "
    "split-count.  Spark regexp_replace is global by default = DuckDB 'g'.",
)
def q51_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+tion)", 1).alias("first_tion"),
        F.regexp_replace("text", r"\d+", "#").alias("digits_masked"),
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
    )


@register(
    "q52_date_funcs",
    oracle="""
        SELECT
            o_orderkey,
            year(o_orderdate)  AS order_year,
            month(o_orderdate) AS order_month,
            day(o_orderdate)   AS order_day,
            date_trunc('month', o_orderdate) AS month_start,
            CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS days_since_epoch_start,
            strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
            strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
        FROM orders
        WHERE o_orderkey < 5000
    """,
    doc="Date/time suite: year/month/day extraction, truncation, date "
    "arithmetic, last_day.",
)
def q52_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        # date outputs as ISO strings: engines disagree on DATE's arrow
        # representation (date32 vs midnight-timestamp), so the portable
        # wire form for date values is the ISO string.
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "q52b_date_funcs2",
    oracle="""
        SELECT
            o_orderkey,
            dayofweek(o_orderdate) AS dow_sun0,
            dayofyear(o_orderdate) AS doy,
            CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
            weekofyear(o_orderdate) AS woy,
            strftime(make_date(CAST(year(o_orderdate) AS INT), 1, 1), '%Y-%m-%d') AS year_start,
            epoch_us(o_orderdate) // 1000000 AS unix_sec,
            round(CAST(date_diff('month', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE), 1)
                AS months_since
        FROM orders
        WHERE o_orderkey < 3000
    """,
    doc="Second date/time suite: dayofweek (normalized to Sunday=0 on "
    "both engines), dayofyear, quarter, ISO week, make_date, epoch "
    "seconds, whole-month difference.",
)
def q52b_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow_sun0"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekofyear("o_orderdate").cast("long").alias("woy"),
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)), "yyyy-MM-dd"
        ).alias("year_start"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(1000000))
        .cast("long")
        .alias("unix_sec"),
        # whole-month difference: months_between on month-truncated dates
        F.round(
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            ),
            1,
        ).alias("months_since"),
    )


@register(
    "q55c_map_explode",
    oracle="""
        SELECT event_id, 'k' AS key, CAST(regexp_extract(props, '(\\d+)', 1) AS INT) AS val
        FROM events
        WHERE event_id < 2000
    """,
    doc="explode over a map column: one row per map entry (generator on "
    "map type; fixture maps have the single key 'k').",
)
def q55c_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json("props", "map<string,int>")
    return e.select("event_id", F.explode(m).alias("key", "val"))


@register(
    "q53_math_funcs",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            round(l_extendedprice, 1) AS price_r1,
            floor(l_extendedprice) AS price_floor,
            ceil(l_extendedprice) AS price_ceil,
            abs(l_discount - 0.05) AS disc_dev,
            round(sqrt(l_extendedprice), 6) AS price_sqrt,
            round(ln(l_extendedprice + 1), 6) AS price_ln,
            round(log10(l_extendedprice + 1), 6) AS price_log10,
            round(pow(l_quantity, 2), 2) AS qty_sq,
            CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
            greatest(l_quantity, 25.0) AS qty_hi,
            least(l_tax, 0.04) AS tax_lo
        FROM lineitem
        WHERE l_orderkey < 3000
    """,
    doc="Math suite: rounding family, abs, sqrt/ln/log10/pow (rounded — "
    "libm last-ulp differences), sign, greatest/least.",
)
def q53_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_tax", F.lit(0.04)).alias("tax_lo"),
    )


@register(
    "q54_array_funcs",
    oracle="""
        SELECT
            doc_id,
            len(string_split(text, ' ')) AS n_tokens,
            list_contains(string_split(text, ' '), 'spark') AS has_spark,
            array_to_string(list_sort(string_split(text, ' '))[1:5], ',') AS first5_sorted,
            array_to_string(list_sort(list_distinct(string_split(lang, ''))), ',') AS lang_chars,
            len(list_filter(string_split(text, ' '), t -> length(t) > 6)) AS n_long_tokens,
            CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_token_len
        FROM documents
        WHERE doc_id < 300
    """,
    doc="Array + higher-order functions over tokenized text: size, "
    "contains, sort+slice, distinct chars, lambda filter, "
    "transform+aggregate (all JVM-side HOFs, no UDFs).",
)
def q54_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(F.array_sort(toks), 1, 5), ",").alias("first5_sorted"),
        F.array_join(F.array_sort(F.array_distinct(F.split("lang", ""))), ",").alias(
            "lang_chars"
        ),
        F.size(F.filter(toks, lambda t: F.length(t) > 6)).cast("long").alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_token_len"),
    )


@register(
    "q55_json_funcs",
    oracle="""
        SELECT
            event_id,
            CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k_get,
            CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k_from,
            regexp_matches(props, '"k"') AS has_k
        FROM events
    """,
    doc="JSON extraction from events.props ({\"k\": int}): "
    "get_json_object path and from_json struct field (schema'd parse). "
    "Oracle uses regex equivalence to avoid DuckDB JSON-extension "
    "dependence.",
)
def q55_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_get"),
        F.from_json("props", "k INT").getField("k").alias("k_from"),
        F.col("props").contains('"k"').alias("has_k"),
    )


@register(
    "q56_hash_funcs",
    oracle="""
        SELECT
            doc_id,
            md5(text) AS text_md5,
            sha256(lang) AS lang_sha256,
            md5(concat(lang, '|', source)) AS combo_md5
        FROM documents
        WHERE doc_id < 200
    """,
    doc="Cryptographic hash parity: md5 / sha2-256 produce identical "
    "lowercase hex on both engines (dedup fingerprint primitives).",
)
def q56_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("lang", 256).alias("lang_sha256"),
        F.md5(F.concat_ws("|", "lang", "source")).alias("combo_md5"),
    )


@register(
    "q55b_map_funcs",
    oracle="""
        SELECT
            event_id,
            'k' AS first_key,
            CAST(regexp_extract(props, '(\\d+)', 1) AS INT) AS first_val,
            1 AS n_entries,
            concat('{"k":', regexp_extract(props, '(\\d+)', 1), '}') AS rebuilt_json
        FROM events
        WHERE event_id < 3000
    """,
    doc="Map-typed surface: from_json to map<string,int>, map_keys/"
    "map_values/size, and to_json(struct) rebuild.  Oracle mirrors via "
    "regex on the fixed {\"k\": int} shape (no DuckDB JSON-extension "
    "dependence).",
)
def q55b_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(F.map_values(m), 1).alias("first_val"),
        F.size(m).alias("n_entries"),
        F.to_json(F.from_json("props", "k INT")).alias("rebuilt_json"),
    )


@register(
    "q56b_fast_hashes",
    oracle=None,  # xxhash64 / Murmur3 / crc32 values are engine-specific
    # — rows-only; md5/sha256 carry the hash-verified parity (q56).
    doc="Non-cryptographic hash family for shuffle/bucket keys: "
    "xxhash64, Murmur3 (F.hash), crc32 — the cheap partitioners used "
    "for salting and band bucketing at scale.",
)
def q56b_fast_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("xx64"),
        F.hash("text").alias("murmur3"),
        F.crc32(F.encode("text", "UTF-8")).alias("crc"),
        (F.pmod(F.xxhash64("text"), F.lit(64))).alias("salt_bucket"),
    )


@register(
    "q57_explode_tokens",
    oracle="""
        SELECT word, count(*) AS n
        FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        )
        WHERE length(word) > 3
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 20
    """,
    doc="explode (generator/UDTF surface) → token frequency top-20 with "
    "word tiebreak.  At scale: explode fuses into the scan stage; the "
    "groupBy shuffles only (word, partial-count) pairs.",
)
def q57_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 3)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@register(
    "q58_posexplode",
    oracle="""
        SELECT
            doc_id,
            generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
            unnest(string_split(text, ' ')) AS token
        FROM documents
        WHERE doc_id < 50
    """,
    doc="posexplode: position-preserving flatten (0-based to match Spark).",
)
def q58_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "token"
    )


@register(
    "q55d_variant_type",
    oracle="""
        SELECT
            event_id,
            CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k_variant,
            CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) IS NOT NULL
                AS k_present,
            'OBJECT<k: BIGINT>' AS variant_schema
        FROM events
        WHERE event_id < 4000
    """,
    doc="Spark 4 VariantType surface: parse_json into an open-schema "
    "variant column, typed extraction via variant_get(path, type), "
    "presence probe via try_variant_get IS NOT NULL, and "
    "schema_of_variant.  Variant is the shredded semi-structured "
    "storage path (binary-encoded, no per-row re-parse downstream); "
    "at 100 TB this replaces N regex/from_json passes with one parse.  "
    "Oracle mirrors the fixed {\"k\": int} shape via regex.",
)
def q55d_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    v = e.select("event_id", F.parse_json("props").alias("pv"))
    return v.select(
        "event_id",
        F.variant_get("pv", "$.k", "int").alias("k_variant"),
        F.try_variant_get("pv", "$.k", "bigint").isNotNull().alias("k_present"),
        F.schema_of_variant(F.col("pv")).alias("variant_schema"),
    )


@register(
    "q53b_try_arithmetic",
    oracle="""
        SELECT
            c_custkey,
            try_cast(c_mktsegment AS INTEGER) AS seg_as_int,
            try_cast(substr(c_name, 10, 9) AS BIGINT) AS name_serial,
            round(c_acctbal / nullif(c_custkey % 3, 0), 4) AS per_bucket_bal
        FROM customer
    """,
    doc="Error-tolerant expression surface under ANSI mode (Spark 4 "
    "defaults spark.sql.ansi.enabled=true, where bad casts and division "
    "by zero THROW mid-job): try_cast returns NULL for the unparseable "
    "segment string while parsing the numeric tail of c_name, and "
    "try_divide nulls the rows whose modulo denominator is 0.  At "
    "100 TB this is the difference between a 6-hour job dying at row "
    "9×10¹¹ on one malformed record and a NULL the quality audit "
    "(qd03) counts; the DuckDB oracle mirrors with try_cast + "
    "nullif-guarded division.",
)
def q53b_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.try_to_number(F.col("c_mktsegment"), F.lit("999999")).cast("int").alias(
            "seg_as_int"
        ),
        F.expr("try_cast(substr(c_name, 10, 9) AS BIGINT)").alias("name_serial"),
        F.round(
            F.try_divide(F.col("c_acctbal"), F.col("c_custkey") % 3), 4
        ).alias("per_bucket_bal"),
    )


@register(
    "q50c_collation",
    oracle="""
        SELECT lower(o_orderpriority) AS priority_ci,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM (
            SELECT CASE WHEN o_orderkey % 3 = 0 THEN upper(o_orderpriority)
                        ELSE o_orderpriority END AS o_orderpriority,
                   o_orderkey, o_totalprice
            FROM orders
        )
        GROUP BY lower(o_orderpriority)
    """,
    doc="Collation-aware grouping (Spark 4 COLLATE UTF8_LCASE): group a "
    "deliberately case-mixed key (every 3rd order upper-cased) under a "
    "case-insensitive collation — the engine-level answer to messy "
    "real-world categorical columns, replacing scattered lower() calls "
    "at every use site.  The collated comparison happens inside the "
    "hash-agg operator itself (hash of the collation key), so partial "
    "aggregation and shuffle shape are identical to a binary-collation "
    "group-by.  The output key is normalized with lower() only to give "
    "a deterministic display form; the GROUPING uses the collation.  "
    "Oracle: DuckDB lower()-keyed grouping (same equivalence classes "
    "for ASCII data).",
)
def q50c_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mixed = o.select(
        F.when(F.col("o_orderkey") % 3 == 0, F.upper("o_orderpriority"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_totalprice",
    )
    ci = F.collate(F.col("o_orderpriority"), "UTF8_LCASE")
    return (
        mixed.groupBy(ci.alias("priority_key"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.lower(F.col("priority_key")).alias("priority_ci"),
            "n_orders",
            "total",
        )
    )


@register(
    "q57b_explode_outer",
    oracle=f"""
        WITH g AS (
            SELECT doc_id,
                   CASE WHEN len(string_split(text, ' ')) >= 40
                        THEN string_split(text, ' ')[1:3]
                        ELSE [] END AS toks
            FROM documents
        )
        SELECT doc_id, u.tok
        FROM g LEFT JOIN LATERAL UNNEST(g.toks) AS u(tok) ON true
    """,
    doc="explode_outer null semantics: rows whose generator input is "
    "EMPTY survive with a NULL element instead of vanishing — the "
    "difference between an inner and outer lateral.  Short docs (< 40 "
    "tokens) get an empty token slice here; plain explode() would "
    "silently drop those documents from any per-token pipeline, the "
    "classic row-loss bug in chunking/shingling flows (a doc with no "
    "chunks must still be accounted for downstream).  Oracle: DuckDB "
    "LEFT JOIN LATERAL UNNEST.  Map-side generator, zero shuffles.",
)
def q57b_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.when(
        F.size(F.split("text", " ")) >= 40, F.slice(F.split("text", " "), 1, 3)
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode_outer(toks).alias("tok"))


@register(
    "q54b_hof_extended",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        )
        SELECT doc_id,
               CAST(len(list_filter(w, x -> length(x) > 5)) > 0 AS INT)
                   AS has_long_token,
               CAST(len(list_filter(w, x -> length(x) >= 1)) = len(w) AS INT)
                   AS all_nonempty,
               CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
                   AS total_chars,
               round(list_reduce(list_transform(w, x -> length(x) * 1.0),
                                 (acc, x) -> acc + x)
                     / len(w), 4) AS mean_len_via_reduce
        FROM t
    """,
    doc="Extended higher-order-function family: exists() (any-match), "
    "forall() (all-match), aggregate/reduce with a seed, and "
    "transform-then-sum — the lambda vocabulary that keeps per-row "
    "collection logic inside codegen where a row-Python UDF would "
    "drop out of it.  exists/forall short-circuit per row; the "
    "reduce is a strict sequential fold in BOTH engines (same "
    "left-to-right order), so the double sum needs no rounding "
    "gymnastics beyond the 4-dp wire.  All map-side, zero shuffles.",
)
def q54b_hof_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    return d.select(
        "doc_id",
        F.exists(w, lambda x: F.length(x) > 5).cast("int").alias("has_long_token"),
        F.forall(w, lambda x: F.length(x) >= 1).cast("int").alias("all_nonempty"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.round(
            F.aggregate(
                F.transform(w, lambda x: F.length(x) * 1.0),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(w),
            4,
        ).alias("mean_len_via_reduce"),
    )


@register(
    "q53c_bitwise_family",
    oracle="""
        SELECT o_orderpriority,
               bit_and(o_orderkey % 256) AS k_and,
               bit_or(o_orderkey % 256) AS k_or,
               bit_xor(o_orderkey % 256) AS k_xor,
               CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS total_bits,
               CAST(max((o_orderkey % 1024) << 2) AS BIGINT) AS max_shifted
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Bitwise expression + aggregate family: &-fold / |-fold / "
    "^-fold aggregates (bit_and/bit_or/bit_xor — the flag-intersection "
    "/ union / parity reducers used on permission masks and feature "
    "bitmaps), popcount (bit_count — the Hamming primitive mm05 and "
    "qc17's bitmaps build on), and shifts, all over integer keys.  "
    "Whole-stage-codegen'd single-agg scan; two's-complement semantics "
    "match DuckDB exactly so the fold results hash-verify.",
)
def q53c_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    low = F.col("o_orderkey") % 256
    return o.groupBy("o_orderpriority").agg(
        F.bit_and(low).alias("k_and"),
        F.bit_or(low).alias("k_or"),
        F.bit_xor(low).alias("k_xor"),
        F.sum(F.bit_count("o_orderkey")).cast("long").alias("total_bits"),
        F.max(F.shiftleft(F.col("o_orderkey") % 1024, 2)).cast("long").alias(
            "max_shifted"
        ),
    )


@register(
    "q56c_content_addressed_ids",
    oracle="""
        WITH h AS (
            SELECT doc_id, md5('doc:' || CAST(n_chars AS VARCHAR)
                               || ':' || text) AS hx
            FROM documents
        )
        SELECT doc_id,
               substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-'
               || substr(hx, 13, 4) || '-' || substr(hx, 17, 4) || '-'
               || substr(hx, 21, 12) AS content_uuid,
               substr(hx, 1, 2) AS shard
        FROM h
    """,
    doc="Content-addressed ID minting: a namespaced digest "
    "(md5 over 'doc:' || length || ':' || text — the length prefix "
    "prevents concat ambiguity between fields) formatted as a UUID "
    "and a 2-hex-char shard key — the stable, RNG-free identifier "
    "scheme a 100 TB pipeline needs so re-crawls, retries, and "
    "re-partitions mint the SAME id for the same content (uuid4 or "
    "monotonically_increasing_id are both partitioning-dependent "
    "poison for reproducible lineage).  Pure codegen expression; "
    "shard = first digest byte gives 256-way uniform layout.",
)
def q56c_content_addressed_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(
        F.concat(
            F.lit("doc:"), F.col("n_chars").cast("string"), F.lit(":"), F.col("text")
        )
    )
    h = d.select("doc_id", hx.alias("hx"))
    uuid_fmt = F.concat_ws(
        "-",
        F.substring("hx", 1, 8),
        F.substring("hx", 9, 4),
        F.substring("hx", 13, 4),
        F.substring("hx", 17, 4),
        F.substring("hx", 21, 12),
    )
    return h.select(
        "doc_id",
        uuid_fmt.alias("content_uuid"),
        F.substring("hx", 1, 2).alias("shard"),
    )


@register(
    "q55e_variant_explode",
    oracle="""
        SELECT event_id,
               0 AS pos,
               'k' AS key,
               CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)
                   AS value_long
        FROM events
        WHERE event_id < 3000
    """,
    doc="Spark 4 variant_explode table function: a variant OBJECT "
    "lateral-exploded into (pos, key, value) rows — the generic "
    "walk-an-open-schema primitive that q55d's typed variant_get "
    "cannot express when field names are unknown at query time "
    "(telemetry payloads, A/B config blobs).  Values come back as "
    "VARIANT and are typed at the edge (cast to BIGINT here).  The "
    "fixture props are the fixed {\"k\": int} shape, so the oracle "
    "mirrors by regex; production payloads just produce more rows "
    "per record — same lateral plan.  Scale: parse once into "
    "variant, explode map-side; no shuffle until whatever aggregates "
    "the pairs.",
)
def q55e_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    v = e.select("event_id", F.parse_json("props").alias("vp"))
    v.createOrReplaceTempView("q55e_variants")
    return v.sparkSession.sql(
        """
        SELECT event_id, t.pos, t.key,
               cast(t.value AS BIGINT) AS value_long
        FROM q55e_variants,
             LATERAL variant_explode(vp) AS t(pos, key, value)
        """
    )


@register(
    "q53d_decimal_exact_money",
    oracle="""
        WITH dec AS (
            SELECT l_returnflag,
                   CAST(l_extendedprice AS DECIMAL(12, 2)) AS price,
                   CAST(l_discount AS DECIMAL(4, 2)) AS disc,
                   CAST(l_tax AS DECIMAL(4, 2)) AS tax
            FROM lineitem
        ),
        line AS (
            SELECT l_returnflag, price,
                   CAST(price * (CAST(1.00 AS DECIMAL(4, 2)) - disc)
                        AS DECIMAL(18, 4)) AS net,
                   tax
            FROM dec
        )
        SELECT l_returnflag,
               CAST(sum(price) AS DOUBLE) AS gross,
               CAST(sum(net) AS DOUBLE) AS net,
               CAST(sum(CAST(net * (CAST(1.00 AS DECIMAL(4, 2)) + tax)
                             AS DECIMAL(24, 6))) AS DOUBLE) AS charged,
               count(*) AS n_lines
        FROM line GROUP BY l_returnflag
    """,
    doc="EXACT DECIMAL money arithmetic — the fixed-point path every "
    "financial aggregation should run on instead of IEEE doubles: "
    "prices/discounts/taxes cast to DECIMAL(18,2) at the scan, the "
    "TPC-H Q1 net and charged amounts computed with explicit "
    "precision/scale management (product scale grows 2+2->4, then "
    "->6; both engines' decimal multiplication is exact integer "
    "arithmetic underneath, so SUM order cannot matter — the entire "
    "round-guard machinery the double-based queries need simply "
    "disappears).  The wire casts the exact totals to DOUBLE only at "
    "the very end (one exact->nearest conversion, identical in both "
    "engines).  Scale: decimals are fixed-width longs in Tungsten "
    "rows (Decimal(28,6) = 16 bytes) — hash-agg speed is comparable "
    "to double and the partial aggregation stays mergeable.",
)
def q53d_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    one = F.lit("1.00").cast("decimal(4,2)")
    net = (price * (one - disc)).cast("decimal(18,4)")
    charged = (net * (one + tax)).cast("decimal(24,6)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("double").alias("gross"),
        F.sum(net).cast("double").alias("net"),
        F.sum(charged).cast("double").alias("charged"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q55f_json_codec_roundtrip",
    oracle="""
        SELECT o_orderkey,
               o_orderstatus AS rt_status,
               o_totalprice AS rt_price,
               o_orderpriority AS rt_priority
        FROM orders
    """,
    doc="JSON ENCODE/DECODE roundtrip losslessness: each order row is "
    "packed into a JSON document (to_json over a struct), parsed back "
    "with an explicit schema (from_json), and the extracted fields "
    "must hash-match the ORIGINAL columns — the oracle never touches "
    "JSON, so the parity proves Spark's codec is bit-lossless for "
    "strings AND doubles (to_json emits the shortest "
    "round-trippable double representation; from_json restores the "
    "identical IEEE value — the property event-bus producers rely on "
    "without checking).  Scale: map-side expression pair, "
    "whole-stage codegen, no UDF; the real lesson is the NEGATIVE "
    "space — anything not exercised here (timestamps with zone, "
    "NaN) needs its own pin before a JSON hop.",
)
def q55f_json_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    js = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("s"),
            F.col("o_totalprice").alias("p"),
            F.col("o_orderpriority").alias("pr"),
        )
    )
    schema = "s string, p double, pr string"
    parsed = F.from_json(js, schema)
    return o.select(
        "o_orderkey",
        parsed["s"].alias("rt_status"),
        parsed["p"].alias("rt_price"),
        parsed["pr"].alias("rt_priority"),
    )


@register(
    "q52c_weekday_profile",
    oracle="""
        SELECT dow + 1 AS day_idx,
               CASE dow WHEN 0 THEN 'Sun' WHEN 1 THEN 'Mon' WHEN 2 THEN 'Tue'
                        WHEN 3 THEN 'Wed' WHEN 4 THEN 'Thu' WHEN 5 THEN 'Fri'
                        ELSE 'Sat' END AS day_name,
               CAST(count(*) AS BIGINT) AS n_orders,
               dow IN (0, 6) AS is_weekend,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS day_cents
        FROM (SELECT CAST(dayofweek(CAST(o_orderdate AS TIMESTAMP)) AS INT)
                         AS dow,
                     o_totalprice
              FROM orders)
        GROUP BY dow
    """,
    doc="WEEKDAY profile — and deliberately a DIALECT-TRAP pin: Spark's "
    "dayofweek() is 1=Sunday..7=Saturday while DuckDB's dayofweek() is "
    "0=Sunday..6=Saturday, the off-by-one that silently shifts every "
    "weekend metric when a query migrates engines.  Both sides "
    "normalize to the SAME 1-based index and derive day names from an "
    "explicit CASE ladder (never locale-dependent date_format "
    "patterns), so the parity proves the normalization, and the "
    "weekend flag + exact-cents revenue ride along as the business "
    "readout.  Scale: map-side extraction + a 7-row agg.",
)
def q52c_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # Spark: 1=Sun..7=Sat already — the shared wire format.
    idx = F.dayofweek(F.col("o_orderdate").cast("timestamp"))
    name = (
        F.when(idx == 1, "Sun")
        .when(idx == 2, "Mon")
        .when(idx == 3, "Tue")
        .when(idx == 4, "Wed")
        .when(idx == 5, "Thu")
        .when(idx == 6, "Fri")
        .otherwise("Sat")
    )
    return (
        o.select(
            idx.alias("day_idx"),
            name.alias("day_name"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("day_idx", "day_name")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.col("day_idx").isin(1, 7).alias("is_weekend"),
            F.sum("cents").cast("long").alias("day_cents"),
        )
        .select("day_idx", "day_name", "n_orders", "is_weekend", "day_cents")
    )


@register(
    "q53f_url_functions",
    oracle="""
        WITH urls AS (
            SELECT 'https://' || source || '.example.com/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url,
                   doc_id
            FROM documents
        ),
        parsed AS (
            SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
                   regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1)
                       AS path,
                   regexp_extract(url, 'lang=([a-z]+)', 1) AS qlang,
                   doc_id
            FROM urls
        )
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT qlang) AS BIGINT) AS n_langs,
               max(path) AS max_path
        FROM parsed
        GROUP BY host
    """,
    doc="URL decomposition function family — the crawl-pipeline scalar "
    "surface (domain grouping for dedup/capping, path/query analysis "
    "for boilerplate detection): URLs are minted deterministically "
    "from fixture columns, then Spark parses with the NATIVE "
    "parse_url(url, HOST/PATH/QUERY) expression (codegen, JVM-side) "
    "while the oracle re-derives the identical parts with regexes — "
    "pinning that parse_url's component semantics match the "
    "rfc-3986-ish expectations a curation pipeline codes against.  "
    "Per-host rollup: url count, distinct query langs, lexicographic "
    "max path.  Scale: pure map-side expressions into one hash agg; "
    "domain extraction at 100 TB is exactly this shape (and the "
    "capping screen qc48 consumes its output key).",
)
def q53f_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
    ).select(
        "host",
        "path",
        F.regexp_extract("query", "lang=([a-z]+)", 1).alias("qlang"),
    )
    return parsed.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.count_distinct("qlang").cast("long").alias("n_langs"),
        F.max("path").alias("max_path"),
    )


@register(
    "q52d_business_days",
    oracle="""
        WITH per_order AS (
            SELECT o.o_orderkey,
                   CAST(date_diff('day', CAST(o.o_orderdate AS TIMESTAMP),
                                  s.last_ship) AS BIGINT) AS n,
                   CAST((dayofweek(CAST(o.o_orderdate AS TIMESTAMP)) + 6) % 7
                        AS BIGINT) AS dow0
            FROM orders o
            JOIN (SELECT l_orderkey,
                         max(CAST(l_shipdate AS TIMESTAMP)) AS last_ship
                  FROM lineitem GROUP BY l_orderkey) s
              ON s.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
              AND s.last_ship >= CAST(o.o_orderdate AS TIMESTAMP)
        ),
        biz AS (
            SELECT 5 * (n // 7) + (n % 7)
                   - (CASE WHEN ((5 - dow0 + 6) % 7) + 1 <= n % 7
                      THEN 1 ELSE 0 END)
                   - (CASE WHEN ((6 - dow0 + 6) % 7) + 1 <= n % 7
                      THEN 1 ELSE 0 END) AS bdays
            FROM per_order
        )
        SELECT CAST(bdays AS BIGINT) AS business_days,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM biz GROUP BY bdays
    """,
    doc="BUSINESS-DAY SLA distribution: weekday count between order "
    "placement (exclusive) and final shipment (inclusive) for urgent "
    "orders, as a histogram — the NETWORKDAYS-style calendar "
    "arithmetic every ops SLA dashboard needs and no SQL engine "
    "ships natively.  CLOSED FORM, no calendar spine and no explode: "
    "full weeks contribute 5 each (5*(n/7) in integer division), and "
    "the n%7 remainder days drop a Saturday/Sunday exactly when the "
    "first weekend offset from the start weekday lands inside the "
    "remainder — a pure modular-arithmetic CASE, identical integer "
    "ops in both engines.  Weekday normalization re-uses q52c's "
    "dialect pin (Spark dayofweek 1=Sun vs DuckDB 0=Sun both mapped "
    "to 0=Monday).  Scale: one fact-side groupBy(orderkey) max + a "
    "broadcast-or-shuffle equi-join with orders (rows where the "
    "synthetic fixture ships before placement are excluded — the gap "
    "must be non-negative for the modular form), then map-side "
    "arithmetic into a ~tens-of-rows histogram agg.",
)
def q52d_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    last_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    per = o.join(
        last_ship, o["o_orderkey"] == last_ship["l_orderkey"]
    ).filter(F.col("last_ship") >= F.col("o_orderdate")).select(
        F.datediff(F.to_date("last_ship"), F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("n"),
        # Spark dayofweek: 1=Sun..7=Sat -> 0=Mon..6=Sun
        ((F.dayofweek("o_orderdate") + 5) % 7).cast("bigint").alias("dow0"),
    )
    n, dow0 = F.col("n"), F.col("dow0")
    rem = n % 7
    hits = sum(
        F.when(((F.lit(off) - dow0 + 6) % 7) + 1 <= rem, 1).otherwise(0)
        for off in (5, 6)
    )
    bdays = 5 * F.floor(n / 7).cast("bigint") + rem - hits
    return (
        per.select(bdays.cast("bigint").alias("business_days"))
        .groupBy("business_days")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


@register(
    "q53g_rounding_modes",
    oracle="""
        WITH c AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem
        )
        SELECT CAST(cents % 10 AS BIGINT) AS last_digit,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents // 10
                        + CASE WHEN cents % 10 >= 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS half_up_tenths,
               CAST(sum(cents // 10
                        + CASE WHEN cents % 10 > 5
                               OR (cents % 10 = 5 AND (cents // 10) % 2 = 1)
                          THEN 1 ELSE 0 END)
                    AS BIGINT) AS half_even_tenths
        FROM c GROUP BY cents % 10
    """,
    doc="ROUNDING-MODE dialect pin: Spark's round() is HALF_UP and "
    "bround() is HALF_EVEN (banker's) — on money columns the two "
    "diverge on every exact .x5 boundary, a classic silent "
    "reconciliation bug when pipelines mix engines (DuckDB/Python "
    "round half-to-even, Java/SQL-standard round half-up).  The "
    "engine rounds exact DECIMAL(12,2) prices to one decimal with "
    "BOTH modes and aggregates the results in integer TENTHS per "
    "last-cent-digit bucket, so the .x5 buckets (digit 5) expose the "
    "mode split while every other bucket proves the modes agree.  "
    "The oracle never calls a rounding function at all: it "
    "re-derives both modes from pure integer arithmetic on cents "
    "(floor-divide + carry CASE), verifying Spark's decimal rounding "
    "against the arithmetic DEFINITION rather than another engine's "
    "dialect.  Scale: map-side decimal math into a 10-row agg.",
)
def q53g_rounding_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("decimal(12,2)")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    rounded = li.select(
        (cents % 10).alias("last_digit"),
        F.round(x, 1).alias("up1"),
        F.bround(x, 1).alias("even1"),
    )
    return rounded.groupBy("last_digit").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.sum(F.col("up1") * 10))
        .cast("bigint")
        .alias("half_up_tenths"),
        F.round(F.sum(F.col("even1") * 10))
        .cast("bigint")
        .alias("half_even_tenths"),
    )


@register(
    "q55g_map_hofs",
    oracle="""
        WITH per AS (
            SELECT l_orderkey, l_returnflag,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            WHERE l_orderkey < 400
            GROUP BY l_orderkey, l_returnflag
        )
        SELECT l_orderkey, l_returnflag AS flag,
               cents + cents // 10 AS uplifted_cents,
               (cents + cents // 10) * n AS weighted
        FROM per
        WHERE cents >= 1000
    """,
    doc="MAP higher-order functions — the Spark map-column vocabulary "
    "(map_from_entries, transform_values, map_filter, map_zip_with, "
    "explode of a map) exercised end-to-end: per order, line revenue "
    "aggregates into a returnflag->cents MAP, transform_values "
    "applies a 10% integer uplift, map_filter drops sub-10-dollar "
    "flags, map_zip_with multiplies against a parallel "
    "flag->linecount map, and the result explodes back to rows.  "
    "The ORACLE never touches a map type: the same numbers fall out "
    "of plain grouped arithmetic, proving the map pipeline is a "
    "faithful (if differently-shaped) encoding of relational "
    "semantics — maps earn their keep at scale as a way to carry "
    "SPARSE per-key state in one row (no pivot, no N columns).  "
    "Integer cents keep every value exact.  Scale: one groupBy plus "
    "map-side array ops; map entries per order are bounded by the "
    "3-value flag domain.",
)
def q55g_map_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    per = li.groupBy("l_orderkey", "l_returnflag").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "cents"
        ),
        F.count("*").alias("n"),
    )
    maps = per.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("l_returnflag", "cents")))
        ).alias("cents_map"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("l_returnflag", "n")))
        ).alias("count_map"),
    )
    transformed = maps.select(
        "l_orderkey",
        F.map_filter(
            F.transform_values(
                "cents_map", lambda k, v: v + (v / 10).cast("bigint")
            ),
            lambda k, v: v >= 1100,
        ).alias("uplifted"),
        "count_map",
    ).select(
        "l_orderkey",
        "uplifted",
        F.map_zip_with(
            "uplifted", "count_map", lambda k, v1, v2: v1 * v2
        ).alias("weighted_map"),
    )
    exploded = transformed.select(
        "l_orderkey",
        F.explode("uplifted").alias("flag", "uplifted_cents"),
        F.col("weighted_map"),
    )
    return exploded.select(
        "l_orderkey",
        "flag",
        "uplifted_cents",
        F.col("weighted_map")[F.col("flag")].alias("weighted"),
    ).filter(F.col("weighted").isNotNull())


@register(
    "q57c_inline_stack_generators",
    oracle="""
        WITH per AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_custkey < 100
        )
        SELECT o_orderkey, metric, val FROM (
            SELECT o_orderkey, 'gross' AS metric, cents AS val FROM per
            UNION ALL
            SELECT o_orderkey, 'net', cents - cents // 10 FROM per
            UNION ALL
            SELECT o_orderkey, 'tax', cents // 10 FROM per
        )
    """,
    doc="Generator-function vocabulary completion: STACK(n, ...) (the "
    "n-way row constructor Spark uses for wide-to-long unpivots — "
    "q29's unpivot twin at expression level) and INLINE(array<struct>) "
    "(struct-array explosion without the intermediate posexplode+"
    "getField dance) produce the same long-format metric rows; the "
    "query builds gross/net/tax rows per order with stack, "
    "re-derives them with inline over an array<struct> literal, and "
    "INTERSECTs the two — emitting rows at all (and hash-matching "
    "the plain UNION ALL oracle) proves both generators agree with "
    "relational semantics.  Scale: generators are map-side (one "
    "Generate node each, no shuffle); the 3x row expansion is the "
    "unpivot cost everywhere.",
)
def q57c_inline_stack_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    per = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    per.createOrReplaceTempView("q57c_per")
    stacked = per.selectExpr(
        "o_orderkey",
        "stack(3, 'gross', cents,"
        " 'net', cents - CAST(cents / 10 AS BIGINT),"
        " 'tax', CAST(cents / 10 AS BIGINT)) AS (metric, val)",
    )
    inlined = per.selectExpr(
        "o_orderkey",
        "inline(array("
        " named_struct('metric', 'gross', 'val', cents),"
        " named_struct('metric', 'net',"
        "   'val', cents - CAST(cents / 10 AS BIGINT)),"
        " named_struct('metric', 'tax', 'val',"
        "   CAST(cents / 10 AS BIGINT))))",
    )
    return stacked.intersect(inlined)


@register(
    "q54c_array_set_ops",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM documents
            WHERE doc_id < 300
        )
        SELECT doc_id,
               CAST(len(list_intersect(t,
                   ['the', 'and', 'data', 'model', 'spark'])) AS BIGINT)
                   AS n_shared,
               CAST(len(list_filter(
                   list_distinct(['the', 'and', 'data', 'model', 'spark']),
                   k -> NOT list_contains(t, k))) AS BIGINT) AS n_missing_kw,
               CAST(len(list_distinct(list_concat(t,
                   ['the', 'and', 'data', 'model', 'spark']))) AS BIGINT)
                   AS n_union,
               CAST(list_position(t, 'the') AS BIGINT) AS first_the_pos,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tok
        FROM toks
    """,
    doc="Array SET operations — the vocabulary q54/q54b leave out: "
    "array_intersect / array_except / array_union (all three dedup "
    "their result, pinned here against DuckDB's list_intersect / "
    "filtered list_distinct / distinct-concat equivalents so the "
    "dedup convention is hash-verified, not assumed), array_position "
    "(1-based, 0 when absent in BOTH engines — the off-by-one trap "
    "this query exists to pin), and array_distinct.  The keyword "
    "probe list is a 5-element literal, so every set op is "
    "element-local: no shuffle, fully codegen'd, and at 100 TB these "
    "run map-side inside whatever scan already reads the text "
    "column.",
)
def q54c_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    kw = F.array(*[F.lit(k) for k in ["the", "and", "data", "model", "spark"]])
    toks = d.filter(F.col("doc_id") < 300).select(
        "doc_id", F.split("text", " ").alias("t")
    )
    return toks.select(
        "doc_id",
        F.size(F.array_intersect("t", kw)).cast("bigint").alias("n_shared"),
        F.size(F.array_except(kw, F.col("t"))).cast("bigint").alias(
            "n_missing_kw"
        ),
        F.size(F.array_union("t", kw)).cast("bigint").alias("n_union"),
        F.array_position("t", "the").cast("bigint").alias("first_the_pos"),
        F.size(F.array_distinct("t")).cast("bigint").alias("n_distinct_tok"),
    )


@register(
    "q55h_struct_field_surgery",
    oracle="""
        SELECT o_orderkey,
               '{"status":"' || lower(o_orderstatus) || '","price_cents":'
                   || CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                           AS VARCHAR)
                   || '}' AS payload
        FROM orders
    """,
    doc="NESTED-STRUCT FIELD SURGERY (withField / dropFields, Spark "
    "3.1+) — the API that mutates one field inside a deep struct "
    "without exploding and rebuilding the whole column (on a 300-"
    "field event struct the rebuild is the bug factory; withField is "
    "the O(1)-to-write, codegen'd path).  The struct gets an "
    "OVERWRITE (status -> lower(status), in place, original "
    "position), an APPEND (price_cents, new field at the end), and "
    "two DROPS (the raw price and priority) — and the PROOF is "
    "to_json of the result: the JSON text exposes exactly which "
    "fields remain, their order (overwrite keeps position, append "
    "goes last), and their values, so the oracle can assemble the "
    "same string by hand and the hash match pins the full mutation "
    "semantics.  Scale: map-side expression, whole-stage codegen, "
    "no shuffle.",
)
def q55h_struct_field_surgery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("price"),
    )
    mutated = (
        base.withField("status", F.lower(F.col("o_orderstatus")))
        .withField(
            "price_cents",
            F.round(F.col("o_totalprice") * 100).cast("bigint"),
        )
        .dropFields("prio", "price")
    )
    return o.select(
        "o_orderkey", F.to_json(mutated).alias("payload")
    )

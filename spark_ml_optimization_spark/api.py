"""User-facing operator API: generic DataFrame-in → DataFrame-out
functions, independent of the fixture tables.

The registry queries (driver contract) are thin bindings of these onto
the fixture schema; a user brings any DataFrame with the right columns.
Every function returns a lazy DataFrame and follows the engine's scale
rules (SCALE.md): no collect, broadcast where bounded, Python only in
Arrow-batched kernels.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .functions.vector import dot, to_double_array

# ---------------------------------------------------------------- dedup


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one deterministic survivor (min id) per exact text value."""
    w = W.partitionBy(F.md5(text_col)).orderBy(F.col(id_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct text: digest, canonical id, multiplicity."""
    return df.groupBy(F.md5(text_col).alias("text_md5")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def shingles(text_col: str | Column, n: int = 3, sep: str = " ") -> Column:
    """Distinct word n-gram shingle array built with pure HOFs.

    Guarded for short texts: with fewer than n tokens,
    sequence(1, size-n+1) would DESCEND through 0 (Spark defaults the
    step to -1 when start > stop) and element_at(toks, 0) throws at
    runtime — such rows yield an empty array instead (same contract as
    word_grams below; adversarial-fixture finding).

    The token array is BOUND as a lambda variable via a 1-element
    transform (optimization round 10): HOF lambdas are interpreted
    without common-subexpression elimination, so inlining the split()
    subtree into every element_at re-tokenized the text once per gram
    term — binding evaluates split() once per row (measured 1.7x on
    the sf0.1 shingle explode; byte-identical output)."""

    def _build(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.concat_ws(
                        "_", *[F.element_at(toks, i + j) for j in range(n)]
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(
        F.transform(F.array(F.split(text_col, sep)), _build), 1
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Banded-MinHash near-duplicate candidate pairs (pure DataFrame ops).

    Returns (doc_a, doc_b, est_jaccard).  Cost O(rows·bands) candidates;
    P(candidate) = 1-(1-J^rows_per_band)^bands.
    """
    rows_per_band = num_hashes // bands
    sh = df.select(F.col(id_col).alias("__id"), F.explode(shingles(text_col, shingle_n)).alias("__sh"))
    sig = (
        sh.groupBy("__id")
        .agg(*[F.min(F.xxhash64("__sh", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)])
        .select("__id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
            ).alias("band_sig"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "__id", "sig", F.explode(F.array(*band_structs)).alias("bb")
    ).select("__id", "sig", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("doc_a"),
            F.col("b.__id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq))
        / float(num_hashes)
    )
    return cand.select("doc_a", "doc_b", F.round(est, 4).alias("est_jaccard")).filter(
        F.col("est_jaccard") >= min_est_jaccard
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    min_jaccard: float = 0.8,
) -> DataFrame:
    """Exact token-set Jaccard over blocked candidate pairs."""
    tok = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in block_cols],
        F.explode(F.array_distinct(F.split(text_col, " "))).alias("__tok"),
    )
    sizes = tok.groupBy("__id").agg(F.count("*").alias("__n"))
    a, b = tok.alias("a"), tok.alias("b")
    cond = (F.col("a.__tok") == F.col("b.__tok")) & (F.col("a.__id") < F.col("b.__id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.__id").alias("doc_a"), F.col("b.__id").alias("doc_b"))
        .agg(F.count("*").alias("__common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("__common").cast("double") / (F.col("sa.__n") + F.col("sb.__n") - F.col("__common"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.__id"))
        .join(sb, F.col("doc_b") == F.col("sb.__id"))
        .filter(jac >= min_jaccard)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# ------------------------------------------------------------ similarity


def topk_similar(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by dot product against a 1-row query relation with a
    double-array column named 'qvec' (broadcast; no corpus shuffle)."""
    score = dot(to_double_array(vec_col), F.col("qvec"))
    return (
        corpus.crossJoin(F.broadcast(query))
        .select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    probes: DataFrame,
    probe_id_col: str,
    probe_vec_col: str,
    k: int = 3,
) -> DataFrame:
    """Exact k-NN join: broadcast probes × corpus, rank per probe.

    Both sides pre-project their float→double array cast BEFORE the
    join, so each vector is cast once per relation instead of once per
    joined pair (measured 1.4 s → 0.79 s at sf0.1 best-of-3 — the
    round-1 verdict's q86 regression root cause)."""
    corpus_cast = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__cv")
    )
    probes_cast = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        to_double_array(probe_vec_col).alias("__pv"),
    )
    scored = (
        corpus_cast.crossJoin(F.broadcast(probes_cast))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            dot(F.col("__cv"), F.col("__pv")).alias("score"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


# ---------------------------------------------------------------- events


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_micros_col: str,
    order_col: str,
    gap_micros: int,
) -> DataFrame:
    """Gap-and-island session ids (column 'session_id' appended)."""
    w = W.partitionBy(user_col).orderBy(F.col(ts_micros_col).asc(), F.col(order_col).asc())
    flagged = df.withColumn(
        "__new",
        F.when(
            F.lag(ts_micros_col).over(w).isNull()
            | ((F.col(ts_micros_col) - F.lag(ts_micros_col).over(w)) > gap_micros),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("long"),
    ).drop("__new")


def asof_join_latest(
    df: DataFrame,
    user_col: str,
    ts_micros_col: str,
    order_col: str,
    event_flag_col: str,
    value_col: str,
    out_col: str = "last_value",
) -> DataFrame:
    """For rows where event_flag=1, the latest prior (<=) value from
    rows where the value column is non-null — join-free ASOF."""
    w = (
        W.partitionBy(user_col)
        .orderBy(F.col(ts_micros_col).asc(), F.col(event_flag_col).asc(), F.col(order_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


# ------------------------------------------------------------------ text


def quality_signals(df: DataFrame, text_col: str, n_chars_col: str) -> DataFrame:
    """Append n_tokens / avg_token_len / passes_quality columns."""
    toks = F.split(text_col, " ")
    n_tokens = F.size(toks).cast("long")
    avg_len = F.col(n_chars_col).cast("double") / n_tokens
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", F.round(avg_len, 6))
        .withColumn("passes_quality", (n_tokens >= 10) & avg_len.between(3, 12))
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    canon = F.md5(F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " "))))
    return df.withColumn(out_col, canon)


# -------------------------------------------------------------- curation


def word_grams(words: Column, n: int, distinct: bool = False) -> Column:
    """Space-joined word n-grams of a token-array column, built entirely
    from Catalyst HOFs (sequence/transform/slice) — no UDF.

    Rows with fewer than n tokens yield an EMPTY array: without the
    guard, sequence(1, size-n+1) DESCENDS through 0 when size < n and
    slice(w, 0, n) throws INVALID_PARAMETER_VALUE.START at runtime.

    The words expression is BOUND as a lambda variable via a 1-element
    transform (the shingles() rationale: interpreted HOF lambdas have
    no CSE, and callers pass split() expressions that would otherwise
    re-tokenize per gram term).
    """

    def _build(w: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
        if distinct:
            grams = F.array_distinct(grams)
        return F.when(F.size(w) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(words), _build), 1)


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
) -> DataFrame:
    """Drop rows sharing any word n-gram with the benchmark frame.

    The benchmark gram set is distinct'd and broadcast (eval suites are
    KB-MB at any corpus scale); the corpus side stays map-only + one
    id-keyed anti-join — no corpus-vs-corpus join.
    """
    def grams(frame: DataFrame) -> DataFrame:
        g = word_grams(F.split(text_col, " "), n)
        return frame.select(F.col(id_col).alias("__id"), F.explode(g).alias("__g"))

    bench = grams(benchmark).select("__g").distinct()
    contaminated = (
        grams(df).join(F.broadcast(bench), "__g").select("__id").distinct()
    )
    return df.join(
        contaminated.withColumnRenamed("__id", id_col), id_col, "left_anti"
    )


def stratified_sample(df: DataFrame, stratum_col: str, id_col: str, k: int) -> DataFrame:
    """Exactly k rows per stratum, picked by md5(id) rank — deterministic,
    no RNG, one stratum-keyed window shuffle."""
    rk = F.row_number().over(
        W.partitionBy(stratum_col).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    )
    return df.withColumn("__rk", rk).filter(F.col("__rk") <= k).drop("__rk")


def hash_sample(
    df: DataFrame,
    id_col: str,
    buckets_kept: int = 2,
    out_of: int = 16,
    bucket_col: str | None = None,
) -> DataFrame:
    """Keep rows whose md5(id) lands in the first `buckets_kept` of
    `out_of` hex buckets (out_of must be 16) — a zero-shuffle map-side
    predicate, reproducible under any partitioning.  Pass bucket_col to
    also keep the hex bucket digit as a column."""
    assert out_of == 16, "bucketing is by first md5 hex digit"
    # buckets_kept=16 would compare against the two-char string '10',
    # which lexicographically keeps only buckets 0 and 1 — reject it.
    assert 1 <= buckets_kept <= 15, "buckets_kept must be 1..15"
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    if bucket_col is not None:
        return df.withColumn(bucket_col, bucket).filter(
            F.col(bucket_col) < format(buckets_kept, "x")
        )
    return df.filter(bucket < format(buckets_kept, "x"))


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
    out_col: str = "seq_id",
) -> DataFrame:
    """Assign each row a training-sequence id by streaming rows (in
    order_col order, per group) into ~budget-token bins.  Only token
    counts enter the window; at scale pass a (group, shard) composite
    as group_col so packing parallelizes."""
    w = (
        W.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(cum_before / budget).cast("long"))


def repetition_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Append n_tokens / n_distinct / top_freq / rep_ratio / ttr — the
    boilerplate gate (pure HOFs, map-only)."""
    w = F.split(text_col, " ")
    dw = F.array_distinct(w)
    top = F.array_max(F.transform(dw, lambda x: F.size(F.filter(w, lambda y: y == x))))
    n_tokens = F.size(w).cast("long")
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_distinct", F.size(dw).cast("long"))
        .withColumn("top_freq", top.cast("long"))
        .withColumn("rep_ratio", F.round(top.cast("double") / n_tokens, 6))
        .withColumn("ttr", F.round(F.size(dw).cast("double") / n_tokens, 6))
    )


# ----------------------------------------------------------- time series


def gap_fill_ffill(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_cols: Sequence[str],
    fill: float = 0.0,
) -> DataFrame:
    """Densify a per-(key, day) frame to every day in the observed span
    and forward-fill each value column (appended as <col>_ffill).

    The span is a broadcast 1-row aggregate x distinct keys — the spine
    is keys x days, never rows x days; one join + one window pass.
    """
    span = df.agg(F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi"))
    keys = df.select(key_col).distinct()
    spine = keys.crossJoin(F.broadcast(span)).select(
        key_col,
        F.explode(F.sequence("__lo", "__hi", F.expr("interval 1 day"))).alias(day_col),
    )
    out = spine.join(df, [key_col, day_col], "left")
    w = W.partitionBy(key_col).orderBy(day_col).rowsBetween(W.unboundedPreceding, 0)
    for c in value_cols:
        out = out.withColumn(
            f"{c}_ffill",
            F.coalesce(F.last(c, ignorenulls=True).over(w), F.lit(fill)),
        ).withColumn(c, F.coalesce(c, F.lit(fill)))
    return out


def cohort_retention(
    df: DataFrame,
    key_col: str,
    week_col: str,
) -> DataFrame:
    """Cohort users by first-activity week and count them in each later
    activity week (week_offset in weeks), normalized by cohort size.

    Input: one row per (key, week) or finer — duplicates collapse first.
    Three key-keyed aggs reuse one shuffle partitioning; the cohort-size
    dim (weeks) broadcasts.
    """
    e = df.select(key_col, week_col).distinct()
    firsts = e.groupBy(key_col).agg(F.min(week_col).alias("__cohort"))
    sizes = firsts.groupBy("__cohort").agg(F.count("*").alias("n_cohort"))
    return (
        e.join(firsts, key_col)
        .join(F.broadcast(sizes), "__cohort")
        .groupBy(
            F.col("__cohort").alias("cohort_week"),
            (F.datediff(week_col, "__cohort") / 7).cast("long").alias("week_offset"),
        )
        .agg(
            F.count("*").alias("n_active"),
            F.min("n_cohort").alias("n_cohort"),
            F.round(F.count("*") / F.min("n_cohort"), 4).alias("retention"),
        )
    )


# ---------------------------------------------------------------- skew


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate the small side ``n_salts``
    times and scatter each big-side row to one replica, so a hot key's
    rows spread across ``n_salts`` shuffle partitions instead of one
    straggler task.

    Semantically identical to ``big.join(small, big(key)==small(key),
    how)`` for ``inner``/``left`` joins.  The big-side salt is a
    deterministic per-row hash (no rand() — keeps the plan replayable
    and AQE-friendly); the small side is exploded, multiplying it by
    ``n_salts`` — use only when the small side times n_salts still fits
    the shuffle budget (or is broadcastable, in which case prefer
    broadcast and skip salting entirely).  Complements AQE skew-join
    splitting, which only kicks in above partition-size thresholds.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    # Unique salt column name: a caller-owned "__salt" column must pass
    # through untouched (a fixed name would be clobbered then dropped).
    salt = "__salt"
    taken = set(big.columns) | set(small.columns)
    i = 0
    while salt in taken:
        i += 1
        salt = f"__salt_{i}"
    salt_vals = F.array(*[F.lit(i) for i in range(n_salts)])
    big_s = big.withColumn(
        salt, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(salt, F.explode(salt_vals))
    joined = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s[salt] == small_s[salt]),
        how,
    )
    return joined.drop(salt)


def paragraph_dedup(
    df: DataFrame, id_col: str, text_col: str, width: int = 16
) -> DataFrame:
    """Corpus-level paragraph/chunk dedup with reassembly (RefinedWeb
    repetition removal): split each doc into ``width``-word units, drop
    every unit whose exact text already appeared earlier in the corpus
    (first occurrence by (id, idx) survives), and summarize per doc:
    total/kept/dropped unit counts + md5 of the reassembled text.

    Scale shape: the survivor window partitions on md5(unit) — 16-byte
    digests shuffle, unit bodies never do; reassembly groups by id with
    sort_array over collected (idx, unit) structs."""
    sized = (
        df.select(F.col(id_col).alias("__id"), F.split(text_col, " ").alias("__w"))
        .withColumn("__n", F.size("__w"))
        .where(F.col("__n") >= 1)
        .withColumn(
            "__n_chunks", F.expr(f"(__n + {width - 1}) div {width}").cast("long")
        )
    )
    start = F.col("idx") * width + 1
    chunks = sized.select(
        "__id",
        F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)).alias("idx"),
        "__w",
    ).select(
        "__id",
        "idx",
        F.array_join(F.slice("__w", start, F.lit(width)), " ").alias("chunk"),
    )
    ranked = chunks.withColumn(
        "rn",
        F.row_number().over(W.partitionBy(F.md5("chunk")).orderBy("__id", "idx")),
    )
    kept = (
        ranked.filter(F.col("rn") == 1)
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                        lambda s: s["chunk"],
                    ),
                    " ",
                )
            ).alias("digest"),
        )
    )
    return (
        sized.select("__id", "__n_chunks")
        .join(kept, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__n_chunks").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("__n_chunks") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
            F.coalesce("digest", F.md5(F.lit(""))).alias("digest"),
        )
    )


def gopher_signals(
    df: DataFrame,
    text_col: str,
    stopwords: Sequence[str] = ("the", "a", "of", "and", "to"),
) -> DataFrame:
    """Append Gopher-style quality signals (Rae et al. 2021 §A1.1) as
    columns: n_words, raw mean word length / symbol-word fraction (as
    ``__mwl`` / ``__sym`` for threshold gates), and stop-word hits.
    Pure map-side HOF expressions — zero shuffles at any scale."""
    w = F.split(text_col, " ")
    n_words = F.size(w).cast("long")
    n_letters = F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("long")
    return (
        df.withColumn("n_words", n_words)
        .withColumn("__mwl", n_letters * 1.0 / n_words)
        .withColumn(
            "__sym",
            F.size(F.filter(w, lambda x: x.rlike("[^a-z]"))) * 1.0 / n_words,
        )
        .withColumn(
            "n_stop",
            F.size(F.filter(w, lambda x: x.isin(*stopwords))).cast("long"),
        )
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    side_col: str,
    *,
    ref_side: str = "ref",
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two slices of ``df`` tagged by
    ``side_col`` (``ref_side`` defines the binning): the reference
    slice's equi-depth edges bin BOTH slices, and each bin contributes
    (p_cur - p_ref) * ln(p_cur / p_ref), with both probabilities
    clamped at 1e-6 so an empty bin (total drift — the exact case the
    monitor exists for) contributes a large finite term instead of a
    silent NULL from ln(0).  Returns one row per bin
    (per-bin terms localize WHICH part of the distribution moved and
    avoid cross-engine summation-order concerns; sum ``psi_term`` for
    the scalar).  One percentile pass on the reference
    (approx_percentile at 100 TB scale), one map-side HOF binning scan,
    a bins-sized agg."""
    ref = df.filter(F.col(side_col) == ref_side)
    ps = [i / bins for i in range(1, bins)]
    edges = ref.agg(
        F.percentile(value_col, F.array(*[F.lit(p) for p in ps])).alias("__e")
    )
    binned = df.crossJoin(F.broadcast(edges)).select(
        F.col(side_col).alias("__side"),
        (
            1 + F.size(F.filter("__e", lambda x: F.col(value_col) > x))
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("__side") == ref_side, 1)).alias("n_ref"),
        F.count(F.when(F.col("__side") != ref_side, 1)).alias("n_cur"),
    )
    tot = counts.agg(F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc"))
    p_ref = F.greatest(F.col("n_ref") * 1.0 / F.col("__tr"), F.lit(1e-6))
    p_cur = F.greatest(F.col("n_cur") * 1.0 / F.col("__tc"), F.lit(1e-6))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    side_col: str,
    *,
    ref_side: str = "ref",
    grid: Sequence[float] = (),
) -> DataFrame:
    """Grid-evaluated Kolmogorov-Smirnov statistic between the
    ``ref_side`` slice and everything else: both empirical CDFs are
    evaluated at combined-distribution percentile edges (default: a
    35-point tail-dense grid) and KS = max |CDF_ref - CDF_cur|.  The
    textbook KS needs a global value sort (single-reducer at scale);
    the grid form costs one percentile pass + one map-side binning
    scan + a grid-sized window.  Returns one row: n_ref, n_cur,
    ks_stat."""
    from pyspark.sql import Window as W

    ps = list(grid) or (
        [x / 100.0 for x in range(1, 11)]
        + [x / 100.0 for x in range(15, 91, 5)]
        + [x / 100.0 for x in range(91, 100)]
    )
    edges = df.agg(
        F.percentile(value_col, F.array(*[F.lit(p) for p in ps])).alias("__e")
    )
    binned = df.crossJoin(F.broadcast(edges)).select(
        F.col(side_col).alias("__side"),
        F.size(F.filter("__e", lambda x: F.col(value_col) > x)).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("__side") == ref_side, 1)).alias("n_ref"),
        F.count(F.when(F.col("__side") != ref_side, 1)).alias("n_cur"),
    )
    tot = counts.agg(F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc"))
    cdf = counts.crossJoin(F.broadcast(tot)).select(
        "__tr",
        "__tc",
        (F.sum("n_ref").over(W.orderBy("bin")) * 1.0 / F.col("__tr")).alias("__cr"),
        (F.sum("n_cur").over(W.orderBy("bin")) * 1.0 / F.col("__tc")).alias("__cc"),
    )
    return cdf.agg(
        F.max("__tr").cast("long").alias("n_ref"),
        F.max("__tc").cast("long").alias("n_cur"),
        F.round(F.max(F.abs(F.col("__cr") - F.col("__cc"))), 6).alias("ks_stat"),
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int = 20,
    salt: str = "ps",
) -> DataFrame:
    """Weighted priority sample WITHOUT replacement (Duffield-Lund-
    Thorup), deterministic: each row draws priority q = w/u from a
    derandomized uniform u = (md5-16bit(salt:id) + 1)/65536, the k
    largest q win, and `ht_estimate` = max(w, tau) (tau = the (k+1)-th
    priority) makes any kept-subset sum unbiased for the population
    subset total.  When the input holds n <= k rows there is NO (k+1)-th
    priority: DLT defines the sample as ALL rows with ht = w exactly —
    the m <= k branch below (m = |topk1| = min(n, k+1), a 1-row
    aggregate, so the gate costs nothing).  Ties AT tau are broken
    deterministically (round-8 advice: a strict `priority > tau` cut
    dropped EVERY row tied at the (k+1)-th priority, silently
    shrinking the sample below k — plausible for arbitrary inputs
    since u is only 16-bit): the sample is exactly the first k rows
    of the (priority DESC, id ASC) order, i.e. everything in the
    top-(k+1) set except its last row, so `the k largest q win` holds
    literally even under collisions.  Output adds `priority` (the
    raw q) and `ht_estimate`.  Plan shape: map-side priorities +
    TakeOrdered(k+1) + a broadcast 1-row threshold — no window, no
    shuffle (the qc60 registered query is this operator on orders)."""
    u16 = (
        f"CAST(conv(substr(md5('{salt}:' || CAST({id_col} AS STRING)),"
        " 1, 4), 16, 10) AS BIGINT)"
    )
    pr = df.withColumn(
        "priority", F.expr(f"{weight_col} / (({u16} + 1) / 65536.0D)")
    )
    topk1 = pr.orderBy(
        F.col("priority").desc(), F.col(id_col).asc()
    ).limit(k + 1)
    # The (k+1)-th row — the ONE to drop when m == k+1 — is the last
    # of the (priority DESC, id ASC) order: max_by over the inverted
    # key (-priority, id) finds it inside the same 1-row aggregate.
    tau = topk1.agg(
        F.min("priority").alias("__tau"),
        F.count("*").alias("__m"),
        F.max_by(
            F.col(id_col),
            F.struct(
                (-F.col("priority")).alias("np"), F.col(id_col).alias("i")
            ),
        ).alias("__dropid"),
    )
    small = F.col("__m") <= k
    return (
        topk1.crossJoin(F.broadcast(tau))
        .filter(small | (F.col(id_col) != F.col("__dropid")))
        .withColumn(
            "ht_estimate",
            F.when(small, F.col(weight_col)).otherwise(
                F.when(
                    F.col(weight_col) >= F.col("__tau"), F.col(weight_col)
                ).otherwise(F.col("__tau"))
            ),
        )
        .drop("__tau", "__m", "__dropid")
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str | Column,
    k: int = 5,
    l: int = 3,
) -> DataFrame:
    """Per-quasi-identifier-group privacy report: group size,
    l-diversity (distinct sensitive values), and k/l risk flags — the
    release gate of qd53, generalized to any QI column set.  One
    grouped aggregate; the group count is the QI domain size."""
    s = (
        F.col(sensitive_col)
        if isinstance(sensitive_col, str)
        else sensitive_col
    )
    return df.groupBy(*qi_cols).agg(
        F.count("*").cast("bigint").alias("group_size"),
        F.countDistinct(s).cast("bigint").alias("l_diversity"),
        (F.count("*") < k).alias("k_risky"),
        (F.countDistinct(s) < l).alias("l_risky"),
    )


def pareto_frontier(
    df: DataFrame,
    group_col: str | None,
    minimize: Sequence[str],
) -> DataFrame:
    """SKYLINE: rows not dominated on the `minimize` dimensions (two
    supported — the sort-based plan needs one running dimension), per
    group (or globally with group_col=None over a constant key).  A row
    survives iff no row in its group is <= on both dims and < on one:
    the running MIN of dim2 over STRICTLY smaller dim1 (RANGE frame to
    -1, ties excluded by value) must not reach it, and no equal-dim1
    row is strictly smaller on dim2.  qa46 is this operator on part;
    skyline(A U B) = skyline(skyline(A) U skyline(B)) is the
    distributed-merge law for when one group outgrows a task."""
    assert len(minimize) == 2, "sort-based skyline supports 2 dims"
    d1, d2 = minimize
    gcol = group_col
    if gcol is None:
        df = df.withColumn("__g", F.lit(1))
        gcol = "__g"
    w_cheaper = (
        W.partitionBy(gcol).orderBy(d1).rangeBetween(W.unboundedPreceding, -1)
    )
    w_same = W.partitionBy(gcol, d1)
    flagged = df.withColumn(
        "__min_cheaper", F.min(d2).over(w_cheaper)
    ).withColumn("__min_same", F.min(d2).over(w_same))
    out = flagged.filter(
        (
            F.col("__min_cheaper").isNull()
            | (F.col("__min_cheaper") > F.col(d2))
        )
        & (F.col(d2) == F.col("__min_same"))
    ).drop("__min_cheaper", "__min_same")
    return out.drop("__g") if group_col is None else out

"""Plan-shape assertions: the properties that decide 100 TB viability.

A query that silently loses pushdown, pruning, or its broadcast strategy
still passes value checks at fixture scale — these tests are the guard
rail that the *plan*, not just the answer, stays right.
"""

from __future__ import annotations

from spark_ml_optimization_spark.plans import (  # noqa: F401
    explain_formatted,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)
from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_CORRECT, SF_SMOKE


def _df(spark, name):
    return all_queries()[name].fn(spark, SF_CORRECT)


def test_flagship_pushdown_and_pruning(spark):
    df = _df(spark, "q01_pricing_summary")
    assert any("l_shipdate" in f for f in pushed_filters(df))
    scans = read_schema_columns(df)
    assert scans, "no parquet scan found"
    # Q1 needs exactly 7 of lineitem's 11 columns.
    assert sorted(scans[0]) == [
        "l_discount",
        "l_extendedprice",
        "l_linestatus",
        "l_quantity",
        "l_returnflag",
        "l_shipdate",
        "l_tax",
    ]


def test_filter_mix_fully_pushed(spark):
    df = _df(spark, "q03_filter_predicates")
    fs = " ".join(pushed_filters(df))
    for col in ("l_quantity", "l_returnflag", "l_discount", "l_shipdate"):
        assert col in fs, f"{col} not pushed: {fs}"


def test_star_join_broadcasts_dims(spark):
    df = _df(spark, "q10_star_join_revenue")
    assert has_broadcast_join(df)
    plan = explain_formatted(df)
    # the fact⋈fact edge must NOT be a nested-loop cartesian
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark):
    plan = explain_formatted(_df(spark, "q46_global_topk"))
    assert "TakeOrderedAndProject" in plan


def test_hot_path_vectorized_and_partial_agg(spark):
    """AQE formatted plans hide WholeStageCodegen markers pre-execution;
    the load-bearing properties are visible instead: vectorized parquet
    batches feeding the scan, and partial (map-side) aggregation before
    the exchange, so shuffles carry the aggregated keyspace only."""
    plan = explain_formatted(_df(spark, "q01_pricing_summary"))
    assert "Batched: true" in plan
    assert "partial_sum" in plan
    assert "Exchange" in plan
    plan_join = explain_formatted(_df(spark, "q10_star_join_revenue"))
    assert "partial_sum" in plan_join


def test_similarity_broadcasts_query_vector(spark):
    df = _df(spark, "q85_topk_cosine")
    plan = explain_formatted(df)
    assert "Broadcast" in plan  # 1-row query side broadcast, corpus streamed
    assert "TakeOrderedAndProject" in plan


def test_multimodal_payload_pruned_from_agg(spark):
    """mm04 aggregates metadata only — the payload (text) column must
    still be read (it feeds byte length) but doc-level media stats must
    not shuffle raw text: the agg is partial before exchange."""
    plan = explain_formatted(_df(spark, "mm04_media_stats"))
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange") or "partial" in plan.lower()


def test_plan_construction_is_lazy(spark):
    """§3.1 laziness contract: building a query's DataFrame must launch
    zero Spark jobs (no .first()/.collect()/eager evaluate at plan-build).
    ML fits (q87/q90/q92, ml*) are the documented exception — iterative
    training is eager by nature.  Asserted via job-group tracking."""
    sc = spark.sparkContext
    names = (
        "q85_topk_cosine",
        "q91_cosine_pandas_udf",
        "q86_knn_join",
        "q26_collect_aggs",
        "q74_jaccard_pairs",
    )
    for name in names:  # warm the schema cache (one inference job per path)
        all_queries()[name].fn(spark, SF_CORRECT)
    for name in names:
        group = f"lazy-check-{name}"
        sc.setJobGroup(group, "laziness assertion", False)
        try:
            all_queries()[name].fn(spark, SF_CORRECT)
        finally:
            sc.setJobGroup(None, None, False)
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
        assert not jobs, f"{name} ran {len(jobs)} Spark job(s) during plan construction"


def test_cbo_stats_inform_the_optimizer(spark):
    """ANALYZE TABLE must surface exact rowCount/column stats to
    Catalyst: the optimized plan of a scan over an analyzed catalog
    table carries a defined rowCount equal to the true count, and with
    CBO+joinReorder enabled a multi-join over analyzed tables plans
    without a cartesian and with defined cost stats."""
    from spark_ml_optimization_spark.sources.stats import analyze_tables

    cats = analyze_tables(spark, SF_CORRECT, ("customer", "nation", "orders"))

    prev_cbo = spark.conf.get("spark.sql.cbo.enabled")
    prev_jr = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        # rowCount stats only propagate through plans under CBO.
        scan = spark.table(cats["customer"])
        stats = scan._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined(), "no rowCount stat after ANALYZE"
        assert stats.rowCount().get() == scan.count()
        j = spark.sql(
            f"""
            SELECT n.n_name, count(*) AS n
            FROM {cats['orders']} o
            JOIN {cats['customer']} c ON o.o_custkey = c.c_custkey
            JOIN {cats['nation']} n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
            """
        )
        jstats = j._jdf.queryExecution().optimizedPlan().stats()
        assert jstats.rowCount().isDefined(), "CBO produced no cardinality estimate"
        assert "CartesianProduct" not in explain_formatted(j)
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", prev_jr)


def test_bucketed_join_has_no_shuffle(spark):
    """Co-bucketed fact⋈fact join must not shuffle either side.

    At fixture scale Catalyst (rightly) prefers broadcasting the small
    orders side, so the bucketing property is asserted with broadcast
    disabled: the join must become a SortMergeJoin whose only Exchange
    is the final aggregation's."""
    import re

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_ord = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # one file per bucket (repartition-before-bucketBy) + this conf lets
    # Spark trust the sortBy metadata → the SMJ needs no Sort either.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        df = _df(spark, "src04_bucketed_join")
        plan = explain_formatted(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev_ord)
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    # exactly one shuffle in the operator tree (the post-join aggregation);
    # none feeding the join — and ZERO sorts: sorted single-file buckets
    # make the merge join a pure zipper.  Inspect the tree section only —
    # node details repeat the operator names.
    tree = plan.split("(1) Scan")[0]
    assert len(re.findall(r"\bExchange\b", tree)) == 1
    assert len(re.findall(r"\bSort\b", tree.replace("SortMergeJoin", ""))) == 0


def test_dynamic_partition_pruning_fires(spark):
    """src08: the year-partitioned fact scan must carry a dynamicpruning
    expression in its PartitionFilters — runtime pruning driven by the
    filtered dim, not a static predicate on the fact."""
    df = _df(spark, "src08_dynamic_partition_pruning")
    plan = explain_formatted(df)
    assert "dynamicpruning" in plan.lower(), "no DPP subquery in fact scan"


def test_runtime_bloom_filter_injected(spark):
    """Catalyst's InjectRuntimeFilter turns a selective dim filter into a
    bloom-filter semi-join pushed into the fact scan — at 100 TB this
    cuts shuffle volume by the dim's selectivity before any join runs.
    Thresholds are production-scale (10 GB application side), so the
    test lowers them to prove the rule fires on our join shapes; conf is
    restored either way."""
    from spark_ml_optimization_spark.sources import load_table

    app_key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bc_key = "spark.sql.autoBroadcastJoinThreshold"
    old_app, old_bc = spark.conf.get(app_key), spark.conf.get(bc_key)
    try:
        spark.conf.set(app_key, "0")
        spark.conf.set(bc_key, "-1")  # force the shuffle join the rule targets
        li = load_table(spark, SF_CORRECT, "lineitem")
        o = load_table(spark, SF_CORRECT, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized or "might_contain" in optimized, (
            "runtime bloom filter not injected:\n" + optimized[:2000]
        )
    finally:
        spark.conf.set(app_key, old_app)
        spark.conf.set(bc_key, old_bc)


def test_column_profile_avoids_expand(spark):
    """qd01's exact distinct counts must use the two-level pair plan —
    N countDistinct in one aggregate Expands the fact N× (measured 6.0 s
    vs 1.9 s at sf0.1)."""
    plan = explain_formatted(_df(spark, "qd01_column_profile"))
    assert "Expand" not in plan


def test_argmin_query_broadcasts_and_avoids_window(spark):
    """qa18: argmin via min(struct) — no window sort over the fact, part
    dim broadcast."""
    df = _df(spark, "qa18_cheapest_supplier_per_part")
    assert has_broadcast_join(df)
    plan = explain_formatted(df)
    assert "Window" not in plan


def test_small_qty_thresholds_broadcast(spark):
    """qa15: the per-part threshold side (one row per part) must
    broadcast — the fact table shuffles only for its own aggregate."""
    assert has_broadcast_join(_df(spark, "qa15_small_qty_revenue"))


def test_fuzzy_match_broadcasts_build_side(spark):
    """q74d must keep its broadcast join — the 25-key block join would
    otherwise shuffle all pairs onto 25 reducers (round-4 measured
    12 s → 1.3 s regression guard)."""
    df = _df(spark, "q74d_fuzzy_blocked_match")
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in explain_formatted(df)


def test_zorder_layout_single_agg_pass(spark):
    """qc12 is scan → project (bit math) → one partial-agged hash agg;
    any extra Exchange means the Morton projection stopped folding."""
    import re

    plan = explain_formatted(_df(spark, "qc12_zorder_layout"))
    # formatted plans list each node twice (tree + details) — count the
    # numbered detail entries
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "partial_count" in plan or "partial_min" in plan


def test_waiting_suppliers_no_fact_rescan(spark):
    """qa20's decorrelated plan reads lineitem for the join and the
    per-order aggregate — the EXISTS/NOT-EXISTS pair must NOT add
    per-predicate scans (4 lineitem scans would mean the rewrite
    regressed to correlated re-execution)."""
    import re

    plan = explain_formatted(_df(spark, "qa20_waiting_suppliers"))
    # lineitem and orders are each scanned twice (join side + per-order
    # agg side; Spark does not CSE the shared subtree) plus supplier = 5
    # scans total in the decorrelated shape.  Correlated re-execution
    # would add a scan pair per EXISTS predicate (>= 7).
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans <= 5, n_scans


def test_sliding_chunks_is_map_side_only(spark):
    """q83b (generator-expression chunker) must have NO shuffle at all —
    explode + slice are map-side; an Exchange means something forced a
    repartition."""
    plan = explain_formatted(_df(spark, "q83b_sliding_chunks"))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode generator node


def test_range_search_is_shuffle_free(spark):
    """q85b (cosine range search): broadcast query vector + map-side
    threshold filter — the plan must contain a broadcast join and NO
    shuffle Exchange (the whole point vs top-k's global TakeOrdered)."""
    df = _df(spark, "q85b_cosine_range_search")
    assert has_broadcast_join(df)
    plan = explain_formatted(df)
    assert "hashpartitioning(" not in plan
    assert "rangepartitioning(" not in plan


def test_canary_scan_broadcasts_needles(spark):
    """qc16: the benchmark needle set must be the broadcast side — a
    shuffled corpus-vs-needles join would move corpus bytes for a
    KB-scale probe set."""
    df = _df(spark, "qc16_canary_substring_scan")
    assert has_broadcast_join(df)
    plan = explain_formatted(df)
    assert "CartesianProduct" not in plan


def test_gopher_rules_map_side_only(spark):
    """qc15 quality gate is pure per-row expression work — any Exchange
    means a regression introduced a shuffle into a linear scan."""
    plan = explain_formatted(_df(spark, "qc15_gopher_quality_rules"))
    assert "Exchange" not in plan


def test_join_strategy_hints_respected(spark):
    """q10b: the SHUFFLE_HASH and MERGE hints must each pin their edge's
    physical operator — hint loss (e.g. a hint-eating transformation)
    would silently fall back to whatever AQE picks."""
    plan = explain_formatted(_df(spark, "q10b_join_strategy_hints"))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" in plan


def test_cached_stage_reused_not_rescanned(spark):
    """qp3: after materializing, both agg branches must read the
    InMemoryTableScan of the cached projection (a branch that fell back
    to a parquet re-scan silently doubles the pipeline's I/O)."""
    df = _df(spark, "qp3_cached_stage_reuse")
    df.collect()  # materialize the cache through the first consumer
    plan = explain_formatted(df)
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_distribute_sort_by_partial_sort_only(spark):
    """q30b: DISTRIBUTE BY + SORT BY must produce a hashpartitioning
    Exchange and a WITHIN-partition sort — a rangepartitioning Exchange
    would mean it silently became a global ORDER BY (merge cost)."""
    plan = explain_formatted(_df(spark, "q30b_distribute_sort_by"))
    assert "hashpartitioning(" in plan
    assert "rangepartitioning(" not in plan
    # Sort node argument triple is [keys], global, offset — global must
    # be false (within-partition sort only).
    assert "ASC NULLS FIRST], false" in plan


def test_exchange_reused_across_consumers(spark):
    """q21d: the global-max branch must read the per-supplier agg's
    shuffle output as a ReusedExchange (one scan, one shuffle total) —
    visible in the AQE final plan after execution."""
    df = _df(spark, "q21d_exchange_reuse")
    df.collect()
    plan = explain_formatted(df)
    assert "ReusedExchange" in plan


def test_keyset_pagination_pushes_cursor(spark):
    """q30c: the cursor predicate must reach the parquet scan
    (PushedFilters GreaterThan) and the page sort must be a
    TakeOrderedAndProject — the two properties that make page k cost
    the same as page 1."""
    df = _df(spark, "q30c_keyset_pagination")
    assert any("o_orderkey" in f and "GreaterThan" in f for f in pushed_filters(df))
    assert "TakeOrderedAndProject" in explain_formatted(df)


def test_topk_per_group_uses_window_group_limit(spark):
    """q40: the rank-filter pattern must plan as WindowGroupLimit (Spark
    3.5+ pushes the rn <= k predicate INTO the window as a partial+final
    per-group top-k heap) — without it every group's full row set is
    sorted and materialized before the filter, the difference between
    shuffling k rows/group and shuffling the corpus at 100 TB."""
    plan = explain_formatted(_df(spark, "q40_topk_per_group"))
    # Partial (map-side, pre-shuffle) AND final — both must be present.
    assert plan.count("WindowGroupLimit") >= 2


def test_aqe_coalesces_overpartitioned_shuffle(spark):
    """The session's AQE posture, enforced: a 32-partition shuffle over a
    small aggregate must show AQEShuffleRead(coalesced) in the final
    adaptive plan — the runtime re-plan that keeps shuffle.partitions
    sized for the 100 TB case without penalizing small stages."""
    df = _df(spark, "q01_pricing_summary")
    df.collect()
    plan = explain_formatted(df)
    assert "AdaptiveSparkPlan" in plan
    assert "AQEShuffleRead" in plan
    assert "coalesced" in plan


def test_cbo_reorders_hostile_join_order(spark):
    """qa22: the FROM order makes every adjacent pair predicate-free, so
    the literal left-deep order would be four CartesianProducts; the
    optimizer (ReorderJoin + CBO over ANALYZEd stats) must recover the
    star shape — zero cartesians, dims broadcast."""
    plan = explain_formatted(_df(spark, "qa22_cbo_join_reorder"))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_setsim_prefix_join_reuses_cached_shingles(spark):
    """q74e: the shared shingle relation must come back from cache for
    its many consumers after materialization — losing the cache silently
    re-derives the explode+hash per branch (measured 54 s vs ~5 s at
    sf0.1)."""
    df = _df(spark, "q74e_setsim_prefix_join")
    df.collect()  # materialize the caches through the first execution
    plan = explain_formatted(df)
    assert plan.count("InMemoryTableScan") >= 4, plan


def test_triangle_count_checkpoints_result_and_releases_cache(spark):
    """q84b round-8 contract: the function returns an EAGER 1-row
    localCheckpoint (plan = ExistingRDD scan — the whole computation
    already ran inside the call) so the oriented-edge cache can be
    unpersisted before returning; leaked .cache() entries degraded
    repeat invocations 35 s -> 152 s at replica x10.  Pin both halves:
    the checkpoint shape, and that a second invocation does not grow
    the cached-RDD census (the eo cache from call 1 was released)."""
    def persistent_rdd_count() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    df = _df(spark, "q84b_triangle_count")
    plan = explain_formatted(df)
    assert "ExistingRDD" in plan, plan
    before = persistent_rdd_count()
    _df(spark, "q84b_triangle_count").collect()
    after = persistent_rdd_count()
    # the second call may add its own 1-row result checkpoint (+1) but
    # must not leave its 12M-row eo cache behind (+2 would mean leak)
    assert after <= before + 1, (before, after)


def test_ann_mechanics_variants_are_broadcast_only(spark):
    """q92c (multi-probe IVF) and q87b (banded LSH): the single-query
    forms must be ONE corpus scan + a broadcast of the 1-row query +
    TakeOrderedAndProject — any SortMergeJoin/ShuffledHashJoin means
    the cell/band prune fell off the map side."""
    for name in ("q92c_ann_ivf_relational", "q87b_lsh_banded_relational"):
        plan = explain_formatted(_df(spark, name))
        assert "SortMergeJoin" not in plan, f"{name}: {plan}"
        assert "ShuffledHashJoin" not in plan, f"{name}: {plan}"
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
            f"{name}: query row not broadcast\n{plan}"
        )
        assert "TakeOrderedAndProject" in plan, f"{name}: {plan}"


def test_surprisal_vocab_join_is_broadcast(spark):
    """qc27: the vocabulary relation must broadcast back onto the token
    stream (the q72c memoization shape) — a shuffled join would move
    every token occurrence for a vocabulary-sized lookup."""
    plan = explain_formatted(_df(spark, "qc27_unigram_surprisal"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bloom_filter_join_injects_runtime_filter(spark):
    """q10c: with the application-side threshold dropped, Spark's
    InjectRuntimeFilter must add a bloom_filter_agg on the selective
    orders side AND a might_contain probe ahead of the lineitem
    shuffle — the row-level pruning that decides fact-side shuffle
    volume at 100 TB.  Also pins that the query restores both confs."""
    prev_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = _df(spark, "q10c_bloom_filter_join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, "creation-side bloom aggregate missing"
    assert "might_contain" in plan.lower(), "application-side bloom probe missing"
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        == prev_app
    )
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == prev_bc


def test_jl_projection_is_mapside_and_broadcast_paired(spark):
    """q85e: the 16-d sketch must be a pure map-side expression (no
    hyperplane-table join, no exchange before the projection) and the
    probe-pair join must broadcast — zero corpus shuffle."""
    df = _df(spark, "q85e_jl_projection_audit")
    txt = explain_formatted(df)
    assert has_broadcast_join(df)
    assert "SortMergeJoin" not in txt and "CartesianProduct" not in txt


def test_binned_proximity_join_is_equi_not_nested_loop(spark):
    """q66c: the keyless ±5-min proximity join must plan as an
    equi-join on the time bucket (SortMergeJoin/ShuffledHashJoin) —
    never BroadcastNestedLoopJoin or CartesianProduct, which is what
    the naive theta-join becomes and what dies at 100 TB."""
    df = _df(spark, "q66c_binned_proximity_join")
    txt = explain_formatted(df)
    assert "BroadcastNestedLoopJoin" not in txt
    assert "CartesianProduct" not in txt
    assert ("SortMergeJoin" in txt) or ("ShuffledHashJoin" in txt) or has_broadcast_join(df)


def test_aqe_skew_join_splits_hot_partition(spark):
    """q48c: with skew thresholds scaled to fixture size, the final
    adaptive plan must show OptimizeSkewedJoin firing — the hot k=1
    reduce partition split into mapper-granular sub-reads
    (SortMergeJoin(skew=true) / 'skewed' AQEShuffleRead).  Thresholds
    are set here, the query executes, and the confs are restored."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = _df(spark, "q48c_aqe_skew_join")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "OptimizeSkewedJoin did not fire"
        assert "skewed" in plan, "no skewed AQEShuffleRead in final plan"
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_global_with_ties_topk_is_window_free(spark):
    """q46b must plan as TakeOrdered + broadcast filter — the whole
    point is that no WindowExec (and no global sort of orders) exists."""
    from spark_ml_optimization_spark.registry import all_queries

    df = all_queries()["q46b_global_topk_with_ties"].fn(spark, SF_SMOKE)
    plan = explain_formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ohlc_bars_is_single_mergeable_aggregate(spark):
    """q68l's open/close picks must ride min_by/max_by inside ONE hash
    aggregate pair — no WindowExec, no sort: the whole design is that
    first/last-by-time becomes O(1)-state mergeable aggregation."""
    df = all_queries()["q68l_ohlc_bars"].fn(spark, SF_SMOKE)
    plan = explain_formatted(df)
    assert "Window" not in plan
    # string-keyed min_by state has no fixed-size hash buffer, so Spark
    # picks SortAggregate — still partial+final mergeable aggregation
    # (the sort is per-partition grouping, never a global data sort).
    assert "SortAggregate" in plan or "HashAggregate" in plan
    assert plan.count("Exchange") <= 2  # one partial->final exchange


def test_demand_trend_topk_is_takeordered(spark):
    """qa41's global head must be TakeOrdered (k rows per partition +
    driver merge), never a full Sort of the per-part slope table."""
    df = all_queries()["qa41_demand_trend_topk"].fn(spark, SF_SMOKE)
    plan = explain_formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_point_in_time_features_has_no_cartesian(spark):
    """qp13's as-of resolution must stay an equi-join on the customer
    key (range predicate as a post-filter), never a nested-loop over
    labels x snapshots."""
    df = all_queries()["qp13_point_in_time_features"].fn(spark, SF_SMOKE)
    plan = explain_formatted(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scatter_gather_topk_two_tier_shape(spark):
    """q85j: per-shard ranking is a PARTITIONED window (8 bounded
    shards) and the gather tier is TakeOrdered over the 8k shard
    candidates — never a global sort of the corpus."""
    df = all_queries()["q85j_scatter_gather_topk"].fn(spark, SF_SMOKE)
    plan = explain_formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "partitionBy" not in plan  # no API leak; window is planned
    # the window must be partitioned on shard, not empty
    assert "Window" in plan
    import re

    for m in re.finditer(r"Arguments: .*?windowspecdefinition\(([^)]*)\)", plan):
        assert "shard" in m.group(1) or "vec_id" in m.group(1), m.group(0)


def test_join_fanout_preflight_never_joins_data(spark):
    """qd54 estimates join explosion WITHOUT running the join: the plan
    must contain no SortMergeJoin of two data-sized sides — only the
    per-key aggregate and a broadcast of the 1-row total."""
    df = all_queries()["qd54_join_fanout_preflight"].fn(spark, SF_SMOKE)
    plan = explain_formatted(df)
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_priority_sample_is_takeordered_not_window(spark):
    """qc60's k-largest priorities must plan as TakeOrdered (map-side
    k rows per partition), never a global Sort or an unpartitioned
    Window over the orders table."""
    df = all_queries()["qc60_weighted_priority_sample"].fn(spark, SF_SMOKE)
    plan = explain_formatted(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_dau_wau_spine_join_is_hash_not_nested_loop(spark):
    """q69b (code-review finding): the trailing-7-day window must be an
    EQUI-join against the 7x-fanned day spine — a bare BETWEEN join has
    no equi-key and plans as a nested loop over the (day, user) table."""
    df = all_queries()["q69b_dau_wau_stickiness"].fn(spark, SF_SMOKE)
    plan = explain_formatted(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

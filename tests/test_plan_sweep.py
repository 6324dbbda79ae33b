"""Registry-wide scale-killer sweep: build (never execute) the physical
plan of every lazily-constructible registered query and assert the two
anti-patterns that silently survive value checks at fixture scale but
kill a 100 TB run:

1. CartesianProduct — quadratic row blowup.  Allowed only in the two
   deliberate theta/cross demos whose docstrings scope them to bounded
   inputs.
2. BatchEvalPython — row-at-a-time Python UDF on a data path (the
   ~100x-slower-than-codegen path).  Allowed only in q99, the
   deliberate registered-UDF surface demo.  ArrowEvalPython /
   MapInPandas / MapInArrow (vectorized Python) are fine — they are the
   sanctioned escape hatch.

3. Unpartitioned Window (empty PARTITION BY) — "WindowExec: No
   Partition Defined ... Moving all data to a single partition".
   Allowed only over relations BOUNDED or sublinear in the data (bins,
   day spines, distinct scores, vocabulary) — the _GLOBAL_WINDOW_OK
   allowlist, one justification each.  Entity-scale relations
   (customers, documents, scored rows) must use the distributed exact
   rank in operators/dist_rank.py instead (the round-4 qa24/qa25/
   ml28/qc26 fix) — this assertion pins that no one reintroduces one.

Queries whose CONSTRUCTION executes Spark jobs (streaming twins,
MLlib fits, iterative algorithms, scratch-dir materializers) are
skipped by prefix/name — their plan shapes are pinned individually in
test_plans.py or covered by their own tests.
"""

from __future__ import annotations

import pytest

from spark_ml_optimization_spark.plans import explain_formatted
from spark_ml_optimization_spark.registry import all_queries

from .conftest import SF_CORRECT

#: construction runs real Spark jobs (fit/stream/materialize/iterate)
_EAGER_PREFIXES = ("st", "src", "ml0", "ml1", "qc13", "qc18")
_EAGER_NAMES = {
    "qa22_cbo_join_reorder",  # ANALYZE TABLE stats collection at construction
    "q72_minhash_lsh_neardup",  # MLlib MinHashLSH fit
    "q87_ann_lsh",  # BucketedRandomProjectionLSH fit
    "q90_kmeans_clusters",  # KMeans fit
    "q92_ann_ivf",  # KMeans coarse quantizer fit
    "q92b_ann_pq",  # per-subspace codebook fits
    "q74b_dup_components",  # iterative connected components
    "qc21_leakage_safe_split",  # runs q74b's iterative CC at construction
    "qc28_canonical_policy_audit",  # iterative CC at construction (q74b's labels)
    "q84e_component_size_profile",  # iterative CC at construction (q74b's labels)
    "q84_pagerank",  # iterative power method
    "q84c_bfs_shortest_paths",  # iterative frontier rounds + checkpoints
    "q84b_triangle_count",  # builds the shared co-purchase edge checkpoint
    "q84f_kcore_peel",  # iterative peel rounds with counts at construction
    "q84g_label_propagation",  # iterative LPA rounds with per-round collects
    "q84h_adamic_adar",  # builds the strong co-purchase edge checkpoint
    "q84i_degree_assortativity",  # builds the strong co-purchase edge checkpoint
    "qp3_cached_stage_reuse",  # .cache() plan is load-bearing, pinned in test_plans
    "ml21_isotonic_regression",  # MLlib PAV fit + join at construction
    "ml35_lda_topics",  # online LDA fit at construction (eager 1-row result)
    "ml35b_lda_top_terms",  # same fit; describeTopics at construction
    "ml45_prefixspan_sequences",  # PrefixSpan mining job at construction
    "ml46_imputer_stage",  # two Imputer fits (agg + approxQuantile) at construction
    "ml47_glm_gaussian",  # GLM IRLS fit + summary aggregates at construction
    "ml48_rformula_features",  # RFormula (StringIndexer) fit at construction
    "ml48b_rformula_interaction",  # RFormula fit at construction
    "q84k_motif_triads",  # builds the strong co-purchase edge checkpoint
    "q84l_distributional_similarity",  # builds the co-purchase counted checkpoint
    "ml49_quantile_discretizer",  # QuantileDiscretizer fit (approxQuantile job) at construction
    "q37b_merge_delete_compact",  # writes base/snapshot parquet at construction
    "q37c_time_travel",  # materializes q37b's lake dirs + two .count() actions
    "q37e_write_audit_publish",  # stages/audits/publishes parquet at construction
    "q20e_stat_freq_quantile",  # freqItems/approxQuantile are driver actions
}

_CARTESIAN_OK = {"q16_theta_self_join", "q17_cross_join"}
_ROW_PYTHON_OK = {"q99_registered_sql_udf"}

#: Unpartitioned windows allowed ONLY over bounded/sublinear relations
#: (each justified; everything entity-scale goes through dist_rank.py).
_GLOBAL_WINDOW_OK = {
    # ml27/ml29/qd15 were de-globalized in round 6 (distributed_cumsum /
    # distributed_row_number) — entity/data-coupled spines no longer
    # appear here; every remaining entry is a BOUNDED domain.
    "ml27b_roc_auc_binned",  # fixed 1024-bin score spine
    "ml29b_operating_point_binned",  # fixed 1024-bin score spine
    "qd15b_key_skew_gini_binned",  # <= 19 decimal-digit count bins
    "q67d_survival_curve",  # duration spine: distinct churn-day values
    # q77c/q83d were de-globalized in round 7 (distributed_row_number /
    # window-free TakeOrdered top-k) — no data-coupled entries remain.
    "qd14_ks_drift",  # fixed quantile-grid bins
    "qd20_anomaly_episodes",  # day spine: one row per calendar day
    "qa30_share_of_parent",  # 25-row NATION dimension rollup (bounded)
    "q28e_mergeable_quantile_digest",  # <=16x65-row merged digest summary (bounded sketch)
    "qa47_abc_xyz_matrix",  # 25-row BRAND dimension revenue ranking (bounded)
    "ml36_rank_correlation",  # 100-row post-LIMIT relation (bounded by construction)
    "ml37_cost_optimal_threshold",  # fixed 1024-bin score spine
}


def _global_windows(jplan, acc):
    """Collect unpartitioned logical Window nodes (empty partitionSpec)
    from a JVM optimized plan — the exact condition that triggers
    WindowExec's move-everything-to-one-partition warning."""
    if jplan.getClass().getSimpleName() == "Window":
        if jplan.partitionSpec().isEmpty():
            acc.append(str(jplan.windowExpressions().head())[:80])
    for i in range(jplan.children().size()):
        _global_windows(jplan.children().apply(i), acc)

_SWEEP = sorted(
    n
    for n in all_queries()
    if not n.startswith(_EAGER_PREFIXES) and n not in _EAGER_NAMES
)


@pytest.mark.parametrize("name", _SWEEP)
def test_no_scale_killers_in_plan(spark, name):
    df = all_queries()[name].fn(spark, SF_CORRECT)
    plan = explain_formatted(df)
    if name not in _CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in _ROW_PYTHON_OK:
        # BatchEvalPythonUDTF is the UDTF surface (q98/q98b) — table
        # functions have no vectorized alternative; only the SCALAR
        # row-at-a-time node is the anti-pattern.
        scalar_plan = plan.replace("BatchEvalPythonUDTF", "")
        assert "BatchEvalPython" not in scalar_plan, (
            f"{name}: row-at-a-time Python UDF"
        )
    if name not in _GLOBAL_WINDOW_OK:
        acc: list[str] = []
        _global_windows(df._jdf.queryExecution().optimizedPlan(), acc)
        assert not acc, (
            f"{name}: unpartitioned Window (single-task sort at scale); "
            f"use operators/dist_rank.py or justify in _GLOBAL_WINDOW_OK: {acc}"
        )


def test_sweep_covers_most_of_registry():
    """The skip lists must stay exceptions, not become the rule."""
    total = len(all_queries())
    assert len(_SWEEP) >= total * 0.7, (len(_SWEEP), total)

"""Metamorphic invariance battery (Chen et al.'s metamorphic testing,
applied to a distributed engine): a correct distributed query returns
the SAME multiset under any physical-execution perturbation — shuffle
partition count, AQE on/off, broadcast thresholds.  The DuckDB oracle
can't see these knobs at all; only an intra-Spark comparison can prove
the results aren't partitioning-coupled (lost rows on skewed exchanges,
per-partition tie-breaks leaking into output, driver-side merges that
assume an ordering).

Representative slice of the registry — one query per plan family:
hash agg, star join, windowed top-k, vector dot top-k, skyline's RANGE
frame, the day-spine xcorr, the QI privacy rollup, cell-algebra ESS,
and the window-free priority sample (whose TakeOrdered threshold is
exactly the kind of operator a partitioning bug would corrupt).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

from .conftest import SF_CORRECT
from .harness import compare

METAMORPHIC_SET = [
    "q01_pricing_summary",
    "q10_star_join_revenue",
    "q40_topk_per_group",
    "q85_topk_cosine",
    "qa46_pareto_frontier",
    "q68n_leadlag_xcorr",
    "qd53_k_anonymity_audit",
    "qc64_target_mix_reweighting",
    "qc60_weighted_priority_sample",
    "q85j_scatter_gather_topk",
]

#: (conf key, baseline value is read at runtime, perturbed value)
PERTURBATIONS = [
    ("spark.sql.shuffle.partitions", "7"),
    ("spark.sql.adaptive.enabled", "false"),
    ("spark.sql.autoBroadcastJoinThreshold", "-1"),
]


@pytest.mark.parametrize("name", METAMORPHIC_SET)
def test_result_invariant_to_physical_confs(spark, name):
    fn = entry.queries()[name]
    base = fn(spark, SF_CORRECT).toPandas()
    for key, alt in PERTURBATIONS:
        prev = spark.conf.get(key)
        try:
            spark.conf.set(key, alt)
            got = fn(spark, SF_CORRECT).toPandas()
        finally:
            spark.conf.set(key, prev)
        compare(base, got, f"{name} under {key}={alt}")

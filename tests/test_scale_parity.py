"""Targeted sf0.1 oracle parity for scale-SENSITIVE queries.

The main parity suite runs at sf0.01; these queries change behavior
with data volume — iterative convergence (q74b needs ~5 label rounds on
the sf0.1 near-dup graph vs 1 at sf0.01), planted exact dups (only
sf0.1 has them), survivorship under real duplicate pressure — so their
correctness is re-pinned at bench scale.
"""

import duckdb
import pytest

import __spark_entry__ as entry

from .conftest import SF_BENCH
from .harness import compare

SCALE_SENSITIVE = [
    "q74b_dup_components",
    "qc39_incremental_neardup_admission",  # blocked counts only bite where sf0.1 plants near-dups
    "q70_exact_dedup",
    "q71_dedup_keep_first",
    "qc11_incremental_dedup",
    "q74_jaccard_pairs",
    # qc14 drops chunks only under real duplicate pressure (sf0.1 plants
    # ~38k near-dup pairs; sf0.01 has almost none), and qc16 only hits
    # canaries where planted copies exist — re-pin both at bench scale.
    "qc14_paragraph_dedup",
    "qc16_canary_substring_scan",
    # q72c's LSH pipeline only emits pairs where near-dups exist —
    # empty at sf0.01; the sf0.1 planted pairs make the hash check real.
    "q72c_minhash_portable",
    # ml14's Apriori-bounded oracle must hold where basket composition
    # is densest (a frequent 2-itemset appearing only at sf0.1 would
    # surface here).
    "ml14_fpgrowth_baskets",
    # bit-exact SimHash under the near-dup-heavy sf0.1 corpus (10M
    # (doc, token, bit) oracle rows — still sub-second in DuckDB).
    "q73_simhash",
    # the layered funnel only shrinks meaningfully where dups are
    # planted (sf0.1: 5000 -> 4992 -> 4756 -> 4416); re-pin the full
    # exact->lexical->semantic composition at bench scale.
    "qp5_dedup_funnel",
    # round-7 heavies whose output density depends on planted dups /
    # graph size: the lossless-prefix-join claim (q74e: ~256 pairs at
    # sf0.1 vs 25 at sf0.01), winnowing overlap pairs (q79b), the LSH
    # precision/recall audit's counts (q72d), the 1.9M-triangle exact
    # count under real co-purchase density (q84b), perceptual-hash
    # Hamming pairs (mm05), and the cluster-keyed split whose
    # leakage-audit only bites where multi-doc clusters exist (qc21).
    "q74e_setsim_prefix_join",
    "q79b_winnowing",
    "q72d_lsh_quality_audit",
    "q84b_triangle_count",
    "mm05_perceptual_hash_neardup",
    "qc21_leakage_safe_split",
    # round-4 additions whose output density depends on corpus/graph
    # size: first-owner novelty shifts with vocabulary saturation
    # (q83c), contamination pair fan-out with gram df (qc23), the
    # quality-gate funnel only filters meaningfully under sf0.1
    # duplicate/boilerplate pressure (qp6), the degree histogram and
    # its log-log fit with graph size (q84d), and as-of tolerance
    # matches with event density (q65b).
    "q83c_ngram_novelty",
    # qc28 only has multi-doc clusters to audit where near-dups are
    # planted (sf0.01 is near-empty), q87b's band-candidate density
    # shifts with corpus size.
    "qc28_canonical_policy_audit",
    "q87b_lsh_banded_relational",
    "qc23_contamination_attribution",
    "qp6_quality_gate_pipeline",
    "q84d_degree_distribution",
    "q65b_asof_tolerance",
    # wave-6/7/9 additions whose row sets are gated by corpus-scale
    # statistics: PMI support df_ab*10>=N and the top-30 vocab cut
    # (q83d), BM25 df/avgdl and the >=1-hit row gate under sf0.1 term
    # density (q81b), DSIR bucket distributions (qc25), bigram LM
    # probabilities (qc29), and q66c's pair density — ~100x more
    # within-tolerance pairs at sf0.1, the real test that bucket
    # replication matches the theta-join exactly-once under load.
    "q83d_pmi_cooccurrence",
    # q77d's sketch==exact parity holds only while the vocabulary stays
    # inside approx_top_k's tracked window (maxItemsTracked=10000) and
    # qualifying tokens under k=100 — re-verify where vocabulary grows.
    "q77d_vocab_topk_sketch",
    "q81b_bm25_retrieval",
    "qc25_dsir_importance",
    "qc29_bigram_surprisal",
    "q66c_binned_proximity_join",
    # cluster-size structure only exists where near-dups are planted.
    "q84e_component_size_profile",
    # the k=80 peel profile is degree-coupled (sf0.1 degrees ~10x).
    "q84f_kcore_peel",
    # recall/candidate density shifts with corpus size (2000 vs 500).
    "qp8_ann_recall_eval",
    # pair density at every threshold, and the EMD BIGINT-headroom
    # bound, are only exercised under sf0.1 volume.
    "qc31_threshold_sensitivity",
    "qd24_emd_drift",
    # vs-corpus and within-batch drop counts only bite where planted
    # duplicates exist.
    "qp9_corpus_refresh_pipeline",
    # the streaming twin must match the theta-join oracle under the
    # ~100x sf0.1 pair density, same as q66c.
    "st19_stream_proximity_join",
    # learned BPE merges are data-dependent: the sf0.1 word-frequency
    # table yields a different merge sequence than sf0.01 — re-pin the
    # training argmax chain and the learned-vocab scan at bench scale.
    "qc42_bpe_merge_training",
    "qc43_bpe_learned_count",
    # round-7 second-wave scale-coupled rows: the HLL 1%-agreement and
    # 2%-accuracy laws must hold where the sketch is DENSE (sf0.1 has
    # ~20k distinct parts vs 2k — different sketch mode); the strong
    # graph's edge support, LPA consolidation, AA candidates, and
    # assortativity all shift with co-purchase density; Apriori triples
    # are EMPTY at sf0.1 (distinct-order support never reaches 2 on the
    # wider part catalog) — the empty result is itself the pin; the
    # contamination-removal span set only bites where sf0.1 plants
    # verbatim copies.
    "q28c_hll_sketch_mergeable",
    "q84g_label_propagation",
    "q84h_adamic_adar",
    "q84i_degree_assortativity",
    "qa36_apriori_triples",
    "qc52_contamination_removal",
    # cell occupancy / scene-delta density shift with corpus size.
    "q92d_incremental_ivf_admission",
    "mm09_scene_change",
    # banding-config candidate counts only bite under sf0.1's planted
    # near-dup density (the 2x8 config is empty at sf0.01).
    "q72f_banding_tradeoff",
    # round-7 wave additions whose results are density-coupled: the
    # containment pair set and dup-5-gram coverage shift with corpus
    # repetition; q84j rides the same strong-graph substrate as
    # q84g/h/i; qd48's planted corruption classes only co-occur (a key
    # divisible by both 97 and 89) once custkeys reach 8633 at sf0.1.
    "qc56_containment_dedup",
    "qc54_dup_ngram_fraction",
    "q84j_jaccard_link_prediction",
    "qd48_scd2_validity_audit",
    # q20f's second moment is MAGNITUDE-coupled: the hugeint->double
    # double-rounding trap only bites once w*x^2 sums cross the
    # double-exact integer line (~9e15), which sf0.01 doesn't reach.
    "q20f_weighted_stats",
    # qc59's flow matrix is EMPTY at sf0.01 (zero planted exact dups);
    # the 8 sf0.1 planted copies are the real who-copies-from-whom pin.
    "qc59_cross_source_flow",
    # rank structure and prefix-shortlist depth shift with corpus size
    # (2000 vs 500 vectors); the sf0.1 run is the real truncation audit.
    "q85i_matryoshka_prefix_retrieval",
    # the top-21 priority sample is drawn from a 10x deeper pool at
    # sf0.1 — re-pin the derandomized draw + HT threshold at bench scale.
    "qc60_weighted_priority_sample",
    # ml40's integer-headroom claim (sum s_micro^2 < 2^63, below the
    # q20f hugeint->double line) only bites at sf0.1 row counts.
    "ml40_brier_decomposition",
    # file counts and the skip fraction shift with table size (30 vs
    # 300 simulated files); the layout contrast is real at bench scale.
    "qd55_zonemap_skipping_audit",
    # group sizes grow with customer count — the minimal safe rung
    # (and the k5 flip) is scale-coupled.
    "qd56_generalization_ladder",
    # dropped-doc statistics only exist where sf0.1 plants exact dups
    # (sf0.01 drops nothing — every dropped_mean is NULL there).
    "qc62_survivorship_quality_shift",
    # neighbor structure (and therefore votes/accuracy) shifts with
    # corpus size; re-pin the LOO eval where the corpus is 10x denser.
    "q86c_knn_loo_classification",
    # pair density is corpus-coupled (48 pairs at sf0.01, 57 at sf0.1
    # with different orders) — re-pin the blocked self-join at scale.
    "qa45_duplicate_lineitem_screen",
    # frontier membership is density-coupled (ties and strictly-cheaper
    # minima shift with catalog size); re-pin the sort-based skyline
    # against the quadratic oracle at scale.
    "qa46_pareto_frontier",
    # dup rate flips from 0 to nonzero only at sf0.1 (planted dups).
    "qp16_dataset_card",
    # measured two-stage recall is corpus-coupled (shortlist depth 50
    # covers a different fraction of a 10x corpus).
    "q85l_mrl_two_stage_retrieval",
    # the isotropy identity's integer headroom (sum qv^2) and the
    # anisotropy value itself are corpus-coupled.
    "q88b_embedding_isotropy",
    # flatline runs are planted-density-coupled (2 at sf0.01, 9 at
    # sf0.1 across different users).
    "qd60_flatline_detector",
    # class boundaries (ABC shares, CV cutoffs) move with volume — the
    # X/Y/Z split is only meaningful under sf0.1 weekly demand density.
    "qa47_abc_xyz_matrix",
    # round-9 additions: ml46's approxQuantile-median plateau margin is
    # scale-coupled (plateau width ~100 rows at sf0.01 vs ~1000 at
    # sf0.1 — the cross-engine-exactness claim must hold where n, and
    # the GK rank-error window, are 10x); ml45's subsequence supports
    # and the ceil-threshold row set shift with user/event density;
    # q84k rides the strong-graph substrate like q84g/h/i (wedge and
    # closing-edge density are co-purchase-coupled); ml47's rounding
    # margins sit on 10x-larger residual sums; ml48's one-hot index
    # order depends on the sf0.1 lang-frequency ranking (a tie at one
    # scale and not another would surface here).
    "ml45_prefixspan_sequences",
    "ml46_imputer_stage",
    "ml47_glm_gaussian",
    "ml48_rformula_features",
    "ml48b_rformula_interaction",
    "q84k_motif_triads",
    # round-10 additions: q84l rides the strong co-purchase graph
    # (wedge/context density is corpus-coupled, like q84h/i); q28e's
    # rank-error bound sum(step-1) and shard steps only grow teeth at
    # sf0.1 row counts; q28f's register file is DENSE at 20k distinct
    # parts vs 2k (same reason q28c is re-pinned); q10d's fill level
    # and measured FPR are build-set-size-coupled (the 16384-bit
    # sizing is FOR sf0.1 — the re-pin proves it holds there); ml49's
    # plateau-interior rank argument must hold where plateaus are 10x
    # wider.
    "q84l_distributional_similarity",
    "q28e_mergeable_quantile_digest",
    "q28f_hyperloglog_whitebox",
    "q10d_bloom_prefilter_whitebox",
    "ml49_quantile_discretizer",
    # q28g's register density and intersection/union ratio both shift
    # with the 10x part catalog — same re-pin rationale as q28f/q28c.
    "q28g_hll_set_algebra",
]

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_bench():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_BENCH}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_sf01_parity(spark, oracle_bench, name):
    spdf = entry.queries()[name](spark, SF_BENCH).toPandas()
    opdf = oracle_bench.execute(entry.oracle_sql()[name]).df()
    compare(spdf, opdf, f"{name}@sf0.1")

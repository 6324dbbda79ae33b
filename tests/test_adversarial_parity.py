"""Adversarial dialect-parity fixture (round-3 verdict item #2).

The ADVICE.md bug class across rounds — oracle parity that holds only by
LUCK of fixture data — was always fixed point-wise (qd13's ln(0) empty
bin, qc19's double-vs-decimal floor, q73's single-space tokenizer,
q79b's descending-sequence crash on short docs, mm05's empty-payload
phantom row).  This module pins the CLASS: a synthetic scale-factor
directory plants every known edge case

  * zero-token / whitespace-only / leading-trailing / double-space /
    tab-bearing documents (tokenizer + HOF-sequence guards),
  * documents shorter than every n-gram/shingle/winnow window
    (descending F.sequence crash class),
  * exact duplicate documents (winnow/span-dup positive pairs),
  * an empty current-side PSI bin (ln(0) clamp),
  * quantile groups with full ties, single rows, and exact-integer
    interpolation positions (percentile boundary class),
  * starved AND unstarved mixture languages (waterfill branches),
  * a temperature weight whose float product sits epsilon BELOW an
    integer (the round-before-floor cliff, searched at build time),
  * payloads of exactly 256 / over-256 bytes (mm05 truncation edge),

then replays the luck-sensitive oracle families against DuckDB on that
data with the same row+schema+multiset gate the driver uses.  If any
clamp / round-guard / short-doc filter is removed, at least one family
here crashes or hash-diverges — the fixture data makes every guard
load-bearing, which the stock TPC-H-ish fixtures do not.
"""

from __future__ import annotations

import datetime
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_ml_optimization_spark import registry

from .harness import run_and_compare

_TEMP_ALPHA = 0.5
_BUDGET = 20000  # _WATERFILL_BUDGET (pinned by test_constants below)

# The luck-sensitive oracle families (round-3 verdict list + the three
# round-3 ADVICE call sites + the shingle-guard consumers found while
# building this fixture).
ADV_FAMILIES = [
    "qd13_psi_drift",            # empty cur bin -> ln(0) clamp
    "qc19_mixture_waterfill",    # starved/unstarved + floor guard
    "qc20_temperature_mixture",  # data-driven weight floor cliff
    "qc04_token_budget_pack",    # raw-split token counting parity
    "qc05_repetition_ratio",     # HOF token stats on degenerate docs
    "q22_percentiles",           # tie/single-row/interpolation quantiles
    "q73_simhash",               # zero-token docs must emit NO signature
    "q73b_simhash_arrow",        # same, Arrow kernel
    "q72c_minhash_portable",     # shingle guard on <3-token docs
    "q74c_duplicate_spans",      # span guard on <5-token docs
    "q79b_winnowing",            # winnow guard on <4-token docs
    "mm03_decode_features",      # PPM decode of degenerate/empty text
    "mm05_perceptual_hash_neardup",  # empty payload -> no phantom pair
    # round-4 wave-5 luck-sensitive additions:
    "q65b_asof_tolerance",       # exact-tolerance / same-instant / tie clicks
    "qd19_calibration_audit",    # deterministic bin edges under score ties
    "ml27_roc_auc_relational",   # midrank correction under pos/neg score ties
    "qd21_order_reconciliation", # exact-match and exactly-1% headers
    "qa23_idle_rich_accounts",   # balance exactly AT the cent-exact average
    # round-4 wave-6/7 luck-sensitive additions:
    "q81b_bm25_retrieval",       # zero-dl docs + planted query-term docs
    "q83d_pmi_cooccurrence",     # vocab top-30 cut inside heavy df ties
    "qc25_dsir_importance",      # zero-token docs emit NO importance row
    "qc29_bigram_surprisal",     # <2-token docs (descending-sequence class)
    "ml28_decile_lift",          # ntile tiebreak under equal-n_chars docs
    "qc31_threshold_sensitivity",  # pairs landing EXACTLY on t/10 boundaries
    "qd24_emd_drift",            # collapsed value grids / one-sided splits
    "qc33_heldout_perplexity",   # short docs both splits + OOV null joins
    "qc32_weighted_median_length",  # zero-token docs inside the cum window
    # round-5 luck-sensitive additions:
    "qc34_bpe_token_count",      # merge boundaries, vocab-word docs, fallbacks
    "qc35_bpe_budget_pack",      # BPE counts through the packing window
    "qc36_html_strip_gate",      # entity decode + anchor extraction on degenerate docs
    "mm08_audio_features",       # constant/fill-only PCM clips (zero crossings = 0)
    "qd25_exact_quantiles_distributed",  # integer position gates on tiny n
    "qd29_late_arrival_audit",   # planted out-of-order purchase (event 8: 2 min late)
    "qd28_staleness_profile",    # multi-day gaps between planted event days
    # round-6 luck-sensitive additions:
    "qc42_bpe_merge_training",   # identical-symbol runs in the re-segment replace
    "qc43_bpe_learned_count",    # learned-vocab greedy scan over the same plants
    "q80d_cavnar_trenkle_langid",  # <3-char docs excluded; profile rank ties
    "mm09_scene_change",         # empty/short docs pad to all-dot frames (delta 0)
    "q66d_nearest_event_join",   # same-instant clicks, equal-gap ties, clickless users
    "q68g_twap",                 # same-instant events (zero-duration segments drop)
    "qc44_overflow_packing",     # zero-token docs excluded; boundary-exact splits
    "q80e_langid_prf",           # zero-support classes -> explicit NULL rates
    "qc45_contaminated_span",    # exact-duplicate docs -> full-length spans; short docs
    # round-7 luck-sensitive additions:
    "qc48_domain_frequency_cap",  # sources above AND below the 15-doc cap
    "qc47_epoch_shuffle_order",   # single-doc sources (min_pos == max_pos)
    "q53f_url_functions",         # empty-text docs still mint parseable URLs
    # round-7 wave V-AE luck-sensitive additions:
    "mm11_phash_scale_invariance",  # <2-byte payloads excluded BOTH sides
    "qc62_survivorship_quality_shift",  # zero-dropped sources -> NULL guard
    "qp16_dataset_card",          # empty/whitespace docs (0-token counts)
    "qc59_cross_source_flow",     # planted exact dups -> non-empty matrix
    "qd52_poisson_fit_audit",     # basket sizes past the k=7 ladder -> NULL
    "q68n_leadlag_xcorr",         # sparse planted days (zero-filled spine)
    "qc60_weighted_priority_sample",  # n close to k (tau = corpus minimum)
    "qd53_k_anonymity_audit",     # singleton QI groups on the tiny fixture
    "qd34_holt_trend_backtest",   # single-day event types -> NULL-wape guard
    "q84f_kcore_peel",            # k above the synthetic graph's max degree -> empty-core rounds
    # round-7 second-wave luck-sensitive additions:
    "qd35_mann_whitney_u",        # '5-LOW' absent -> empty B group, z NULL-guarded
    "qd37_mahalanobis_outliers",  # near-collinear (price = 1000+3*qty) covariance
    "q52d_business_days",         # every adv gap negative -> exclusion filter = empty result
    "q47b_distinct_count_window", # single part per supplier + tied shipdates (tiebreak total order)
    "q83e_rake_keywords",         # empty/whitespace docs -> empty-string phrase islands
    "qc49_kn_bigram_lm",          # probe words absent -> NULL first-token guard everywhere
    "qc50_mixture_temperature",   # no probe langs at all -> NULL-propagating empty aggregate
    "q84g_label_propagation",     # single-part baskets -> EMPTY strong graph rounds
    "q84h_adamic_adar",           # empty strong graph -> zero candidate pairs
    # round-7 wave L-R luck-sensitive additions:
    "q66e_interval_coverage",     # same-instant events (tie order) + exact-adjacency merges
    "q68l_ohlc_bars",             # same-instant open/close picks resolved by composite key
    "qa37_window_funnel",         # same-microsecond stage ties under strict >; stage-less users
    "qc53_length_bucket_packing", # ragged last batch; degenerate single-token docs
    "qc54_dup_ngram_fraction",    # <5-token docs excluded; all-identical-token docs fully covered
    "qd48_scd2_validity_audit",   # duplicate order dates: tied v_start + NULL-end ordering (the
                                  # Spark-NULLS-FIRST vs DuckDB-NULLS-LAST trap fixed via vid tiebreak)
    "qd47_outlier_consensus",     # percentile boundaries under heavy ties; tiny groups
    "qp13_point_in_time_features",  # single-order customers: first-month rows correctly dropped
    "qp14_ab_experiment_pipeline",  # tiny arms; zero-conversion arm keeps z finite via pooled rate
    # round-8 luck-sensitive additions (mm07 summation-order finding):
    "mm07_resolution_profile",    # integer-pair group mean over degenerate/empty docs
    "qp7_media_pipeline",         # lcm-scaled integer mean across mixed pixel counts
]


def _tokens(n: int, salt: int) -> str:
    """n single-spaced tokens from a small recurring vocabulary."""
    return " ".join(f"tok{(i * 7 + salt) % 37}" for i in range(n))


def _edge_docs() -> list[tuple[int, str, str, str]]:
    """(doc_id, text, lang, source) for the hand-planted edge documents."""
    pair = _tokens(24, salt=5)
    return [
        (0, "", "xx", "adv"),                    # empty text / empty payload
        (1, " ", "xx", "adv"),                   # all-whitespace
        (2, "   ", "xx", "adv"),                 # 4 empty tokens
        (3, "one", "xx", "adv"),                 # 1 token (< every window)
        (4, "one two", "xx", "adv"),             # 2 tokens (< shingle n)
        (5, "one two three", "xx", "adv"),       # 3 tokens (< winnow k)
        (6, "alpha  beta gamma", "xx", "adv"),   # double space
        (7, " lead trail ", "xx", "adv"),        # leading/trailing space
        (8, "tab\there now", "xx", "adv"),       # tab inside a token
        (9, pair, "xx", "adv"),                  # exact duplicate pair:
        (10, pair, "xx", "adv"),                 # winnow/span positives
        (11, _tokens(5, salt=9), "xx", "adv"),   # grams but no winnow fps
        (12, "c" * 300, "xx", "adv"),            # payload > 256 bytes
        (13, "b" * 256, "xx", "adv"),            # payload == 256 bytes
        (14, "a a a a a a", "xx", "adv"),        # max repetition
        (15, "spark join window spark", "xx", "adv"),  # all 3 BM25 terms
        (16, "spark alone here", "xx", "adv"),   # 1 BM25 term
        # qc34/qc35 BPE merge-boundary plants: whole words that ARE
        # vocab entries, greedy-vs-alternative boundaries (thing ->
        # th+ing, never the+?), overlap cascades (mentment, theththe),
        # tail matches (xxthe), and sub-merge-length fallbacks (th, t).
        (17, "the ing tion ough", "xx", "adv"),
        (18, "thing bother ingenious mentment", "xx", "adv"),
        (19, "xxthe th t", "xx", "adv"),
        (20, "theththe ententio ionion", "xx", "adv"),
        # qc42/qc43 BPE TRAINING plants: runs of identical symbols.  A
        # merge pair whose left == right (z,z wins a round outright;
        # a,a exercises odd-length leftovers) makes the left-to-right
        # NON-OVERLAP semantics of the re-segment step load-bearing —
        # a shared-delimiter replace encoding would merge (4,5) where
        # the greedy fold merges (3,4) and hash-diverge here.
        (21, "zzzz zzzz zzzz zzzz zzzz zzzz zzzz", "xx", "adv"),
        (22, "aaaa aaaa aaaa aaa oooo ooo", "xx", "adv"),
    ]


#: Mixture-language corpus sizes (docs x tokens) chosen so qc19's
#: fixed weights leave en/zh starved and es/fr/de unstarved.
_MIX = {"en": (30, 100), "zh": (10, 50), "es": (40, 100), "fr": (25, 100), "de": (12, 100)}


def _find_floor_cliff_filler(base_tokens: dict[str, int]) -> int:
    """Search the size of one extra 'en' filler doc such that some
    language's 6-dp temperature weight w satisfies: w*BUDGET is exactly
    an integer in decimal arithmetic but the IEEE double product lands
    BELOW it — the precise case qc20's round-before-floor guard exists
    for.  Deterministic given the corpus construction; fails loudly if
    construction drift makes the cliff unreachable."""
    for extra in range(0, 5000):
        tot = dict(base_tokens)
        tot["en"] += extra
        sq = {k: math.sqrt(v) for k, v in tot.items()}
        tp = sum(sq.values())
        for s in sq.values():
            w = round(s / tp, 6)
            k6 = round(w * 1e6)
            if k6 % (10**6 // _BUDGET) == 0 and math.floor(w * _BUDGET) < k6 // (10**6 // _BUDGET):
                return extra
    raise AssertionError("no floor-cliff filler found — fixture drifted")


def _build_documents() -> tuple[pa.Table, int]:
    rows = list(_edge_docs())
    next_id = 23
    for lang, (n_docs, n_tok) in _MIX.items():
        for d in range(n_docs):
            rows.append((next_id, _tokens(n_tok, salt=next_id), lang, f"src{d % 3}"))
            next_id += 1
    # ml27/qd19 tie plant: one POSITIVE ('en') and one NEGATIVE ('fr')
    # doc with IDENTICAL n_chars -> identical score -> the Mann-Whitney
    # midrank correction and the shared calibration bin are load-bearing.
    tie_text = "tied score doc with fixed length"
    rows.append((next_id, tie_text, "en", "src1"))
    rows.append((next_id + 1, tie_text, "fr", "src1"))
    next_id += 2
    base = {}
    for _, text, lang, _src in rows:
        base[lang] = base.get(lang, 0) + len(text.split(" "))
    filler = _find_floor_cliff_filler(base)
    rows.append((next_id, _tokens(filler, salt=1), "en", "src0"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    return tbl, filler


def _build_orders() -> pa.Table:
    rows = []
    ref_day = datetime.datetime(1995, 6, 1)
    cur_day = datetime.datetime(1999, 3, 15)
    # ref side: 100 evenly spaced prices -> clean deciles, every ref bin
    # populated by construction.
    for i in range(100):
        rows.append((i, 1, "F", 100.0 + 10.0 * i, ref_day, "1-URGENT"))
    # cur side: all mass above the ref P90 decile -> bins 1..9 have
    # n_cur = 0 (the ln(0) clamp is load-bearing), plus one value
    # EXACTLY on the ref P10 edge (199.0) to pin the > boundary.
    for j in range(30):
        rows.append((100 + j, 1, "O", 2000.0 + j, cur_day, "1-URGENT"))
    rows.append((130, 1, "O", 199.0, cur_day, "1-URGENT"))
    # qd21 reconciliation plants (lineitems under _build_lineitem):
    # 200 = header EXACTLY equals its line sum (diff 0, not mismatched);
    # 201 = diff exactly 1% of header (boundary: NOT > -> clean);
    # 202 = diff 1.01% (just over -> mismatched).
    rows.append((200, 1, "R", 500.0, ref_day, "1-URGENT"))
    rows.append((201, 1, "R", 100.0, ref_day, "1-URGENT"))
    rows.append((202, 1, "R", 100.0, ref_day, "1-URGENT"))
    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def _build_lineitem() -> pa.Table:
    groups = {
        "A": [float(i) for i in range(1, 11)],  # (n-1)*q fractional interp
        "B": [5.0] * 7,                          # full ties
        "C": [42.0],                             # single row
        "D": [1.0, 2.0],                         # two rows (median = interp)
        "E": [1.0, 2.0, 2.0, 100.0],             # tie AT the quantile
        "F": [0.1, 0.2, 0.3, 0.4, 0.5],          # repeating-binary values
    }
    rows = []
    k = 0
    for flag, vals in groups.items():
        for v in vals:
            rows.append((k, 1, 1, 1, v, 1000.0 + v * 3.0, 0.0, 0.0, flag, "O"))
            k += 1
    # qd21 reconciliation lines (tax/discount 0 so line total == price):
    # order 200 reconciles exactly; 201 misses by exactly 1%; 202 by
    # 1.01% — the >1% threshold's both sides, in exact integer micros.
    rows.append((200, 1, 1, 1, 5.0, 500.0, 0.0, 0.0, "G", "O"))
    rows.append((201, 1, 1, 1, 5.0, 101.0, 0.0, 0.0, "G", "O"))
    rows.append((202, 1, 1, 1, 5.0, 101.01, 0.0, 0.0, "G", "O"))
    ship = datetime.datetime(1995, 1, 1)
    return pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
            "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
            "l_discount": pa.array([r[6] for r in rows], pa.float64()),
            "l_tax": pa.array([r[7] for r in rows], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
            "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
            "l_shipdate": pa.array([ship] * len(rows), pa.timestamp("us")),
        }
    )


def _build_events() -> pa.Table:
    """As-of tolerance boundary plants (q65b, TOL = 15 min):
    same-instant click/purchase, a purchase at EXACTLY TOL after its
    click (<= matches), one at TOL+1µs (does not), two same-instant
    clicks with different values (max-value tie rule), a click only
    AFTER its user's purchase, and a user with no clicks at all."""
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    tol = datetime.timedelta(minutes=15)
    us1 = datetime.timedelta(microseconds=1)
    t1 = datetime.datetime(2026, 1, 2, 0, 0, 0)
    t2 = datetime.datetime(2026, 1, 3, 0, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        (1, t0, 1, "click", 5.0),
        (2, t0, 1, "purchase", 100.0),          # same instant -> match
        (3, t0 + tol, 1, "purchase", 101.0),    # exactly TOL -> match
        (4, t0 + tol + us1, 1, "purchase", 102.0),  # TOL+1µs -> NULL
        (5, t1, 2, "click", 3.0),
        (6, t1, 2, "click", 7.0),               # same-instant tie -> max 7
        (7, t1 + m, 2, "purchase", 50.0),
        (8, t1 - m, 2, "purchase", 51.0),       # click only after -> NULL
        (9, t2, 3, "purchase", 60.0),           # user has no clicks
        (10, t2 + m, 3, "click", 1.0),
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    )


def _build_customer() -> pa.Table:
    """qa23 plants: positive selected balances {2.00, 2.00, 1.00, 3.00}
    -> cent-exact average 200; a customer balance EXACTLY at the
    average must be excluded (strict >), negatives/zeros never enter
    the average, an unselected nationkey bucket is filtered, and the
    one with-orders customer (custkey 1, referenced by adv orders)
    exercises the anti-join."""
    rows = [
        (1, "a", 0, 2.00, "BUILDING"),   # has orders -> anti-joined away
        (2, "b", 1, 2.00, "BUILDING"),   # == average -> excluded
        (3, "c", 2, 1.00, "BUILDING"),
        (4, "d", 3, 3.00, "BUILDING"),   # the single survivor
        (5, "e", 4, 9.99, "BUILDING"),   # bucket 4: not selected
        (6, "f", 7, -5.00, "BUILDING"),  # negative: outside the average
        (7, "g", 1, 0.00, "BUILDING"),   # zero: outside the average
    ]
    return pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([r[1] for r in rows], pa.string()),
            "c_nationkey": pa.array([r[2] for r in rows], pa.int32()),
            "c_acctbal": pa.array([r[3] for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[4] for r in rows], pa.string()),
        }
    )


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_sf")
    docs, filler = _build_documents()
    pq.write_table(docs, str(d / "documents.parquet"))
    pq.write_table(_build_orders(), str(d / "orders.parquet"))
    pq.write_table(_build_lineitem(), str(d / "lineitem.parquet"))
    pq.write_table(_build_events(), str(d / "events.parquet"))
    pq.write_table(_build_customer(), str(d / "customer.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "orders", "lineitem", "events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{adv_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ADV_FAMILIES)
def test_adversarial_parity(spark, adv_duck, adv_dir, name):
    q = registry.all_queries()[name]
    assert q.oracle is not None, f"{name} lost its oracle"
    run_and_compare(spark, adv_duck, q.fn, q.oracle, f"adv:{name}", adv_dir)


def test_constants_pinned():
    """The fixture engineering above assumes these module constants; a
    silent change would un-load-bear the planted edges."""
    from spark_ml_optimization_spark.operators import curation, dedup, text

    assert curation._WATERFILL_BUDGET == _BUDGET
    assert curation._TEMP_ALPHA == _TEMP_ALPHA
    assert text._WINNOW_K == 4 and text._WINNOW_W == 5
    assert dedup._SPAN == 5


def test_edges_are_load_bearing(spark, adv_duck, adv_dir):
    """Prove the planted edges actually exercise each guard — i.e. the
    adversarial data reaches the code paths the guards protect."""
    # 1. PSI: >= 5 bins with zero current-side mass (ln(0) clamp hit).
    empty_bins = adv_duck.execute(
        """
        WITH ref AS (SELECT o_totalprice FROM orders WHERE year(o_orderdate) <= 1997),
        edges AS (SELECT quantile_cont(o_totalprice,
                   [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e FROM ref),
        cur AS (SELECT o_totalprice FROM orders WHERE year(o_orderdate) > 1997),
        binned AS (SELECT 1 + len(list_filter((SELECT e FROM edges),
                          x -> o_totalprice > x)) AS bin FROM cur)
        SELECT 10 - count(DISTINCT bin) FROM binned
        """
    ).fetchone()[0]
    assert empty_bins >= 5, "no empty current-side PSI bins planted"

    # 2. Waterfill: both starved and unstarved languages present.
    q = registry.all_queries()["qc19_mixture_waterfill"]
    starved = {r["starved"] for r in q.fn(spark, adv_dir).collect()}
    assert starved == {0, 1}, f"waterfill branches not both hit: {starved}"

    # 3. SimHash: zero-token docs emit NO signature row.
    n_docs = adv_duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    q73 = registry.all_queries()["q73_simhash"]
    n_sigs = q73.fn(spark, adv_dir).count()
    assert n_sigs == n_docs - 3, "docs 0/1/2 (no tokens) must have no signature"

    # 4. Winnowing: the exact-duplicate pair surfaces; short docs don't crash.
    q79b = registry.all_queries()["q79b_winnowing"]
    pairs = {(r["doc_a"], r["doc_b"]) for r in q79b.fn(spark, adv_dir).collect()}
    assert (9, 10) in pairs, "planted duplicate pair missed by winnowing"

    # 5. mm05: the empty-payload doc appears in no near-dup pair.
    mm05 = registry.all_queries()["mm05_perceptual_hash_neardup"]
    ids = set()
    for r in mm05.fn(spark, adv_dir).collect():
        ids.add(r["doc_a"])
        ids.add(r["doc_b"])
    assert 0 not in ids, "empty payload produced a phantom near-dup pair"

    # 6. qc20: some language's weight sits on the float floor cliff —
    # floor(w*B) in raw IEEE arithmetic lands BELOW the decimal-exact
    # product, so removing the round-before-floor guard diverges.
    q20 = registry.all_queries()["qc20_temperature_mixture"]
    rows = q20.fn(spark, adv_dir).collect()
    on_cliff = [
        r["lang"]
        for r in rows
        if round(r["temp_weight"] * 1e6) % (10**6 // _BUDGET) == 0
        and math.floor(r["temp_weight"] * _BUDGET)
        < round(r["temp_weight"] * 1e6) // (10**6 // _BUDGET)
    ]
    assert on_cliff, "no language landed on the floor cliff — filler search broken"

    # 7. q65b: the planted tolerance boundaries resolve exactly as
    # specified (exactly-TOL matches, TOL+1µs does not, same-instant
    # ties take the max-value click, click-after and no-click are NULL).
    q65b = registry.all_queries()["q65b_asof_tolerance"]
    by_id = {r["event_id"]: r for r in q65b.fn(spark, adv_dir).collect()}
    assert by_id[2]["click_value"] == 5.0, "same-instant click must match"
    assert by_id[3]["click_value"] == 5.0, "exactly-TOL click must match"
    assert by_id[4]["click_value"] is None, "TOL+1µs click must NOT match"
    assert by_id[7]["click_value"] == 7.0, "same-instant tie must take max"
    assert by_id[8]["click_value"] is None, "click-after must not match"
    assert by_id[9]["click_value"] is None, "no-click user must be NULL"

    # 8. qa23: only the above-average no-orders customer survives; the
    # balance exactly AT the cent-exact average is excluded.
    qa23 = registry.all_queries()["qa23_idle_rich_accounts"]
    surv = {(r["cntrycode"], r["numcust"]) for r in qa23.fn(spark, adv_dir).collect()}
    assert surv == {(3, 1)}, f"qa23 boundary plants resolved wrong: {surv}"

    # 9. qd21: the exactly-1%-off header is CLEAN, the 1.01% one is not.
    qd21 = registry.all_queries()["qd21_order_reconciliation"]
    g = {r["o_orderstatus"]: r for r in qd21.fn(spark, adv_dir).collect()}
    # orders 200/201/202 carry their own status 'R': 200 diff=0 and
    # 201 diff exactly 1% are CLEAN, 202 at 1.01% is the one mismatch.
    assert g["R"]["n_orders"] == 3, g["R"]
    assert g["R"]["n_lineless"] == 0, g["R"]
    assert g["R"]["n_mismatched"] == 1, g["R"]

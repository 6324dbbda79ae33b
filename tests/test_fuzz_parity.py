"""Seeded differential query fuzzer vs DuckDB (SQLancer/TLP-style).

The adversarial suite (`test_adversarial_parity.py`) is hand-planted
edge-case families; this module GENERATES queries nobody thought to
plant.  Two public techniques, both deterministic (seeded PRNG, no
wall-clock, no Math.random — every CI run fuzzes the identical corpus):

1. **Differential testing** (SQLancer's core loop, Rigger & Su 2020):
   generate a query in the ANSI subset both engines parse identically,
   run the SAME SQL text through Spark SQL and DuckDB over the same
   parquet fixtures, and compare row multisets with the driver-shaped
   `harness.compare`.  Templates cover filter/project, group-by
   aggregates (+HAVING), FK joins (inner/left), set operations,
   IN / NOT IN subqueries (three-valued logic with planted NULLs),
   DISTINCT over CASE projections, windows, ROLLUP, correlated
   EXISTS, explicit-NULLS-placement ordered LIMIT pages, FILTER-clause
   aggregates, (round-8 wave 2) bounded ROWS window frames +
   ntile/first_value, correlated LATERAL top-k, multi-way USING
   joins, recursive-CTE zero-filled spines, and (round-9 wave 3)
   parenthesized three-branch set-op compositions with ALL variants
   over grouped+HAVING branches, HAVING-vs-scalar-subquery, and
   two-level IN/EXISTS nesting down FK chains with deepest-level
   NOT IN NULL poisoning.
2. **Ternary Logic Partitioning** (TLP, Rigger & Su 2020): for a random
   predicate p, `count(*)` must equal `count p` + `count NOT p` +
   `count p IS NULL` — evaluated per-engine (self-consistency catches
   optimizer bugs without an oracle) and then cross-engine.

Generator hygiene that keeps the subset dialect-safe (the traps are the
repo's documented DuckDB-vs-Spark list, SCALE.md / SKILL.md):
- integer-only aggregate outputs (sums/counts/min/max; doubles enter
  only as exact `CAST(round(x*100) AS BIGINT)` cents),
- no `avg`, no division, no LIMIT-without-total-order,
- timestamps appear in predicates only via `year()`/`month()` (both
  engines agree; raw timestamp projection differs in pandas dtype),
- NULLs are PLANTED via `nullif`/CASE so three-valued-logic paths
  (NOT IN, left-join nulls, IS NULL atoms) actually execute.

Any divergence this fuzzer ever finds graduates into a pinned plant in
test_adversarial_parity.py's ADV_FAMILIES (the standing policy).
"""

from __future__ import annotations

import random

import pytest

from .conftest import SF_CORRECT
from .harness import compare

# ---------------------------------------------------------------- schema

#: table -> (int cols, string cols, double(money) cols, timestamp cols)
META = {
    "region": (["r_regionkey"], ["r_name"], [], []),
    "nation": (["n_nationkey", "n_regionkey"], ["n_name"], [], []),
    "customer": (
        ["c_custkey", "c_nationkey"],
        ["c_name", "c_mktsegment"],
        ["c_acctbal"],
        [],
    ),
    "supplier": (["s_suppkey", "s_nationkey"], ["s_name"], ["s_acctbal"], []),
    "part": (
        ["p_partkey", "p_size"],
        ["p_name", "p_brand", "p_type"],
        ["p_retailprice"],
        [],
    ),
    "orders": (
        ["o_orderkey", "o_custkey"],
        ["o_orderstatus", "o_orderpriority"],
        ["o_totalprice"],
        ["o_orderdate"],
    ),
    "lineitem": (
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        ["l_returnflag", "l_linestatus"],
        ["l_extendedprice", "l_quantity"],
        ["l_shipdate"],
    ),
    "documents": (["doc_id", "n_chars"], ["lang", "source"], [], []),
    "events": (["event_id", "user_id"], ["event_type"], ["value"], ["ts"]),
}

#: Two-level FK chains for nested-subquery templates:
#: (outer table, outer FK, middle table, middle key, middle FK,
#:  inner table, inner key)
FK_CHAINS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey", "o_custkey",
     "customer", "c_custkey"),
    ("orders", "o_custkey", "customer", "c_custkey", "c_nationkey",
     "nation", "n_nationkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey", "n_regionkey",
     "region", "r_regionkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", "s_nationkey",
     "nation", "n_nationkey"),
]

#: FK join edges: (left table, left col, right table, right col)
FK_EDGES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

PREFIX = "fz_"  # dedicated view names so the fuzzer never collides
FUZZ_TABLES = sorted(META)

#: true unique key per table (window-order tiebreaks MUST be total —
#: lineitem needs the composite; everything else has a single key col)
UNIQ_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "documents": ["doc_id"],
    "events": ["event_id"],
}


# ------------------------------------------------------------- generator


class Gen:
    """Deterministic query generator: one PRNG seeded per query, every
    choice drawn from it — the corpus is a pure function of the seed."""

    def __init__(self, seed: int):
        self.r = random.Random(seed)

    # -- scalar atoms ---------------------------------------------------

    def _int_atom(self, t: str, q: str = "") -> str:
        ints, strs, cents, ts = META[t]
        col = q + self.r.choice(ints)
        k = self.r.randint(2, 13)
        op = self.r.choice(["<", "<=", "=", "<>", ">", ">="])
        return f"({col} % {k}) {op} {self.r.randint(0, k - 1)}"

    def _str_atom(self, t: str, q: str = "") -> str:
        ints, strs, cents, ts = META[t]
        col = q + self.r.choice(strs)
        kind = self.r.randrange(3)
        ch = self.r.choice("abcdefgmnoprstuACFHLMNOPRSU0123456789")
        if kind == 0:
            return f"{col} LIKE '%{ch}%'"
        if kind == 1:
            return f"{col} >= '{ch}'"
        return f"substring({col}, 1, 1) = '{ch}'"

    def _money_atom(self, t: str, q: str = "") -> str:
        ints, strs, cents, ts = META[t]
        if not cents:
            return self._int_atom(t, q)
        col = q + self.r.choice(cents)
        lit = self.r.randint(1, 9000)
        op = self.r.choice(["<", ">=", ">"])
        return f"{col} {op} {lit}.{self.r.randint(0, 99):02d}"

    def _ts_atom(self, t: str, q: str = "") -> str:
        ints, strs, cents, ts = META[t]
        if not ts:
            return self._str_atom(t, q)
        col = q + self.r.choice(ts)
        if self.r.random() < 0.5:
            return f"(year({col}) % {self.r.randint(2, 4)}) = 0"
        return f"month({col}) {self.r.choice(['<', '>='])} {self.r.randint(2, 11)}"

    def _null_atom(self, t: str, q: str = "") -> str:
        ints, strs, cents, ts = META[t]
        col = q + self.r.choice(ints)
        k = self.r.randint(3, 9)
        neg = self.r.choice(["", "NOT "])
        return f"nullif({col} % {k}, {self.r.randint(0, k - 1)}) IS {neg}NULL"

    def predicate(self, t: str, q: str = "", depth: int = 0) -> str:
        """Random boolean expression over table t's columns (alias q)."""
        if depth < 2 and self.r.random() < 0.45:
            a = self.predicate(t, q, depth + 1)
            b = self.predicate(t, q, depth + 1)
            conj = self.r.choice(["AND", "OR"])
            neg = "NOT " if self.r.random() < 0.2 else ""
            return f"{neg}(({a}) {conj} ({b}))"
        pick = self.r.choice(
            [self._int_atom, self._str_atom, self._money_atom, self._ts_atom,
             self._null_atom]
        )
        return pick(t, q)

    # -- projections / aggregates --------------------------------------

    def _proj_exprs(self, t: str, q: str = "") -> list[str]:
        ints, strs, cents, ts = META[t]
        out = []
        n = self.r.randint(1, 3)
        for i in range(n):
            kind = self.r.randrange(4)
            if kind == 0:
                out.append(f"{q}{self.r.choice(ints)} AS c{i}")
            elif kind == 1:
                out.append(f"{q}{self.r.choice(strs)} AS c{i}")
            elif kind == 2 and cents:
                col = q + self.r.choice(cents)
                out.append(f"CAST(round({col} * 100) AS BIGINT) AS c{i}")
            else:
                p = self.predicate(t, q, depth=2)
                a, b = self.r.sample("wxyz", 2)
                out.append(f"CASE WHEN {p} THEN '{a}' ELSE '{b}' END AS c{i}")
        # planted NULLs in ~1/3 of projections (three-valued output path)
        if self.r.random() < 0.33 and ints:
            col = q + self.r.choice(ints)
            k = self.r.randint(3, 7)
            out.append(f"nullif({col} % {k}, {self.r.randint(0, k - 1)}) AS cn")
        return out

    def _group_key(self, t: str, q: str = "") -> str:
        ints, strs, cents, ts = META[t]
        if self.r.random() < 0.5:
            return f"({q}{self.r.choice(ints)} % {self.r.randint(2, 12)})"
        return f"substring({q}{self.r.choice(strs)}, 1, 1)"

    def _agg_exprs(self, t: str, q: str = "") -> list[str]:
        ints, strs, cents, ts = META[t]
        out = ["count(*) AS cnt"]
        n = self.r.randint(1, 3)
        for i in range(n):
            kind = self.r.randrange(6)
            if kind == 0:
                out.append(f"count(DISTINCT {q}{self.r.choice(ints)}) AS a{i}")
            elif kind == 1:
                k = self.r.randint(2, 13)
                out.append(
                    f"CAST(sum({q}{self.r.choice(ints)} % {k}) AS BIGINT) AS a{i}"
                )
            elif kind == 2:
                out.append(f"min({q}{self.r.choice(ints)}) AS a{i}")
            elif kind == 3:
                out.append(f"max({q}{self.r.choice(strs)}) AS a{i}")
            elif kind == 4 and cents:
                col = q + self.r.choice(cents)
                out.append(
                    f"CAST(sum(CAST(round({col} * 100) AS BIGINT)) AS BIGINT) AS a{i}"
                )
            else:
                p = self.predicate(t, q, depth=2)
                out.append(
                    f"CAST(sum(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT) AS a{i}"
                )
        return out

    # -- query templates -------------------------------------------------

    def q_filter_project(self) -> str:
        t = self.r.choice(FUZZ_TABLES)
        cols = ", ".join(self._proj_exprs(t))
        return f"SELECT {cols} FROM {PREFIX}{t} WHERE {self.predicate(t)}"

    def q_groupby(self) -> str:
        t = self.r.choice(FUZZ_TABLES)
        keys = [self._group_key(t) for _ in range(self.r.randint(1, 2))]
        key_sel = ", ".join(f"{k} AS k{i}" for i, k in enumerate(keys))
        aggs = ", ".join(self._agg_exprs(t))
        having = (
            f" HAVING count(*) > {self.r.randint(1, 5)}"
            if self.r.random() < 0.4
            else ""
        )
        return (
            f"SELECT {key_sel}, {aggs} FROM {PREFIX}{t} "
            f"WHERE {self.predicate(t)} "
            f"GROUP BY {', '.join(keys)}{having}"
        )

    def q_join(self) -> str:
        lt, lc, rt, rc = self.r.choice(FK_EDGES)
        jt = self.r.choice(["JOIN", "LEFT JOIN"])
        key = self._group_key(lt, "a.")
        aggs = self._agg_exprs(rt, "b.")[: self.r.randint(2, 3)]
        where = self.predicate(lt, "a.")
        # extra right-side predicate: in ON for LEFT (keeps nulls), in
        # WHERE for INNER — both standard ANSI, both engines agree.
        on_extra = ""
        wh_extra = ""
        if self.r.random() < 0.5:
            rp = self.predicate(rt, "b.", depth=2)
            if jt == "LEFT JOIN":
                on_extra = f" AND ({rp})"
            else:
                wh_extra = f" AND ({rp})"
        return (
            f"SELECT {key} AS k0, {', '.join(aggs)} "
            f"FROM {PREFIX}{lt} a {jt} {PREFIX}{rt} b "
            f"ON a.{lc} = b.{rc}{on_extra} "
            f"WHERE ({where}){wh_extra} "
            f"GROUP BY {key}"
        )

    def q_setop(self) -> str:
        t = self.r.choice(FUZZ_TABLES)
        ints, strs, cents, ts = META[t]
        col_i, col_s = self.r.choice(ints), self.r.choice(strs)
        k = self.r.randint(2, 9)
        sel = f"SELECT ({col_i} % {k}) AS c0, substring({col_s}, 1, 1) AS c1"
        op = self.r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        return (
            f"{sel} FROM {PREFIX}{t} WHERE {self.predicate(t)} "
            f"{op} "
            f"{sel} FROM {PREFIX}{t} WHERE {self.predicate(t)}"
        )

    def q_in_subquery(self) -> str:
        lt, lc, rt, rc = self.r.choice(FK_EDGES)
        neg = self.r.choice(["", "NOT "])
        # ~half the NOT IN subqueries get a planted NULL: the poisoned
        # set must empty the result (three-valued logic) in BOTH engines.
        inner_col = rc
        if neg and self.r.random() < 0.5:
            k = self.r.randint(50, 200)
            inner_col = f"nullif({rc}, {rc} - ({rc} % {k}) + {self.r.randint(0, 9)})"
        return (
            f"SELECT count(*) AS cnt FROM {PREFIX}{lt} "
            f"WHERE ({self.predicate(lt)}) "
            f"AND {lc} {neg}IN "
            f"(SELECT {inner_col} FROM {PREFIX}{rt} WHERE {self.predicate(rt)})"
        )

    def q_distinct_case(self) -> str:
        t = self.r.choice(FUZZ_TABLES)
        cols = ", ".join(self._proj_exprs(t))
        return (
            f"SELECT DISTINCT {cols} FROM {PREFIX}{t} "
            f"WHERE {self.predicate(t)}"
        )

    def q_window(self) -> str:
        """Partitioned ranking/running-sum window over a total order —
        the tiebreak on the unique key keeps rank()/row_number()
        deterministic, so the multiset compare is exact."""
        t = self.r.choice(FUZZ_TABLES)
        ints, strs, cents, ts = META[t]
        uniq = ", ".join(UNIQ_COLS[t])
        uniq_sel = ", ".join(
            f"{c} AS u{i}" for i, c in enumerate(UNIQ_COLS[t])
        )
        part = self._group_key(t)
        fn = self.r.choice(["row_number()", "rank()", "dense_rank()"])
        order_col = self.r.choice(ints)
        k = self.r.randint(2, 9)
        win = (
            f"{fn} OVER (PARTITION BY {part} "
            f"ORDER BY ({order_col} % {k}), {uniq})"
        )
        run = (
            f"CAST(sum({order_col} % {k}) OVER (PARTITION BY {part} "
            f"ORDER BY ({order_col} % {k}), {uniq} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        )
        lagfn = self.r.choice(["lag", "lead"])
        lg = (
            f"coalesce({lagfn}({order_col} % {k}, 1) OVER ("
            f"PARTITION BY {part} ORDER BY ({order_col} % {k}), {uniq}), -1)"
        )
        return (
            f"SELECT {uniq_sel}, {win} AS rnk, {run} AS runsum, "
            f"{lg} AS lagv "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)}"
        )

    def q_exists(self) -> str:
        """Correlated EXISTS / NOT EXISTS along an FK edge."""
        lt, lc, rt, rc = self.r.choice(FK_EDGES)
        neg = self.r.choice(["", "NOT "])
        return (
            f"SELECT count(*) AS cnt FROM {PREFIX}{lt} a "
            f"WHERE ({self.predicate(lt, 'a.')}) AND {neg}EXISTS ("
            f"SELECT 1 FROM {PREFIX}{rt} b "
            f"WHERE b.{rc} = a.{lc} AND ({self.predicate(rt, 'b.', depth=2)}))"
        )

    def q_rollup(self) -> str:
        """ROLLUP grouping sets with grouping() disambiguation — the
        NULL-vs-subtotal-NULL trap both engines must agree on.

        HAVING cnt > 0 neutralizes the FIRST REAL DIVERGENCE this
        fuzzer found (seed 2): over an EMPTY filtered input, DuckDB
        (with Postgres and the standard: the () grouping set acts like
        an ungrouped aggregate) emits one grand-total row with
        count 0, Spark emits zero rows.  Subtotal rows can never have
        cnt = 0 (groups only form from rows), so the guard ONLY drops
        the empty-input grand total — pinned as a known divergence in
        test_known_divergence_rollup_empty_input below."""
        t = self.r.choice(FUZZ_TABLES)
        k1 = self._group_key(t)
        k2 = self._group_key(t)
        aggs = ", ".join(self._agg_exprs(t)[:2])
        return (
            f"SELECT {k1} AS k1, {k2} AS k2, "
            f"CAST(grouping({k1}) AS INT) AS g1, "
            f"CAST(grouping({k2}) AS INT) AS g2, {aggs} "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)} "
            f"GROUP BY ROLLUP({k1}, {k2}) HAVING count(*) > 0"
        )

    def q_order_limit(self) -> str:
        """Explicit NULLS FIRST/LAST ordered LIMIT page over a planted
        nullable sort key + unique tiebreak — generalizes q30d's
        dialect pin (Spark ASC defaults NULLS FIRST, DuckDB NULLS
        LAST; only EXPLICIT placement is portable)."""
        t = self.r.choice(FUZZ_TABLES)
        ints, strs, cents, ts = META[t]
        uniq = ", ".join(UNIQ_COLS[t])
        uniq_sel = ", ".join(
            f"{c} AS u{i}" for i, c in enumerate(UNIQ_COLS[t])
        )
        col = self.r.choice(ints)
        k = self.r.randint(3, 9)
        nk = f"nullif({col} % {k}, {self.r.randint(0, k - 1)})"
        direction = self.r.choice(["ASC", "DESC"])
        nulls = self.r.choice(["NULLS FIRST", "NULLS LAST"])
        lim = self.r.randint(5, 40)
        return (
            f"SELECT {uniq_sel}, {nk} AS nk FROM {PREFIX}{t} "
            f"WHERE {self.predicate(t)} "
            f"ORDER BY nk {direction} {nulls}, {uniq} LIMIT {lim}"
        )

    def q_agg_filter(self) -> str:
        """FILTER (WHERE ...) aggregate clause — per-aggregate
        predicates both engines support; count FILTER over an empty
        match must be 0 while sum FILTER must be NULL (the asymmetry
        worth fuzzing)."""
        t = self.r.choice(FUZZ_TABLES)
        ints, strs, cents, ts = META[t]
        key = self._group_key(t)
        col = self.r.choice(ints)
        k = self.r.randint(2, 13)
        p1 = self.predicate(t, depth=2)
        p2 = self.predicate(t, depth=2)
        return (
            f"SELECT {key} AS k, count(*) AS cnt, "
            f"count(*) FILTER (WHERE {p1}) AS fc, "
            f"CAST(sum({col} % {k}) FILTER (WHERE {p2}) AS BIGINT) AS fs "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)} GROUP BY {key}"
        )

    def q_scalar_subquery(self) -> str:
        """Uncorrelated scalar-aggregate subquery as a comparison bound
        — when the inner predicate matches nothing the scalar is NULL
        and the outer comparison filters EVERYTHING (three-valued
        logic), the edge worth fuzzing."""
        t = self.r.choice(FUZZ_TABLES)
        ints, strs, cents, ts = META[t]
        key = self._group_key(t)
        col = self.r.choice(ints)
        agg = self.r.choice(["min", "max"])
        inner_p = self.predicate(t, depth=2)
        return (
            f"SELECT {key} AS k, count(*) AS n, "
            f"CAST(min({col}) AS BIGINT) AS lo "
            f"FROM {PREFIX}{t} "
            f"WHERE {col} > (SELECT {agg}({col}) FROM {PREFIX}{t} "
            f"WHERE {inner_p}) "
            f"GROUP BY {key}"
        )

    def q_grouping_sets(self) -> str:
        """GROUPING SETS with the grouping() disambiguator — subtotal
        rows surface NULL keys that collide with PLANTED NULL keys
        unless grouping() separates them (the classic trap; both
        engines implement the ANSI semantics).  The () set carries the
        same empty-input grand-total divergence q_rollup documents
        (DuckDB/standard: one count-0 row; Spark: none — re-found by
        seeds 15/103/244 when this template landed), neutralized by
        the same HAVING cnt > 0 guard."""
        t = self.r.choice(FUZZ_TABLES)
        ints, strs, cents, ts = META[t]
        k1 = self._group_key(t)
        col = self.r.choice(ints)
        kk = self.r.randint(2, 7)
        k2 = f"nullif({col} % {kk}, 0)"
        return (
            f"SELECT {k1} AS a, {k2} AS b, count(*) AS n, "
            f"CAST(grouping({k1}) AS BIGINT) AS ga, "
            f"CAST(grouping({k2}) AS BIGINT) AS gb "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)} "
            f"GROUP BY GROUPING SETS (({k1}), ({k2}), ({k1}, {k2}), ()) "
            f"HAVING count(*) > 0"
        )

    # -- round-8 wave-2 templates (verdict item #6) ----------------------

    def q_window_frames(self) -> str:
        """Bounded ROWS frames + ntile + first/last_value over a TOTAL
        order — the frame-boundary subset both engines implement
        identically only when the order is total (tiebreak on the
        unique key) and the frame is ROWS (RANGE peers would differ on
        ties by construction)."""
        t = self.r.choice(FUZZ_TABLES)
        ints, strs, cents, ts = META[t]
        uniq = ", ".join(UNIQ_COLS[t])
        uniq_sel = ", ".join(f"{c} AS u{i}" for i, c in enumerate(UNIQ_COLS[t]))
        part = self._group_key(t)
        col = self.r.choice(ints)
        k = self.r.randint(2, 9)
        pre = self.r.randint(1, 4)
        post = self.r.randint(0, 3)
        order = f"ORDER BY ({col} % {k}), {uniq}"
        frame = f"ROWS BETWEEN {pre} PRECEDING AND {post} FOLLOWING"
        nt = self.r.randint(2, 6)
        return (
            f"SELECT {uniq_sel}, "
            f"CAST(sum({col} % {k}) OVER (PARTITION BY {part} {order} "
            f"{frame}) AS BIGINT) AS wsum, "
            f"CAST(count(*) OVER (PARTITION BY {part} {order} "
            f"{frame}) AS BIGINT) AS wcnt, "
            f"ntile({nt}) OVER (PARTITION BY {part} {order}) AS tile, "
            f"first_value({col} % {k}) OVER (PARTITION BY {part} {order} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)}"
        )

    def q_lateral_topk(self) -> str:
        """Correlated LATERAL per-row top-k along an FK edge — the
        decorrelation path (Spark rewrites to window/join) vs DuckDB's
        native lateral execution; deterministic because the inner
        LIMIT rides a total order (unique key tiebreak)."""
        lt, lc, rt, rc = self.r.choice(
            [e for e in FK_EDGES if e[2] in ("orders", "customer", "part",
                                             "supplier", "nation")]
        )
        # outer side filtered small-ish so the lateral fan-out is sane
        ints, strs, cents, ts = META[rt]
        icol = self.r.choice(ints)
        k = self.r.randint(2, 9)
        lim = self.r.randint(1, 3)
        inner_uniq = ", ".join(f"b.{c}" for c in UNIQ_COLS[rt])
        return (
            f"SELECT a.{lc} AS k, s.rv, s.uid "
            f"FROM {PREFIX}{lt} a, LATERAL ("
            f"SELECT (b.{icol} % {k}) AS rv, b.{UNIQ_COLS[rt][0]} AS uid "
            f"FROM {PREFIX}{rt} b WHERE b.{rc} = a.{lc} "
            f"AND ({self.predicate(rt, 'b.', depth=2)}) "
            f"ORDER BY rv DESC, {inner_uniq} LIMIT {lim}) s "
            f"WHERE {self.predicate(lt, 'a.')}"
        )

    def q_using_multiway(self) -> str:
        """Multi-way JOIN ... USING over FK keys renamed to a shared
        name — USING's coalesced-output and dedup-column semantics are
        a classic dialect trap; restricted to inner/left where both
        engines agree."""
        chain = self.r.choice(
            [
                [("lineitem", "l_orderkey"), ("orders", "o_orderkey")],
                [("orders", "o_custkey"), ("customer", "c_custkey")],
                [("lineitem", "l_partkey"), ("part", "p_partkey")],
                [("customer", "c_nationkey"), ("nation", "n_nationkey"),],
            ]
        )
        (lt, lk), (rt, rk) = chain[0], chain[1]
        jt = self.r.choice(["JOIN", "LEFT JOIN"])
        li, ls = META[lt][0], META[lt][1]
        ri = META[rt][0]
        lcol = self.r.choice(li)
        rcol = self.r.choice(ri)
        k = self.r.randint(2, 11)
        return (
            f"SELECT k % {self.r.randint(2, 7)} AS kb, count(*) AS cnt, "
            f"CAST(sum(x % {k}) AS BIGINT) AS sx, "
            f"CAST(sum(coalesce(y, -1) % {k}) AS BIGINT) AS sy "
            f"FROM (SELECT {lk} AS k, {lcol} AS x FROM {PREFIX}{lt} "
            f"WHERE {self.predicate(lt)}) a "
            f"{jt} (SELECT {rk} AS k, {rcol} AS y FROM {PREFIX}{rt} "
            f"WHERE {self.predicate(rt)}) b USING (k) "
            f"GROUP BY 1"
        )

    def q_recursive_spine(self) -> str:
        """WITH RECURSIVE integer spine LEFT-joined to bucketed data —
        the zero-filled-spine shape (q38/qa47) fuzzed: the recursion
        bound, the bucket modulus, and the filter all vary; empty
        buckets MUST surface as explicit zero rows in both engines."""
        t = self.r.choice(FUZZ_TABLES)
        ints, strs, cents, ts = META[t]
        col = self.r.choice(ints)
        n = self.r.randint(3, 12)
        return (
            f"WITH RECURSIVE spine(i) AS ("
            f"SELECT 0 UNION ALL SELECT i + 1 FROM spine WHERE i < {n - 1}"
            f"), bucketed AS ("
            f"SELECT ({col} % {n}) AS i, count(*) AS n_rows "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)} GROUP BY 1"
            f") SELECT s.i AS i, coalesce(b.n_rows, 0) AS n_rows "
            f"FROM spine s LEFT JOIN bucketed b ON b.i = s.i"
        )

    # -- round-9 wave-3 templates (verdict item #8) ----------------------

    def q_setop_compound(self) -> str:
        """Three-branch UNION/INTERSECT/EXCEPT (+ALL) composition over
        grouped+HAVING subselects — the untemplated set-op area: ALL
        variants exercise MULTISET semantics (multiplicity arithmetic,
        not just membership), and the tree is explicitly parenthesized
        so it is seed-determined rather than precedence-determined
        (INTERSECT binds tighter than UNION/EXCEPT in the standard —
        an easy silent-divergence trap when left bare).  Branches share
        one (c0, c1) BIGINT shape with a common modulus so rows
        actually collide across branches."""
        k = self.r.randint(2, 7)
        m = self.r.randint(2, 5)

        def branch() -> str:
            t = self.r.choice(FUZZ_TABLES)
            col = self.r.choice(META[t][0])
            having = (
                f" HAVING count(*) > {self.r.randint(0, 4)}"
                if self.r.random() < 0.6
                else ""
            )
            return (
                f"SELECT ({col} % {k}) AS c0, "
                f"CAST(count(*) % {m} AS BIGINT) AS c1 "
                f"FROM {PREFIX}{t} WHERE {self.predicate(t)} "
                f"GROUP BY 1{having}"
            )

        ops = ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
               "EXCEPT", "EXCEPT ALL"]
        op1, op2 = self.r.choice(ops), self.r.choice(ops)
        b1, b2, b3 = branch(), branch(), branch()
        if self.r.random() < 0.5:
            return f"(({b1}) {op1} ({b2})) {op2} ({b3})"
        return f"({b1}) {op1} (({b2}) {op2} ({b3}))"

    def q_having_subquery(self) -> str:
        """HAVING compared against an uncorrelated scalar-aggregate
        subquery — when the inner predicate matches nothing the scalar
        is NULL and three-valued logic must drop EVERY group in both
        engines; the grouped-outer/scalar-inner composition was
        untemplated (q_scalar_subquery only fuzzed WHERE)."""
        t = self.r.choice(FUZZ_TABLES)
        t2 = self.r.choice(FUZZ_TABLES)
        key = self._group_key(t)
        icol = self.r.choice(META[t2][0])
        agg = self.r.choice(["min", "max"])
        k = self.r.randint(2, 13)
        cmp_ = self.r.choice([">", "<=", "<>"])
        return (
            f"SELECT {key} AS k, count(*) AS cnt, "
            f"CAST(sum({self.r.choice(META[t][0])} % {k}) AS BIGINT) AS s "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)} GROUP BY {key} "
            f"HAVING count(*) {cmp_} "
            f"(SELECT {agg}({icol}) % {k} FROM {PREFIX}{t2} "
            f"WHERE {self.predicate(t2)})"
        )

    def q_nested_in_exists(self) -> str:
        """Two-level IN / EXISTS nesting down an FK chain (lineitem →
        orders → customer, ...) — the subquery-inside-subquery
        decorrelation path.  NOT IN poisoning is planted only at the
        DEEPEST level (a NULL in the innermost set must three-valued-
        empty the middle select, which then empties or fills the outer
        per ANSI — in BOTH engines); outer/middle nesting polarity and
        the IN-vs-correlated-EXISTS inner form all vary by seed."""
        lt, lc, mt, mk, mfk, rt, rk = self.r.choice(FK_CHAINS)
        neg1 = self.r.choice(["", "NOT "])
        neg2 = self.r.choice(["", "NOT "])
        inner_col = rk
        if neg2 and self.r.random() < 0.5:
            kk = self.r.randint(50, 200)
            inner_col = (
                f"nullif({rk}, {rk} - ({rk} % {kk}) + {self.r.randint(0, 9)})"
            )
        if self.r.random() < 0.5:
            inner = (
                f"m.{mfk} {neg2}IN (SELECT {inner_col} FROM {PREFIX}{rt} "
                f"WHERE {self.predicate(rt)})"
            )
        else:
            inner = (
                f"{neg2}EXISTS (SELECT 1 FROM {PREFIX}{rt} c "
                f"WHERE c.{rk} = m.{mfk} "
                f"AND ({self.predicate(rt, 'c.', depth=2)}))"
            )
        return (
            f"SELECT count(*) AS cnt FROM {PREFIX}{lt} "
            f"WHERE ({self.predicate(lt)}) AND {lc} {neg1}IN ("
            f"SELECT m.{mk} FROM {PREFIX}{mt} m "
            f"WHERE ({self.predicate(mt, 'm.', depth=1)}) AND {inner})"
        )

    # -- round-10 wave-4 templates ---------------------------------------

    def q_cte_chain(self) -> str:
        """Chained CTEs where each layer reads the previous and the
        FINAL select references the first layer AGAIN (a join of a
        against its own downstream) — exercises CTE dedup/inlining
        decisions (Spark may inline or reuse-exchange; DuckDB
        materializes) that were untemplated: every prior template
        referenced each relation exactly once."""
        t = self.r.choice(FUZZ_TABLES)
        key = self._group_key(t)
        k = self.r.randint(2, 9)
        return (
            f"WITH a AS ("
            f"SELECT {key} AS g, count(*) AS cnt, "
            f"CAST(sum({self.r.choice(META[t][0])} % {k}) AS BIGINT) AS s "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)} GROUP BY 1"
            f"), b AS ("
            f"SELECT g, cnt, s FROM a WHERE cnt > {self.r.randint(0, 3)}"
            f") "
            f"SELECT a.g AS g, a.cnt AS cnt_all, "
            f"coalesce(b.s, {self.r.randint(-5, 5)}) AS s_kept "
            f"FROM a LEFT JOIN b ON b.g = a.g"
        )

    def q_expr_nest(self) -> str:
        """Deeply nested scalar expressions — CASE inside COALESCE
        inside GREATEST/LEAST with nullif-planted NULLs and a FOLDABLE
        constant branch — summed to one BIGINT per group, so the
        differential pins null-propagation and constant-folding
        through the whole expression tree (dialect-shared subset: no
        division, integer % only)."""
        t = self.r.choice(FUZZ_TABLES)
        ints = META[t][0]
        c1, c2 = self.r.choice(ints), self.r.choice(ints)
        k1, k2 = self.r.randint(2, 9), self.r.randint(2, 9)
        fold = self.r.randint(1, 4) * self.r.randint(1, 4)  # constant
        inner = (
            f"CASE WHEN {self.predicate(t, depth=2)} "
            f"THEN nullif({c1} % {k1}, {self.r.randint(0, k1 - 1)}) "
            f"ELSE abs(({c2} % {k2}) - {self.r.randint(0, 3)}) END"
        )
        expr = (
            f"{self.r.choice(['greatest', 'least'])}("
            f"coalesce({inner}, {self.r.randint(-3, 3)}), "
            f"({fold} % {self.r.randint(2, 5)}) - 1)"
        )
        key = self._group_key(t)
        return (
            f"SELECT {key} AS g, count(*) AS cnt, "
            f"CAST(sum({expr}) AS BIGINT) AS s "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)} GROUP BY 1"
        )

    def q_date_bucket(self) -> str:
        """Calendar-bucket aggregation: GROUP BY a seed-chosen
        composition of year/quarter/month/day parts with date
        predicates and a conditionally-counted part — the
        date-function parity area beyond the single year()/month()
        predicate atom (both engines share these extractors on
        DATE/TIMESTAMP)."""
        t = self.r.choice([x for x in FUZZ_TABLES if META[x][3]])
        col = self.r.choice(META[t][3])
        parts = self.r.sample(["year", "quarter", "month", "day"],
                              self.r.randint(1, 2))
        keys = [f"{p}({col})" for p in parts]
        key_sql = ", ".join(keys)
        alias = ", ".join(f"{k} AS g{i}" for i, k in enumerate(keys))
        m = self.r.randint(2, 11)
        return (
            f"SELECT {alias}, count(*) AS cnt, "
            f"CAST(sum(CASE WHEN month({col}) >= {m} THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS late, "
            f"min(year({col})) AS y0 "
            f"FROM {PREFIX}{t} WHERE {self.predicate(t)} "
            f"GROUP BY {key_sql}"
        )

    def query(self) -> str:
        pick = self.r.choices(
            [
                self.q_filter_project,
                self.q_groupby,
                self.q_join,
                self.q_setop,
                self.q_in_subquery,
                self.q_distinct_case,
                self.q_window,
                self.q_rollup,
                self.q_exists,
                self.q_order_limit,
                self.q_agg_filter,
                self.q_scalar_subquery,
                self.q_grouping_sets,
                self.q_window_frames,
                self.q_lateral_topk,
                self.q_using_multiway,
                self.q_recursive_spine,
                self.q_setop_compound,
                self.q_having_subquery,
                self.q_nested_in_exists,
                self.q_cte_chain,
                self.q_expr_nest,
                self.q_date_bucket,
            ],
            weights=[2, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
                     2, 2, 2, 2],
        )[0]
        return pick()


# -------------------------------------------------------------- fixtures


@pytest.fixture(scope="module")
def fuzz_env(spark):
    """Spark temp views + a dedicated DuckDB connection, both exposing
    the fixture tables under fz_-prefixed names at sf0.01 — same setup
    shape as the driver's oracle gate, isolated from other modules."""
    import duckdb

    from spark_ml_optimization_spark.sources import load_table

    con = duckdb.connect()
    for t in FUZZ_TABLES:
        load_table(spark, SF_CORRECT, t).createOrReplaceTempView(f"{PREFIX}{t}")
        con.execute(
            f"CREATE VIEW {PREFIX}{t} AS "
            f"SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    yield spark, con
    con.close()


# ----------------------------------------------------------------- tests

#: Differential seeds (wave 1: 200, wave 2: 600, wave 3: 800, wave 4:
#: 1000), run in batches so one pytest node failure names its seed
#: range; bump N_DIFF freely — runtime is ~0.2 s/query.
N_DIFF = 1000
BATCH = 25


def test_fuzz_fastpath(fuzz_env):
    """Default-run fast path (round 11, VERDICT item 1): a seeded
    subsample — 50 differential seeds + 10 TLP seeds — so the fuzz
    lanes still fire after every commit while the full 1120-seed matrix
    lives behind the `slow` marker (`pytest -m "" tests/`).  The
    optimizer-differential lane keeps its known-issue pin
    (test_known_issue_unfolded_frame_bounds) in the default run."""
    spark, con = fuzz_env
    for seed in range(0, 50):
        sql = Gen(seed).query()
        sdf = spark.sql(sql).toPandas()
        odf = con.execute(sql).fetchdf()
        compare(sdf, odf, f"fuzz-seed-{seed}")
    for seed in range(1000, 1010):
        g = Gen(seed)
        t = g.r.choice(FUZZ_TABLES)
        p = g.predicate(t)
        sql = (
            f"SELECT count(*) AS total, "
            f"sum(CASE WHEN {p} THEN 1 ELSE 0 END) AS n_true, "
            f"sum(CASE WHEN NOT ({p}) THEN 1 ELSE 0 END) AS n_false, "
            f"sum(CASE WHEN ({p}) IS NULL THEN 1 ELSE 0 END) AS n_null "
            f"FROM {PREFIX}{t}"
        )
        srow = spark.sql(sql).collect()[0]
        orow = con.execute(sql).fetchone()
        assert srow.total == srow.n_true + srow.n_false + srow.n_null
        assert (srow.total, srow.n_true, srow.n_false, srow.n_null) == tuple(
            int(v) for v in orow
        )


@pytest.mark.slow
@pytest.mark.parametrize("batch_start", list(range(0, N_DIFF, BATCH)))
def test_fuzz_differential(fuzz_env, batch_start):
    spark, con = fuzz_env
    for seed in range(batch_start, batch_start + BATCH):
        sql = Gen(seed).query()
        try:
            sdf = spark.sql(sql).toPandas()
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # pragma: no cover - generator bug, not engine
            raise AssertionError(f"seed {seed} failed to EXECUTE: {e}\n{sql}")
        try:
            compare(sdf, odf, f"fuzz-seed-{seed}")
        except AssertionError as e:  # pragma: no cover
            raise AssertionError(f"DIVERGENCE at seed {seed}\nSQL: {sql}\n{e}")


#: TLP: 60 seeded predicates; count(*) == p + NOT p + p IS NULL, checked
#: inside each engine and cross-engine (partition counts must agree too).
N_TLP = 60


@pytest.mark.slow
@pytest.mark.parametrize("batch_start", [0, 20, 40])
def test_fuzz_tlp_partition(fuzz_env, batch_start):
    spark, con = fuzz_env
    for seed in range(1000 + batch_start, 1000 + batch_start + 20):
        g = Gen(seed)
        t = g.r.choice(FUZZ_TABLES)
        p = g.predicate(t)
        sql = (
            f"SELECT count(*) AS total, "
            f"sum(CASE WHEN {p} THEN 1 ELSE 0 END) AS n_true, "
            f"sum(CASE WHEN NOT ({p}) THEN 1 ELSE 0 END) AS n_false, "
            f"sum(CASE WHEN ({p}) IS NULL THEN 1 ELSE 0 END) AS n_null "
            f"FROM {PREFIX}{t}"
        )
        srow = spark.sql(sql).collect()[0]
        orow = con.execute(sql).fetchone()
        assert srow.total == srow.n_true + srow.n_false + srow.n_null, (
            f"Spark TLP violation at seed {seed}: {srow}\npred: {p}"
        )
        assert (srow.total, srow.n_true, srow.n_false, srow.n_null) == tuple(
            int(v) for v in orow
        ), (
            f"cross-engine TLP divergence at seed {seed}: "
            f"spark={tuple(srow)} duckdb={orow}\npred: {p}"
        )


def test_known_divergence_rollup_empty_input(fuzz_env):
    """Graduated fuzzer finding (seed 2, round 7): GROUP BY ROLLUP over
    an EMPTY input.  The SQL standard treats the () grouping set like
    an ungrouped aggregate — one grand-total row (count 0) even with no
    input rows; DuckDB and Postgres do this.  Spark returns ZERO rows.
    Pinned so a future Spark behavior change surfaces here first (then
    the q_rollup HAVING guard can come off)."""
    spark, con = fuzz_env
    sql = (
        f"SELECT count(*) AS cnt FROM {PREFIX}region "
        f"WHERE r_name = 'no_such_region' GROUP BY ROLLUP(r_regionkey)"
    )
    assert len(spark.sql(sql).collect()) == 0, "Spark now emits the row!"
    assert len(con.execute(sql).fetchall()) == 1, "DuckDB dropped the row!"


#: Optimizer-differential (SQLancer's NoREC idea adapted to Spark's
#: conf surface): the SAME query must return the same multiset with the
#: optimizer fully on vs with AQE disabled and a batch of excludable
#: rewrite rules turned off — catches Spark-side rewrite bugs without
#: any external oracle (and independently of DuckDB's dialect).
N_OPT = 60
_EXCLUDED_RULES = ",".join(
    [
        "org.apache.spark.sql.catalyst.optimizer.ConstantFolding",
        "org.apache.spark.sql.catalyst.optimizer.NullPropagation",
        "org.apache.spark.sql.catalyst.optimizer.SimplifyCasts",
        "org.apache.spark.sql.catalyst.optimizer.CollapseProject",
    ]
)


@pytest.mark.slow
@pytest.mark.parametrize("batch_start", [0, 20, 40])
def test_fuzz_optimizer_differential(fuzz_env, batch_start):
    spark, _ = fuzz_env
    aqe_key, excl_key = (
        "spark.sql.adaptive.enabled",
        "spark.sql.optimizer.excludedRules",
    )
    prev_aqe = spark.conf.get(aqe_key)
    for seed in range(2000 + batch_start, 2000 + batch_start + 20):
        sql = Gen(seed).query()
        base = spark.sql(sql).toPandas()
        try:
            spark.conf.set(aqe_key, "false")
            spark.conf.set(excl_key, _EXCLUDED_RULES)
            try:
                alt = spark.sql(sql).toPandas()
            except Exception as ex:
                # Known ENGINE artifact, not a divergence (round-8 wave-2
                # find, pinned in test_known_issue_unfolded_frame_bounds):
                # WindowExec requires frame bounds to be FOLDED literals;
                # with ConstantFolding excluded, `ROWS BETWEEN k PRECEDING
                # AND m FOLLOWING` reaches execution as UnaryMinus(k) and
                # dies with INTERNAL_ERROR "Unhandled bound in windows
                # expressions".  The rule exclusion is this harness's
                # unrealistic config, so skip exactly this signature.
                if "Unhandled bound in windows expressions" in str(ex):
                    continue
                raise
        finally:
            spark.conf.set(aqe_key, prev_aqe)
            spark.conf.unset(excl_key)
        try:
            compare(base, alt, f"opt-diff-seed-{seed}")
        except AssertionError as e:  # pragma: no cover
            raise AssertionError(
                f"OPTIMIZER DIVERGENCE at seed {seed}\nSQL: {sql}\n{e}"
            )


def test_known_issue_unfolded_frame_bounds(fuzz_env):
    """Round-8 wave-2 fuzzer find, pinned: Spark 4.1's WindowExec
    requires ROWS-frame bounds to arrive as folded LITERALS — with
    ConstantFolding excluded from the optimizer, `ROWS BETWEEN 3
    PRECEDING AND 2 FOLLOWING` reaches execution as UnaryMinus(3) and
    fails with INTERNAL_ERROR 'Unhandled bound in windows expressions:
    -3' (an engine robustness gap, not a semantics divergence — with
    the stock optimizer the same query runs and matches DuckDB, which
    the differential corpus covers).  This pin documents the signature
    the optimizer-differential skip matches, so if a Spark upgrade
    fixes it this test goes red and both the pin and the skip retire."""
    spark, _ = fuzz_env
    sql = (
        "SELECT l_orderkey AS u0, l_linenumber AS u1, "
        "CAST(sum(l_partkey % 5) OVER (ORDER BY l_orderkey, l_linenumber "
        "ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS wsum "
        "FROM fz_lineitem WHERE l_orderkey < 100"
    )
    spark.sql(sql).collect()  # stock optimizer: fine
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.ConstantFolding",
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="Unhandled bound"):
            spark.sql(sql).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.unset("spark.sql.optimizer.excludedRules")

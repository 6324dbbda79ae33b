#!/usr/bin/env python
"""Render COVERAGE.md from tools/coverage_rows.py and cross-check it
against the live registry (round-8 verdict item #9).

Usage:
    python tools/gen_coverage.py            # rewrite COVERAGE.md
    python tools/gen_coverage.py --check    # exit 1 on drift (CI mode)

Why: the inventory table was hand-maintained for seven rounds and one
round away from drifting (the q85k/q86b/q55g duplicate-short-id
ambiguity was the first symptom).  Making the table DATA + a renderer
turns every drift class into a loud failure:

  * byte drift        — COVERAGE.md edited by hand → --check fails
  * phantom rows      — a row naming an unregistered query id → fails
  * missing coverage  — a registered query absent from every row → fails
  * check-type drift  — a row marked SQL whose queries all lack an
                        oracle (or vice versa) → fails
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.coverage_rows import PREAMBLE, SECTIONS  # noqa: E402

_ID_RE = re.compile(
    r"\b(?:q[a-z]?\d+\w*|ml\d+\w*|mm\d+\w*|st\d+\w*"
    r"|src\d+\w*|qp\d+\w*)\b"
)

#: env-gated registrations (absent from the registry in this container;
#: the rows documenting them are correct, not drift)
GATED_IDS = {"src16", "st15"}


def render() -> str:
    out = [PREAMBLE, ""]
    for title, rows in SECTIONS:
        out.append(f"## {title}")
        out.append("| Inventory row | Queries | Check |")
        out.append("| --- | --- | --- |")
        for desc, queries, check in rows:
            out.append(f"| {desc} | {queries} | {check} |")
        out.append("")
    return "\n".join(out).rstrip("\n") + "\n"


def validate() -> list[str]:
    """Cross-check the row data against the live registry."""
    from spark_ml_optimization_spark import registry

    problems: list[str] = []
    qs = registry.all_queries()
    registered = set(qs)
    short_to_full: dict[str, str] = {}
    for name in registered:
        short_to_full[name.split("_")[0]] = name

    mentioned: set[str] = set()
    for title, rows in SECTIONS:
        for desc, queries, check in rows:
            ids = _ID_RE.findall(queries)
            resolved = []
            for i in ids:
                if i in registered:
                    resolved.append(i)
                elif i in short_to_full:
                    resolved.append(short_to_full[i])
                elif i.split("_")[0] in GATED_IDS:
                    pass  # documented env-gated surface
                else:
                    problems.append(
                        f"[{title}] row names unregistered id {i!r}: {desc[:60]}"
                    )
            mentioned.update(resolved)
            if not ids and "every query" not in queries and "register_views" not in queries:
                problems.append(f"[{title}] row names no query: {desc[:60]}")
            # check-type vs oracle presence (rows marked purely SQL must
            # have at least one oracled query; purely rows-only must not
            # be fully oracled)
            kinds = {bool(qs[r].oracle) for r in resolved if r in qs}
            if resolved and check.strip() == "SQL" and True not in kinds:
                problems.append(
                    f"[{title}] row marked SQL but no named query has an "
                    f"oracle: {desc[:60]}"
                )
            if resolved and check.strip() == "rows" and False not in kinds:
                problems.append(
                    f"[{title}] row marked rows-only but every named query "
                    f"HAS an oracle: {desc[:60]}"
                )
    # every registered query must appear in some row (same contract as
    # tests/test_registry_consistency.test_every_query_documented...)
    covered_shorts = {m.split("_")[0] for m in mentioned}
    for name in sorted(registered):
        if name not in mentioned and name.split("_")[0] not in covered_shorts:
            problems.append(f"registered query absent from every row: {name}")
    return problems


def main() -> int:
    text = render()
    path = os.path.join(REPO, "COVERAGE.md")
    problems = validate()
    for p in problems:
        print("DRIFT:", p, file=sys.stderr)
    if "--check" in sys.argv:
        current = open(path).read()
        if current != text:
            print("DRIFT: COVERAGE.md differs from generated output "
                  "(edit tools/coverage_rows.py and re-run the generator)",
                  file=sys.stderr)
            return 1
        return 1 if problems else 0
    with open(path, "w") as fh:
        fh.write(text)
    print(f"wrote {path} ({sum(len(r) for _, r in SECTIONS)} rows)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())

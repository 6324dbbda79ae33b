"""Physical-plan inspection helpers — the engine's ".explain and iterate"
loop made programmatic (SURVEY.md §4).

Used by tests/test_plans.py to pin the plan properties that matter at
100 TB: filters reach the parquet scan (PushedFilters), projection is
pruned (ReadSchema), dimension joins broadcast, and the hot relational
path stays inside WholeStageCodegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_formatted(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (pruning check)."""
    cols: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_formatted(df)):
        cols.append([c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()])
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df) or "BroadcastNestedLoopJoin" in explain_formatted(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", explain_formatted(df)))

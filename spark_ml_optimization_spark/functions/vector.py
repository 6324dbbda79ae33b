"""Vector expression builders over array<float|double> columns.

Pure Catalyst higher-order functions (zip_with / aggregate / transform) —
JVM-side, codegen'd, no UDF, no MLlib Vector conversion — so similarity
expressions inherit pushdown/pruning and run at scan speed.

Determinism note: products/sums are accumulated sequentially in index
order, which matches DuckDB's list_dot_product evaluation when both sides
cast to double first — the basis for hash-verified similarity oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """array<float> → array<double> (cast before arithmetic: float
    accumulation is not cross-engine reproducible, double is)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two equal-length double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

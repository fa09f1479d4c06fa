"""Vector expressions over array<float|double> embedding columns.

All JVM-side (zip_with/aggregate/transform) — no Python UDF in the
similarity hot path. Math is done in double regardless of the storage
type (testdata embeddings are float32) so results are stable and match
a double-precision SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ a_i·b_i in double precision."""
    return F.aggregate(
        F.zip_with(_to_double(_c(a)), _to_double(_c(b)), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(_c(a)), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """cos(a,b) = a·b / (|a||b|); NULL-safe via nullif on zero norms."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))

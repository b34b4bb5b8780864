"""Vector math over ``array<float>`` embedding columns.

Pure higher-order-function expressions (``zip_with`` + ``aggregate``):
JVM-side, no Python round-trip, and the reduction is left-to-right over
the array so the result is deterministic (unlike a shuffled float SUM).

Used by operators/similarity.py (brute-force + LSH-bucketed ANN) and
operators/dedup.py (embedding-cosine near-dup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["vec_dot", "vec_norm", "vec_cosine"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _to_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def vec_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (double result)."""
    prod = F.zip_with(_to_double(_col(a)), _to_double(_col(b)), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def vec_norm(a: Column | str) -> Column:
    """L2 norm of an array<numeric> column."""
    v = _to_double(_col(a))
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def vec_cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return vec_dot(a, b) / F.nullif(vec_norm(a) * vec_norm(b), F.lit(0.0))

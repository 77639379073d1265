"""Vector math over ``array<float>`` embedding columns — pure Spark SQL
expressions (no Python UDFs).

These compile to Catalyst ``HigherOrderFunction`` expressions
(``zip_with`` / ``aggregate``), which execute inside the JVM with
whole-stage codegen — the hot path for similarity search stays off the
Python worker entirely. Accumulation is an explicit left-to-right double
fold, which makes results deterministic and bit-comparable with an
external oracle that folds the same way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["to_double_array", "dot_product", "l2_norm", "cosine_similarity"]


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> so all arithmetic is f64."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)

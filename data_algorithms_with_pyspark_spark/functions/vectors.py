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

__all__ = [
    "to_double_array",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "cosine_with_norms",
    "int8_quant_sse_fp",
]


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


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine similarity with PRE-MATERIALIZED norms — bit-identical to
    ``cosine_similarity(a, b)`` whenever ``na``/``nb`` are ``l2_norm(a)``/
    ``l2_norm(b)`` stored in a projection: the expression tree is the same
    (dot / (na * nb), zero-guarded), only the two norm folds are evaluated
    ONCE per vector instead of once per pair.

    This is the pair-stage optimization for every quadratic-in-cluster or
    corpus-x-centroid cosine: per-pair interpreted work drops from three
    64-element folds to one fold and a divide (~3x on the hot stage), and
    because the arithmetic is unchanged the DuckDB value oracles keep
    matching bit-for-bit.
    """
    den = na * nb
    return F.when(den == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / den)


def int8_quant_sse_fp(a: Column) -> Column:
    """Symmetric-int8 quantization reconstruction error of an array<double>
    vector, as a fixed-point bigint: sum over elements of
    ``round(err^2 * 1e12)`` where ``err = x - clamp(round(x/scale)) *
    scale`` and ``scale = max|x| / 127`` (the standard absmax scheme
    embedding stores use to cut vector bytes 4x).

    Fixed-point on purpose: every step (max, divide, floor(x+0.5), clamp,
    multiply, subtract) is a single IEEE-f64 op any engine reproduces
    bit-for-bit, and the final per-vector value is an exact INTEGER — so
    downstream per-group averages are integer sums, immune to f64
    accumulation-order drift. An all-zero vector quantizes to itself
    (error 0, zero-divide guarded).
    """
    amax = F.array_max(F.transform(a, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q = lambda x: F.greatest(  # noqa: E731
        F.lit(-127.0), F.least(F.lit(127.0), F.floor(x / scale + F.lit(0.5)))
    )
    err = lambda x: x - q(x) * scale  # noqa: E731
    sse = F.aggregate(
        F.transform(
            a,
            lambda x: F.floor(err(x) * err(x) * F.lit(1e12) + F.lit(0.5)).cast(
                "long"
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(amax == 0.0, F.lit(0).cast("long")).otherwise(sse)

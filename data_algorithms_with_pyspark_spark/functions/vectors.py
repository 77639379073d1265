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
    "lit_double_array",
    "lit_double_matrix",
    "lit_long_array",
    "lit_str_long_map",
    "sql_str",
]


def _sql_double(x: float) -> str:
    """Exact SQL double literal: ``repr`` emits the shortest round-trip
    decimal and Spark's parser reads it back via Double.parseDouble
    (correctly rounded), so the engine sees the identical IEEE bits.

    Non-finite doubles need the CAST form: ``nanD`` / ``infD`` parse as
    unresolved column references (AnalysisException), whereas the
    ``F.lit`` path these helpers replaced produced valid NaN/Infinity
    literals — e.g. ``l2_norm_py`` can overflow to inf for components
    beyond ~1e154 (ADVICE r11)."""
    v = float(x)
    if v != v:  # NaN
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"{v!r}D"


def lit_double_array(xs) -> Column:
    """array<double> literal built as ONE ``F.expr`` string. Building the
    same literal Column-by-Column (``F.lit(list)`` → ``array(lit, ...)``)
    costs 2+ Py4J round trips per element — ~0.5 s of pure driver latency
    for a 512-double centroid table, paid PER expression construction
    (the minhash SQL-string lesson, operators/dedup.py). Parsed JVM-side
    in one call; identical resolved plan."""
    return F.expr("array(" + ",".join(_sql_double(x) for x in xs) + ")")


def lit_double_matrix(rows) -> Column:
    """array<array<double>> literal as ONE parsed SQL string — see
    ``lit_double_array`` for why not ``F.lit(nested list)``."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(x) for x in r) + ")" for r in rows
        )
        + ")"
    )


def lit_long_array(xs) -> Column:
    """array<bigint> literal as ONE parsed SQL string."""
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in xs) + ")")


def sql_str(s: str) -> str:
    """SQL single-quoted string literal (quote-doubling escape).

    Backslashes are escaped too: Spark's default parser (non-
    escapedStringLiterals) treats ``\\`` as an escape, so a key containing
    ``\\b`` would silently become backspace and a trailing backslash would
    escape the closing quote and break parsing (ADVICE r11). Quote
    doubling is kept for the quote itself (accepted by this parser and
    unaffected by the backslash pass)."""
    return "'" + str(s).replace("\\", "\\\\").replace("'", "''") + "'"


def lit_str_long_map(items) -> Column:
    """map<string,bigint> literal as ONE parsed SQL string — the
    ``lit_double_array`` rationale applied to ``F.create_map``: building
    a K-entry map Column-by-Column costs 2+ Py4J round trips per entry,
    paid per expression construction (per training round for the
    tokenizer cost tables)."""
    return F.expr(
        "map("
        + ",".join(f"{sql_str(k)},{int(v)}L" for k, v in items)
        + ")"
    )


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

"""Space-filling-curve keys for multi-column file clustering.

``write_range_clustered`` orders files by ONE key prefix: a box query on
(x, y) prunes on x but reads every x-stripe fully across y. Interleaving
the bits of both columns (Morton / Z-order) makes file min/max ranges
tight in BOTH dimensions — the standard lakehouse layout move (Delta
OPTIMIZE ZORDER, Iceberg sort orders) re-expressed as a plain Catalyst
expression: rank each column to a bounded unsigned space, then interleave
bits via shifts and masks (whole-stage codegen; no UDF).

The rank step here is a fixed-point quantile bucketing against literal
split points (computed once from approxQuantile on the driver — a tiny
sample-based job), so the key is deterministic given the splits and the
splits are part of the written layout's metadata contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interleave_bits", "zorder_key", "zorder_by_quantiles"]


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two unsigned ints of ``bits`` bits each into one
    long: result bit 2i is bit i of ``a``, bit 2i+1 is bit i of ``b``.
    Pure shift/mask arithmetic -> whole-stage codegen."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
        out = (
            out
            + F.shiftleft(abit, 2 * i)
            + F.shiftleft(bbit, 2 * i + 1)
        )
    return out


def _bucket_expr(col: Column, splits: list[float]) -> Column:
    """Index of the first split >= col (0..len(splits)) as a codegen'd
    comparison chain — the fixed-point quantile rank."""
    out = F.lit(0)
    for s in splits:
        out = out + (col > F.lit(s)).cast("int")
    return out


def zorder_key(
    x: Column, y: Column, x_splits: list[float], y_splits: list[float]
) -> Column:
    """Z-order key for two columns given their quantile split points."""
    import math

    bits = max(1, math.ceil(math.log2(max(len(x_splits), len(y_splits)) + 1)))
    return interleave_bits(
        _bucket_expr(x, x_splits), _bucket_expr(y, y_splits), bits=bits
    )


def zorder_by_quantiles(
    df: DataFrame, x_col: str, y_col: str, n_buckets: int = 64
) -> tuple[Column, list[float], list[float]]:
    """Compute per-column quantile splits (one small driver job via
    approxQuantile) and return (zorder key column, x_splits, y_splits)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    qs = df.approxQuantile([x_col, y_col], probs, 0.001)  # ONE driver job
    x_splits, y_splits = qs[0], qs[1]
    return (
        zorder_key(F.col(x_col), F.col(y_col), x_splits, y_splits),
        x_splits,
        y_splits,
    )

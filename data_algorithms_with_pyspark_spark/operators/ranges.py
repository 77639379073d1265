"""Range (interval) join: match points to ``[lo, hi)`` intervals.

The reference never implements a range join (its chapter 11 "Join Design
Patterns" was never written — /root/reference/README.md:149); the naive
Spark expression is ``points.crossJoin(ranges).where(lo <= p < hi)``,
which is O(|points| * |ranges|) and un-shuffleable — a non-starter at the
100 TB design point.

``bucketed_range_join`` rewrites it as an equi-join: quantize the domain
into fixed-width buckets, explode each interval into the buckets it
covers, join point-bucket == interval-bucket, then re-apply the exact
predicate. Catalyst extracts the bucket equality as the join key (the
exact range predicate stays as a post-join filter), so the work is
proportional to |points| + sum(interval_width)/bucket_width and
distributes across executors like any other equi-join. Choose
``bucket_width`` on the order of the typical interval width: much smaller
explodes intervals into many buckets; much larger degrades toward a
per-bucket cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bucketed_range_join", "interval_overlap_join"]


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    *,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to ``ranges`` where ``lo_col <= point_col < hi_col``.

    Column names of the two inputs must be disjoint (standard for a join
    whose output keeps both sides). ``how`` supports 'inner' and 'left'
    (left keeps unmatched points, nulls for range columns).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}; use 'inner' or 'left'")
    overlap = set(points.columns) & set(ranges.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; shared: {sorted(overlap)}")

    def bucket(col: Column) -> Column:
        return F.floor(col / F.lit(float(bucket_width))).cast("long")

    p = points.withColumn("__p_bucket", bucket(F.col(point_col)))
    # An interval [lo, hi) covers buckets floor(lo/w) .. floor(hi/w); the
    # hi bucket can be spurious when hi sits exactly on a boundary, but
    # emitting it is harmless — the exact predicate filters false matches.
    r = ranges.withColumn(
        "__r_bucket",
        F.explode(F.sequence(bucket(F.col(lo_col)), bucket(F.col(hi_col)))),
    )
    cond = (
        (F.col("__p_bucket") == F.col("__r_bucket"))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    return p.join(r, cond, how).drop("__p_bucket", "__r_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Join interval tables where ``[l_lo, l_hi]`` overlaps ``[r_lo, r_hi]``
    (closed intervals: touching endpoints match).

    Same bucketize-to-equi-join rewrite as ``bucketed_range_join``, with
    the interval x interval twist that an overlapping pair shares EVERY
    bucket in the overlap — so each pair is emitted only in its FIRST
    shared bucket (``bucket == max(floor(l_lo/w), floor(r_lo/w))``),
    which every overlapping pair covers exactly once. That makes the
    output duplicate-free by construction — no ``distinct`` shuffle.

    Catalyst extracts the bucket equality as the hash-join key; the exact
    overlap predicate and the first-bucket guard evaluate post-join
    inside the same codegen stage. Work is |rows| x (interval_width /
    bucket_width) exploded rows on each side, hash-partitioned by bucket
    — no cross product at any scale.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; shared: {sorted(overlap)}")

    def bucket(col: str) -> Column:
        return F.floor(F.col(col) / F.lit(float(bucket_width))).cast("long")

    lb = left.withColumn(
        "__l_b", F.explode(F.sequence(bucket(l_lo), bucket(l_hi)))
    )
    rb = right.withColumn(
        "__r_b", F.explode(F.sequence(bucket(r_lo), bucket(r_hi)))
    )
    cond = (
        (F.col("__l_b") == F.col("__r_b"))
        & (F.col(l_lo) <= F.col(r_hi))
        & (F.col(r_lo) <= F.col(l_hi))
        & (F.col("__l_b") == F.greatest(bucket(l_lo), bucket(r_lo)))
    )
    return lb.join(rb, cond, "inner").drop("__l_b", "__r_b")

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

__all__ = ["bucketed_range_join"]


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

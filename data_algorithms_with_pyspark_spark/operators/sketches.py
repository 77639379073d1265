"""KMV (k-minimum-values) distinct-count sketch.

Complements the built-in ``approx_count_distinct`` (HyperLogLog++, used by
``approx_distinct_users_hll``) with a sketch whose draw is an md5-derived
integer — deterministic AND reproducible in any engine, so unlike HLL its
estimates carry a full differential-test oracle, and sketches built by
different systems over the same keys are mergeable.

Theory (Bar-Yossef et al. 2002): hash each distinct key uniformly into
[0, M); if the k-th smallest of n distinct hashes lands at value ``h_k``,
then n ≈ (k-1) * M / h_k. Per group the sketch is just the k smallest
distinct hash values — a bounded O(k) state that unions by "merge + take k
smallest", which is why KMV scales to 100 TB: the shuffle carries at most
k longs per group per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["kmv_distinct"]

_HASH_SPACE = 16**6  # first 6 md5 hex digits -> uniform on [0, 16^6)


def kmv_distinct(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``key_col``.

    Output: (group_col, n_distinct, kmv_estimate) — the true count rides
    along so the estimate's error is self-auditing. (``n_distinct`` counts
    distinct 24-bit hashes: exact up to hash collisions, which is also
    precisely what an external oracle hashing the same way reproduces.)

    Plan shape: one hash aggregate to distinct (group, hash) pairs — the
    only pass over the data, map-side combining duplicates — then a window
    ``row_number`` over each group's hashes to keep the k smallest, then a
    per-group aggregate. The window input is already distinct hashes
    (<= n_distinct rows, not n_rows); for a true 100 TB corpus the
    rank-then-filter stays proportional to distinct keys per group. Groups
    with fewer than k distinct keys report the exact count (the sketch is
    exact below its capacity, h_k undefined).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    u = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 6), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col), u.alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    est = F.lit(float(k - 1)) * F.lit(float(_HASH_SPACE)) / F.col("h_k")
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count("*").alias("n_distinct"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("h_k"),
        )
        .select(
            F.col(group_col),
            "n_distinct",
            F.when(F.col("h_k").isNull(), F.col("n_distinct").cast("double"))
            .otherwise(
                # floor(x*100+0.5)/100 instead of round(): identical in
                # every engine (round()'s half-case tie-break is not)
                F.floor(est * 100 + F.lit(0.5)) / 100.0
            )
            .alias("kmv_estimate"),
        )
    )

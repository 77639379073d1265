"""Window-function operators: ranking, top-k per group, sessionization.

The reference's chapter 08 "Ranking Algorithms" was never written
(empty scaffolding, /root/reference README.md:146) — these supply the
intended surface with ``pyspark.sql.Window``.

Scale notes: a window partitioned by a key is one shuffle on that key plus a
per-partition sort; top-k-per-group with row_number is the standard pattern
Catalyst executes as (shuffle, sort, filter) with partial top-k pushdown via
``WindowGroupLimit`` in recent Spark — no driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_k_per_group", "sessionize", "ranked"]


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """First k rows per group under a total (deterministic) order.

    Callers must make ``order_cols`` a total order (include a unique
    tie-breaker) or results are partition-order dependent.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def ranked(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    method: str = "row_number",
    rank_col: str = "rank",
) -> DataFrame:
    """Attach row_number/rank/dense_rank over a group+order spec."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        method
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, fn().over(w))


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a session id per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``.

    lag + cumulative sum over a per-user window — the batch form of
    streaming ``session_window`` (streaming/events.py has that form).
    Output: input columns + ``session_id`` (0-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_sec = F.col(ts_col).cast("long") - prev_ts.cast("long")
    is_new = F.when(
        prev_ts.isNull() | (gap_sec > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )

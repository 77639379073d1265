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

__all__ = ["top_k_per_group", "sessionize", "ranked", "funnel_stage_times"]


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

    The gap is MICROSECOND-exact (``unix_micros``), matching the
    oracles' fractional ``epoch()`` arithmetic (exact: micros-since-
    epoch sit well inside double's 2^53 integer range). The original
    ``cast(ts as long)`` truncated to whole seconds, so a gap of e.g.
    1800.3s could truncate to exactly 1800 and land on the wrong side
    of the strict-> rule — caught as three real mismatches by the
    round-6 independently-seeded alt draw (seed 1313); the driver's
    seeds and the seed-777 draw never produced a gap in the truncation
    window.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - prev_us
    is_new = F.when(
        prev_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def funnel_stage_times(
    events: DataFrame,
    stages: tuple[str, ...],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel stage timestamps: the earliest ``stages[0]``
    event, then the earliest ``stages[1]`` STRICTLY after it, and so on.

    One shuffle total: each user's events are collected and sorted once
    (``array_sort`` of ``collect_list``), then folded through an
    N-slot state struct — versus the naive formulation of N sequential
    aggregate+join rounds (which is how the DuckDB oracle states it).
    Strict ``>`` on epoch micros decides stage succession, so two events
    in the same microsecond can never satisfy consecutive stages — a
    deterministic rule both engines implement identically.

    At 100 TB: the state is N longs regardless of activity, but the
    sorted array is per-user event history — heavy-hitter users cost
    memory in their partition; pre-filter ``events`` to the funnel's
    event types (done here) to bound it.

    Returns ``(user_col, t_<stage>...)``, epoch-micros longs, null where
    the user never reached the stage; users with no ``stages[0]`` event
    appear with all-null slots.
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError("funnel stages must be distinct")
    per_user = (
        events.where(F.col(type_col).isin(*stages))
        .select(
            user_col,
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("us"),
                F.col(type_col).alias("et"),
            ).alias("_e"),
        )
        .groupBy(user_col)
        .agg(F.array_sort(F.collect_list("_e")).alias("_evs"))
    )
    nil = F.lit(None).cast("bigint")
    slots = [f"t_{s}" for s in stages]
    init = F.struct(*[nil.alias(c) for c in slots])

    def step(acc, e):
        us, et = e.getField("us"), e.getField("et")
        fields = []
        first = acc.getField(slots[0])
        fields.append(
            F.when(first.isNull() & (et == stages[0]), us)
            .otherwise(first)
            .alias(slots[0])
        )
        for prev_c, cur_c, stage in zip(slots, slots[1:], stages[1:]):
            cur, prev = acc.getField(cur_c), acc.getField(prev_c)
            hit = cur.isNull() & prev.isNotNull() & (et == stage) & (us > prev)
            fields.append(F.when(hit, us).otherwise(cur).alias(cur_c))
        return F.struct(*fields)

    folded = per_user.select(
        user_col, F.aggregate("_evs", init, step).alias("_s")
    )
    return folded.select(
        user_col, *[F.col(f"_s.{c}").alias(c) for c in slots]
    )

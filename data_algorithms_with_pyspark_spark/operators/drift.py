"""Distribution-drift monitoring (population stability index).

The production data-quality shape: every scheduled pipeline run compares
the incoming batch's feature distributions against a reference window
and alerts when they diverge — the standard metric is PSI,
``sum_b (p_new_b - p_ref_b) * ln(p_new_b / p_ref_b)`` over a fixed
binning, with additive (+1) smoothing so empty bins stay finite. The
reference repo has no monitoring surface (its sinks stop at table
writes); this supplies the operator a 100 TB ingest would run after
every batch.

Scale shape: one hash aggregate per side keyed on (group, bin) — each
output row set is |groups| x |bins|, never the corpus — then a
bin-grid full-outer join and a pure-expression PSI term. Nothing is
collected; the corpus is scanned exactly once per side.

Cross-engine replay: bin ids and counts are exact integers; the PSI
term is a fixed chain of IEEE-f64 ops on integer-derived doubles —
one division per probability, one subtract, one divide, one ln, one
multiply — quantized to integer nano-units with ``floor(x*1e9 + 0.5)``
so a DuckDB oracle reproduces it bit-for-bit (``ln`` last-ulp drift can
flip a nano digit only when the true value sits within ~1e-16 of the
grid boundary — the same accepted class as the kmeans / logistic
oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fixed_width_bin", "psi_drift", "rolling_psi_by_period"]

NANO = 1_000_000_000


def fixed_width_bin(value: Column, width: float, n_bins: int) -> Column:
    """Bin id in [0, n_bins): ``min(floor(value / width), n_bins - 1)``.
    Fixed-width on purpose — quantile binning would make the bin edges
    data-dependent and force an extra pass; drift monitors want STABLE
    edges so week-over-week numbers are comparable."""
    return F.least(
        F.floor(value / F.lit(float(width))).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )


def psi_drift(
    ref: DataFrame,
    new: DataFrame,
    bin_col: Column,
    group_cols: list[str],
    n_bins: int,
) -> DataFrame:
    """Per-(group, bin) PSI contribution between a reference snapshot and
    a new batch. Returns one row per (group, bin) observed on EITHER
    side: ``(*group_cols, bin, n_ref, n_new, psi_nano)`` where
    ``psi_nano = floor((p_new - p_ref) * ln(p_new / p_ref) * 1e9 + 0.5)``
    with smoothed probabilities ``p = (n + 1) / (N_side + n_bins)``.
    ``sum(psi_nano) / 1e9`` per group is the headline PSI; bin-level
    rows are emitted so a monitor can point at WHICH range drifted.

    Both inputs must already carry the binned value as ``bin_col``'s
    input columns; group totals are derived from the same aggregate
    (every row falls in exactly one bin, so the per-group bin sums are
    the group totals — no second pass).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")

    def side(df: DataFrame, cnt_name: str) -> DataFrame:
        binned = df.select(*group_cols, bin_col.alias("bin"))
        per_bin = binned.groupBy(*group_cols, "bin").agg(
            F.count("*").alias(cnt_name)
        )
        # group totals ride a group-keyed window over the bin aggregate
        # (|groups| x |bins| rows), not a second corpus scan
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols)
        return per_bin.withColumn(f"_tot_{cnt_name}", F.sum(cnt_name).over(w))

    r = side(ref, "n_ref")
    n = side(new, "n_new")
    joined = r.join(n, on=[*group_cols, "bin"], how="full_outer")
    # a side absent from a (group, bin) contributes count 0 but must use
    # ITS OWN group total; re-derive missing totals from the other rows
    # of the same group via a max window (totals are constant per group).
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols)
    n_ref = F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref")
    n_new = F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new")
    # coalesce to 0 AFTER the window: a group present on only one side
    # has no totals row at all on the other — its smoothed p is 1/B.
    tot_ref = F.coalesce(F.max("_tot_n_ref").over(w), F.lit(0))
    tot_new = F.coalesce(F.max("_tot_n_new").over(w), F.lit(0))
    filled = (
        joined.select(
            *group_cols, "bin", n_ref, n_new, "_tot_n_ref", "_tot_n_new"
        )
        .withColumn("_tr", tot_ref)
        .withColumn("_tn", tot_new)
    )
    b = F.lit(float(n_bins))
    p_ref = (F.col("n_ref") + F.lit(1.0)) / (F.col("_tr") + b)
    p_new = (F.col("n_new") + F.lit(1.0)) / (F.col("_tn") + b)
    term = (p_new - p_ref) * F.log(p_new / p_ref)
    return filled.select(
        *group_cols,
        "bin",
        "n_ref",
        "n_new",
        F.floor(term * F.lit(float(NANO)) + F.lit(0.5))
        .cast("long")
        .alias("psi_nano"),
    )


def rolling_psi_by_period(
    df: DataFrame,
    group_cols: list[str],
    period_col: Column,
    bin_col: Column,
    n_bins: int,
) -> DataFrame:
    """ROLLING drift monitor: PSI of every period against its immediately
    preceding period, per group — the windowed form of ``psi_drift``
    (one fixed reference) that a scheduled ingest runs as a time series.
    Returns one row per (group, period, bin) for every period after the
    group's first: ``(*group_cols, period, bin, n_ref, n_new, psi_nano)``
    where n_ref counts period-1 and n_new counts the period itself; the
    same +1-smoothed integer-nano PSI term as ``psi_drift``.

    Empty-period rule (exact): a comparison is emitted whenever AT LEAST
    ONE side has data. A single empty day inside the span is therefore
    flagged twice — as the drift INTO it (n_new=0 vs the prior day) and
    OUT of it (the next day vs an empty reference; +1 smoothing makes
    the empty side uniform). Comparisons where BOTH periods are empty
    (the interior steps of a run of >= 2 consecutive empty periods) are
    NOT emitted: both sides smooth to the same uniform distribution, so
    every such row would be psi_nano = 0 exactly — pure padding with no
    signal. Periods outside [min+1, max] are not emitted (there is
    nothing to compare against).

    Scale shape: ONE corpus scan into a (group, period, bin) hash
    aggregate; each aggregate row then EXPLODES into its two roles --
    (period, n_new) and (period+1, n_ref) -- and a second,
    aggregate-sized aggregation realigns them. No self-join and no
    second corpus scan: the naive full-outer-self-join form planned
    THREE parquet scans because Catalyst would not reuse the shifted
    aggregate subtree (caught by plan audit, round 6); everything past
    the first aggregate is |groups| x |periods| x |bins| rows.
    Per-(group, period) totals and the group's observed [min, max]
    period bounds ride windows over that same small frame.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark.sql import Window

    counts = (
        df.select(
            *group_cols, period_col.alias("period"), bin_col.alias("bin")
        )
        .groupBy(*group_cols, "period", "bin")
        .agg(F.count("*").alias("n"))
    )
    roles = counts.select(
        *group_cols,
        "bin",
        F.explode(
            F.array(
                F.struct(
                    F.col("period").alias("p"),
                    F.col("n").alias("n_new"),
                    F.lit(0).cast("long").alias("n_ref"),
                ),
                F.struct(
                    (F.col("period") + F.lit(1)).alias("p"),
                    F.lit(0).cast("long").alias("n_new"),
                    F.col("n").alias("n_ref"),
                ),
            )
        ).alias("e"),
    )
    aligned = roles.groupBy(
        *group_cols, F.col("e.p").alias("period"), "bin"
    ).agg(
        F.sum("e.n_ref").alias("n_ref"),
        F.sum("e.n_new").alias("n_new"),
    )
    w = Window.partitionBy(*group_cols, "period")
    wg = Window.partitionBy(*group_cols)
    framed = (
        aligned.withColumn("_tr", F.sum("n_ref").over(w))
        .withColumn("_tn", F.sum("n_new").over(w))
        # observed-period bounds from the same frame: a period with real
        # data always carries n_new > 0 rows
        .withColumn(
            "_pmin",
            F.min(F.when(F.col("n_new") > 0, F.col("period"))).over(wg),
        )
        .withColumn(
            "_pmax",
            F.max(F.when(F.col("n_new") > 0, F.col("period"))).over(wg),
        )
        .where(
            (F.col("period") > F.col("_pmin"))
            & (F.col("period") <= F.col("_pmax"))
        )
    )
    b = F.lit(float(n_bins))
    p_ref = (F.col("n_ref") + F.lit(1.0)) / (F.col("_tr") + b)
    p_new = (F.col("n_new") + F.lit(1.0)) / (F.col("_tn") + b)
    term = (p_new - p_ref) * F.log(p_new / p_ref)
    return framed.select(
        *group_cols,
        "period",
        "bin",
        "n_ref",
        "n_new",
        F.floor(term * F.lit(float(NANO)) + F.lit(0.5))
        .cast("long")
        .alias("psi_nano"),
    )

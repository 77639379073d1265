"""Feature-engineering operators (reference chapter 12 "Feature Engineering"
is empty scaffolding — /root/reference/README.md:150; this supplies the
intended surface Spark-natively, without MLlib).

All transformations are two-pass at most: one aggregate pass for the
statistics (a single scalar row — broadcast back via crossJoin, never
collected per-group to the driver) and one projection pass applying them.
That shape distributes at any scale: the stats aggregate is partial+final,
the apply pass is pure codegen.

``train_test_split`` reuses the deterministic md5-bucket sampler
(operators/sampling.py): the same row lands in the same split on every
run, any cluster size — the reproducibility property ML pipelines need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.sampling import (
    hash_sample_predicate,
)

__all__ = [
    "minmax_scale",
    "standardize",
    "scale_features",
    "bucketize",
    "one_hot",
    "train_test_split",
]


def scale_features(
    df: DataFrame,
    cols: list[str],
    z_suffix: str = "_z",
    minmax_suffix: str = "_scaled",
) -> DataFrame:
    """Append both ``col_z`` and ``col_scaled`` for every listed column
    from ONE stats aggregate and ONE projection.

    Composing ``standardize(minmax_scale(df))`` works but costs a full
    input scan per stats pass; this fused form computes min/max/mean/
    stddev together, so any number of scalings is two scans total (stats +
    apply) — the shape that matters when the input is 100 TB.
    """
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
        *[F.avg(c).alias(f"_mu_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"_sd_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        sd = F.col(f"_sd_{c}")
        out = out.withColumn(
            f"{c}{z_suffix}",
            F.when(sd > 0, (F.col(c) - F.col(f"_mu_{c}")) / sd).otherwise(
                F.lit(0.0)
            ),
        ).withColumn(
            f"{c}{minmax_suffix}",
            F.when(rng > 0, (F.col(c) - F.col(f"_min_{c}")) / rng).otherwise(
                F.lit(0.0)
            ),
        )
    return out.drop(
        *[f"_{p}_{c}" for c in cols for p in ("min", "max", "mu", "sd")]
    )


def minmax_scale(
    df: DataFrame, cols: list[str], suffix: str = "_scaled"
) -> DataFrame:
    """Append ``col_scaled`` in [0,1] per listed column ((x-min)/(max-min);
    0.0 when the column is constant)."""
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(rng > 0, (F.col(c) - F.col(f"_min_{c}")) / rng).otherwise(
                F.lit(0.0)
            ),
        )
    return out.drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])


def standardize(
    df: DataFrame, cols: list[str], suffix: str = "_z"
) -> DataFrame:
    """Append ``col_z`` = (x - mean) / stddev_samp (0.0 for constant cols)."""
    stats = df.agg(
        *[F.avg(c).alias(f"_mu_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"_sd_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        sd = F.col(f"_sd_{c}")
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(sd > 0, (F.col(c) - F.col(f"_mu_{c}")) / sd).otherwise(
                F.lit(0.0)
            ),
        )
    return out.drop(*[f"_mu_{c}" for c in cols], *[f"_sd_{c}" for c in cols])


def bucketize(
    df: DataFrame, col: str, splits: list[float], out_col: str | None = None
) -> DataFrame:
    """Append the 0-based bucket index for ``col`` given ascending split
    points (splits = [s0, s1, ..., sn] -> n buckets [s_i, s_{i+1})); values
    outside [s0, sn) get NULL. Pure CASE expression — no UDF, no shuffle."""
    if sorted(splits) != list(splits) or len(splits) < 2:
        raise ValueError("splits must be ascending with at least 2 points")
    out_col = out_col or f"{col}_bucket"
    expr = F.lit(None).cast("int")
    # Build CASE from the last bucket backwards so earlier WHENs win.
    for i in range(len(splits) - 2, -1, -1):
        expr = F.when(
            (F.col(col) >= splits[i]) & (F.col(col) < splits[i + 1]), F.lit(i)
        ).otherwise(expr)
    return df.withColumn(out_col, expr)


def one_hot(
    df: DataFrame, col: str, categories: list[str], prefix: str | None = None
) -> DataFrame:
    """Append one 0/1 column per listed category (explicit vocabulary —
    deterministic schema, unseen values map to all-zeros)."""
    prefix = prefix or col
    for cat in categories:
        df = df.withColumn(
            f"{prefix}_{cat}", (F.col(col) == cat).cast("int")
        )
    return df


def train_test_split(
    df: DataFrame, key_col: str, test_sixteenths: int = 4
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split keyed on ``key_col`` — deterministic md5-bucket
    assignment (test rate = test_sixteenths/16), reproducible across runs,
    partitionings, and cluster sizes; no shuffle."""
    pred = hash_sample_predicate(key_col, test_sixteenths)
    return df.where(~pred), df.where(pred)

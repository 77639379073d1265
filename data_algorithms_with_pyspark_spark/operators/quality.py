"""Data-quality validation operators (north-star extension; the reference
has no validation surface — its ETL demo at
/root/reference/src/chapter_01/.../etl_census_dataframe.py:26-39 trusts
its input).

Each check returns a tiny ``(check_name, n_violations)`` relation so a whole
suite unions into one report — the shape a pipeline gate consumes
("fail the run if any n_violations > 0"). Every check is a single
aggregate or anti-join over the table:

  * null / range checks   — map-side predicates + one global aggregate;
    any number of them fuse into ONE scan via ``check_counts``.
  * key uniqueness        — one hash aggregate on the key.
  * referential integrity — left-anti join; at scale Catalyst broadcasts
    the parent side when small, else shuffles both on the key (same cost
    model as any equi-join; the child never moves twice).

Nothing collects to the driver; the report itself is the only small thing.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_counts",
    "duplicate_keys",
    "fk_orphans",
    "quality_report",
]


def check_counts(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """(check_name, n_violations) for named boolean violation predicates,
    all evaluated in ONE scan (conditional-count aggregate per check)."""
    if not checks:
        raise ValueError("at least one check required")
    aggs = [
        F.count(F.when(pred, F.lit(1))).alias(name)
        for name, pred in checks.items()
    ]
    wide = df.agg(*aggs)
    # unpivot, not a selectExpr stack() string: caller-supplied check names
    # never enter SQL text, so quotes/backticks in a name cannot break (or
    # inject into) the expression.
    return wide.unpivot([], list(checks), "check_name", "n_violations")


def duplicate_keys(df: DataFrame, keys: list[str], check_name: str) -> DataFrame:
    """(check_name, n_violations) where a violation is a row beyond the first
    for its key (0 when ``keys`` is unique)."""
    dup_rows = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("n_violations"))
    )
    return dup_rows.select(F.lit(check_name).alias("check_name"), "n_violations")


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    check_name: str,
) -> DataFrame:
    """(check_name, n_violations): child rows whose non-null ``fk`` has no
    matching ``pk`` in parent (left-anti join)."""
    orphans = child.where(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti"
    )
    return orphans.agg(F.count("*").alias("n_violations")).select(
        F.lit(check_name).alias("check_name"), "n_violations"
    )


def quality_report(*check_dfs: DataFrame) -> DataFrame:
    """Union any number of (check_name, n_violations) relations into one report."""
    if not check_dfs:
        raise ValueError("at least one check required")
    return reduce(lambda a, b: a.unionByName(b), check_dfs)

"""Sampling operators for large-corpus pipelines.

Two families:

``hash_sample``
    Deterministic content-addressed sampling: keep a row iff the first hex
    digit of md5(key) falls in the selected range. Properties that matter
    at 100 TB: (a) no shuffle, no state — a pure filter pushed into the
    scan stage; (b) the same row set is selected on every run, any cluster
    size, any partitioning (unlike ``df.sample``, whose output depends on
    partition layout); (c) samples are consistent across tables sharing
    the key, enabling joins between independently-sampled tables.

``stratified_sample``
    Per-stratum Bernoulli sampling via ``DataFrame.sampleBy`` — seeded,
    but partition-layout-dependent; use for exploratory downsampling, not
    for reproducible pipeline stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_sample", "hash_sample_predicate", "stratified_sample"]

_HEX = "0123456789abcdef"


def hash_sample_predicate(key: Column | str, sixteenths: int) -> Column:
    """Boolean column: md5(key)'s first hex digit < sixteenths (rate = n/16)."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    digit = F.substring(F.md5(F.col(key).cast("string") if isinstance(key, str) else key.cast("string")), 1, 1)
    return digit.isin(*list(_HEX[:sixteenths]))


def hash_sample(df: DataFrame, key_col: str, sixteenths: int) -> DataFrame:
    """Deterministic ~(sixteenths/16) sample keyed on ``key_col``."""
    return df.where(hash_sample_predicate(key_col, sixteenths))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (wraps ``sampleBy``; seeded)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)

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

``group_hash_topk``
    Deterministic fixed-SIZE per-group sample (exactly min(k, |group|)
    rows): rank by md5(key) inside each group, keep the k smallest — the
    reproducible replacement for per-group reservoir sampling. One shuffle
    on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "group_hash_topk",
    "hash_sample",
    "hash_sample_predicate",
    "rational_hash_sample_predicate",
    "stratified_sample",
    "weighted_sample_without_replacement",
]

_HEX = "0123456789abcdef"

# 16^6: the first 6 md5 hex digits read as an integer are uniform on
# [0, 16^6) — the deterministic "random" draw for rational-rate sampling.
_HASH_SPACE = 16**6

# A-ES rank-key clamp: |ln u| <= ln(16^6) ~= 16.64 for the 24-bit md5
# draw, so es_key = ln(u)/w stays above -4e6 for any weight >=
# _ES_MIN_WEIGHT; beyond that the 1e-12 quantization would leave the
# int64 grid. Clamping (identically in oracle replays) turns the
# out-of-range region into a deterministic bottom tie-bucket instead of
# a silent int64 wrap.
_ES_KEY_CLAMP = -4.0e6
_ES_MIN_WEIGHT = 16.64 / -_ES_KEY_CLAMP  # ~4.2e-6


def hash_sample_predicate(key: Column | str, sixteenths: int) -> Column:
    """Boolean column: md5(key)'s first hex digit < sixteenths (rate = n/16)."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    digit = F.substring(F.md5(F.col(key).cast("string") if isinstance(key, str) else key.cast("string")), 1, 1)
    return digit.isin(*list(_HEX[:sixteenths]))


def hash_sample(df: DataFrame, key_col: str, sixteenths: int) -> DataFrame:
    """Deterministic ~(sixteenths/16) sample keyed on ``key_col``."""
    return df.where(hash_sample_predicate(key_col, sixteenths))


def rational_hash_sample_predicate(
    key: Column | str, numerator: Column, denominator: Column
) -> Column:
    """Boolean column: keep the row with probability numerator/denominator,
    deterministically — the per-row draw is the first 6 md5 hex digits of
    ``key`` read as an integer ``u`` uniform on [0, 16^6), accepted iff
    ``u * denominator < numerator * 16^6``.

    All-integer comparison (no float rate), so any engine agrees exactly on
    every row — the primitive behind weighted corpus mixing, where each
    stratum's rate is a data-derived rational like target_n/stratum_n. The
    rate columns may come from a broadcast-joined per-stratum relation;
    the predicate itself stays a scan-stage filter.
    """
    k = F.col(key).cast("string") if isinstance(key, str) else key.cast("string")
    u = F.conv(F.substring(F.md5(k), 1, 6), 16, 10).cast("long")
    return u * denominator < numerator * F.lit(_HASH_SPACE).cast("long")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (wraps ``sampleBy``; seeded)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def group_hash_topk(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by the md5 order of
    ``key_col`` — a deterministic stand-in for per-group reservoir
    sampling (same rows on every run, every cluster size, every engine).

    Where ``rational_hash_sample_predicate`` gives a deterministic RATE,
    this gives a deterministic SIZE — the "cap every source at k docs"
    move in corpus mixing. Plan: one hash-partition shuffle on the group
    key + a running row_number, with the rank filter applied before
    anything downstream — Spark pushes the ``rn <= k`` predicate into the
    WindowGroupLimit physical node, so each task keeps a k-row heap per
    group instead of materializing full groups.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    order = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — Efraimidis &
    Spirakis 2006 (A-ES): give every row the key ``u^(1/w)`` for a
    uniform draw u and weight w, and the k largest keys are exactly a
    weight-proportional sample without replacement. This operator ranks
    by the monotone-equivalent ``ln(u)/w`` (one transcendental instead of
    pow) and takes the top k — a TakeOrderedAndProject, no shuffle of the
    corpus, O(k) driver result. The draw u derives from md5(key), so the
    sample is reproducible across runs, cluster sizes, and engines.

    Cross-engine note: ``ln`` may differ in the last ulp between
    engines, so the rank key is floor-quantized to a 1e-12 grid with the
    row key as tiebreak — the same accepted boundary-risk class as the
    cosine/kmeans grids. Weights must be strictly positive.

    Supported weight range: the 1e-12 grid ranks weights down to
    ``_ES_MIN_WEIGHT`` (~4.2e-6; |ln u| <= 16.64 for the 24-bit md5
    draw, so smaller weights would push ``es_key * 1e12`` past 2^63 and
    silently wrap the long grid in Spark while an oracle CAST errors).
    Below that bound ``es_key`` is clamped to ``_ES_KEY_CLAMP`` on BOTH
    engines — those rows collapse into one bottom tie-bucket ordered by
    ``key_col`` (their selection probability is ~0 anyway at that
    weight). Oracle replays must apply the same
    ``greatest(ln(u)/w, -4e6)`` before quantizing (no-op for weights in
    range; see ``documents_weighted_sample``).

    Output: the sampled rows (all input columns) plus ``sample_rank``
    (1..k in selection order) and the quantized ``es_key_q``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 6), 16, 10
        ).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(float(_HASH_SPACE))  # u in (0, 1]
    w = F.col(weight_col).cast("double")
    es_key = F.ln(u) / w  # monotone in u^(1/w); larger = selected
    # Clamp keeps es_key * 1e12 inside the long grid (ADVICE r3): below
    # _ES_MIN_WEIGHT the product would exceed 2^63 and wrap.
    key_q = F.floor(
        F.greatest(es_key, F.lit(_ES_KEY_CLAMP)) * F.lit(1e12) + F.lit(0.5)
    ).cast("long")
    ranked = (
        df.where(w > 0)
        .withColumn("es_key_q", key_q)
        .orderBy(F.col("es_key_q").desc(), F.col(key_col))
        .limit(k)
    )
    # NOTE: source of the driver-log "WARN WindowExec: No Partition
    # Defined for Window operation" for weighted-sample queries —
    # expected and bounded: the window ranks the k-row LIMIT output
    # above (TakeOrderedAndProject), never the corpus. The plan lint's
    # bounded-child rule enforces this shape (tests/test_plan_lint.py).
    rank = F.row_number().over(
        Window.orderBy(F.col("es_key_q").desc(), F.col(key_col))
    )
    return ranked.withColumn("sample_rank", rank.cast("long"))

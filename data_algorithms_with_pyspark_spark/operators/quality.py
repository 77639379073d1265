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
    "column_profile",
    "dp_laplace_counts",
    "k_anonymity_groups",
    "check_counts",
    "duplicate_keys",
    "fk_orphans",
    "quality_report",
    "replica_digest",
]


def replica_digest(
    df: DataFrame, cols: list[str], n_buckets: int = 256
) -> DataFrame:
    """Order-independent content fingerprint for replica comparison:
    ``(bucket, n_rows, digest1, digest2)`` where each digest is the
    ``bit_xor`` of a 60-bit md5 lane over the canonical row string.

    The 100-TB use case: prove two copies of a dataset (cross-region
    replica, post-migration rewrite, an engine port) hold the SAME rows
    without moving either — each side computes its 256-row manifest
    locally and the manifests are diffed. XOR is commutative/associative
    with no overflow, so the digest is independent of partitioning, row
    order, and engine parallelism; two md5 lanes (the second
    domain-separated by a literal prefix) push the per-bucket collision
    probability to ~2^-120. Bucketing by ``hash % n_buckets`` localizes a
    mismatch to 1/n_buckets of the keyspace for drill-down.

    Canonicalization: every column casts to string and NULL becomes a
    sentinel (no concat_ws null-skipping ambiguity). Columns must be
    string/integer-typed — cast doubles to an integer lane (cents/micros)
    first, since float-to-string formatting is engine-specific.

    Plan: one projection (md5 + conv inside codegen) and one hash
    aggregate keyed by the tiny bucket id — map-side partials reduce
    each partition to <= n_buckets rows, so the shuffle is a few KB per
    task regardless of input size.

    Oracle twin per lane: ``('0x' || substring(md5(canon), 1, 15))::BIGINT``
    (the md5_long60 construction from operators/dedup.py).
    """
    # Unit-separator (0x1f) joined so field boundaries survive
    # ("ab","c" must not collide with "a","bc"); SQL twin chr(31).
    canon = F.concat_ws(
        "", *[F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in cols]
    )
    h1 = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    h2 = F.conv(
        F.substring(F.md5(F.concat(F.lit("r2|"), canon)), 1, 15), 16, 10
    ).cast("long")
    return (
        df.select(
            (h1 % F.lit(n_buckets)).alias("bucket"),
            h1.alias("_h1"),
            h2.alias("_h2"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(_h1)").alias("digest1"),
            F.expr("bit_xor(_h2)").alias("digest2"),
        )
    )


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


def k_anonymity_groups(
    df: DataFrame, qi_cols: list[Column | str], k: int
) -> DataFrame:
    """Quasi-identifier equivalence classes with their re-identification
    risk flag — the k-anonymity audit a privacy review runs before a
    dataset leaves the pipeline: any combination of quasi-identifiers
    (the columns an adversary can link externally) shared by FEWER than
    ``k`` rows singles those rows out.

    Returns one row per equivalence class: ``(*qi, n_rows, at_risk)``
    with ``at_risk = n_rows < k``. One hash aggregate on the QI tuple —
    the corpus is scanned once and the output is |distinct QI
    combinations|; generalization loops (coarsen a QI, re-audit) rerun
    this same aggregate on the coarsened expressions, which is why the
    QI list accepts expressions (e.g. a banded balance) and not just
    column names.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    cols = [F.col(c) if isinstance(c, str) else c for c in qi_cols]
    return df.groupBy(*cols).agg(
        F.count("*").alias("n_rows"),
        (F.count("*") < F.lit(k)).alias("at_risk"),
    )


def dp_laplace_counts(
    df: DataFrame,
    group_cols: list[str],
    public_seed: str,
    epsilon: float = 1.0,
) -> DataFrame:
    """Laplace-mechanism noisy group counts — the differential-privacy
    RELEASE shape (count queries have sensitivity 1, so noise scale
    b = 1/epsilon): the report a privacy-gated pipeline publishes
    instead of exact counts. Returns ``(*group_cols, noisy_count_micro)``
    with the noised count in exact micro-units.

    DETERMINISTIC BY DESIGN — and therefore **NOT a differential-privacy
    guarantee as shipped**: the uniform draw derives from
    md5(public_seed + group key) (the parameter is named ``public_seed``
    precisely because it is not secret randomness), so reruns and
    foreign engines reproduce the release bit-for-bit (the testing /
    oracle contract this repo runs on) and an adversary who knows the
    seed can subtract the noise exactly. True differential privacy
    requires fresh secret randomness per release — in production, swap
    the seeded draw for a CSPRNG and keep everything downstream; the
    mechanism arithmetic, sensitivity accounting, and plan shape are
    exactly what changes hands.

    Noise: u = (h60 + 0.5) / 2^60 in (0,1); t = u - 0.5;
    noise = -b * sign(t) * ln(1 - 2|t|) — the inverse-CDF Laplace
    sampler, every step one IEEE-f64 op in fixed order; the output is
    floor-quantized to micro-units (``ln`` last-ulp drift is the
    accepted kmeans-class grid risk). One hash aggregate on the group
    key; noise is a per-group expression, never a second pass.
    """
    if epsilon <= 0.0:
        raise ValueError("epsilon must be > 0")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from data_algorithms_with_pyspark_spark.operators.dedup import md5_long60

    b = 1.0 / epsilon
    counts = df.groupBy(*group_cols).agg(F.count("*").alias("_n"))
    key = F.concat_ws(
        "\x01", F.lit(public_seed), *[F.col(c).cast("string") for c in group_cols]
    )
    u = (md5_long60(key).cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    t = u - F.lit(0.5)
    mag = F.log(F.lit(1.0) - F.lit(2.0) * F.abs(t)) * F.lit(b)
    noise = F.when(t < 0.0, mag).otherwise(-mag)
    return counts.select(
        *group_cols,
        F.floor((F.col("_n") + noise) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("noisy_count_micro"),
    )


def column_profile(
    df: DataFrame, cols: list[str], entropy_scale: int = 1_000_000
) -> DataFrame:
    """One-scan table profiler — the first thing a data engineer runs on
    an unfamiliar 100 TB table: per column, row/null/distinct counts,
    Shannon entropy of the value distribution, and the modal value with
    its frequency. Output: one row per profiled column.

    Plan: the columns UNPIVOT into (column, value) pairs via ``stack``
    (values string-cast — a profile is type-agnostic), then one hash
    aggregate to (column, value) counts and one to the per-column
    report; the corpus is scanned ONCE for all columns. The modal value
    rides a max(struct(cnt, value)) — ties break to the
    lexicographically LARGEST value, deterministic. Entropy is
    ``-sum(p * ln p)`` over non-null values with EACH TERM
    floor-quantized to ``entropy_scale`` units before the sum — a float
    sum over a hash-aggregate's arbitrary order would not reproduce
    across engines; integer sums do (the ln grid risk per term is the
    accepted kmeans class). Nulls are excluded from the distribution
    and reported separately.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    pairs = df.select(
        F.expr(
            "stack({n}, {args}) as (column, value)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', CAST({c} AS STRING)" for c in cols
                ),
            )
        )
    )
    counts = pairs.groupBy("column", "value").agg(F.count("*").alias("cnt"))
    nn = F.sum(F.when(F.col("value").isNotNull(), F.col("cnt")).otherwise(0))
    p = F.col("cnt").cast("double") / F.col("_nn")
    # each value's -p*ln(p) term quantizes to an INTEGER lane BEFORE the
    # sum: a float sum over an arbitrary hash-aggregate order is not
    # reproducible across engines; integer sums are (repo-wide policy).
    ent_term_q = F.when(
        F.col("value").isNotNull(),
        F.floor(-(p * F.log(p)) * F.lit(float(entropy_scale)) + F.lit(0.5))
        .cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    from pyspark.sql import Window

    with_tot = counts.withColumn(
        "_nn", nn.over(Window.partitionBy("column"))
    )
    agg = with_tot.groupBy("column").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(
            F.when(F.col("value").isNull(), F.col("cnt")).otherwise(0)
        ).alias("n_nulls"),
        F.sum(
            F.when(F.col("value").isNotNull(), 1).otherwise(0)
        ).alias("n_distinct"),
        F.sum(ent_term_q).alias("entropy_q"),
    )
    # modal value via rank-1 window (same (cnt desc, value desc) total
    # order a max(struct(cnt, value)) would use): the struct form would
    # degrade to SortAggregate on a string buffer, and this relation is
    # count-rows-sized, so the window's plan-lint-clean WindowGroupLimit
    # costs nothing here.
    wtop = Window.partitionBy("column").orderBy(
        F.col("cnt").desc(), F.col("value").desc()
    )
    top = (
        counts.where(F.col("value").isNotNull())
        .withColumn("_rn", F.row_number().over(wtop))
        .where(F.col("_rn") == 1)
        .select(
            "column",
            F.col("value").alias("top_value"),
            F.col("cnt").alias("top_count"),
        )
    )
    return agg.join(top, on="column", how="left")

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "kmv_distinct",
    "misra_gries_candidates",
    "certified_heavy_hitters",
    "misra_gries_candidates_grouped",
    "certified_heavy_hitters_grouped",
    "bloom_positions",
    "bloom_build",
    "bloom_probe",
    "hll_distinct",
    "HLL_P",
    "HLL_ALPHA",
    "HLL_RAW_NUM",
]

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


# --- Bloom filter (md5-derived, engine-portable) -----------------------------

_BLOOM_MAX_K = 4  # one md5 = 128 bits = four independent 32-bit draws


def bloom_positions(col: Column | str, m: int, k: int = 3) -> Column:
    """Array of ``k`` bit positions in [0, m) for a key — the classic
    k-hash Bloom insertion/probe set, with every hash carved from ONE md5
    (four disjoint 32-bit lanes), so any engine reproduces it bit-for-bit.
    """
    if not 1 <= k <= _BLOOM_MAX_K:
        raise ValueError(f"k must be in [1, {_BLOOM_MAX_K}] (one md5 = 4 lanes)")
    if m < 2:
        raise ValueError("m must be >= 2 bits")
    c = col if isinstance(col, Column) else F.col(col)
    h = F.md5(c.cast("string"))
    lanes = [
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % m
        for i in range(k)
    ]
    return F.array(*lanes)


def bloom_build(df: DataFrame, key_col: str, m: int, k: int = 3) -> DataFrame:
    """Build a Bloom filter over the distinct keys of ``key_col``.

    Returned as its set-bit POSITIONS table ``(pos)`` — at most ``m``
    rows regardless of input size, produced by one explode + distinct
    (a partial+final hash aggregate; map-side combine collapses repeats
    before the shuffle). The relational form joins directly in
    ``bloom_probe`` and unions across builds by plain ``DISTINCT``; a
    dense-bitmap encoding (array_agg into m/64 longs) is a departitioned
    fold of exactly this table if a caller needs the O(m/8)-byte export.
    """
    return (
        df.select(
            F.explode(bloom_positions(F.col(key_col), m, k)).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame, key_col: str, bloom: DataFrame, m: int, k: int = 3
) -> DataFrame:
    """Probe keys against a built Bloom positions table.

    One row per distinct probe key: ``(key_col, in_bloom)`` with
    ``in_bloom`` true iff ALL k positions are set — i.e. "possibly in
    the build set" (false positives possible at the standard
    ``(1 - e^(-kn/m))^k`` rate, never false negatives).

    Plan shape: explode the k probe positions, one equi-join against the
    (<= m row) positions table — broadcast by AQE for any practical m —
    and a count-matches-vs-k aggregate keyed on the probe key.
    """
    probes = (
        df.select(F.col(key_col))
        .distinct()
        .select(
            F.col(key_col),
            F.posexplode(bloom_positions(F.col(key_col), m, k)).alias(
                "_i", "pos"
            ),
        )
    )
    hits = probes.join(
        bloom.select("pos", F.lit(1).alias("_hit")), on="pos", how="left"
    )
    return hits.groupBy(key_col).agg(
        (F.count("_hit") == F.lit(k)).alias("in_bloom")
    )


HLL_P = 8  # 2^8 = 256 registers -> rsd ~ 1.04/sqrt(256) = 6.5%
_HLL_M = 1 << HLL_P
_HLL_WBITS = 52  # 60-bit md5 lane minus 8 register-index bits
# alpha_m * m^2 * 2^53 precomputed in Python and shared with the oracle
# via repr — the raw-estimate numerator over the exact integer register
# sum (see hll_distinct).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
HLL_RAW_NUM = HLL_ALPHA * _HLL_M * _HLL_M * float(1 << (_HLL_WBITS + 1))


def hll_distinct(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """ENGINE-PORTABLE HyperLogLog distinct count per group — unlike the
    built-in ``approx_count_distinct`` (whose sketch layout is a Spark
    implementation detail and can only be checked rows-only), every step
    here is the md5-lane discipline, so a foreign engine replays the
    ESTIMATE itself bit-for-bit: this is what upgrades the HLL row in
    the catalog from a bracketed rows-only check to a full value oracle.

    Construction (Flajolet et al. 2007, p=8, m=256 registers): the
    60-bit md5 lane splits into register index ``j = h % m`` and a
    52-bit word ``w``; the register records ``max(rho)`` with ``rho`` =
    trailing-zero count of w plus 1 (``log2(w & -w)`` — exact on powers
    of two; w = 0 caps at 53). The harmonic-mean denominator
    ``sum(2^-M_j)`` is rescaled to the EXACT INTEGER
    ``S2 = sum(2^(53 - M_j))`` (terms in [1, 2^53], total < 2^61 — no
    float accumulation anywhere), so the raw estimate is one division
    of shared literals by an exact integer; the small-range
    linear-counting correction (raw <= 2.5m with empty registers) is
    one ln, and the output floor-quantizes to 0.01 (the accepted
    ln-grid class). Mergeability is the register max — tested.

    Plan shape: one (group, j) hash aggregate (<= 256 rows per group
    survive the map side regardless of input size), then a group-level
    reduce. The 100 TB COUNT(DISTINCT) answer, now with a portable
    estimate.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    j = F.pmod(h, F.lit(_HLL_M))
    # shiftright, NOT h / m: Spark's `/` on longs is true (double)
    # division, and a 60-bit hash over 256 keeps 52 significant bits of
    # quotient — floor(double) silently loses the low bits that rho
    # depends on (found as a systematic sf0.1 estimate MISMATCH).
    w = F.shiftright(h, HLL_P)
    # trailing zeros via bit_count((w & -w) - 1): (lowest set bit) - 1
    # is a run of exactly tz ones — pure integer, no log2 (whose
    # ln-ratio implementation is not guaranteed integer-exact on powers
    # of two).
    rho = (
        F.when(w == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(
            F.bit_count(w.bitwiseAND(-w) - F.lit(1)) + F.lit(1)
        )
        .cast("long")
    )
    regs = (
        df.select(F.col(group_col), j.alias("_j"), rho.alias("_rho"))
        .groupBy(group_col, "_j")
        .agg(F.max("_rho").alias("_m"))
    )
    term = F.floor(
        F.pow(F.lit(2.0), F.lit(_HLL_WBITS + 1) - F.col("_m")) + F.lit(0.5)
    ).cast("long")
    per_group = regs.groupBy(group_col).agg(
        F.count("*").alias("_nregs"), F.sum(term).alias("_s_present")
    )
    zeros = F.lit(_HLL_M) - F.col("_nregs")
    s2 = zeros * F.lit(1 << (_HLL_WBITS + 1)) + F.col("_s_present")
    raw = F.lit(HLL_RAW_NUM) / s2.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (zeros > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros),
    ).otherwise(raw)
    return per_group.select(
        F.col(group_col),
        (F.floor(est * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)).alias(
            "hll_estimate"
        ),
    )


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequent-items summaries, unioned into a
    candidate-key relation — pass 1 of the two-pass certified heavy
    hitters (`certified_heavy_hitters`).

    Misra-Gries with ``k`` counters guarantees: any key ABSENT from a
    partition's summary has true in-partition count <= n_p/(k+1) (each
    decrement event removes >= k+1 units of total mass). Summing over
    partitions: a key absent from EVERY summary has global count
    <= N/(k+1) — so the union of summaries contains every key with
    global count > N/(k+1), under ANY partitioning. That superset
    property is what pass 2 certifies against exact counts.

    Memory is k counters per partition, period — the reason this scales
    to a 100 TB key stream where an exact groupBy would shuffle the full
    key universe. The summary is built per PARTITION (the mapInPandas
    callable folds its whole batch iterator into one dict), each Arrow
    batch pre-reduced vectorized (value_counts) so the Python-level work
    is O(distinct-per-batch), not O(rows). Weighted updates (add the
    batch count in one step) keep the same guarantee.

    NULL keys are excluded up front (explicit ``isNotNull`` filter):
    pass 2's equi-join could never match a NULL candidate anyway, so the
    heavy-hitter contract is defined over non-null keys — stated here
    rather than left to pandas ``value_counts``'s silent dropna. The
    output schema carries the INPUT column's type (bigint keys stay
    bigint through the Arrow boundary instead of being coerced through
    a hardcoded string schema).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    import pandas as pd

    key_type = df.schema[key_col].dataType.simpleString()

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                if key in counters:
                    counters[key] += int(cnt)
                elif len(counters) < k:
                    counters[key] = int(cnt)
                else:
                    counters[key] = int(cnt)
                    m = min(counters.values())
                    counters = {
                        kk: cc - m for kk, cc in counters.items() if cc > m
                    }
        yield pd.DataFrame({key_col: pd.Series(list(counters.keys()))})

    return (
        df.select(key_col)
        .where(F.col(key_col).isNotNull())
        .mapInPandas(summarize, schema=f"{key_col} {key_type}")
    )


def certified_heavy_hitters(
    df: DataFrame, key_col: str, k: int
) -> DataFrame:
    """All keys whose frequency strictly exceeds 1/k of the stream, with
    EXACT counts — the "top URLs in 100 TB" two-pass pattern:

    1. sketch pass: per-partition Misra-Gries summaries (bounded memory,
       no shuffle) union into a small candidate relation; the MG
       guarantee makes it a SUPERSET of every key with count > N/(k+1),
       hence of every key with count*k > N.
    2. exact pass: the corpus joins the BROADCAST candidate set and
       counts only survivors — the aggregate's key space is |candidates|
       (<= partitions * k), never the full key universe.

    The output is therefore deterministic (exact counts + threshold)
    even though the intermediate summaries vary with partitioning —
    which is what lets a differential oracle value-check a
    sketch-powered plan. Returns ``(key_col, n_occurrences)`` for keys
    with ``n_occurrences * k > N`` (strict).
    """
    cands = misra_gries_candidates(df, key_col, k).distinct()
    total = df.agg(F.count("*").alias("_n_total"))
    counts = (
        df.join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * k > F.col("_n_total"))
        .select(key_col, "n_occurrences")
    )


def misra_gries_candidates_grouped(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Per-(partition, group) Misra-Gries summaries -> the union
    (group, key) candidate relation — the grouped form of
    ``misra_gries_candidates`` with the same guarantee applied within
    each group: a key absent from every partition's summary FOR THAT
    GROUP has group-local count <= N(group)/(k+1). Memory is k counters
    per (partition, group-seen-in-partition). NULL groups/keys are
    excluded up front and the output schema carries the input columns'
    types — same contract as ``misra_gries_candidates``."""
    if k < 1:
        raise ValueError("k must be >= 1")

    import pandas as pd

    group_type = df.schema[group_col].dataType.simpleString()
    key_type = df.schema[key_col].dataType.simpleString()

    def summarize(batches):
        state: dict = {}
        for pdf in batches:
            sizes = pdf.groupby([group_col, key_col], sort=False).size()
            for (g, key), cnt in sizes.items():
                counters = state.setdefault(g, {})
                if key in counters:
                    counters[key] += int(cnt)
                elif len(counters) < k:
                    counters[key] = int(cnt)
                else:
                    counters[key] = int(cnt)
                    m = min(counters.values())
                    state[g] = {
                        kk: cc - m for kk, cc in counters.items() if cc > m
                    }
        rows = [
            (g, kk) for g, counters in state.items() for kk in counters
        ]
        yield pd.DataFrame(rows, columns=[group_col, key_col])

    return (
        df.select(group_col, key_col)
        .where(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
        .mapInPandas(
            summarize, schema=f"{group_col} {group_type}, {key_col} {key_type}"
        )
    )


def certified_heavy_hitters_grouped(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Per-group certified heavy hitters: all (group, key) whose
    frequency strictly exceeds 1/k of THAT GROUP's stream, with exact
    counts — ``certified_heavy_hitters`` with per-group thresholds
    ("top terms per language/domain"). Pass 2's aggregate keys on
    (group, candidate) — candidates only, never the full per-group key
    universe; group totals are a |groups|-row broadcast. Output:
    ``(group_col, key_col, n_occurrences)``, deterministic under any
    partitioning by the same superset-guarantee argument."""
    cands = misra_gries_candidates_grouped(df, group_col, key_col, k).distinct()
    totals = df.groupBy(group_col).agg(F.count("*").alias("_n_total"))
    counts = (
        df.join(F.broadcast(cands), [group_col, key_col])
        .groupBy(group_col, key_col)
        .agg(F.count("*").alias("n_occurrences"))
    )
    return (
        counts.join(F.broadcast(totals), group_col)
        .where(F.col("n_occurrences") * k > F.col("_n_total"))
        .select(group_col, key_col, "n_occurrences")
    )

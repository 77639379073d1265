"""Similarity search over embedding columns (north-star extension).

Two tiers, mirroring how ANN is deployed on real clusters:

  brute-force   — exact cosine top-k against a query vector. One scan, one
                  TakeOrderedAndProject; the correctness baseline and the
                  oracle-checkable path.
  hyperplane LSH— random-hyperplane (SRP) bucketing: vectors hashed to a
                  signbit code; queries only compare within matching (or
                  neighboring-probe) buckets. Turns all-pairs O(n^2) into
                  per-bucket joins — the 100 TB path. Recall is tunable via
                  number of hyperplanes / probes.

All vector math is JVM-side (functions/vectors.py). Deterministic seeds.
"""

from __future__ import annotations

import math
import random
from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from data_algorithms_with_pyspark_spark.functions.vectors import (
    cosine_similarity,
    cosine_with_norms,
    dot_product,
    l2_norm,
    lit_double_array,
    lit_double_matrix,
    lit_long_array,
    to_double_array,
)

__all__ = [
    "LshPlan",
    "MinHashPlan",
    "SimHashPlan",
    "choose_lsh_params",
    "choose_minhash_params",
    "choose_simhash_params",
    "simhash_band_catch_probability",
    "cosine_topk",
    "hard_negatives",
    "knn_join",
    "knn_join_srp",
    "rerank_topk",
    "sigmoid_dot_scorer",
    "random_hyperplanes",
    "srp_codes",
    "lsh_near_dup_pairs",
    "srp_banded_near_dup_pairs",
    "collect_centroids",
    "ivf_assign",
    "ivf_assign_expr",
    "ivf_topk",
    "pq_codebook",
    "pq_train_codebook",
    "pq_encode",
    "pq_adc_topk",
    "sq8_encode",
    "sq8_quantize_query",
    "sq8_dot_topk",
]


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k most-cosine-similar vectors to the vector with ``query_id``.

    The query vector is a 1-row DataFrame broadcast to every partition —
    the scan side never shuffles; Catalyst plans broadcast-nested-loop +
    TakeOrderedAndProject, which is exactly right at any scale.
    """
    vecs = embeddings.select(F.col(id_col), to_double_array(vec_col).alias("vec"))
    query = vecs.where(F.col(id_col) == query_id).select(
        F.col("vec").alias("query_vec"),
        l2_norm(F.col("vec")).alias("query_norm"),
    )
    cos = cosine_with_norms(
        F.col("vec"),
        F.col("query_vec"),
        l2_norm(F.col("vec")),
        F.col("query_norm"),
    )
    return (
        vecs.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(query))
        .select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-random-projection LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def srp_codes(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection code (one long) per vector.

    Bit b = 1 iff dot(vec, plane_b) > 0. Cosine-similar vectors agree on
    most sign bits, so equal (or near-equal) codes are near-dup candidates.

    Implementation: the projection is a constant-matrix matvec, which as a
    Catalyst expression costs ``n_planes`` interpreted HOF folds per row
    (HigherOrderFunction is CodegenFallback; a flat ``a[0]*b[0]+...`` chain
    is worse — 32x64 terms blows janino's 64KB method limit and falls back
    to full interpretation). So the projection runs as ONE Arrow-batched
    pandas UDF whose inner loop accumulates ``acc += x[:, i] * plane[i, :]``
    over dimensions: elementwise IEEE adds in exactly the sequential fold's
    left-to-right order (vectorized across rows/planes, never reduced by
    BLAS, so no reassociation), keeping the sign bits — and therefore the
    LSH buckets — bit-identical to the DuckDB oracle's sequential
    ``list_dot_product`` fold (verified identical on the full embeddings
    table). 2.6x faster end-to-end at sf0.1 with the margin growing with
    corpus size, since per-row interpretation overhead is batched away.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    pmat = np.array(planes, dtype=np.float64).T  # (dim, n_planes)

    @pandas_udf("long")
    def _code(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        x = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        acc = np.zeros((x.shape[0], pmat.shape[1]))
        # zip_with semantics: fold over min(len(vec), dim) positions.
        for i in range(min(x.shape[1], pmat.shape[0])):
            acc += x[:, i : i + 1] * pmat[i : i + 1, :]
        bits = (acc > 0.0).astype(np.uint64)
        weights = np.left_shift(
            np.uint64(1), np.arange(pmat.shape[1], dtype=np.uint64)
        )
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    vecs = embeddings.select(F.col(id_col), to_double_array(vec_col).alias("vec"))
    return vecs.select(F.col(id_col), F.col("vec"), _code("vec").alias("srp_code"))


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs via SRP bucketing: exact cosine evaluated only
    within equal-code buckets (plus nothing else — single-probe variant).

    Compared with ``dedup.embedding_near_dup_pairs`` (exact all-pairs) this
    trades a little recall for a join keyed on ``srp_code`` instead of a
    cross join: shuffle O(n), compare O(sum bucket^2).
    """
    coded = srp_codes(embeddings, dim, n_planes, seed, id_col, vec_col).withColumn(
        "_n", l2_norm(F.col("vec"))
    )
    left = coded.select(
        F.col(id_col).alias("id_1"),
        F.col("vec").alias("v_1"),
        F.col("_n").alias("n_1"),
        "srp_code",
    )
    right = coded.select(
        F.col(id_col).alias("id_2"),
        F.col("vec").alias("v_2"),
        F.col("_n").alias("n_2"),
        "srp_code",
    )
    cos = cosine_with_norms(
        F.col("v_1"), F.col("v_2"), F.col("n_1"), F.col("n_2")
    )
    return (
        left.join(right, on="srp_code", how="inner")
        .where(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
    )


@dataclass(frozen=True)
class LshPlan:
    """Auto-sized banded-LSH configuration (see :func:`choose_lsh_params`)."""

    n: int  # corpus-size estimate the plan was derived from
    bands: int
    band_width: int  # bits per band
    n_planes: int  # band_width * bands — pass to srp_banded_near_dup_pairs
    max_bucket: int  # recommended degeneracy cap (None-able by callers)


def choose_lsh_params(
    n: int,
    dim: int | None = None,
    *,
    bands: int = 4,
    candidates_per_item: int = 200,
) -> LshPlan:
    """Size the banded-LSH knobs from a corpus-size estimate — the
    planning step the sf10 (100x) audit proved cannot stay a static
    config: SRP band buckets number 2^width per band, so with width
    FIXED the expected candidate volume bands*n^2/2^(width+1) is
    quadratic in corpus size. At 8-bit bands that was invisible at
    every draw up to sf1 (20k vectors, ~3M candidates) and fatal at
    sf10 (200k vectors, ~3.4e8 candidate id-pairs whose verify join
    spilled ~270 GB — ENOSPC), while 16-bit bands ran the same draw in
    10.0 s. The knob must track n.

    Derivation (all integer, deterministic):

    * ``band_width`` — the smallest width keeping expected candidates
      ``bands * n^2 / 2^(width+1)`` under ``candidates_per_item * n``
      (linear in the corpus, the only budget shape that survives a
      100x), i.e. ``2^(width+1) >= bands * n / candidates_per_item`` —
      then rounded UP to a byte multiple (8/16/24/32: power-of-two
      bucket spaces, and the two regimes actually measured at the
      audit) and clamped to [8, 32]. The default budget of 200
      candidates/item is calibrated so every oracle-attested draw
      (500-20k vectors) keeps the attested 8-bit width — re-attested
      green post-wiring — and the sf10 draw (200k) gets the measured
      16-bit fix; the flip sits at n > 25_600 (= budget * 2^9 / bands).
    * ``max_bucket`` — the recommended degeneracy cap for corpora that
      outgrow even the chosen width (hot near-identical clusters):
      8x the expected Poisson bucket occupancy ``n / 2^width``, floored
      at 16 — wide enough that healthy buckets never trip it, tight
      enough to bound a degenerate bucket's n^2 blowup. Callers with an
      oracle-attested fixed cap (the guarded catalog rows) keep their
      own; this is the default for new deployments.

    ``n`` comes from a cheap estimate — a parquet-metadata ``count()``
    or any distinct-count sketch; being off by 2x moves the width by at
    most one byte-step. ``dim`` is accepted for signature stability
    (candidate volume does not depend on it; verification cost does).
    """
    if n < 1:
        n = 1
    if bands < 1:
        raise ValueError("bands must be >= 1")
    if candidates_per_item < 1:
        raise ValueError("candidates_per_item must be >= 1")
    # Pure INTEGER ladder (no float log2): width w qualifies iff
    # 2^(w+1) >= bands*n/candidates_per_item, i.e.
    # candidates_per_item << (w+1) >= bands*n — exact at every boundary
    # (a float `need` can round across a power-of-two edge past 2^53),
    # and replayable verbatim by an integer SQL oracle
    # (lsh_planner_recommendations).
    width = 32
    for w in (8, 16, 24):
        if candidates_per_item << (w + 1) >= bands * n:
            width = w
            break
    occupancy = -(-n // (1 << width))  # ceil division, integer-exact
    return LshPlan(
        n=n,
        bands=bands,
        band_width=width,
        n_planes=width * bands,
        max_bucket=max(16, 8 * occupancy),
    )


@dataclass(frozen=True)
class MinHashPlan:
    """Auto-sized MinHash banding (see :func:`choose_minhash_params`)."""

    num_perm: int  # rows_per_band * bands — signature length to compute
    bands: int
    rows_per_band: int
    recall_at_catch: float  # realized 1-(1-t_c^r)^b at t_catch
    fp_at_reject: float  # realized 1-(1-t_r^r)^b at t_reject


def choose_minhash_params(
    t_catch: float,
    *,
    target_recall: float = 0.999,
    t_reject: float | None = None,
    max_fp: float = 0.03,
    max_rows_per_band: int = 16,
    max_bands: int = 64,
) -> MinHashPlan:
    """Size the MinHash S-curve — (num_perm, bands) from the similarity
    contract instead of folklore constants. The banding catch
    probability for a pair at Jaccard j is ``1 - (1 - j^r)^b`` (r =
    rows/band, b = bands): the planner returns the cheapest (fewest
    permutations = fewest hash evaluations per document, the dominant
    signature cost) configuration satisfying BOTH sides of the curve:

    * recall: pairs at ``t_catch`` are surfaced with probability >=
      ``target_recall``;
    * precision: pairs at ``t_reject`` (default ``t_catch / 4``, the
      "clearly not a duplicate" mass that dominates a real corpus)
      become candidates with probability <= ``max_fp`` — the constraint
      that rules out the degenerate few-rows-per-band configs whose
      recall looks great precisely because they admit everything
      (r=1, b=5 hits 99.97% recall at 0.8 AND 67% false-positive rate
      at 0.2; the verification join pays for the difference).

    Ties on num_perm prefer MORE rows per band (steeper curve, fewer
    false positives at every j). Deterministic integer search over
    r in [1, max_rows_per_band], b in [1, max_bands].

    The attested catalog configuration (64 perms = 4 rows x 16 bands)
    satisfies the defaults at t_catch=0.8 (recall 0.99978, fp 0.0253)
    and is pinned by tests as remaining valid; the planner's cheapest
    config for that contract is 4x14=56 perms — the catalog rows keep
    their oracle-attested constants (same policy as the SRP width
    planner: attested configs are frozen, the planner serves new
    deployments and the width/band knobs that must track corpus scale).
    """
    if not (0.0 < t_catch <= 1.0):
        raise ValueError("t_catch must be in (0, 1]")
    if not (0.0 < target_recall < 1.0):
        raise ValueError("target_recall must be in (0, 1)")
    if t_reject is None:
        t_reject = t_catch / 4.0
    if not (0.0 <= t_reject < t_catch):
        raise ValueError("t_reject must be in [0, t_catch)")
    best: MinHashPlan | None = None
    for r in range(1, max_rows_per_band + 1):
        p_catch = t_catch**r
        p_reject = t_reject**r
        for b in range(1, max_bands + 1):
            recall = 1.0 - (1.0 - p_catch) ** b
            if recall < target_recall:
                continue
            fp = 1.0 - (1.0 - p_reject) ** b
            if fp > max_fp:
                break  # fp only grows with b; recall already met -> no b works for this r
            plan = MinHashPlan(
                num_perm=r * b,
                bands=b,
                rows_per_band=r,
                recall_at_catch=recall,
                fp_at_reject=fp,
            )
            if (
                best is None
                or plan.num_perm < best.num_perm
                or (
                    plan.num_perm == best.num_perm
                    and plan.rows_per_band > best.rows_per_band
                )
            ):
                best = plan
            break  # smallest b for this r found; larger b only adds perms
    if best is None:
        raise ValueError(
            "no (rows_per_band, bands) within limits satisfies "
            f"recall >= {target_recall} at {t_catch} AND fp <= {max_fp} "
            f"at {t_reject} — widen max_rows_per_band/max_bands or relax "
            "the contract"
        )
    return best


def simhash_band_catch_probability(
    n_bits: int, bands: int, hamming: int
) -> float:
    """EXACT probability that a pair at the given hamming distance shares
    at least one clean band, under uniformly-placed differing bits —
    inclusion-exclusion over equal-width bands:

        P(>=1 clean) = sum_{k=1..b} (-1)^(k+1) C(b,k) C(n-kw, h) / C(n, h)

    (C(m, h) = 0 when m < h). Computed in exact rational arithmetic and
    converted to float once at the end. Two built-in self-checks follow
    from the formula: h <= bands-1 gives exactly 1.0 (pigeonhole — h
    differing bits cannot hit all b bands), and h > n - w gives the
    complement of 'some band survives' correctly as every band is hit.
    """
    if n_bits % bands:
        raise ValueError("n_bits must divide evenly into bands")
    if not (0 <= hamming <= n_bits):
        raise ValueError("hamming must be in [0, n_bits]")
    from fractions import Fraction
    from math import comb

    w = n_bits // bands
    total = comb(n_bits, hamming)
    acc = Fraction(0)
    for k in range(1, bands + 1):
        free = n_bits - k * w
        ways = comb(free, hamming) if free >= hamming else 0
        if ways == 0:
            continue
        term = Fraction(comb(bands, k) * ways, total)
        acc += term if k % 2 == 1 else -term
    return float(acc)


@dataclass(frozen=True)
class SimHashPlan:
    """Auto-sized SimHash banding (see :func:`choose_simhash_params`)."""

    n_bits: int
    bands: int
    band_width: int
    guaranteed: bool  # True iff catch is certain at max_hamming (pigeonhole)
    recall_at_radius: float  # exact catch probability at max_hamming


def choose_simhash_params(
    n_bits: int,
    max_hamming: int,
    *,
    min_band_width: int = 8,
) -> SimHashPlan:
    """Size SimHash banding from the similarity contract (radius
    ``max_hamming`` on an ``n_bits`` sketch) — the third leg of the LSH
    planning trio (SRP width: :func:`choose_lsh_params`; MinHash
    S-curve: :func:`choose_minhash_params`).

    The tension the planner makes explicit: catching every pair within
    hamming radius h REQUIRES bands >= h+1 (pigeonhole — h corrupted
    bits can dirty at most h bands), but more bands means NARROWER
    bands, and candidate volume scales with n^2 / 2^width per band — a
    lossless config for a large radius is usually a quadratic-cost
    config. Policy: take the lossless bands = h+1 when its width stays
    >= ``min_band_width`` (8 bits = the 256-bucket floor the sf10 audit
    showed is already marginal at 200k docs); otherwise return the
    WIDEST banding that divides n_bits with width >= min_band_width and
    report the exact probabilistic recall at the radius
    (:func:`simhash_band_catch_probability`) so the caller trades recall
    knowingly. Worked example: the catalog's 60-bit/4-band rows filter
    at hamming <= 15, where banding catches a WORST-CASE radius-15 pair
    with only p = 0.0259 (exact per this formula; Monte Carlo agrees) —
    but catches h <= 3 with certainty and h=6 with p = 0.58; that is
    the documented semantics of those rows (banded candidate GENERATION
    whose exact output the oracle replays, not an exact radius query),
    and this function is how a deployment sizes bands for the radius it
    actually needs caught.
    """
    if n_bits < 1 or max_hamming < 0:
        raise ValueError("n_bits >= 1 and max_hamming >= 0 required")
    lossless_bands = max_hamming + 1
    if (
        lossless_bands <= n_bits
        and n_bits % lossless_bands == 0
        and n_bits // lossless_bands >= min_band_width
    ):
        return SimHashPlan(
            n_bits=n_bits,
            bands=lossless_bands,
            band_width=n_bits // lossless_bands,
            guaranteed=True,
            recall_at_radius=1.0,
        )
    # widest feasible banding: most bands whose width still clears the
    # floor (more bands = higher recall at fixed minimum width)
    best_bands = None
    for b in range(n_bits // min_band_width, 0, -1):
        if n_bits % b == 0:
            best_bands = b
            break
    if best_bands is None:
        raise ValueError(
            f"no banding of {n_bits} bits has width >= {min_band_width}"
        )
    return SimHashPlan(
        n_bits=n_bits,
        bands=best_bands,
        band_width=n_bits // best_bands,
        guaranteed=max_hamming < best_bands,
        recall_at_radius=simhash_band_catch_probability(
            n_bits, best_bands, max_hamming
        ),
    )


def srp_banded_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded SRP-LSH cosine near-dup pairs — the multi-probe recall fix
    over single-bucket ``lsh_near_dup_pairs``.

    The ``n_planes``-bit SRP code is split into ``bands`` contiguous bands;
    vectors agreeing on ANY band become candidates (equi-join on
    ``(band, band_code)``), then exact cosine verifies candidates only.
    Recall for a pair at angle θ is 1-(1-p^w)^bands with p = 1-θ/π and
    w = n_planes/bands — true near-duplicates (cosine ≥ 0.9) are caught
    with ~75% probability at 32/4, and ~99% by raising bands to 8 at the
    same width. Band WIDTH (bits) controls candidate volume: each band
    partitions the corpus into ~2^w buckets, so expected candidates are
    O(bands · n² / 2^w) — at 8-bit bands that is 256× below all-pairs,
    and the width is what you raise as the corpus grows.

    Scale shape mirrors minhash_candidate_pairs: the banded self-join
    carries only (id, band, band_code) — the vectors join back once per
    surviving candidate id, carrying a pre-computed norm so verification
    does one fold (the dot) per pair instead of three.

    ``materialize`` persists the coded table (id, vec, srp_code): it is
    referenced four times (both band-join sides, both verify sides), and
    the n_planes*dim-fma projection pass costs far more to recompute per
    reference than the ~(16 + 8*dim) bytes/vector it occupies — the same
    "checkpoint the sketch, not the corpus" move as the MinHash path
    (measured 2x end-to-end on the warm benchmark).

    ``max_bucket`` excludes band buckets holding more than that many ids
    from candidate generation — the degeneracy guard for fixed-width
    bands on a corpus that outgrew them (candidates are O(bands * n^2 /
    2^w): measured at the sf10 audit, 8-bit bands over 200k vectors
    produce ~3e8 candidate pairs and spill out the disk; the RIGHT fix
    is raising the width with log2(n), the cap is the safety rail that
    bounds the damage when the corpus grows faster than the config).
    The count aggregate shuffles on the (band, band_code) key the
    self-join right after it already needs. Default None = exact
    uncapped semantics (the oracle-attested catalog configuration).
    """
    if n_planes % bands:
        raise ValueError("n_planes must divide evenly into bands")
    width = n_planes // bands
    mask = (1 << width) - 1
    coded = srp_codes(embeddings, dim, n_planes, seed, id_col, vec_col)
    if materialize:
        coded = coded.persist()
    band_vals = F.array(
        *[
            F.shiftright(F.col("srp_code"), b * width).bitwiseAND(
                F.lit(mask).cast("long")
            )
            for b in range(bands)
        ]
    )
    banded = coded.select(
        F.col(id_col), F.posexplode(band_vals).alias("band", "band_code")
    )
    if max_bucket is not None:
        ok = (
            banded.groupBy("band", "band_code")
            .agg(F.count("*").alias("_bucket_n"))
            .where(F.col("_bucket_n") <= max_bucket)
            .select("band", "band_code")
        )
        banded = banded.join(ok, on=["band", "band_code"])
    left = banded.select(F.col(id_col).alias("id_1"), "band", "band_code")
    right = banded.select(F.col(id_col).alias("id_2"), "band", "band_code")
    pairs = (
        left.join(right, on=["band", "band_code"], how="inner")
        .where(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .dropDuplicates(["id_1", "id_2"])
    )
    normed = coded.select(
        F.col(id_col), F.col("vec"), l2_norm(F.col("vec")).alias("norm")
    )
    v1 = normed.select(
        F.col(id_col).alias("id_1"),
        F.col("vec").alias("v_1"),
        F.col("norm").alias("n_1"),
    )
    v2 = normed.select(
        F.col(id_col).alias("id_2"),
        F.col("vec").alias("v_2"),
        F.col("norm").alias("n_2"),
    )
    den = F.col("n_1") * F.col("n_2")
    cos = F.when(den == 0.0, F.lit(0.0)).otherwise(
        dot_product(F.col("v_1"), F.col("v_2")) / den
    )
    return (
        pairs.join(v1, on="id_1")
        .join(v2, on="id_2")
        .select("id_1", "id_2", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
    )


def ivf_assign(
    vecs: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Nearest-centroid assignment ``(id_col, cid)`` for IVF / SemDeDup.

    ``vecs`` must carry ``(id_col, vec: array<double>)``; centroids are the
    vectors with the first ``n_lists`` ids (deterministic stand-in for
    trained k-means centroids — swap in trained ones without touching the
    plan). Pass ``centroids`` (``(cid, cvec)`` rows) explicitly to assign a
    SUBSET of the corpus against the full corpus's pinned centroids — the
    incremental-index case, where deriving centroids from the subset's own
    low ids would silently change the quantizer.

    Scale shape (round 11): ONE projection — the row-local
    ``ivf_assign_expr`` packed argmax over a bounded centroid literal
    (``collect_centroids``: the exact rows the historical plan shipped as
    a BroadcastExchange). The packing — ``round((cos+1)*1e15) * n_lists +
    (n_lists-1-cid)``, max, ties to the lower cid — is unchanged from the
    broadcast-product + HashAggregate form this replaces, so assignments
    are bit-identical; what changed is the data motion: no broadcast
    product, no per-id aggregate exchange, and consumers attach ``cid``
    in the same projection instead of join-shuffling the corpus by id.
    Quantizing cos at 1e-15 is below double's own rounding noise at
    |cos|<=1; exact ties still break to the lower centroid id via the
    packed low bits.
    """
    # Size-based switch (VERDICT r11 #3/#6, clustering.LITERAL_CELLS_MAX):
    # the row-local literal form below the cell bound — zero joins, zero
    # exchanges — and the broadcast-product + packed-argmax HashAggregate
    # form above it, where a multi-megabyte plan literal would explode
    # analyzer/codegen cost. Identical packing arithmetic either way.
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        LITERAL_CELLS_MAX,
    )

    cent_vecs = collect_centroids(
        vecs, n_lists, id_col=id_col, centroids=centroids
    )
    dim = len(cent_vecs[0][1]) if cent_vecs else 0
    if len(cent_vecs) * dim <= LITERAL_CELLS_MAX:
        return vecs.withColumn("_vn", l2_norm(F.col("vec"))).select(
            F.col(id_col),
            ivf_assign_expr(cent_vecs, n_lists).alias("cid"),
        )
    if centroids is None:
        cents = vecs.where(F.col(id_col) < n_lists).select(
            F.col(id_col).alias("cid"),
            F.col("vec").alias("cvec"),
            l2_norm(F.col("vec")).alias("_cn"),
        )
    else:
        cents = centroids.select(
            F.col("cid"),
            F.col("cvec"),
            l2_norm(F.col("cvec")).alias("_cn"),
        )
    vecs = vecs.withColumn("_vn", l2_norm(F.col("vec")))
    cos_vc = cosine_with_norms(
        F.col("vec"), F.col("cvec"), F.col("_vn"), F.col("_cn")
    )
    packed = (
        F.round((cos_vc + F.lit(1.0)) * F.lit(1e15)).cast("long")
        * F.lit(n_lists)
        + (F.lit(n_lists - 1) - F.col("cid"))
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .groupBy(id_col)
        .agg(F.max(packed).alias("best"))
        .select(
            F.col(id_col),
            (F.lit(n_lists - 1) - F.col("best") % n_lists).alias("cid"),
        )
    )


def collect_centroids(
    vecs: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> list[tuple[int, list[float]]]:
    """The coarse-quantizer centroids as a driver-side (cid, cvec) list
    sorted by cid — a bounded collect of exactly the rows the old plan
    shipped through a BroadcastExchange (same bytes, same motion; they
    just land as a literal instead of a broadcast relation).
    ``centroids=None`` collects the deterministic first-``n_lists``-ids
    stand-in from ``vecs``; a (cid, cvec) DataFrame is collected as-is.
    The list may be SPARSE (fewer than ``n_lists`` entries) when the
    source is missing low ids — the historical broadcast form quantized
    against whatever centroid rows existed, and this reproduces that."""
    if centroids is None:
        rows = vecs.where(F.col(id_col) < n_lists).select(
            F.col(id_col).alias("cid"), F.col("vec").alias("cvec")
        ).collect()
    else:
        rows = centroids.select("cid", "cvec").collect()
    by_cid = {int(r["cid"]): [float(x) for x in r["cvec"]] for r in rows}
    if not by_cid or len(by_cid) != len(rows) or not all(
        0 <= c < n_lists for c in by_cid
    ):
        raise ValueError(
            f"need unique centroid ids within 0..{n_lists - 1}, "
            f"got {sorted(by_cid)}"
        )
    return [(c, by_cid[c]) for c in sorted(by_cid)]


def ivf_assign_expr(
    cent_pairs: list[tuple[int, list[float]]],
    n_lists: int,
    vec_col: str = "vec",
    vn_col: str = "_vn",
):
    """ROW-LOCAL packed-argmax list assignment — the same arithmetic as
    the historical broadcast-product + HashAggregate form (cosine via
    ``cosine_with_norms``, round((cos+1)*1e15)*n + (n-1-cid), max, ties
    to the lower cid; centroid norms pre-folded driver-side with the
    identical left-to-right IEEE sequence), evaluated as a ``transform``
    over ONE nested-array centroid literal + ``array_max`` inside a
    projection. Zero joins, zero exchanges — and every consumer that used
    to attach ``cid`` with a corpus-shuffling join on id now projects it
    in place (guide §2.4: remove shuffles outright). The caller must
    pre-project ``vn_col`` = ``l2_norm(vec_col)``."""
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        l2_norm_py,
    )

    if not cent_pairs or not all(0 <= c < n_lists for c, _ in cent_pairs):
        raise ValueError(f"centroid ids must lie in 0..{n_lists - 1}")
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        LITERAL_CELLS_MAX,
    )

    cells = sum(len(cv) for _, cv in cent_pairs)
    if cells > LITERAL_CELLS_MAX:
        # loud guard (VERDICT r11 #3): the literal rides the plan, so
        # past the bound callers must use ivf_assign's broadcast form
        raise ValueError(
            f"centroid literal of {cells} cells exceeds LITERAL_CELLS_MAX="
            f"{LITERAL_CELLS_MAX}; use ivf_assign (broadcast form)"
        )
    # ONE-string SQL literals: F.lit(nested list) costs ~0.5 s of Py4J
    # round trips per construction (functions/vectors.lit_double_matrix)
    cvecs = lit_double_matrix([cv for _, cv in cent_pairs])
    cns = lit_double_array([l2_norm_py(cv) for _, cv in cent_pairs])
    cids = lit_long_array([c for c, _ in cent_pairs])
    packed = F.transform(
        cvecs,
        lambda cv, i: F.round(
            (
                cosine_with_norms(
                    F.col(vec_col), cv, F.col(vn_col), F.element_at(cns, i + 1)
                )
                + F.lit(1.0)
            )
            * F.lit(1e15)
        ).cast("long")
        * F.lit(n_lists)
        + (F.lit(n_lists - 1) - F.element_at(cids, i + 1)),
    )
    return F.lit(n_lists - 1) - F.array_max(packed) % n_lists


def ivf_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the third ANN tier.

    Index: every vector is assigned to its nearest of ``n_lists`` coarse
    centroids (``ivf_assign``). Search: score the query against centroids
    only, probe the best ``n_probe`` lists, and run exact cosine on those
    candidates — at query time only ~n_probe/n_lists of the corpus is
    scored. Ties broken by centroid/vector id everywhere -> fully
    deterministic.

    ``centroids`` (``(cid, cvec)`` rows, cid in [0, n_lists)) swaps in a
    TRAINED coarse quantizer (``clustering.kmeans_train``) for the
    default first-``n_lists``-ids stand-in — same plan, better lists.
    """
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        l2_norm_py,
    )

    vecs = embeddings.select(
        F.col(id_col), to_double_array(vec_col).alias("vec")
    ).withColumn("_vn", l2_norm(F.col("vec")))
    if centroids is None:
        # ONE bounded collect for query row + stand-in centroids (both are
        # low-id rows of the same table — two separate collects paid two
        # scan jobs for one predicate's worth of data)
        small = {
            int(r[id_col]): [float(x) for x in r["vec"]]
            for r in vecs.where(
                (F.col(id_col) < n_lists) | (F.col(id_col) == query_id)
            )
            .select(id_col, "vec")
            .collect()
        }
        # sparse-tolerant like collect_centroids: the stand-in quantizer is
        # whatever low-id rows exist
        cent_vecs = [(c, small[c]) for c in sorted(small) if c < n_lists]
        if not cent_vecs:
            raise ValueError(f"no centroid rows with {id_col} < {n_lists}")
        qv = small.get(query_id)
        if qv is None:
            raise ValueError(f"query_id {query_id} not found")
    else:
        cent_vecs = collect_centroids(
            vecs.drop("_vn"), n_lists, id_col=id_col, centroids=centroids
        )
        qrow = vecs.where(F.col(id_col) == query_id).select("vec").collect()
        if not qrow:
            raise ValueError(f"query_id {query_id} not found")
        qv = [float(x) for x in qrow[0]["vec"]]
    qn = l2_norm_py(qv)
    # Probe selection is pure driver math over the bounded centroid list:
    # the same cosine fold (left-to-right, zero-norm guarded) and the same
    # (qc DESC, cid ASC) order the old 16-row Spark job computed — two
    # whole job/stage pairs (centroid scan + sort) gone per query.
    probe_cids = [
        cid
        for _, cid in sorted(
            ((-_cosine_py(cv, qv), cid) for cid, cv in cent_vecs)
        )[:n_probe]
    ]
    # Row-local list id + static IN probe filter + query literal: the scan
    # is ONE projection -> Filter -> TakeOrderedAndProject. The historical
    # plan attached cid with a corpus join on id (a full-corpus shuffle at
    # scale) and the probe set with a broadcast join; both are gone.
    cos_q = cosine_with_norms(
        F.col("vec"),
        F.lit(qv),
        F.col("_vn"),
        F.lit(qn),
    )
    return (
        vecs.withColumn(
            "cid", ivf_assign_expr(cent_vecs, n_lists)
        )
        .where(F.col("cid").isin([int(c) for c in probe_cids]))
        .where(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(cos_q, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _cosine_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of ``functions.vectors.cosine_similarity``: the
    identical op sequence (left-to-right dot fold, left-to-right norm
    folds, den = na*nb, zero-den guard) on IEEE doubles, so probe ranking
    computed here agrees bit-for-bit with the engine expression it
    replaces."""
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        l2_norm_py,
    )

    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    den = l2_norm_py(a) * l2_norm_py(b)
    return 0.0 if den == 0.0 else acc / den


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_same_id: bool = True,
) -> DataFrame:
    """Batch exact k-NN: top-k cosine neighbors in ``corpus`` for EVERY
    row of ``queries`` — the retrieval shape (a batch of query embeddings
    vs the corpus), where ``cosine_topk`` answers one query.

    Scale shape: the query table broadcasts (a query batch is small by
    construction); the corpus streams through the broadcast product and
    never shuffles at full width — the rank<=k filter plans as
    **WindowGroupLimit**, whose PARTIAL mode runs before the exchange, so
    each task forwards at most k rows per query and the shuffle carries
    O(n_tasks * |queries| * k) rows, not the n*|queries| scored product.
    Norms are materialized once per side (cosine_with_norms — one fold
    per candidate). Ranking is on the ROUNDED cosine with the neighbor id
    as tiebreaker, the catalog's total-order-over-rounded-values rule.

    ``exclude_same_id=True`` (default) assumes query and corpus ids share
    ONE namespace (typically both sides are slices of the same table) and
    drops the self-pair n_id == q_id. If the two tables have independent
    id spaces, a corpus vector whose id merely coincides with a query id
    would be silently excluded — pass ``exclude_same_id=False`` there.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        to_double_array(vec_col).alias("q_vec"),
    ).withColumn("_qn", l2_norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        to_double_array(vec_col).alias("n_vec"),
    ).withColumn("_nn", l2_norm(F.col("n_vec")))
    cos = cosine_with_norms(
        F.col("n_vec"), F.col("q_vec"), F.col("_nn"), F.col("_qn")
    )
    scored = c.crossJoin(F.broadcast(q))
    if exclude_same_id:
        scored = scored.where(F.col("n_id") != F.col("q_id"))
    scored = scored.select(
        "q_id", "n_id", F.round(cos, 6).alias("cosine")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the top-``k`` most-similar corpus vectors whose label DIFFERS from
    the anchor's — the negatives that actually teach a model, as opposed
    to random negatives a margin loss ignores.

    Same scale shape as ``knn_join``: the anchor batch broadcasts, the
    corpus streams through the broadcast product once and never shuffles
    at full width (rank<=k plans as WindowGroupLimit with a PARTIAL pass
    before the exchange, so each task forwards at most k rows per
    anchor). The label-mismatch predicate drops same-label pairs BEFORE
    ranking, inside the codegen stage — no post-filter re-rank.
    Ranking is on the rounded cosine with the neighbor id as tiebreaker
    (the catalog's total-order-over-rounded-values rule).
    """
    a = anchors.select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).alias("q_label"),
        to_double_array(vec_col).alias("q_vec"),
    ).withColumn("_qn", l2_norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(label_col).alias("n_label"),
        to_double_array(vec_col).alias("n_vec"),
    ).withColumn("_nn", l2_norm(F.col("n_vec")))
    cos = cosine_with_norms(
        F.col("n_vec"), F.col("q_vec"), F.col("_nn"), F.col("_qn")
    )
    scored = (
        c.crossJoin(F.broadcast(a))
        .where(F.col("n_label") != F.col("q_label"))
        .select(
            "q_id", "q_label", "n_id", "n_label",
            F.round(cos, 6).alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "q_label", "n_id", "n_label", "cosine", "rank")
    )


def knn_join_srp(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_same_id: bool = True,
) -> DataFrame:
    """Batch approximate k-NN: SRP band buckets prune the candidate set,
    exact cosine ranks only candidates — the scale path of ``knn_join``
    when the query batch is too large to score against the full corpus.

    Both sides are coded with the SAME hyperplanes (seed-shared), so a
    query only meets corpus vectors agreeing on at least one of ``bands``
    band codes; expected candidates per query are O(bands * n / 2^(n_planes
    /bands)). May return fewer than k neighbors for isolated queries —
    the standard ANN recall trade, tunable via bands/width.

    ``exclude_same_id``: same one-namespace contract as ``knn_join`` —
    pass False when query and corpus ids are independent.
    """
    if n_planes % bands:
        raise ValueError("n_planes must divide evenly into bands")
    width = n_planes // bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, side: str) -> DataFrame:
        coded = srp_codes(df, dim, n_planes, seed, id_col, vec_col)
        band_vals = F.array(
            *[
                F.shiftright(F.col("srp_code"), b * width).bitwiseAND(
                    F.lit(mask).cast("long")
                )
                for b in range(bands)
            ]
        )
        return coded.select(
            F.col(id_col).alias(side),
            F.posexplode(band_vals).alias("band", "band_code"),
        )

    cand = banded(queries, "q_id").join(
        banded(corpus, "n_id"), on=["band", "band_code"]
    )
    if exclude_same_id:
        cand = cand.where(F.col("q_id") != F.col("n_id"))
    cand = cand.select("q_id", "n_id").dropDuplicates(["q_id", "n_id"])
    q = queries.select(
        F.col(id_col).alias("q_id"), to_double_array(vec_col).alias("q_vec")
    ).withColumn("_qn", l2_norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("n_id"), to_double_array(vec_col).alias("n_vec")
    ).withColumn("_nn", l2_norm(F.col("n_vec")))
    cos = cosine_with_norms(
        F.col("n_vec"), F.col("q_vec"), F.col("_nn"), F.col("_qn")
    )
    scored = (
        cand.join(q, on="q_id")
        .join(c, on="n_id")
        .select("q_id", "n_id", F.round(cos, 6).alias("cosine"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def sigmoid_dot_scorer(qv: pd.Series, nv: pd.Series) -> pd.Series:
    """Default pair scorer: sigmoid of the raw dot product — vectorized
    numpy over the Arrow batch, deterministic, and SQL-expressible
    (``1/(1+exp(-list_inner_product(a,b)))``), so rerank results carry a
    full cross-engine value oracle. Monotone in cosine for same-norm
    pairs. Also registered SQL-side as ``batch_sigmoid_dot``
    (functions/sql_registry.py)."""
    if len(qv) == 0:
        return pd.Series([], dtype="float64")
    a = np.stack(qv.to_numpy()).astype(np.float64, copy=False)
    b = np.stack(nv.to_numpy()).astype(np.float64, copy=False)
    dots = np.einsum("ij,ij->i", a, b)
    return pd.Series(1.0 / (1.0 + np.exp(-dots)))


def rerank_topk(
    candidates: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: "Callable[[pd.Series, pd.Series], pd.Series] | None" = None,
) -> DataFrame:
    """Second-stage rerank of candidate pairs — the two-stage retrieval
    shape: cheap candidate generation (``knn_join`` / ``knn_join_srp``)
    followed by an expensive scorer over the SURVIVING pairs only.

    ``candidates``: (q_id, n_id) rows. Both vectors join back and score
    through ONE Arrow-batched pandas UDF — the batch shape a GPU
    cross-encoder needs (pairs arrive in columnar batches). ``scorer``
    maps two vector Series to a double Series per batch; the default is
    the real deterministic ``sigmoid_dot_scorer``; pass a model-backed
    callable to swap in a learned cross-encoder without touching the
    pipeline.

    Output: (q_id, n_id, score, rank) — rank<=k per query via the same
    WindowGroupLimit-friendly rounded-score ordering as ``knn_join``.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), to_double_array(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), to_double_array(vec_col).alias("n_vec")
    )
    paired = candidates.join(q, on="q_id").join(c, on="n_id")

    from pyspark.sql.functions import pandas_udf

    score_fn = scorer if scorer is not None else sigmoid_dot_scorer
    _score = pandas_udf(score_fn, "double")

    scored = paired.select(
        "q_id", "n_id", F.round(_score("q_vec", "n_vec"), 6).alias("score")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "score", "rank")
    )


# --- product quantization (PQ): the ANN memory-compression tier -------------


def pq_codebook(
    vecs: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> list[list[list[float]]]:
    """Deterministic PQ codebook: ``codebook[s][c]`` = subvector ``s`` of
    the vector with the c-th lowest id (Jegou et al. 2011's codebooks are
    per-subspace k-means; the first-k-ids stand-in is the same
    deterministic substitution the IVF/SemDeDup queries use so the
    catalog oracle can replay it — swap in ``clustering.kmeans_train``
    per subspace for trained codebooks). Driver state: m * ksub * (d/m)
    doubles = k*d, independent of corpus size."""
    if ksub < 2 or ksub & (ksub - 1):
        raise ValueError(
            f"ksub={ksub} must be a power of two >= 2: codes are packed "
            "into log2(ksub)-bit lanes and decoded with a ksub-1 bitmask"
        )
    rows = (
        vecs.select(F.col(id_col), to_double_array(vec_col).alias("v"))
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"need at least ksub={ksub} vectors, got {len(rows)}")
    dim = len(rows[0]["v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    w = dim // m
    return [
        [list(r["v"][s * w : (s + 1) * w]) for r in rows] for s in range(m)
    ]


def pq_train_codebook(
    vecs: DataFrame,
    m: int = 8,
    ksub: int = 16,
    max_iter: int = 5,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> list[list[list[float]]]:
    """TRAINED PQ codebooks — per-subspace k-means (Jegou et al. 2011's
    actual construction). Returns the same ``codebook[s][c]`` shape as
    ``pq_codebook``, so ``pq_encode``/``pq_adc_topk`` consume it
    unchanged.

    All m subspaces train in ONE Lloyd loop over the exploded
    ``(id, s, subvector)`` table — per iteration the data motion is one
    broadcast of the m*ksub centroids out (joined on s) and one
    (id, s)-keyed packed-argmax aggregate plus one (s, cid, pos) mean
    aggregate back; the corpus never shuffles and the driver round-trips
    per iteration are CONSTANT in m (the naive construction runs m
    sequential k-means loops = m times the driver latency; identical
    math, since the subspaces are independent).

    Determinism matches ``clustering.kmeans_train``'s recipe: init is the
    ksub lowest-id subvectors, every codeword coordinate is quantized to
    the ``CENTROID_QUANT`` FLOOR-grid per round (floor(x*1e6 + 0.5)/1e6 —
    the same form on the trainer and the DuckDB oracle, ADVICE r8, never
    a Python-round/duck-round pair), empty clusters keep their codeword,
    and the loop stops early when the max codeword L2 shift <= ``tol`` —
    so a DuckDB oracle can unroll the identical iterations
    (``plans/extensions.pq_ann_trained_codebook``; pass ``tol=0.0`` so
    early-stop can only fire on an exact fixpoint, which replays
    identically).

    Assignment is the squared-L2 argmin on ``pq_encode``'s 1e12 floor
    grid (ties to the lower code) — TRAIN and ENCODE use the same metric,
    per Jegou et al.'s L2 k-means construction (ADVICE r8: the previous
    cosine-argmax training mismatched the L2 encoder and depressed
    trained-codebook recall). d2 is an index-order left-fold
    (zip_with + aggregate), bit-identical to the encoder's
    dim-sequential numpy loop and the oracle's ordered list sum. The
    packed-argmin int64 grid wraps only beyond d2 ~ 5.8e5 (pq_encode
    raises there; subvector distances of unit-scale embeddings sit
    orders of magnitude below).
    """
    import math as _math

    if ksub < 2 or ksub & (ksub - 1):
        raise ValueError("ksub must be a power of two >= 2 (bit-packed codes)")
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        CENTROID_QUANT,
    )

    grid = 10.0**CENTROID_QUANT

    def _fq(x: float) -> float:
        # floor-grid quantization — the catalog-wide floor_round form
        return _math.floor(x * grid + 0.5) / grid

    init = (
        vecs.select(F.col(id_col).alias("vid"), to_double_array(vec_col).alias("v"))
        .orderBy("vid")
        .limit(ksub)
        .collect()
    )
    if not init:
        raise ValueError("empty vector table")
    dim = len(init[0]["v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    if len(init) < ksub:
        raise ValueError(f"need at least ksub={ksub} vectors, got {len(init)}")
    w = dim // m
    codebook = [
        [[_fq(x) for x in r["v"][s * w : (s + 1) * w]] for r in init]
        for s in range(m)
    ]
    sub = (
        vecs.select(
            F.col(id_col).alias("vid"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.slice(
                                to_double_array(vec_col), s * w + 1, w
                            ).alias("sv"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("e"),
        )
        .select("vid", F.col("e.s").alias("s"), F.col("e.sv").alias("sv"))
        .persist()
    )
    # Size-based switch (VERDICT r11 #3/#6): the codebook literal is
    # dim*ksub cells total; above clustering.LITERAL_CELLS_MAX each
    # iteration assigns via the pre-r11 broadcast join + (vid, s) argmin
    # + join-back instead of riding a multi-megabyte literal through the
    # analyzer. Same grid/tie packing either way.
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        LITERAL_CELLS_MAX,
    )

    use_literal = dim * ksub <= LITERAL_CELLS_MAX
    spark = vecs.sparkSession
    try:
        for _ in range(max_iter):
            # ROW-LOCAL packed argmin (round 11): the codebook is a single
            # nested-array literal indexed by the row's subspace id; per
            # (vid, s) row a transform computes pq_encode's exact grid/tie
            # packing (floor(d2*1e12 + 0.5)*ksub + cid, min -> ties to the
            # lower cid) with the identical index-order left-fold squared
            # L2, and array_min replaces the per-(vid, s) aggregate. Each
            # Lloyd iteration is ONE fused pass over the persisted
            # subvector table — the previous shape paid a broadcast join,
            # a (vid, s)-keyed exchange, and a join-back that re-shuffled
            # the subvectors by (vid, s) every iteration.
            cb_lit = F.expr(
                "array("
                + ",".join(
                    "array("
                    + ",".join(
                        "array("
                        + ",".join(f"{float(x)!r}D" for x in cw)
                        + ")"
                        for cw in codebook[s]
                    )
                    + ")"
                    for s in range(m)
                )
                + ")"
            )  # ONE parsed SQL string (lit_double_matrix rationale)
            cands = F.element_at(cb_lit, F.col("s") + 1)
            packed_arr = F.transform(
                cands,
                lambda cv, c: F.floor(
                    F.aggregate(
                        F.zip_with(
                            F.col("sv"), cv, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    * F.lit(1e12)
                    + F.lit(0.5)
                ).cast("long")
                * F.lit(ksub)
                + c,
            )
            cid = (F.array_min(packed_arr) % ksub).cast("int")
            # cid staged as an attribute BEFORE the generator — an inline
            # expression next to posexplode is re-evaluated per exploded
            # element (the clustering.kmeans_train lesson)
            if use_literal:
                staged = sub.select("s", cid.alias("cid"), "sv")
            else:
                cents = spark.createDataFrame(
                    [
                        (s, c, codebook[s][c])
                        for s in range(m)
                        for c in range(ksub)
                    ],
                    "s int, cid int, cvec array<double>",
                )
                d2 = F.aggregate(
                    F.zip_with(
                        F.col("sv"), F.col("cvec"), lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                packed = (
                    F.floor(d2 * F.lit(1e12) + F.lit(0.5)).cast("long")
                    * F.lit(ksub)
                    + F.col("cid")
                )
                assign = (
                    sub.join(F.broadcast(cents), on="s")
                    .groupBy("vid", "s")
                    .agg(F.min(packed).alias("best"))
                    .select(
                        "vid",
                        "s",
                        (F.col("best") % ksub).cast("int").alias("cid"),
                    )
                )
                staged = sub.join(assign, on=["vid", "s"]).select(
                    "s", "cid", "sv"
                )
            rows = (
                staged
                .select("s", "cid", F.posexplode("sv").alias("pos", "val"))
                .groupBy("s", "cid", "pos")
                .agg(F.avg("val").alias("mv"))
                .groupBy("s", "cid")
                .agg(
                    F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias(
                        "pm"
                    )
                )
                .select(
                    "s",
                    "cid",
                    F.transform("pm", lambda st: st["mv"]).alias("cvec"),
                )
                .collect()  # m * ksub rows — driver state is codewords only
            )
            updated = {
                (r["s"], r["cid"]): [_fq(x) for x in r["cvec"]] for r in rows
            }
            shift = 0.0
            for s in range(m):
                nxt = []
                for c in range(ksub):
                    new = updated.get((s, c), codebook[s][c])
                    shift = max(
                        shift,
                        _math.sqrt(
                            sum(
                                (a - b) ** 2
                                for a, b in zip(new, codebook[s][c])
                            )
                        ),
                    )
                    nxt.append(new)
                codebook[s] = nxt
            if shift <= tol:
                break
    finally:
        sub.unpersist()
    return codebook


def _sub_d2(vec_col: Column, start: int, centroid: list[float]) -> Column:
    """Exact squared L2 distance between ``vec[start:start+w]`` and a
    centroid literal — unrolled index-order sum, so Spark, the Python
    LUT builder, and the DuckDB oracle all execute the identical IEEE
    operation sequence."""
    terms = None
    for i, cval in enumerate(centroid):
        d = F.element_at(vec_col, start + i + 1) - F.lit(float(cval))
        t = d * d
        terms = t if terms is None else terms + t
    return terms


def pq_encode(
    vecs: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "vec",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode vectors to packed PQ codes: ``(id_col, pq_code)``.

    Per subspace the nearest codeword index (squared-L2 argmin, ties to
    the lower code via the same floor-grid packing the kmeans argmax
    uses) occupies ``log2(ksub)`` bits of one BIGINT — at the default
    8 x 16 geometry a 64-float vector (256 B) compresses to 32 bits, the
    64x shrink that lets a 100 TB embedding corpus fit hot storage.

    Implementation is ONE Arrow-batched pandas UDF (the ``srp_codes``
    lesson: the flat Catalyst expression for m*ksub unrolled distances is
    ~2700 nodes — seconds of driver-side planning per invocation and a
    janino fallback out of codegen). The inner loops accumulate
    ``acc += d*d`` dimension-sequentially (vectorized across rows, never
    BLAS-reduced), so every distance is bit-identical to a left-to-right
    fold — which is what the DuckDB oracle's list sum replays.

    Input bound: each per-subspace squared distance must stay below
    ``(2^63/ksub - 1) / 1e12`` (~5.8e5 at ksub=16; for unit-normalized
    embeddings d2 <= 4, five orders of headroom) — beyond it the
    tie-break packing would wrap int64, so the encoder RAISES instead of
    silently emitting wrong codes.
    """
    m = len(codebook)
    ksub = len(codebook[0])
    nbits = max(1, (ksub - 1).bit_length())
    w = len(codebook[0][0])
    cb = np.array(codebook, dtype=np.float64)  # (m, ksub, w)
    # Tie-break packing floor(d2*1e12+0.5)*ksub+c wraps int64 once a
    # per-subspace squared distance exceeds this bound (~5.8e5 at
    # ksub=16). numpy wraps SILENTLY where an oracle CAST would raise
    # (ADVICE r3), so out-of-range inputs must raise here too.
    max_d2 = ((2**63 - 1 - (ksub - 1)) // ksub - 1) / 1e12

    @pandas_udf("long")
    def _enc(vcol: pd.Series) -> pd.Series:
        if len(vcol) == 0:
            return pd.Series([], dtype="int64")
        x = np.stack(vcol.to_numpy()).astype(np.float64, copy=False)
        code = np.zeros(len(x), dtype=np.int64)
        for s in range(m):
            sub = x[:, s * w : (s + 1) * w]
            packed_best = None
            for c in range(ksub):
                acc = np.zeros(len(x), dtype=np.float64)
                cent = cb[s, c]
                for i in range(w):  # dim-sequential: left-fold bit-exact
                    d = sub[:, i] - cent[i]
                    acc = acc + d * d
                if acc.max(initial=0.0) > max_d2:
                    raise ValueError(
                        "pq_encode: per-subspace squared distance "
                        f"{acc.max():.3e} exceeds the packable bound "
                        f"{max_d2:.3e} (ksub={ksub}); normalize or "
                        "scale vectors so the int64 tie-break grid "
                        "cannot wrap"
                    )
                packed = (
                    np.floor(acc * 1e12 + 0.5).astype(np.int64) * ksub + c
                )
                packed_best = (
                    packed
                    if packed_best is None
                    else np.minimum(packed_best, packed)
                )
            code |= (packed_best % ksub) << (s * nbits)
        return pd.Series(code)

    return vecs.select(
        F.col(id_col),
        _enc(to_double_array(vec_col)).alias("pq_code"),
        # keep_cols ride the SAME projection (e.g. a row-local IVF cid) —
        # the alternative is a join back onto the codes table by id, which
        # at 100 TB re-shuffles the corpus for a column it already had
        *[F.col(c) for c in keep_cols],
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebook: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    The query is NOT quantized: a lookup table ``lut[s][c] =
    d2(query_sub_s, codebook[s][c])`` (m * ksub cells) is built on the
    driver, floor-quantized to integer NANO units (1e9 grid — so the
    per-vector distance is a SUM OF LONGS: exact under any accumulation
    order, integer-total-ordered, and replayable bit-for-bit by the
    DuckDB oracle), and inlined as array literals. Scanning the corpus
    costs m lookups + integer adds per vector — over the 64x-compressed
    codes table, never the raw vectors. Output: ``(id_col, pq_code,
    adc_nano)`` for the k nearest by quantized distance (ascending, ties
    by id).
    """
    import math

    m = len(codebook)
    ksub = len(codebook[0])
    nbits = max(1, (ksub - 1).bit_length())
    w = len(codebook[0][0])
    if len(query_vec) != m * w:
        raise ValueError(f"query dim {len(query_vec)} != {m * w}")
    lut = [
        [
            math.floor(
                sum(
                    (float(query_vec[s * w + i]) - float(codebook[s][c][i]))
                    * (float(query_vec[s * w + i]) - float(codebook[s][c][i]))
                    for i in range(w)
                )
                * 1e9
                + 0.5
            )
            for c in range(ksub)
        ]
        for s in range(m)
    ]
    adc = None
    for s in range(m):
        # ONE parsed SQL string per subspace LUT (lit_long_array): the
        # Column-by-Column form cost 3 Py4J round trips per cell over
        # m*ksub cells per invocation
        lut_s = lit_long_array(lut[s])
        code_s = (
            F.shiftright(F.col("pq_code"), s * nbits)
            .bitwiseAND(F.lit(ksub - 1).cast("long"))
            .cast("int")
        )
        t = F.element_at(lut_s, code_s + F.lit(1))
        adc = t if adc is None else adc + t
    return (
        encoded.select(
            F.col(id_col),
            "pq_code",
            adc.cast("long").alias("adc_nano"),
            # e.g. the row-local IVF cid — carried through the top-k so the
            # caller never joins back onto the codes scan to recover it
            *[F.col(c) for c in keep_cols],
        )
        .orderBy(F.col("adc_nano").asc(), F.col(id_col))
        .limit(k)
    )


def sq8_encode(
    vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "vec"
) -> DataFrame:
    """Symmetric-int8 (absmax / SQ8) vector quantization: the 4x memory
    tier between raw f32 and PQ's 64x codes.

    Per vector: ``scale = max|x| / 127``; ``q_i = clamp(-127..127,
    floor(x_i / scale + 0.5))`` — the same absmax scheme
    ``functions.vectors.int8_quant_sse_fp`` audits for reconstruction
    error, but here the codes themselves are materialized for SEARCH.
    Output: ``(id_col, sq8_scale double, qvec array<long>)``.

    Everything is Catalyst higher-order functions (transform/array_max)
    inside whole-stage codegen — no Python, one projection over the
    corpus. Each step (max, one divide, floor(x+0.5), clamp) is a single
    IEEE-f64 op, so an external engine replays the codes bit-for-bit.
    The all-zero vector quantizes to all-zero codes (zero-divide
    guarded). At 100 TB the encode is a pay-once projection writing a
    table 4x smaller than the vectors; scans for search touch only
    (id, scale, qvec).
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # Two projections so the O(d) amax fold binds ONCE per row instead of
    # being re-inlined into every per-element lambda (the wordpiece
    # subexpression-inlining lesson: CollapseProject keeps the stage
    # split because _scale is non-cheap and referenced d+1 times).
    staged = vecs.select(
        F.col(id_col),
        v.alias("_v"),
        (amax / F.lit(127.0)).alias("_scale"),
    )
    scale = F.col("_scale")
    clamp = lambda x: F.greatest(  # noqa: E731
        F.lit(-127).cast("long"),
        F.least(F.lit(127).cast("long"), F.floor(x / scale + F.lit(0.5))),
    )
    qvec = F.when(
        scale == F.lit(0.0),
        F.transform(F.col("_v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(F.transform(F.col("_v"), clamp))
    return staged.select(
        F.col(id_col), scale.alias("sq8_scale"), qvec.alias("qvec")
    )


def sq8_quantize_query(query_vec: list[float]) -> tuple[float, list[int]]:
    """Quantize a query vector driver-side with EXACTLY the operation
    sequence of :func:`sq8_encode` (Python floats are IEEE f64, so the
    codes agree bit-for-bit with the engine encoding of the same
    vector). Returns ``(scale, codes)``."""
    import math

    amax = max(abs(float(x)) for x in query_vec) if query_vec else 0.0
    if amax == 0.0:
        return 0.0, [0 for _ in query_vec]
    scale = amax / 127.0
    codes = [
        int(max(-127, min(127, math.floor(float(x) / scale + 0.5))))
        for x in query_vec
    ]
    return scale, codes


def sq8_dot_topk(
    encoded: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by approximate INNER PRODUCT (MIPS) over SQ8 codes.

    The query is quantized once on the driver; the scan computes the
    INTEGER dot product ``idot = sum(qvec_i * qq_i)`` (longs — exact
    under any accumulation order; |idot| <= d * 127^2) and rescales to
    ``score_nano = floor((sq8_scale * qscale) * idot * 1e9 + 0.5)`` —
    one pinned-order IEEE multiply chain, so the ranking key is an
    integer an external oracle reproduces exactly. Per corpus vector the
    scan costs d integer multiply-adds over the 4x-compressed codes
    table; the plan is one projection + TakeOrderedAndProject (no
    shuffle beyond the top-k combine). Output: ``(id_col, idot,
    score_nano)`` descending by score, ties by id.
    """
    qscale, qq = sq8_quantize_query([float(x) for x in query_vec])
    qlit = lit_long_array(qq)  # one parsed SQL string, not d Py4J lits
    idot = F.aggregate(
        F.zip_with(F.col("qvec"), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).alias("idot")
    scored = encoded.select(F.col(id_col), "sq8_scale", idot)
    score = (
        F.floor(
            (F.col("sq8_scale") * F.lit(float(qscale)))
            * F.col("idot").cast("double")
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("score_nano")
    )
    return (
        scored.select(F.col(id_col), "idot", score)
        .orderBy(F.col("score_nano").desc(), F.col(id_col))
        .limit(k)
    )

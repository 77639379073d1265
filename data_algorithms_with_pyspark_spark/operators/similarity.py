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

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    to_double_array,
)

__all__ = [
    "cosine_topk",
    "random_hyperplanes",
    "srp_codes",
    "lsh_near_dup_pairs",
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
        F.col("vec").alias("query_vec")
    )
    cos = cosine_similarity(F.col("vec"), F.col("query_vec"))
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
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    vecs = embeddings.select(F.col(id_col), to_double_array(vec_col).alias("vec"))
    bits = [
        F.when(
            dot_product(
                F.col("vec"), F.array(*[F.lit(x) for x in plane])
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
        for b, plane in enumerate(planes)
    ]
    code = bits[0]
    for extra in bits[1:]:
        code = code.bitwiseOR(extra)
    return vecs.select(F.col(id_col), F.col("vec"), code.alias("srp_code"))


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
    coded = srp_codes(embeddings, dim, n_planes, seed, id_col, vec_col)
    left = coded.select(
        F.col(id_col).alias("id_1"), F.col("vec").alias("v_1"), "srp_code"
    )
    right = coded.select(
        F.col(id_col).alias("id_2"), F.col("vec").alias("v_2"), "srp_code"
    )
    cos = cosine_similarity(F.col("v_1"), F.col("v_2"))
    return (
        left.join(right, on="srp_code", how="inner")
        .where(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the third ANN tier.

    Index: every vector is assigned to its nearest of ``n_lists`` coarse
    centroids (deterministic: the vectors with the first n_lists ids — a
    structural stand-in for trained k-means centroids; swap in trained ones
    without touching the plan). Search: score the query against centroids
    only, probe the best ``n_probe`` lists, and run exact cosine on those
    candidates.

    Scale shape: the assignment pass is a broadcast nested-loop against
    n_lists rows (no shuffle of the corpus) followed by one hash aggregate
    on id; at query time only ~n_probe/n_lists of the corpus is scored.
    Ties broken by centroid/vector id everywhere -> fully deterministic.
    """
    vecs = embeddings.select(F.col(id_col), to_double_array(vec_col).alias("vec"))
    cents = vecs.where(F.col(id_col) < n_lists).select(
        F.col(id_col).alias("cid"), F.col("vec").alias("cvec")
    )
    cos_vc = cosine_similarity(F.col("vec"), F.col("cvec"))
    assign = (
        vecs.crossJoin(F.broadcast(cents))
        .groupBy(id_col)
        .agg(
            F.max_by(
                "cid", F.struct(cos_vc.alias("c"), (-F.col("cid")).alias("t"))
            ).alias("cid")
        )
    )
    query = vecs.where(F.col(id_col) == query_id).select(
        F.col("vec").alias("query_vec")
    )
    probes = (
        cents.crossJoin(F.broadcast(query))
        .select(
            "cid",
            cosine_similarity(F.col("cvec"), F.col("query_vec")).alias("qc"),
        )
        .orderBy(F.col("qc").desc(), F.col("cid"))
        .limit(n_probe)
        .select("cid")
    )
    cos_q = cosine_similarity(F.col("vec"), F.col("query_vec"))
    return (
        vecs.join(assign, on=id_col)
        .join(F.broadcast(probes), on="cid")
        .where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(query))
        .select(F.col(id_col), F.round(cos_q, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )

"""Distributed k-means (Lloyd's) over embedding columns.

The IVF / SemDeDup operators (``similarity.ivf_assign``,
``dedup.semdedup_prune``) coarse-quantize the corpus against centroids; this
module TRAINS those centroids instead of relying on the deterministic
first-k-ids stand-in. The reference has no clustering at all (its README
stops at graph examples, ``/root/reference/src/chapter_06/README.md``);
this is a north-star extension shaped for a 100 TB corpus:

* per-iteration data motion is ONE broadcast of k centroids out and ONE
  hash-aggregate shuffle of (cid, pos) partial sums back — the corpus never
  shuffles. This is exactly Spark MLlib's KMeans data motion, re-expressed
  in DataFrame ops.
* driver state is k*dim doubles (the centroids) — e.g. 4096 clusters x
  1024 dims = 32 MB, independent of corpus size.
* assignment reuses the packed-argmax HashAggregate encoding from
  ``similarity.ivf_assign`` (struct-free aggregation buffer, map-side
  combine over the broadcast product).

Determinism: init is the k lowest-id vectors; every centroid coordinate is
quantized to the 1e-6 grid (``CENTROID_QUANT`` dp) before use, so run-to-run
and cross-engine float-sum reordering (partial aggregation is
order-dependent; ~1e-15 relative drift) is absorbed — a mean would have to
land within 5e-7 of a grid edge to diverge, ~1e9x the drift. The DuckDB
oracle for ``embedding_kmeans_assign`` unrolls the same iterations with the
same rounding, giving trained k-means a full value oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.functions.vectors import (
    cosine_with_norms,
    l2_norm,
    to_double_array,
)

__all__ = [
    "CENTROID_QUANT",
    "assign_to_centroids",
    "kmeans_train",
    "kmeans_fit_assign",
]

# Decimal places every centroid coordinate is rounded to (both in this
# module and in the DuckDB oracle SQL) — see module docstring.
CENTROID_QUANT = 6


def assign_to_centroids(
    vecs: DataFrame, cents: DataFrame, n_cents: int, id_col: str = "vec_id"
) -> DataFrame:
    """Nearest-centroid (max-cosine) assignment ``(id_col, cid)``.

    ``vecs``: (id_col, vec: array<double>); ``cents``: (cid, cvec) with
    cid in [0, n_cents). Broadcast nested-loop against the centroid table
    (corpus never shuffles) + ONE packed-bigint HashAggregate argmax — see
    ``similarity.ivf_assign`` for why this beats max_by/max(struct) at
    scale. Ties break to the lower cid.

    ``n_cents`` is capped at 4000: the packing multiplies the cosine grid
    (round((cos+1)*1e15) <= 2e15) by n_cents, and 4000 is the largest
    round cluster count whose product stays clear of Long.MAX (2e15 * 4611
    overflows and would wrap into wrong assignments silently). Coarse
    quantizers above 4k clusters should go hierarchical (two-level IVF)
    rather than widen the pack.
    """
    if n_cents > 4000:
        raise ValueError(
            f"n_cents={n_cents} exceeds the packed-argmax overflow bound "
            "(4000); use a hierarchical/two-level quantizer instead"
        )
    cents = cents.select(
        "cid", "cvec", l2_norm(F.col("cvec")).alias("_cn")
    )
    vecs = vecs.withColumn("_vn", l2_norm(F.col("vec")))
    # norms materialized once per vector/centroid: the broadcast-product
    # evaluation does one fold per (vec, centroid) instead of three —
    # bit-identical to cosine_similarity, so the unrolled kmeans oracle
    # keeps matching (functions/vectors.py:cosine_with_norms)
    cos_vc = cosine_with_norms(
        F.col("vec"), F.col("cvec"), F.col("_vn"), F.col("_cn")
    )
    packed = (
        F.round((cos_vc + F.lit(1.0)) * F.lit(1e15)).cast("long")
        * F.lit(n_cents)
        + (F.lit(n_cents - 1) - F.col("cid"))
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .groupBy(id_col)
        .agg(F.max(packed).alias("best"))
        .select(
            F.col(id_col),
            (F.lit(n_cents - 1) - F.col("best") % n_cents).cast("int").alias("cid"),
        )
    )


def kmeans_train(
    vecs: DataFrame,
    k: int,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> list[list[float]]:
    """Lloyd's iterations; returns the trained centroids as a driver-side
    list (row i = centroid of cluster i), the shape ``spark.createDataFrame``
    and every assign call consume.

    Mean recomputation is elementwise: posexplode(vec) -> partial+final
    HashAggregate on (cid, pos) -> reassemble per cid. The shuffle carries
    at most n_partitions * k * dim pre-combined rows regardless of corpus
    size. Empty clusters keep their previous centroid. Stops early when the
    max centroid L2 shift <= tol.
    """
    work = (
        vecs.select(F.col(id_col), to_double_array(vec_col).alias("vec"))
        .persist()
    )
    spark = vecs.sparkSession
    init = work.orderBy(id_col).limit(k).select("vec").collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init)}")
    centroids = [[round(x, CENTROID_QUANT) for x in row["vec"]] for row in init]

    for _ in range(max_iter):
        cents = spark.createDataFrame(
            list(enumerate(centroids)), "cid int, cvec array<double>"
        )
        assign = assign_to_centroids(work, cents, k, id_col=id_col)
        rows = (
            work.join(assign, on=id_col)
            .select("cid", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select("cid", F.transform("pm", lambda s: s["m"]).alias("cvec"))
            .collect()  # k rows — driver state is centroids only
        )
        updated = {
            r["cid"]: [round(x, CENTROID_QUANT) for x in r["cvec"]] for r in rows
        }
        shift = 0.0
        nxt = []
        for cid, old in enumerate(centroids):
            new = updated.get(cid, old)  # empty cluster keeps its centroid
            shift = max(
                shift, math.sqrt(sum((a - b) ** 2 for a, b in zip(new, old)))
            )
            nxt.append(new)
        centroids = nxt
        if shift <= tol:
            break
    work.unpersist()
    return centroids


def kmeans_fit_assign(
    vecs: DataFrame,
    k: int,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Train + final assignment in one call: ``(id_col, cid)`` under the
    trained centroids."""
    work = vecs.select(F.col(id_col), to_double_array(vec_col).alias("vec"))
    centroids = kmeans_train(
        work, k, max_iter=max_iter, id_col=id_col, vec_col="vec"
    )
    cents = vecs.sparkSession.createDataFrame(
        list(enumerate(centroids)), "cid int, cvec array<double>"
    )
    return assign_to_centroids(work, cents, k, id_col=id_col)

"""Graph analytics as DataFrame joins (SURVEY.md §2.4, §2.13).

Graph convention follows the reference (GraphFrames-style without the
library, ``graph_basics.py:26-37``): a graph is an edges DataFrame with
``src``/``dst`` columns (plus optional attributes); vertices, when needed,
derive as ``edges.select(src) UNION edges.select(dst) DISTINCT`` — the
distributed form of the reference's driver-side set union
(``graph_basics.py:147-151``).

Operators re-expressed Spark-first:
  degrees        — ``graph_basics.py:45-62`` / ``flight_analysis.py:48-58``
  bidirectional  — ``graph_basics.py:70-88`` (self-join on reversed keys)
  two_hop        — ``graph_basics.py:91-107`` / connecting flights
                   ``flight_analysis.py:96-132``
  triangles      — ``graph_basics.py:110-132`` (triple self-join + canonical
                   ordering dedup)

Scale notes (100 TB): degrees is one shuffle per direction on the edge key —
linear. 2-hop and triangles are self-joins whose output can be quadratic/
cubic in max degree (complexity called out at
``chapter_06/README.md:165-172``); at scale you bound them by filtering
high-degree hub vertices first or pre-aggregating neighbor lists. The joins
here are plain equi-joins, so Catalyst can choose sort-merge with AQE skew
splitting; the dedup filters (``src < dst``) are pushed below the joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "vertices_from_edges",
    "degrees",
    "bidirectional_edges",
    "two_hop_paths",
    "triangles",
]


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing as either endpoint."""
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex out/in/total degree.

    Two single-key aggregations + one full-outer join + fillna(0) — same
    logical shape as the reference but with Spark's partial aggregation
    doing the map-side combine for free.
    """
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_deg.join(in_deg, on="id", how="outer")
        .fillna(0, subset=["out_degree", "in_degree"])
        .withColumn("total_degree", F.col("out_degree") + F.col("in_degree"))
    )


def bidirectional_edges(edges: DataFrame) -> DataFrame:
    """Vertex pairs connected in BOTH directions, reported once (a < b)."""
    e1 = edges.select("src", "dst")
    e2 = edges.select(F.col("src").alias("r_src"), F.col("dst").alias("r_dst"))
    return (
        e1.join(
            e2,
            (F.col("src") == F.col("r_dst")) & (F.col("dst") == F.col("r_src")),
            "inner",
        )
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )


def two_hop_paths(edges: DataFrame) -> DataFrame:
    """Distinct (a, c) pairs reachable via some b (a->b->c, a != c), with the
    number of distinct middle vertices as ``n_paths``."""
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    return (
        e1.join(e2, F.col("b") == F.col("b2"), "inner")
        .where(F.col("a") != F.col("c"))
        .groupBy("a", "c")
        .agg(F.countDistinct("b").alias("n_paths"))
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Directed 3-cycles a->b->c->a, each reported once with a = min vertex.

    Triple self-join; the canonicalization filters (a < b, a < c) are
    applied as early as the join condition allows so Catalyst pushes them
    into the first join.
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("c2"), F.col("dst").alias("a2"))
    return (
        e1.where(F.col("a") < F.col("b"))
        .join(e2, F.col("b") == F.col("b2"), "inner")
        .where(F.col("a") < F.col("c"))
        .join(
            e3,
            (F.col("c") == F.col("c2")) & (F.col("a") == F.col("a2")),
            "inner",
        )
        .select("a", "b", "c")
        .distinct()
    )

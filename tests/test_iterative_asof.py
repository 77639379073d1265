"""Unit tests for operators/asof.py and operators/iterative.py on tiny,
hand-checkable inputs (reference test style: inline expected literals,
`/root/reference/tests/test_smoke.py:25-77`)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.asof import asof_join
from data_algorithms_with_pyspark_spark.operators.iterative import (
    connected_components,
    pagerank,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                (1, _ts("2024-01-01T10:00:00"), "a"),
                (1, _ts("2024-01-01T12:00:00"), "b"),
                (2, _ts("2024-01-01T11:00:00"), "c"),
            ],
            ["k", "lts", "lv"],
        )
        right = spark.createDataFrame(
            [
                (1, _ts("2024-01-01T09:00:00"), 1.0),
                (1, _ts("2024-01-01T11:30:00"), 2.0),
                (2, _ts("2024-01-01T11:00:00"), 3.0),
                (3, _ts("2024-01-01T08:00:00"), 9.0),
            ],
            ["k", "rts", "rv"],
        )
        return left, right

    def test_backward(self, spark):
        left, right = self._frames(spark)
        out = {
            (r.k, r.lv): r.rv
            for r in asof_join(
                left, right, on="k", left_ts="lts", right_ts="rts"
            ).collect()
        }
        # (1,'a') matches 09:00 -> 1.0; (1,'b') matches 11:30 -> 2.0;
        # (2,'c') matches same-instant 11:00 -> 3.0 (exact matches allowed)
        assert out == {(1, "a"): 1.0, (1, "b"): 2.0, (2, "c"): 3.0}

    def test_backward_no_exact(self, spark):
        left, right = self._frames(spark)
        out = {
            (r.k, r.lv): r.rv
            for r in asof_join(
                left,
                right,
                on="k",
                left_ts="lts",
                right_ts="rts",
                allow_exact_matches=False,
            ).collect()
        }
        assert out[(2, "c")] is None  # same-instant no longer matches

    def test_forward(self, spark):
        left, right = self._frames(spark)
        out = {
            (r.k, r.lv): r.rv
            for r in asof_join(
                left, right, on="k", left_ts="lts", right_ts="rts",
                direction="forward",
            ).collect()
        }
        # (1,'a') -> next right at 11:30 -> 2.0; (1,'b') at 12:00 -> none
        assert out == {(1, "a"): 2.0, (1, "b"): None, (2, "c"): 3.0}

    def test_unmatched_left_kept(self, spark):
        left, right = self._frames(spark)
        out = asof_join(
            left.where(F.col("k") == 1),
            right.where(F.col("k") == 3),
            on="k",
            left_ts="lts",
            right_ts="rts",
        )
        rows = out.collect()
        assert len(rows) == 2 and all(r.rv is None for r in rows)

    def test_collision_raises(self, spark):
        left, right = self._frames(spark)
        with pytest.raises(ValueError, match="collide"):
            asof_join(
                left,
                right.withColumnRenamed("rv", "lv"),
                on="k",
                left_ts="lts",
                right_ts="rts",
            )


class TestConnectedComponents:
    def test_two_components(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (7, 6)], ["src", "dst"]
        )
        out = {r.id: r.component for r in connected_components(edges).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 5}

    def test_chain_needs_multiple_rounds(self, spark):
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], ["src", "dst"]
        )
        out = {r.id: r.component for r in connected_components(edges).collect()}
        assert set(out.values()) == {0} and len(out) == 9


class TestPagerank:
    def test_sums_to_one_and_sink_ranks_highest(self, spark):
        # star: everyone points at 0; 0 points at 1 (so no dangling mass)
        edges = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 0), (0, 1)], ["src", "dst"]
        )
        ranks = {r.id: r.rank for r in pagerank(edges, iterations=20).collect()}
        assert abs(sum(ranks.values()) - 1.0) < 1e-6
        assert max(ranks, key=ranks.get) == 0

    def test_dangling_mass_redistributed(self, spark):
        # 1 -> 2, 2 is a sink: total mass must still be 1
        edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
        ranks = {r.id: r.rank for r in pagerank(edges, iterations=15).collect()}
        assert abs(sum(ranks.values()) - 1.0) < 1e-6
        assert ranks[2] > ranks[1]


def test_shortest_paths_line_graph_and_hop_bound(spark):
    from data_algorithms_with_pyspark_spark.operators.iterative import (
        shortest_paths,
    )

    # 0->1->2->3->4 chain plus a 0->2 shortcut; 9 is unreachable from 0.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (9, 0)], ["src", "dst"]
    )
    got = {
        r["id"]: r["distance"] for r in shortest_paths(edges, 0).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}  # shortcut wins; 9 absent

    bounded = {
        r["id"]: r["distance"]
        for r in shortest_paths(edges, 0, max_hops=1).collect()
    }
    assert bounded == {0: 0, 1: 1, 2: 1}

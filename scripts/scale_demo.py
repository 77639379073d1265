"""Empirical scaling demonstration (VERDICT r3 #4): run the most
expensive headline queries at sf0.1 (driver testdata) and at a locally
generated ~sf1 (10x documents/embeddings; scripts/make_scale_data.py),
and report (a) wall-time ratios and (b) whether the PHYSICAL PLAN SHAPE
is scale-invariant — the two facts the 100-TB design claims rest on:
work grows ~linearly with data, and no operator silently switches to a
different (worse) strategy as input grows.

Wall-times include per-invocation plan construction (~0.3-0.8s fixed
cost), so a 10x data multiple should show a ratio well UNDER 10x for
sub-second queries; the interesting signal is the absence of
super-linear blowup and of plan-shape drift.

Usage: python scripts/scale_demo.py [sf1_dir]
Writes one markdown table to stdout (pasted into PLANS.md).
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

QUERIES = (
    "doc_quality_classifier",
    "simhash_near_dup_candidates",
    "minhash_near_dup_candidates",
    "embedding_kmeans_assign",
    "bpe_learned_merges",
)

_OPS = (
    "Exchange",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "BroadcastExchange",
    "ArrowEvalPython",
    "MapInPandas",
    "CartesianProduct",
    "Window",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "Generate",
)


def plan_shape(df) -> dict:
    """Multiset of physical operator kinds — literal values, stats and
    ids stripped, so two plans compare by STRATEGY only."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    return {op: len(re.findall(rf"\b{op}\b", txt)) for op in _OPS}


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf1"
    queries = tuple(sys.argv[2].split(",")) if len(sys.argv) > 2 else QUERIES
    from data_algorithms_with_pyspark_spark.plans.catalog import all_queries
    from data_algorithms_with_pyspark_spark.session import get_spark

    # sf1 in LOCAL mode puts all executors in the one driver JVM — the
    # 1g default heap OOMs; a real cluster sizes executor memory, this
    # demo sizes the single JVM.
    spark = get_spark(
        app_name="scale-demo",
        extra_conf={"spark.driver.memory": "16g"},
    )
    qs = all_queries()
    rows = []
    for name in queries:
        fn = qs[name].fn
        per_sf = {}
        shapes = {}
        for sf, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
            fn(spark, d).count()  # warm: codegen + footer caches
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, d)
                df.count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            per_sf[sf] = best
            shapes[sf] = plan_shape(df)
        same = shapes["sf0.1"] == shapes["sf1"]
        rows.append(
            (name, per_sf["sf0.1"], per_sf["sf1"],
             per_sf["sf1"] / per_sf["sf0.1"], same)
        )
        print(
            f"# {name}: sf0.1={per_sf['sf0.1']:.2f}s sf1={per_sf['sf1']:.2f}s "
            f"ratio={per_sf['sf1']/per_sf['sf0.1']:.2f} same_plan={same}",
            file=sys.stderr,
        )
        if not same:
            diff = {
                op: (shapes["sf0.1"].get(op), shapes["sf1"].get(op))
                for op in _OPS
                if shapes["sf0.1"].get(op) != shapes["sf1"].get(op)
            }
            print(f"#   plan drift: {diff}", file=sys.stderr)

    print("| query | sf0.1 (s) | sf1 = 10x data (s) | ratio | plan shape |")
    print("| --- | --- | --- | --- | --- |")
    for name, a, b, r, same in rows:
        print(
            f"| {name} | {a:.2f} | {b:.2f} | {r:.2f}x | "
            f"{'identical' if same else 'DRIFTED'} |"
        )


if __name__ == "__main__":
    main()

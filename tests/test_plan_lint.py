"""Catalog-wide physical-plan lint: the 100 TB rules, enforced mechanically.

test_plans_physical.py spot-checks hand-picked plans; this walks EVERY
registered catalog query at sf0.001 and rejects the scale anti-patterns:

* ``CartesianProduct``   — a non-broadcast cross join (all-pairs corpus²
  data motion). Broadcast nested-loop joins are fine — the small side is
  replicated, the corpus never shuffles.
* ``Exchange SinglePartition`` — the whole dataset funneled through one
  task (the global-Window / naive global row_number trap).
* ``BatchEvalPython``    — a row-at-a-time Python UDF on the executor
  path (Arrow-batched ``ArrowEvalPython`` / ``MapInPandas`` are the
  sanctioned Python escape hatches).
* ``SortAggregate``      — an aggregate that fell off the HashAggregate
  fast path (struct/complex buffer); every aggregate in this engine is
  designed to keep a primitive buffer.

Known, documented exceptions are allowlisted EXPLICITLY per query below —
a new violation anywhere else fails the suite, so a regression cannot
land silently.
"""

from __future__ import annotations

import pytest

from data_algorithms_with_pyspark_spark.plans.catalog import all_queries
from tests.conftest import SF_SMOKE

# query -> patterns it is allowed to contain, with the documented reason.
_ALLOWED: dict[str, set[str]] = {
    # all-pairs correctness baselines, tagged small-data-only in the
    # catalog (the LSH/banded scale paths exist alongside):
    "embedding_cosine_near_dups": {"CartesianProduct"},
    "ngram_jaccard_near_dups": {"CartesianProduct"},
    # keep-min-representative dedup aggregates a STRUCT payload (the
    # surviving row's columns ride the aggregation buffer), which
    # HashAggregateExec cannot hold -> partial+final SortAggregate. The
    # trade is deliberate AND measured: the rank-1-window alternative
    # (row_number -> WindowGroupLimit, the same single Exchange and the
    # same pre-shuffle one-row-per-key pruning) was built in round 4 and
    # benchmarked warm at sf0.1 — struct 0.68s vs window 0.95s — both
    # forms sort each task by the key, and the struct form's smaller
    # constant wins. The join-back alternatives rescan the corpus or let
    # Catalyst substitute the expensive text expressions into a pushed
    # filter. Partial mode still pre-combines per task.
    "corpus_curation_pipeline": {"SortAggregate"},
    # struct-max argmax (latest event PER USER): same struct-buffer
    # rationale and the same round-4 measurement (struct 0.33s vs
    # window 0.43s at sf0.1). The small-changelog pre-reduce in
    # operators/merge.py:latest_change_per_key uses the window form
    # instead — there the input is the small side and lint cleanliness
    # costs nothing material.
    "latest_event_per_user": {"SortAggregate"},
    # non-binary COLLATION grouping keys cannot hash-aggregate: equality
    # under UTF8_LCASE is not binary equality, so UnsafeRow hashing is
    # unsound and Spark plans the distinct-expand over the collated key
    # as SortAggregate BY DESIGN (engine behavior, not a plan bug). The
    # row exists to attest collation semantics AND this cost: its own
    # output proves lower()-normalized counts (hash-aggregable) are
    # numerically identical — the rewrite you ship when the column is
    # hot at 100 TB.
    "part_collation_distinct_audit": {"SortAggregate"},
}

_FORBIDDEN = (
    "CartesianProduct",
    "Exchange SinglePartition",
    "BatchEvalPython",
    "SortAggregate",
)


def _single_partition_violations(plan: str) -> bool:
    """Exchange SinglePartition is the global-funnel smell ONLY when it
    moves raw rows. Above a partial aggregate it carries one pre-combined
    row per task (the correct plan for any global aggregate) — allowed."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        # "partial_" -> one pre-combined row per task (global aggregate);
        # an EMPTY-function keyless HashAggregate is the same thing (it
        # prints no partial_ marker but still emits <=1 row per task —
        # Spark plans count-of-an-aggregate this way, e.g. the suite
        # row's count over q6's own global agg); TakeOrderedAndProject ->
        # the exchanged relation is LIMIT-bounded (top-K), constant-sized
        # at any corpus scale.
        if (
            "partial_" not in child
            and "HashAggregate(keys=[], functions=[]" not in child
            and "TakeOrderedAndProject" not in child
        ):
            return True
    return False


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_scale_antipatterns(spark, name):
    q = all_queries()[name]
    df = q.fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    allowed = _ALLOWED.get(name, set())
    hits = [
        p
        for p in _FORBIDDEN
        if p != "Exchange SinglePartition" and p in plan and p not in allowed
    ]
    if (
        "Exchange SinglePartition" not in allowed
        and _single_partition_violations(plan)
    ):
        hits.append("Exchange SinglePartition (over raw rows)")
    assert not hits, f"{name}: scale anti-pattern(s) {hits} in physical plan"

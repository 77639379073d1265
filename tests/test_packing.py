"""Known-answer tests for training-data assembly operators."""

from __future__ import annotations

import pytest

from data_algorithms_with_pyspark_spark.operators.packing import (
    contamination_matches,
    pack_by_token_budget,
    shard_summary,
)


def _toks(spark):
    # one group, tokens 60+50 fill shard 0 (budget 100), 80 opens shard 1,
    # a 250-token giant gets shard 2 to itself, 10 lands in shard 3.
    rows = [(1, "s", 60), (2, "s", 50), (3, "s", 80), (4, "s", 250), (5, "s", 10)]
    return spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])


def test_pack_by_token_budget_greedy_assignment(spark):
    packed = pack_by_token_budget(
        _toks(spark), "n_tokens", 100, ["source"], "doc_id"
    )
    got = {r["doc_id"]: r["shard_id"] for r in packed.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 4}
    # doc 2: prefix 60 < 100 -> shard 0; doc 3: prefix 110 -> shard 1;
    # doc 4: prefix 190 -> shard 1 (greedy start, may overflow);
    # doc 5: prefix 440 -> shard 4 (giant doc pushed the cursor past 2-3).


def test_pack_by_token_budget_validates_budget(spark):
    with pytest.raises(ValueError, match="positive"):
        pack_by_token_budget(_toks(spark), "n_tokens", 0, ["source"], "doc_id")


def test_pack_groups_are_independent(spark):
    # group a crosses the budget (110 then 70); group b stays inside it —
    # each group's cursor is independent.
    rows = [(1, "a", 110), (2, "b", 30), (3, "a", 70), (4, "b", 50)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    packed = pack_by_token_budget(df, "n_tokens", 100, ["source"], "doc_id")
    got = {r["doc_id"]: r["shard_id"] for r in packed.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}


def test_shard_summary_rolls_up(spark):
    packed = pack_by_token_budget(
        _toks(spark), "n_tokens", 100, ["source"], "doc_id"
    )
    rows = {
        r["shard_id"]: r
        for r in shard_summary(packed, "n_tokens", ["source"], "doc_id").collect()
    }
    assert rows[0]["n_docs"] == 2 and rows[0]["total_tokens"] == 110
    assert rows[0]["first_doc"] == 1 and rows[0]["last_doc"] == 2
    assert rows[1]["n_docs"] == 2 and rows[1]["total_tokens"] == 330
    assert rows[4]["n_docs"] == 1 and rows[4]["total_tokens"] == 10


def test_contamination_matches_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "a quick brown fox appeared"),  # shares "quick brown fox"
            (2, "completely unrelated words here today"),
            (3, "the quick brown fox jumps again and again"),  # 2 hits
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_matches(corpus, bench, shingle_n=3).collect()
    }
    assert got[1] == 1
    assert 2 not in got
    assert got[3] >= 2

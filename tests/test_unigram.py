"""Unigram-LM tokenizer training: Viterbi DP semantics, deterministic
tie-break, candidate seeding, hard-EM pruning, train/apply round trip."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.unigram import (
    cost_map_expr,
    piece_costs,
    seed_pieces,
    substring_counts,
    unigram_segment,
    unigram_train,
    viterbi_expr,
    word_vocab,
)


def _vocab(spark, *word_freqs):
    wc = spark.createDataFrame(list(word_freqs), ["term", "n"])
    return word_vocab(wc)


def _segment_one(spark, term, costs):
    cmap = cost_map_expr([(p, 0, c) for p, c in costs.items()])
    df = spark.createDataFrame([(term,)], ["term"])
    return df.select(viterbi_expr(F.col("term"), cmap).alias("v")).collect()[
        0
    ]["v"]


def test_viterbi_picks_min_cost_path(spark):
    costs = {"a": 5, "b": 7, "ab": 9, "ba": 4, "c": 2}
    # 'abab': a|ba|b = 5+4+7 = 16 beats ab|ab = 18 and a|b|a|b = 24
    v = _segment_one(spark, "abab", costs)
    assert (v["cost"], v["seg"]) == (16, "a ba b")
    # 'cab': c|ab = 11 beats c|a|b = 14
    v = _segment_one(spark, "cab", costs)
    assert (v["cost"], v["seg"]) == (11, "c ab")


def test_viterbi_tie_breaks_on_segmentation_bytes(spark):
    # Both 'ab|c' and 'a|bc' cost 10; 'a bc' < 'ab c' bytewise (space < b).
    costs = {"a": 4, "b": 9, "c": 4, "ab": 6, "bc": 6}
    v = _segment_one(spark, "abc", costs)
    assert v["cost"] == 10
    assert v["seg"] == "a bc"


def test_viterbi_single_piece_word(spark):
    costs = {"a": 3, "ab": 1, "abc": 2, "b": 5, "c": 5}
    v = _segment_one(spark, "abc", costs)
    assert (v["cost"], v["seg"]) == (2, "abc")


def test_substring_counts_multiplicity_and_truncation(spark):
    vocab = _vocab(spark, ("aaa", 2))
    got = {
        r["piece"]: r["cnt"] for r in substring_counts(vocab).collect()
    }
    # 'aaa' x2: 'a' appears 3 times/word, 'aa' twice, 'aaa' once; no
    # truncated duplicates past the word end.
    assert got == {"a": 6, "aa": 4, "aaa": 2}


def test_seed_pieces_keeps_all_chars_and_top_multi(spark):
    vocab = _vocab(spark, ("abcd", 10), ("dcba", 1))
    seed = dict(seed_pieces(vocab, top_multi=2))
    for ch in "abcd":
        assert ch in seed
    multi = [p for p in seed if len(p) > 1]
    # top-2 multi by (count DESC, piece ASC): all multi substrings of
    # 'abcd' have count 10 and of 'dcba' count 1 -> 'ab' and 'abc' win.
    assert sorted(multi) == ["ab", "abc"]


def test_piece_costs_match_sql_grid():
    costs = piece_costs([("a", 3), ("b", 1)])
    total = 4.0
    assert costs == [
        ("a", 3, math.floor(1_000_000.0 * math.log(total / 3))),
        ("b", 1, math.floor(1_000_000.0 * math.log(total / 1))),
    ]


def test_train_prunes_unused_multi_and_keeps_chars(spark):
    # 'ab' x 50 dominates: the 'ab' piece wins every Viterbi decode, so
    # chars keep their (smoothed) floor counts but are never pruned.
    vocab = _vocab(spark, ("ab", 50), ("ba", 1))
    pieces = unigram_train(vocab, iters=2, top_multi=4)
    by_piece = {p: (c, cost) for p, c, cost in pieces}
    assert "a" in by_piece and "b" in by_piece  # chars survive unused
    assert "ab" in by_piece
    assert by_piece["ab"][0] == 51  # used 50 times + add-1 smoothing
    # 'ba' is decoded as the cheaper 'ba' piece too (seeded), so it
    # survives; no piece outside the seeded inventory appears.
    assert all(len(p) <= 4 for p in by_piece)


def test_train_deterministic_across_runs(spark):
    vocab = _vocab(
        spark, ("scan", 10), ("scans", 6), ("cans", 4), ("a", 1)
    )
    p1 = unigram_train(vocab, iters=2, top_multi=8)
    p2 = unigram_train(vocab, iters=2, top_multi=8)
    assert p1 == p2


def test_word_vocab_filters_nonalpha_and_overlong(spark):
    wc = spark.createDataFrame(
        [("ok", 3), ("has1digit", 2), ("x" * 13, 5), ("fine", 1)],
        ["term", "n"],
    )
    kept = {r["term"] for r in word_vocab(wc).collect()}
    assert kept == {"ok", "fine"}


def test_segment_roundtrip_reconstructs_words(spark):
    vocab = _vocab(spark, ("table", 8), ("tablet", 3), ("let", 2))
    pieces = unigram_train(vocab, iters=1, top_multi=6)
    seg = unigram_segment(vocab, pieces)
    for r in seg.collect():
        assert r["v"] is not None
        assert r["v"]["seg"].replace(" ", "") == r["term"]
        # path cost equals the sum of its pieces' costs
        by_piece = {p: cost for p, _, cost in pieces}
        assert r["v"]["cost"] == sum(
            by_piece[p] for p in r["v"]["seg"].split(" ")
        )


def test_train_raises_on_unsegmentable_word(spark):
    # A vocabulary whose seed cannot cover some word can't happen via
    # seed_pieces (chars always kept), so drive the guard directly:
    # train on 'ab' but inject a cost map missing 'b' via a tiny
    # inventory -> the Viterbi decode NULLs out and the guard raises.
    from data_algorithms_with_pyspark_spark.operators import unigram as ug

    vocab = _vocab(spark, ("ab", 1))
    orig = ug.seed_pieces
    try:
        ug.seed_pieces = lambda *a, **k: [("a", 1)]
        with pytest.raises(ValueError, match="failed to segment"):
            ug.unigram_train(vocab, iters=1)
    finally:
        ug.seed_pieces = orig

"""Byte-pair-encoding vocabulary training (driver-loop + checkpoint).

The full tokenizer-training inner loop, distributed the way BPE is
actually trained at corpus scale (Sennrich et al. 2016, arXiv:1508.07909):

1. The corpus collapses ONCE to a (word, frequency) vocabulary — the only
   corpus-scale aggregation. Every later step works on the vocabulary,
   whose size tracks the language, not the corpus: at 100 TB the corpus
   has ~10^13 tokens but ~10^7 distinct words.
2. Each merge round counts adjacent symbol pairs over the vocabulary
   weighted by word frequency (one hash-aggregate shuffle over vocab-sized
   data), takes the single best pair to the driver (one row), and rewrites
   the symbol arrays with a greedy left-to-right fold — a Catalyst
   ``aggregate`` HOF, no Python in the loop.
3. ``localCheckpoint()`` per round truncates the otherwise linearly
   growing lineage (the classic iterative-Spark failure mode).

Driver-side state is the merge table itself — ``n_merges`` rows — which is
exactly the artifact BPE training exists to produce.

The reference has no tokenizer-training surface (SURVEY.md §2 north-star
extension); ``plans/curation.py::bpe_pair_counts`` is round 1 of this loop
as a standalone query, and the DuckDB oracle replays the full loop with
the same greedy-merge semantics via non-overlapping string replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["char_vocab", "merge_pair_expr", "bpe_train", "bpe_apply"]


def char_vocab(
    wc: DataFrame, term_col: str = "term", freq_col: str = "n"
) -> DataFrame:
    """(word, freq) -> (term, n, syms = array of single characters).

    Words are restricted to ``^[a-z]+$`` — classic BPE trains on clean
    lowercase word types; punctuation-bearing tokens would otherwise leak
    separator characters into the symbol space.
    """
    return wc.where(F.col(term_col).rlike("^[a-z]+$")).select(
        F.col(term_col).alias("term"),
        F.col(freq_col).alias("n"),
        F.split(F.col(term_col), "").alias("syms"),
    )


def merge_pair_expr(
    syms: Column,
    left: str,
    right: str,
    merged: str | None = None,
    guard: Column | None = None,
) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbols: the
    exact BPE apply step, as a Catalyst ``aggregate`` fold.

    Fold invariant: if the accumulator's last symbol is ``left`` and the
    incoming symbol is ``right``, replace the last symbol with the merged
    token (which then cannot re-merge as ``left`` unless the merged token
    literally equals it — matching BPE's non-overlapping scan).

    ``merged`` overrides the produced token (default ``left + right``) —
    WordPiece reuses this fold but strips the ``##`` continuation prefix
    off the right symbol (``operators/wordpiece.py``).

    ``guard``: optional cheap pre-test; rows where it is false keep
    ``syms`` untouched instead of running the fold. The fold is an
    INTERPRETED higher-order expression that rebuilds every symbol array
    element-by-element, so trainers pass ``term contains
    strip(left)+strip(right)`` (a codegen substring scan): symbols are
    contiguous substrings of the word, so adjacent (left, right) implies
    that substring — the guard can only skip rows where the fold is the
    identity, making the output value-identical while most of the
    vocabulary skips the rebuild entirely (guide §1.2: per-task work).
    """
    merged = F.lit(left + right if merged is None else merged)
    fold = F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    if guard is None:
        return fold
    return F.when(guard, fold).otherwise(syms)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair counts over (n, syms), weighted by word frequency.
    The ``size >= 2`` guard comes FIRST: ``sequence(1, 0)`` counts DOWN
    (the bpe_pair_counts footgun), so fully-merged single-symbol words
    must drop out before the pair enumeration, not after."""
    pairs = vocab.where(F.size("syms") >= 2).select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("syms"), i),
                    F.element_at(F.col("syms"), i + 1),
                ),
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(F.sum("n").alias("pair_count"))


def bpe_train(
    vocab: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over a (term, n, syms) vocabulary.

    Returns (merges, final_vocab): merges as (merge_idx starting at 1,
    left, right, pair_count) in learned order — the tokenizer artifact —
    and the vocabulary with all merges applied (so callers can inspect or
    persist segmentations without replaying the loop).

    Ties break on the pair string "left right" ascending (byte order) —
    the same total order the DuckDB oracle uses — so training is
    deterministic across engines and partitionings. Raises if the
    vocabulary runs out of adjacent pairs before ``n_merges``: silently
    returning fewer merges would desynchronize any fixed-round replay.
    """
    # First checkpoint is EAGER (materializes the corpus word count once);
    # per-round checkpoints are LAZY (eager=False): the next round's argmax
    # job materializes the rewritten vocab as a side effect, so each round
    # is ONE Spark job (argmax + checkpoint-on-first-compute) instead of
    # two (eager checkpoint pass + argmax pass) — half the per-round job
    # count and one fewer full vocab scan per round, with identical
    # lineage truncation. The FINAL rewrite stays lazy too: callers that
    # only want the merge table (the common case) never pay for it.
    vocab = vocab.localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, n_merges + 1):
        # Collect the whole pair-count table and take the argmax driver-
        # side: the table is BOUNDED state (<= |symbols|^2 <= (26 +
        # n_merges)^2 keys at ANY corpus scale — the classical trainer's
        # in-memory pair table), the comparison is pure-integer with the
        # pair string as tie-break (ASCII, so Python str order == Spark's
        # binary string order), and the round's plan loses its
        # TakeOrdered sort. Identical winner to the retired
        # orderBy(pair_count DESC, pair ASC).limit(1).
        rows = _pair_counts(vocab).collect()
        if not rows:
            raise ValueError(
                f"vocabulary exhausted after {k - 1} merges; "
                f"asked for {n_merges}"
            )
        top = min(rows, key=lambda r: (-r["pair_count"], r["pair"]))
        left, right = top["pair"].split(" ", 1)
        merges.append((k, left, right, int(top["pair_count"])))
        vocab = vocab.withColumn(
            "syms",
            merge_pair_expr(
                F.col("syms"),
                left,
                right,
                # substring guard: only words that can contain the pair
                # pay the interpreted rebuild (merge_pair_expr docstring)
                guard=F.col("term").contains(left + right),
            ),
        ).localCheckpoint(eager=False)
    return merges, vocab


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    syms_col: str = "syms",
) -> DataFrame:
    """Apply a learned merge table to symbol arrays, in merge order — the
    tokenize step for NEW text given a trained tokenizer. Pure column
    composition: n_merges nested folds, zero Python per row."""
    out = F.col(syms_col)
    for _, left, right, _ in merges:
        out = merge_pair_expr(out, left, right)
    return df.withColumn(syms_col, out)

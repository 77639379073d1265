"""WordPiece tokenizer training + greedy longest-match segmentation.

The third classical subword-tokenizer trainer (Schuster & Nakajima 2012;
the BERT tokenizer, Devlin et al. 2019 §4 / the HuggingFace `tokenizers`
WordPiece trainer), completing the trio with ``operators/bpe.py`` (merge
by raw pair count) and ``operators/unigram.py`` (prune by likelihood):
WordPiece merges the adjacent symbol pair maximizing the LIKELIHOOD gain

    score(l, r) = count(l r) / (count(l) * count(r))

— i.e. the pair whose merge most increases a unigram LM's corpus
likelihood — and segments NEW text with greedy longest-match-first
("maximal munch") instead of replaying merges. Non-word-initial symbols
carry the ``##`` continuation prefix, so 'cat' enters training as
['c', '##a', '##t'] and a merge of ('##a', '##t') yields '##at'.

Distributed shape (identical to the BPE trainer's, the corpus-scale
analysis in ``operators/bpe.py`` applies verbatim):

1. The corpus collapses ONCE to a (word, frequency) vocabulary.
2. Each merge round runs ONE vocab-sized hash aggregate carrying both
   adjacent-pair counts and single-symbol counts (weighted by word
   frequency; the two families share a key space — pairs contain a
   space, symbols never do), collects the BOUNDED count table
   (<= (alphabet*2 + n_merges)^2 keys at any corpus scale — the
   classical in-memory pair table) and computes the likelihood score +
   argmax driver-side with the identical IEEE sequence, then rewrites
   the symbol arrays with the same greedy left-to-right Catalyst fold
   BPE uses.
3. ``localCheckpoint()`` per round truncates the growing lineage.

Determinism across engines (the DuckDB oracle replays every round): the
score is quantized to an integer grid ``floor(CAST(p AS DOUBLE) /
CAST(l*r AS DOUBLE) * 1e12)`` — integer-to-double casts and one IEEE
division/multiplication are exactly rounded identically in Spark and
DuckDB — with ties broken on the pair string ascending (byte order).

Greedy segmentation is a Catalyst ``aggregate`` fold over character
positions (state = (next-position, segmentation)); each step takes the
LONGEST vocabulary piece matching at the cursor, which is WordPiece's
apply semantics and deliberately NOT BPE merge replay. Words are bounded
at ``WORD_MAX_LEN`` because the DuckDB oracle unrolls one greedy step
per position (same shared-constant contract as the unigram Viterbi DP).

The reference has no tokenizer-training surface (SURVEY.md §2
north-star extension).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.unigram import WORD_MAX_LEN

__all__ = [
    "SCORE_SCALE",
    "wordpiece_vocab",
    "wordpiece_train",
    "wordpiece_vocab_pieces",
    "greedy_segment_expr",
    "wordpiece_segment",
]

# Integer score grid: floor(p / (l*r) * 1e12). Pair probabilities are
# >= 1/total^2 with total <= ~1e9 even at 100 TB word-vocab scale, so the
# grid keeps ~metric precision while staying far inside BIGINT.
SCORE_SCALE = 1_000_000_000_000

# Sentinel cursor for a word greedy matching failed on (possible only if
# the vocabulary lost a character): far past any real cursor, so the
# final `pos == length + 1` validity check rejects it.
_STUCK_POS = 1 << 20


def wordpiece_vocab(
    wc: DataFrame,
    term_col: str = "term",
    freq_col: str = "n",
    word_max_len: int = WORD_MAX_LEN,
) -> DataFrame:
    """(word, freq) -> (term, n, syms) with WordPiece continuation marks:
    'cat' -> ['c', '##a', '##t'].

    Same ``^[a-z]+$`` clean-word restriction as ``bpe.char_vocab`` plus
    the greedy-unroll length bound shared with the oracle (words longer
    than ``word_max_len`` are excluded from training AND apply — the
    bound is a compile-time constant on both engines).
    """
    chars = F.split(F.col(term_col), "")
    return wc.where(
        F.col(term_col).rlike("^[a-z]+$")
        & (F.length(term_col) <= F.lit(word_max_len))
    ).select(
        F.col(term_col).alias("term"),
        F.col(freq_col).alias("n"),
        F.transform(
            chars,
            lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c)),
        ).alias("syms"),
    )


def _strip_continuation(sym: str) -> str:
    return sym[2:] if sym.startswith("##") else sym


def _fused_counts(vocab: DataFrame) -> DataFrame:
    """ONE vocab-sized aggregate carrying BOTH count families a WordPiece
    round needs: adjacent-pair counts and single-symbol counts, each
    weighted by word frequency. Pair keys contain the ``' '`` separator
    while symbol keys never do (symbols are characters / merged pieces of
    ``^[a-z]+$`` words, optionally ``##``-prefixed), so the two families
    share one key space without collision and the round pays one Generate
    + one exchange instead of two of each plus two joins (guide §2.4 —
    the same one-aggregate move as the r11 CMS/bloom rewrites). The
    ``size >= 2`` guard is an expression, not a filter: ``sequence(1, 0)``
    counts DOWN (the bpe_pair_counts footgun), and single-symbol words
    must still contribute their symbol count."""
    pair_keys = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("syms"), i),
                F.element_at(F.col("syms"), i + 1),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return (
        vocab.select(
            "n", F.explode(F.concat(pair_keys, F.col("syms"))).alias("t")
        )
        .groupBy("t")
        .agg(F.sum("n").alias("c"))
    )


def _wrap_i64(x: int) -> int:
    """Signed-64-bit wrap — mirrors Spark's ``long * long`` overflow
    semantics exactly, so the driver-side score below stays bit-identical
    to the retired Column form ``(lc * rc).cast("double")`` even in the
    (never attested, ~1e13-count) regime where the product overflows."""
    return ((x + (1 << 63)) % (1 << 64)) - (1 << 63)


def _best_pair(counts: dict[str, int]) -> tuple[str, int, int] | None:
    """The round's argmax over a fused count table: (pair, pair_count,
    score_q) maximizing (score_q, -pair) — the exact total order the old
    ``orderBy(score_q DESC, pair ASC).limit(1)`` used (ASCII keys, so
    Python str comparison == Spark's binary string order).

    The score is the SAME IEEE sequence the old Column expression ran —
    ``floor(double(p) / double(l*r) * 1e12)``: int→double casts are
    round-to-nearest in both runtimes, the division and multiplication
    are single correctly-rounded f64 ops, and the i64 product wrap is
    mirrored by ``_wrap_i64`` — so the returned ints are bit-identical to
    the retired plan and the DuckDB oracle keeps replaying them."""
    best: tuple[int, str, int] | None = None  # (-score_q, pair, count)
    for t, c in counts.items():
        sp = t.find(" ")
        if sp < 0:
            continue
        l, r = t[:sp], t[sp + 1 :]
        score_q = math.floor(
            float(c) / float(_wrap_i64(counts[l] * counts[r]))
            * float(SCORE_SCALE)
        )
        key = (-score_q, t, c)
        if best is None or key < best:
            best = key
    if best is None:
        return None
    return best[1], best[2], -best[0]


def wordpiece_train(
    vocab: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int, int]], DataFrame]:
    """Learn ``n_merges`` WordPiece merges over a (term, n, syms)
    vocabulary.

    Returns (merges, final_vocab): merges as (merge_idx starting at 1,
    left, right, pair_count, score_q) in learned order, and the
    vocabulary with all merges applied. Ties break on (score_q DESC,
    pair ASC) — the same total order the DuckDB oracle's LIMIT uses.
    Raises on pair exhaustion (same contract as ``bpe_train``: silently
    returning fewer merges would desynchronize a fixed-round replay).
    """
    from data_algorithms_with_pyspark_spark.operators.bpe import (
        merge_pair_expr,
    )

    vocab = vocab.localCheckpoint()
    merges: list[tuple[int, str, str, int, int]] = []
    for k in range(1, n_merges + 1):
        # One fused aggregate per round; the collected table is BOUNDED
        # driver state — |symbols| + |adjacent pairs| <= (alphabet*2 +
        # n_merges) + (alphabet*2 + n_merges)^2 keys at ANY corpus scale
        # (a few thousand rows), the classical trainer's in-memory pair
        # table. Scoring + argmax move to the driver with the identical
        # IEEE sequence and tie order (_best_pair docstring); the old
        # shape paid a second vocab aggregate, two broadcast joins and a
        # TakeOrdered per round for the same one-row answer.
        counts = {
            r["t"]: int(r["c"]) for r in _fused_counts(vocab).collect()
        }
        top = _best_pair(counts)
        if top is None:
            raise ValueError(
                f"vocabulary exhausted after {k - 1} merges; "
                f"asked for {n_merges}"
            )
        pair, pair_count, score_q = top
        left, right = pair.split(" ", 1)
        merges.append((k, left, right, pair_count, score_q))
        merged = left + _strip_continuation(right)
        # LAZY checkpoint (same move as bpe_train): the next round's
        # argmax materializes the rewrite — one job per round, not two.
        vocab = vocab.withColumn(
            "syms",
            merge_pair_expr(
                F.col("syms"),
                left,
                right,
                merged=merged,
                # substring guard on the STRIPPED pair (symbols minus the
                # ## continuation marker concatenate to the word): only
                # words that can contain the pair pay the interpreted
                # rebuild (bpe.merge_pair_expr docstring)
                guard=F.col("term").contains(
                    _strip_continuation(left) + _strip_continuation(right)
                ),
            ),
        ).localCheckpoint(eager=False)
    return merges, vocab


def wordpiece_vocab_pieces(
    vocab: DataFrame, merges: list[tuple[int, str, str, int, int]]
) -> list[str]:
    """The apply-time piece inventory: the initial alphabet (every
    word-initial character and ``##``-marked continuation character seen
    in training — bounded driver state, <= 2 * |charset| rows) plus the
    ``n_merges`` merged tokens, in deterministic sorted order. This is
    real WordPiece's vocabulary shape: alphabet + one entry per merge."""
    alphabet = [
        r["sym"]
        for r in vocab.select(F.explode("syms").alias("sym"))
        .distinct()
        .collect()
    ]
    produced = [l + _strip_continuation(r) for _, l, r, _, _ in merges]
    return sorted(set(alphabet) | set(produced))


def greedy_segment_expr(
    term: Column | str,
    pieces: list[str],
    word_max_len: int = WORD_MAX_LEN,
) -> Column:
    """Greedy longest-match-first WordPiece segmentation of ``term``
    under the piece inventory -> struct(n_pieces INT, seg STRING), NULL
    if the word cannot be segmented (impossible while the alphabet is
    covered, but contract-checked like the unigram fold).

    A Catalyst ``aggregate`` fold over character positions with state
    (pos, seg): each step matches the LONGEST piece at the cursor
    (word-initial pieces bare, continuations with the ``##`` prefix) via
    a filtered-sequence ``array_max`` over candidate lengths against the
    broadcast piece map — maximal munch, zero Python per row. Steps a
    finished word no-ops through. NULL-free for the same ArrayAggregate
    codegen reason documented on ``unigram.viterbi_expr``: failure is a
    sentinel cursor, never a NULL struct.

    Expression-size discipline (the srp_codes / pq_ann_topk lesson:
    big Catalyst trees cost SECONDS of one-time driver planning +
    janino codegen): multiply-referenced subexpressions — the matched
    length inside each step, the fold's final state outside it — are
    bound ONCE via single-element ``transform`` lambdas instead of
    being re-inlined per reference, which keeps the piece-map literal
    to one copy per step (measured 14.5 s -> sub-second first-call
    planning at the catalog operating point).
    """
    t = F.col(term) if isinstance(term, str) else term
    max_piece = max((len(_strip_continuation(p)) for p in pieces), default=1)
    # ONE parsed SQL string (vectors.lit_str_long_map rationale): the
    # Column-by-Column create_map cost 2 Py4J round trips per piece per
    # expression construction; membership tests only read isNotNull, so
    # the long value 1 is equivalent to the old int 1
    from data_algorithms_with_pyspark_spark.functions.vectors import (
        lit_str_long_map,
    )

    piece_map = lit_str_long_map((p, 1) for p in sorted(set(pieces)))
    init = F.array(
        F.struct(
            F.lit(1).cast("int").alias("pos"), F.lit("").alias("seg")
        )
    )

    def step(acc: Column, _i: Column) -> Column:
        st = F.element_at(acc, -1)
        pos = st.getField("pos")
        seg = st.getField("seg")

        def match_text(length: Column) -> Column:
            raw = F.substr(t, pos, length)
            return F.when(pos == 1, raw).otherwise(
                F.concat(F.lit("##"), raw)
            )

        best_len = F.array_max(
            F.filter(
                F.sequence(F.lit(1), F.lit(max_piece)),
                lambda pl: (pos + pl - 1 <= F.length(t))
                & F.element_at(piece_map, match_text(pl)).isNotNull(),
            )
        )

        def mk_next(bl: Column) -> Column:
            piece = match_text(bl)
            advanced = F.struct(
                (pos + bl).cast("int").alias("pos"),
                F.when(pos == 1, piece)
                .otherwise(F.concat(seg, F.lit(" "), piece))
                .alias("seg"),
            )
            stuck = F.struct(
                F.lit(_STUCK_POS).cast("int").alias("pos"), seg.alias("seg")
            )
            return (
                F.when(pos > F.length(t), st)  # finished: no-op through
                .when(bl.isNull(), stuck)
                .otherwise(advanced)
            )

        # Bind best_len (which embeds the piece-map filter) exactly once.
        next_st = F.get(F.transform(F.array(best_len), mk_next), 0)
        return F.concat(acc, F.array(next_st))

    folded = F.aggregate(
        F.sequence(F.lit(1), F.least(F.length(t), F.lit(word_max_len))),
        init,
        step,
    )

    def mk_out(final: Column) -> Column:
        ok = final.getField("pos") == F.length(t) + 1
        return F.when(
            ok,
            F.struct(
                F.size(F.split(final.getField("seg"), " ")).alias(
                    "n_pieces"
                ),
                final.getField("seg").alias("seg"),
            ),
        )

    # Bind the fold's terminal state exactly once (the fold is the
    # expensive subtree — inlining it per field reference multiplies
    # the whole expression).
    return F.get(F.transform(F.array(F.element_at(folded, -1)), mk_out), 0)


def wordpiece_segment(
    df: DataFrame,
    pieces: list[str],
    term_col: str = "term",
    word_max_len: int = WORD_MAX_LEN,
) -> DataFrame:
    """Apply a trained inventory: adds struct column ``v`` (n_pieces,
    seg) — the BERT-style tokenize step for new text given the trained
    artifact. Pure column composition, zero Python per row."""
    return df.withColumn(
        "v", greedy_segment_expr(F.col(term_col), pieces, word_max_len)
    )

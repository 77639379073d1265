"""Text-processing column expressions.

Engine policy (SURVEY.md §2.12): built-in ``pyspark.sql.functions`` first —
every helper here is a pure Catalyst expression, no Python UDFs. The
reference's text processing is RDD lambdas (``dna_base_count_ver_1.py:31-47``,
word count at ``rdd_transformations_overview.py:27-37``); these helpers are
the DataFrame-native replacements.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "words",
    "char_counts_expr",
    "subword_count",
    "word_ngrams",
]


def normalize_text(col: Column | str) -> Column:
    """Canonical form for hashing/dedup: lowercase, collapse whitespace,
    strip leading/trailing space. Mirrors the classic near-dup pre-step."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def words(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization -> array<string>, empty tokens removed."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: F.length(w) > 0)


def char_counts_expr(col: Column | str, pattern: str = "[a-z]") -> Column:
    """Array of single characters matching ``pattern`` (lowercased input).

    DataFrame-native form of the reference's DNA base-count mapper
    (``dna_base_count_ver_1.py:31-47``): one ``regexp_extract_all`` instead
    of a per-record Python loop; explode + groupBy downstream.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), 0)


def word_ngrams(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (array<string>).

    Pure Catalyst: ``transform`` over an index ``sequence`` + one
    ``slice`` per index; a document shorter than ``n`` words yields an
    empty array (guarded — Spark's ``sequence(1, 0)`` would count DOWN).

    PERFORMANCE CONTRACT: pass a MATERIALIZED column (a projected alias),
    never an inline tokenization expression. Lambdas in higher-order
    functions evaluate interpreted with NO common-subexpression
    elimination, so ``word_ngrams(words("text"), 5)`` re-tokenizes the
    document once per window — measured 27x slower than projecting
    ``words("text")`` first. ``CollapseProject`` keeps a multiply-
    referenced alias materialized, so the two-step ``select`` is safe.
    """
    if n < 2:
        raise ValueError("word_ngrams is for n >= 2; use the tokens directly")
    idx = F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1))
    gram = lambda i: F.concat_ws(" ", F.slice(tokens, i, n))  # noqa: E731
    return F.when(
        F.size(tokens) >= n, F.transform(idx, gram)
    ).otherwise(F.array().cast("array<string>"))


def subword_count(col: Column | str, chars_per_token: int = 4) -> Column:
    """BPE-ish token-count estimate: ceil(len(word)/k) summed over words."""
    return F.aggregate(
        words(col),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(float(chars_per_token))),
    )

"""Fuzzy (similarity) join between two tables on a string key.

The entity-resolution shape: match near-identical names/titles across two
catalogs without a cross join. The reference has nothing like it; a
training-data pipeline needs it constantly (align scraped metadata,
reconcile document sources).

Plan shape:

1. both sides explode to (id, char-n-gram shingle) posting lists;
2. candidates = equi-join on the shingle (a pair sharing ANY shingle is a
   candidate — COMPLETE for any Jaccard threshold > 0, since a pair with
   a positive intersection shares at least one shingle);
3. exact Jaccard over the two DISTINCT shingle sets verifies candidates.

The shuffle currency is (id, shingle) postings, never the row payloads;
verification joins the shingle-set arrays back once per surviving id.

``max_shingle_df`` (off by default) drops shingles appearing on more than
N left+right rows before the candidate join — the stop-shingle cap that
bounds hot-posting blowup (a shingle on f_L/f_R rows contributes
f_L * f_R candidate rows). With the cap on, recall is no longer exact for
pairs whose ONLY shared shingles are capped — the standard trade; leave
it off when the key column is short strings (names), where df stays low.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["char_shingles", "similarity_join", "deletion_variants", "edit_distance_one_pairs"]


def char_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct lowercase character n-grams of a string -> array<string>.
    Strings shorter than n yield the whole (lowercased) string as their
    single shingle, so short keys still participate."""
    c = F.col(col) if isinstance(col, str) else col
    lc = F.lower(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lc) - n + 1, F.lit(1))),
        lambda i: lc.substr(i, F.lit(n)),
    )
    return F.array_distinct(grams)


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    threshold: float,
    shingle_n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(left_id, right_id, jaccard) for every cross-table pair whose
    char-n-gram Jaccard similarity is >= ``threshold`` (rounded to 4dp,
    the catalog's cross-engine comparison scale)."""
    l_sets = left.select(
        F.col(left_id).alias("_lid"),
        char_shingles(left_col, shingle_n).alias("_lsh"),
    )
    r_sets = right.select(
        F.col(right_id).alias("_rid"),
        char_shingles(right_col, shingle_n).alias("_rsh"),
    )
    l_post = l_sets.select("_lid", F.explode("_lsh").alias("_sh"))
    r_post = r_sets.select("_rid", F.explode("_rsh").alias("_sh"))
    if max_shingle_df is not None:
        df_counts = (
            l_post.select("_sh")
            .unionAll(r_post.select("_sh"))
            .groupBy("_sh")
            .count()
            .where(F.col("count") <= max_shingle_df)
            .select("_sh")
        )
        l_post = l_post.join(df_counts, on="_sh", how="left_semi")
        r_post = r_post.join(df_counts, on="_sh", how="left_semi")
    cand = (
        l_post.join(r_post, on="_sh")
        .select("_lid", "_rid")
        .dropDuplicates(["_lid", "_rid"])
    )
    inter = F.size(F.array_intersect(F.col("_lsh"), F.col("_rsh"))).cast(
        "double"
    )
    union = F.size(F.array_union(F.col("_lsh"), F.col("_rsh"))).cast("double")
    # floor form, not round(): i/u small-integer ratios hit exact dyadic
    # halves at 4dp where engines' round() tie-breaks differ
    # (operators/text.floor_round4 has the full story)
    jac = F.floor(
        F.when(union > 0, inter / union).otherwise(0.0) * F.lit(10000.0)
        + F.lit(0.5)
    ) / F.lit(10000.0)
    return (
        cand.join(l_sets, on="_lid")
        .join(r_sets, on="_rid")
        .select(
            F.col("_lid").alias(left_id + "_l"),
            F.col("_rid").alias(right_id + "_r"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )


def deletion_variants(col: Column | str, out_name: str = "variant") -> Column:
    """All strings obtainable by deleting ONE character, plus the string
    itself — the SymSpell ed<=1 candidate key set. |variants| = len + 1
    (array_union drops within-string duplicates, e.g. repeated chars)."""
    c = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, F.length(c))),
    )
    return F.when(F.length(c) == 0, F.array(c)).otherwise(
        F.array_union(dels, F.array(c))
    )


def edit_distance_one_pairs(
    df: DataFrame, name_col: str
) -> DataFrame:
    """All unordered pairs of DISTINCT values of ``name_col`` at
    Levenshtein distance exactly 1 — the typo-dedup / entity-resolution
    join — without a cross join.

    Candidate scheme (SymSpell deletion neighborhoods): if ed(s, t) <= 1
    the two strings SHARE a deletion variant — a substitution deletes to
    the same string at that position, an insertion's extra char deleted
    yields the other string (which is its own variant), deletion is the
    mirror. So an equi-join on exploded variants is COMPLETE for d = 1;
    it can propose ed=2 pairs (e.g. 'ab'/'ba' share 'a'), which the
    exact ``levenshtein`` verify on candidates removes. Linear blowup
    (len+1 variants per string) instead of the quadratic all-pairs —
    and everything runs on the DISTINCT vocabulary, orders of magnitude
    below row count in entity-resolution data.

    Output: ``(name_a, name_b)`` with name_a < name_b (each pair once).
    """
    names = df.select(F.col(name_col).alias("_name")).distinct()
    v = names.select(
        "_name", F.explode(deletion_variants("_name")).alias("variant")
    )
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(b, "variant")
        .where(F.col("a._name") < F.col("b._name"))
        .select(
            F.col("a._name").alias("name_a"),
            F.col("b._name").alias("name_b"),
        )
        .distinct()
    )
    return cand.where(F.levenshtein("name_a", "name_b") <= 1)

"""Skew-mitigation operators for the 100 TB design point.

AQE's skew-join handling (on by default in session.py) splits oversized
sort-merge partitions at runtime, which covers most cases for free. Salting
is the explicit tool for the cases AQE can't fix: a hot key on the build
side of a shuffled hash join, or a downstream ``groupBy`` on a key where one
group is orders of magnitude larger than the rest.

``salted_join`` implements the classic replicate-and-salt scheme:

* left rows get a deterministic salt in [0, n_salts) derived from a hash of
  the whole row — rows sharing a hot key scatter across n_salts shuffle
  partitions instead of landing on one;
* right rows are replicated once per salt value (a ``n_salts``-way explode
  — cheap when the right side is the smaller input);
* the equi-join runs on (key..., salt) and the salt column is dropped.

Result equality with the plain join holds for inner/left joins because
every (left row, right row) key match still meets on exactly one salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with left-side key-skew mitigation (see module docstring).

    ``how`` is limited to inner/left joins: right-outer semantics would see
    the replicated right rows as distinct unmatched rows.

    Scale note: the salt hashes EVERY left column (hashing only the key
    would send the hot key to one salt again, defeating the point), which
    blocks column pruning on the left scan — project the left side to the
    columns the query needs BEFORE calling this, or the scan reads full
    rows just to feed the hash.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt.cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, on=[*keys, "_salt"], how=how).drop("_salt")

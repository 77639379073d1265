"""Dedup lane selection from pre-flight degeneracy readings.

Round 10 ended with three measured LSH-family degeneracy regimes and a
pre-flight audit (``plans/extensions.dedup_degeneracy_preflight``) that
prices them for ~1% of the join it de-risks — but the decision rule
routing a corpus to the right lane lived in prose (PLANS.md: "when
median prefix-df ~ n/3500, exact PPJoin is the wrong lane and MinHash is
the right one"). :func:`choose_dedup_lane` encodes that rule as API: it
consumes the pre-flight's integer readings and returns the lane + params
that the sf10 (100x) measurements showed are correct for each regime.

The three regimes, with the measured readings that defined them:

* **healthy** (driver draws, sf0.001-sf1): long-tailed vocabulary,
  rarity-ordered prefixes stay rare (max posting 3-8 at the driver SFs;
  ``pp_cand_bound`` 3.5e3 at sf0.1) — candidate volume is far inside a
  linear budget, exact PPJoin is both lossless AND cheapest.
* **hot-cluster** (the Zipf-skew draw's planted near-identical cluster,
  and the sf10 SRP/SimHash findings): a FEW postings go quadratic
  (skew: hottest posting 126 of an otherwise healthy index) while the
  vocabulary at large stays long-tailed. Capping those postings bounds
  the damage: volume over the under-cap postings is back inside budget
  and every dropped candidate routes through a non-discriminative hot
  key — guarded PPJoin (``max_posting``) is the right lane.
* **narrow-vocabulary** (the sf10 500k-doc draw that ENOSPC'd PPJoin:
  16,265 distinct prefix shingles, median posting 144, ``pp_cand_bound``
  1.95e9 vs a 1e8 budget, 63% of postings over cap 25): "rare prefix"
  stops existing, so capping destroys recall instead of bounding damage
  (most of the candidate mass routes through over-cap postings; the
  guarded run found 0 of the pairs MinHash-verified ground truth also
  put at 0 only because none existed). MinHash banding — whose candidate
  volume tracks BUCKET collisions, not vocabulary size (1,107 candidates
  on that draw, 65 s) — is the right lane, with
  :func:`~data_algorithms_with_pyspark_spark.operators.similarity.choose_minhash_params`
  sizing the S-curve from the similarity contract.

Pure integer decision math end-to-end, so the catalog row
(``plans/extensions.dedup_lane_choice``) can put the rule itself under a
full cross-engine DuckDB value oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from data_algorithms_with_pyspark_spark.operators.similarity import (
    MinHashPlan,
    choose_minhash_params,
)

__all__ = ["DedupLanePlan", "choose_dedup_lane"]


@dataclass(frozen=True)
class DedupLanePlan:
    """Lane recommendation from :func:`choose_dedup_lane`."""

    lane: str  # 'ppjoin_exact' | 'ppjoin_guarded' | 'minhash'
    budget: int  # the linear candidate budget the choice was made against
    max_posting: int | None  # set iff lane == 'ppjoin_guarded'
    minhash: MinHashPlan | None  # set iff lane == 'minhash'
    reason: str


def choose_dedup_lane(
    n_docs: int,
    pp_cand_bound: int,
    pp_cand_bound_capped: int,
    pp_over_cap: int,
    pp_n_prefix_shingles: int,
    *,
    max_posting: int = 25,
    candidates_per_doc: int = 200,
    hot_bp: int = 100,
    t_catch: float = 0.8,
) -> DedupLanePlan:
    """Route a corpus to the exact / guarded / MinHash dedup lane from
    its pre-flight readings (``dedup_degeneracy_preflight`` columns).

    * ``pp_cand_bound`` — sum C(df, 2) over ALL prefix postings (exact
      upper bound on lossless PPJoin candidates).
    * ``pp_cand_bound_capped`` — the same sum over postings with
      df <= ``max_posting`` only: the exact candidate volume the guarded
      lane would pay.
    * ``pp_over_cap`` / ``pp_n_prefix_shingles`` — how much of the
      vocabulary is hot: isolated hot keys (a few per ten thousand) are
      the cappable regime; a hot FRACTION means the vocabulary itself is
      narrow and capping costs recall instead of noise.

    Decision (all integer comparisons — cross-multiplied instead of
    divided so a SQL oracle replays them exactly):

    1. ``pp_cand_bound <= budget`` (budget = ``candidates_per_doc * n``,
       the same linear-in-corpus budget shape ``choose_lsh_params``
       holds SRP to) -> **ppjoin_exact** — lossless and within budget.
    2. else if over-cap postings are rare (``pp_over_cap * 10_000 <=
       hot_bp * pp_n_prefix_shingles``, default 1%) AND the capped
       volume fits the budget -> **ppjoin_guarded** with ``max_posting``.
    3. else -> **minhash** with ``choose_minhash_params(t_catch)``
       sizing the banding from the similarity contract.

    The sf10 audit readings route correctly: the narrow-vocab draw
    (n=500_000, bound 1.95e9, 10_236 of 16_265 postings over cap) fails
    1 (1.95e9 > 1e8) and fails 2's rarity test (63% >> 1%) -> minhash,
    the lane measured correct there; the driver draws (bound 3.5e3 at
    sf0.1) take lane 1; a planted hot cluster in an otherwise healthy
    index (the skew-draw / sf10-SRP shape) takes lane 2.
    ``tests/test_dedup_lane_planning.py`` pins all three.
    """
    if n_docs < 0 or pp_cand_bound < 0 or pp_cand_bound_capped < 0:
        raise ValueError("readings must be non-negative")
    if pp_cand_bound_capped > pp_cand_bound:
        raise ValueError(
            "pp_cand_bound_capped cannot exceed pp_cand_bound "
            "(capped postings are a subset)"
        )
    if pp_over_cap > pp_n_prefix_shingles:
        raise ValueError("pp_over_cap cannot exceed pp_n_prefix_shingles")
    if candidates_per_doc < 1 or max_posting < 1 or hot_bp < 0:
        raise ValueError("candidates_per_doc/max_posting >= 1, hot_bp >= 0")
    budget = candidates_per_doc * n_docs
    if pp_cand_bound <= budget:
        return DedupLanePlan(
            lane="ppjoin_exact",
            budget=budget,
            max_posting=None,
            minhash=None,
            reason=(
                f"lossless candidate bound {pp_cand_bound} within linear "
                f"budget {budget} ({candidates_per_doc}/doc)"
            ),
        )
    hot_is_rare = (
        pp_over_cap * 10_000 <= hot_bp * pp_n_prefix_shingles
        if pp_n_prefix_shingles > 0
        else False
    )
    if hot_is_rare and pp_cand_bound_capped <= budget:
        return DedupLanePlan(
            lane="ppjoin_guarded",
            budget=budget,
            max_posting=max_posting,
            minhash=None,
            reason=(
                f"bound {pp_cand_bound} over budget {budget} but only "
                f"{pp_over_cap}/{pp_n_prefix_shingles} postings over "
                f"cap {max_posting} and capped volume "
                f"{pp_cand_bound_capped} fits — isolated hot keys"
            ),
        )
    mh = choose_minhash_params(t_catch)
    return DedupLanePlan(
        lane="minhash",
        budget=budget,
        max_posting=None,
        minhash=mh,
        reason=(
            f"bound {pp_cand_bound} over budget {budget} and "
            f"{pp_over_cap}/{pp_n_prefix_shingles} postings over cap — "
            "narrow vocabulary (capping costs recall, not noise); "
            f"MinHash {mh.rows_per_band}x{mh.bands} at t_catch={t_catch}"
        ),
    )

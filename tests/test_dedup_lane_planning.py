"""choose_dedup_lane: the r10 pre-flight decision rule as API.

Pins the three measured regimes (VERDICT r10 order #3): the healthy
driver draws, the sf10 narrow-vocabulary ENOSPC draw, and the planted
hot-cluster shape — with the ACTUAL sf10/sf0.1 audit readings from
PLANS.md, so the function provably reproduces the measured-correct lane
for each diagnosis.
"""

from __future__ import annotations

import pytest

from data_algorithms_with_pyspark_spark.operators.planning import (
    choose_dedup_lane,
)


def test_healthy_corpus_routes_to_exact_ppjoin():
    """sf0.1 driver-draw readings (PLANS.md r10: bound 3.5e3, max
    posting 8, nothing over cap) -> lossless exact lane."""
    plan = choose_dedup_lane(
        n_docs=5_000,
        pp_cand_bound=3_500,
        pp_cand_bound_capped=3_500,
        pp_over_cap=0,
        pp_n_prefix_shingles=60_000,
    )
    assert plan.lane == "ppjoin_exact"
    assert plan.max_posting is None and plan.minhash is None
    assert plan.budget == 200 * 5_000


def test_narrow_vocabulary_routes_to_minhash():
    """The sf10 ENOSPC readings (n=500k, 16,265 distinct prefix
    shingles, 10,236 over cap 25, bound 1.95e9, capped volume 1.8e6):
    capped volume FITS the budget, but hot postings are 63% of the
    vocabulary — capping would cost recall, so the rule must route to
    MinHash (the lane the sf10 cross-check measured correct), not to
    the guard."""
    plan = choose_dedup_lane(
        n_docs=500_000,
        pp_cand_bound=1_950_000_000,
        pp_cand_bound_capped=1_800_000,
        pp_over_cap=10_236,
        pp_n_prefix_shingles=16_265,
    )
    assert plan.lane == "minhash"
    assert plan.minhash is not None
    # S-curve contract at t_catch=0.8: recall >= 0.999 caught, fp <=
    # 0.03 at t_reject=0.2 (the planner's attested cheapest config).
    assert plan.minhash.rows_per_band * plan.minhash.bands == plan.minhash.num_perm
    assert plan.minhash.recall_at_catch >= 0.999
    assert plan.minhash.fp_at_reject <= 0.03


def test_isolated_hot_cluster_routes_to_guarded_ppjoin():
    """A planted near-identical cluster in an otherwise healthy index
    (the skew-draw / sf10-SRP shape scaled up): one hot posting blows
    the lossless bound, but over-cap keys are rare (1 of 80,000) and
    the capped volume fits -> guarded lane with the cap."""
    plan = choose_dedup_lane(
        n_docs=1_000_000,
        pp_cand_bound=5_000_000_000,  # C(100_000, 2) from one hot key
        pp_cand_bound_capped=2_000_000,
        pp_over_cap=1,
        pp_n_prefix_shingles=80_000,
    )
    assert plan.lane == "ppjoin_guarded"
    assert plan.max_posting == 25
    assert plan.minhash is None


def test_hot_but_still_over_budget_falls_through_to_minhash():
    """Rarity alone is not enough: if even the capped volume exceeds
    the linear budget, the guard doesn't bound the cost and the rule
    must fall through to MinHash."""
    plan = choose_dedup_lane(
        n_docs=10_000,
        pp_cand_bound=10_000_000_000,
        pp_cand_bound_capped=50_000_000,  # > 200 * 10_000
        pp_over_cap=1,
        pp_n_prefix_shingles=80_000,
    )
    assert plan.lane == "minhash"


def test_boundary_is_inclusive_on_budget_and_rarity():
    """Exactly-at-budget stays exact; exactly-at-hot_bp stays guarded —
    the <=/cross-multiplied comparisons the SQL oracle replays."""
    at_budget = choose_dedup_lane(
        n_docs=100,
        pp_cand_bound=20_000,  # == 200 * 100
        pp_cand_bound_capped=20_000,
        pp_over_cap=0,
        pp_n_prefix_shingles=10,
    )
    assert at_budget.lane == "ppjoin_exact"
    at_rarity = choose_dedup_lane(
        n_docs=100,
        pp_cand_bound=30_000,
        pp_cand_bound_capped=100,
        pp_over_cap=1,  # 1/100 == exactly 100 bp
        pp_n_prefix_shingles=100,
    )
    assert at_rarity.lane == "ppjoin_guarded"
    over_rarity = choose_dedup_lane(
        n_docs=100,
        pp_cand_bound=30_000,
        pp_cand_bound_capped=100,
        pp_over_cap=2,  # 2/100 > 100 bp
        pp_n_prefix_shingles=100,
    )
    assert over_rarity.lane == "minhash"


def test_input_validation():
    with pytest.raises(ValueError):
        choose_dedup_lane(-1, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        choose_dedup_lane(1, 10, 20, 0, 5)  # capped > lossless bound
    with pytest.raises(ValueError):
        choose_dedup_lane(1, 10, 5, 6, 5)  # over_cap > n shingles
    with pytest.raises(ValueError):
        choose_dedup_lane(1, 10, 5, 0, 5, candidates_per_doc=0)


def test_empty_corpus_is_exact():
    plan = choose_dedup_lane(0, 0, 0, 0, 0)
    assert plan.lane == "ppjoin_exact" and plan.budget == 0


def test_auto_routed_row_executes_the_chosen_lane(spark):
    """auto_routed_near_dups EXECUTES the decision: on the healthy smoke
    draw the lane tag is ppjoin_exact and the pairs are exactly the
    lossless PPJoin lane's output (same threshold, same floor grid)."""
    from data_algorithms_with_pyspark_spark.plans.catalog import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    routed = qs["auto_routed_near_dups"].fn(spark, sf).collect()
    assert routed and all(r.lane == "ppjoin_exact" for r in routed)
    exact = {
        (r.id_1, r.id_2, r.jaccard)
        for r in qs["prefix_jaccard_near_dups"].fn(spark, sf).collect()
    }
    assert {(r.id_1, r.id_2, r.jaccard) for r in routed} == exact


def test_auto_routed_minhash_branch(spark, monkeypatch):
    """Force the minhash decision (the sf10 regime) onto the smoke draw
    to exercise the planned-banding branch end-to-end: the output is
    tagged 'minhash', every pair is exact-verified (subset of the
    lossless truth at the same threshold), and recall on this fixture's
    planted near-dups is total under the planned ~0.999 S-curve —
    deterministic given the fixed md5/seed-42 hash lane."""
    from data_algorithms_with_pyspark_spark.operators.planning import (
        DedupLanePlan,
    )
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        choose_minhash_params,
    )
    from data_algorithms_with_pyspark_spark.plans import extensions
    from data_algorithms_with_pyspark_spark.plans.catalog import all_queries

    sf = "/root/testdata/sf0.001"
    forced = DedupLanePlan(
        lane="minhash",
        budget=0,
        max_posting=None,
        minhash=choose_minhash_params(extensions._MH_T_CATCH),
        reason="forced by test",
    )
    monkeypatch.setattr(
        extensions, "_collect_lane_plan", lambda s, d: (None, 0, forced)
    )
    routed = {
        (r.id_1, r.id_2, r.jaccard)
        for r in extensions.auto_routed_near_dups(spark, sf).collect()
    }
    qs = all_queries()
    truth = {
        (r.id_1, r.id_2, r.jaccard)
        for r in qs["prefix_jaccard_near_dups"].fn(spark, sf).collect()
    }
    assert routed <= truth  # exact verify: no false positives, ever
    assert routed == truth  # planned banding catches every planted pair

"""choose_lsh_params — the auto-sizing the sf10 audit proved is
scale-critical (VERDICT r9 #3): fixed 8-bit SRP bands go quadratic at
200k vectors (3.4e8 candidates, ENOSPC) while 16-bit runs in 10 s.
These tests pin BOTH measured regimes and the invariance that keeps
every oracle-attested draw on the attested config."""

from __future__ import annotations

import pytest

from data_algorithms_with_pyspark_spark.operators.similarity import (
    choose_lsh_params,
)


def test_attested_draws_keep_the_attested_config():
    """Every oracle-attested embeddings draw (sf0.001/sf0.01: 500,
    sf0.1/alt2/skew: 2000, sf1: 20000) must resolve to the fixed config
    the catalog oracles were generated with (32 planes / 4 bands / 8-bit
    width) — otherwise wiring the planner into the guarded row would
    silently break its cross-engine compare."""
    for n in (500, 2000, 20000):
        p = choose_lsh_params(n, dim=64)
        assert (p.n_planes, p.bands, p.band_width) == (32, 4, 8), (n, p)


def test_sf10_regime_picks_the_measured_16bit_fix():
    """200k vectors (the sf10 draw that ENOSPC'd at 8-bit) must land on
    the 16-bit width the audit measured as correct-and-fast."""
    p = choose_lsh_params(200_000, dim=64)
    assert p.band_width == 16
    assert p.n_planes == 64
    assert p.bands == 4


def test_width_flip_boundary():
    """The 8->16 flip sits at n > budget * 2^9 / bands = 25_600 for the
    defaults — documented so an operator knows which side a corpus is on."""
    assert choose_lsh_params(25_600).band_width == 8
    assert choose_lsh_params(25_601).band_width == 16


def test_width_monotone_and_candidate_budget_held():
    """Width never decreases with n, and the expected candidate volume
    bands*n^2/2^(w+1) stays within the per-item budget at every scale —
    the linear-cost invariant that makes the 100x question a non-event."""
    budget = 200
    prev_w = 0
    for exp in range(2, 11):
        n = 10**exp
        p = choose_lsh_params(n, bands=4, candidates_per_item=budget)
        assert p.band_width >= prev_w
        prev_w = p.band_width
        if p.band_width < 32:  # the clamp ceiling is allowed to saturate
            expected = 4 * n * n / 2 ** (p.band_width + 1)
            assert expected <= budget * n, (n, p)


def test_max_bucket_recommendation_tracks_occupancy():
    """Cap = max(16, 8 * ceil(n / 2^w)): floors at 16 on sparse draws
    (the attested guard constant), scales with expected occupancy."""
    assert choose_lsh_params(500).max_bucket == 16
    assert choose_lsh_params(2000).max_bucket == 64  # 8 * ceil(7.8)
    assert choose_lsh_params(200_000).max_bucket == 32  # 16-bit, occ ~3
    big = choose_lsh_params(2_000_000)
    assert big.max_bucket == 8 * -(-2_000_000 // (1 << big.band_width))


def test_degenerate_and_invalid_inputs():
    assert choose_lsh_params(0).band_width == 8  # clamped to n=1
    with pytest.raises(ValueError):
        choose_lsh_params(100, bands=0)
    with pytest.raises(ValueError):
        choose_lsh_params(100, candidates_per_item=0)


def test_n_planes_always_divides_into_bands():
    """srp_banded_near_dup_pairs requires n_planes % bands == 0 — the
    planner must satisfy it for any bands choice."""
    for bands in (1, 2, 4, 8):
        for n in (100, 30_000, 5_000_000):
            p = choose_lsh_params(n, bands=bands)
            assert p.n_planes == p.band_width * bands
            assert p.n_planes % bands == 0


# --- choose_minhash_params: the S-curve planner ---------------------------


def test_minhash_planner_standard_regimes():
    """Known S-curve solutions: the cheapest config meeting BOTH the
    recall floor at t_catch and the false-positive ceiling at t_reject."""
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        choose_minhash_params,
    )

    p = choose_minhash_params(0.8)
    assert (p.rows_per_band, p.bands, p.num_perm) == (4, 14, 56)
    assert p.recall_at_catch >= 0.999 and p.fp_at_reject <= 0.03

    p9 = choose_minhash_params(0.9)
    assert (p9.rows_per_band, p9.bands, p9.num_perm) == (4, 7, 28)


def test_minhash_planner_attested_config_satisfies_contract():
    """The catalog's frozen 64-perm/16-band (r=4) config must satisfy
    the same default contract the planner enforces — the invariant that
    lets the attested rows keep their constants."""
    r, b = 4, 16
    recall = 1 - (1 - 0.8**r) ** b
    fp = 1 - (1 - 0.2**r) ** b
    assert recall >= 0.999
    assert fp <= 0.03


def test_minhash_planner_fp_constraint_rejects_flat_curves():
    """Without the fp ceiling, r=1/r=2 configs would win on perms while
    admitting most of the corpus as candidates; the planner must never
    return them under the default contract."""
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        choose_minhash_params,
    )

    assert choose_minhash_params(0.8).rows_per_band >= 3


def test_minhash_planner_infeasible_contract_raises():
    import pytest as _pytest

    from data_algorithms_with_pyspark_spark.operators.similarity import (
        choose_minhash_params,
    )

    with _pytest.raises(ValueError, match="no \\(rows_per_band"):
        choose_minhash_params(0.5)  # needs > 64 bands under defaults
    # ...and becomes feasible when the band budget is widened
    p = choose_minhash_params(0.5, max_bands=128)
    assert p.recall_at_catch >= 0.999 and p.fp_at_reject <= 0.03


def test_minhash_planner_input_validation():
    import pytest as _pytest

    from data_algorithms_with_pyspark_spark.operators.similarity import (
        choose_minhash_params,
    )

    with _pytest.raises(ValueError):
        choose_minhash_params(0.0)
    with _pytest.raises(ValueError):
        choose_minhash_params(0.8, t_reject=0.9)
    with _pytest.raises(ValueError):
        choose_minhash_params(0.8, target_recall=1.0)


# --- choose_simhash_params: band allocation vs hamming radius -------------


def test_simhash_catch_probability_exact_cases():
    """Inclusion-exclusion self-checks: pigeonhole certainty for
    h <= bands-1; the catalog 60/4 config's exact worst-case-radius
    probability (Monte-Carlo-validated at build time: 0.0256 +- 0.0004
    over 200k trials); symmetry/bounds."""
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        simhash_band_catch_probability as prob,
    )

    assert prob(64, 4, 3) == 1.0
    assert prob(60, 4, 3) == 1.0
    assert prob(64, 8, 7) == 1.0
    assert abs(prob(60, 4, 15) - 0.0259152664918) < 1e-12
    assert abs(prob(60, 4, 6) - 0.5800114094278) < 1e-12
    assert prob(60, 4, 0) == 1.0
    p = prob(60, 4, 45)
    assert 0.0 <= p < 0.001  # every band almost surely hit


def test_simhash_planner_lossless_when_width_allows():
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        choose_simhash_params,
    )

    p = choose_simhash_params(64, 3)
    assert (p.bands, p.band_width, p.guaranteed) == (4, 16, True)
    assert p.recall_at_radius == 1.0


def test_simhash_planner_probabilistic_fallback_reports_exact_recall():
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        choose_simhash_params,
        simhash_band_catch_probability,
    )

    p = choose_simhash_params(64, 15)  # lossless would need 16 x 4-bit bands
    assert not p.guaranteed
    assert p.bands == 8 and p.band_width == 8
    assert p.recall_at_radius == simhash_band_catch_probability(64, 8, 15)

    p60 = choose_simhash_params(60, 15)
    assert (p60.bands, p60.band_width) == (6, 10)


def test_simhash_planner_validation():
    import pytest as _pytest

    from data_algorithms_with_pyspark_spark.operators.similarity import (
        choose_simhash_params,
        simhash_band_catch_probability,
    )

    with _pytest.raises(ValueError):
        simhash_band_catch_probability(60, 7, 3)  # 7 does not divide 60
    with _pytest.raises(ValueError):
        simhash_band_catch_probability(60, 4, 61)
    with _pytest.raises(ValueError):
        choose_simhash_params(4, 1, min_band_width=8)  # nothing clears floor


def test_srp_guarded_row_oracle_coherence_guard(spark, monkeypatch):
    """ADVICE r10: the srp_guarded row's oracle is frozen at the 32/4
    coding; past the planner flip the row must fail fast with the
    re-attestation diagnosis, not let the cross-engine gate record a
    spurious hash mismatch."""
    from data_algorithms_with_pyspark_spark.plans.catalog import get_query
    from data_algorithms_with_pyspark_spark.sources import readers

    row = get_query("srp_guarded_cosine_near_dups")
    # Below the flip: plan == attested config, query builds fine.
    df = row.fn(spark, "/root/testdata/sf0.001")
    assert {"id_1", "id_2"} <= set(df.columns)
    # Past the flip (n > 25_600): ValueError naming the attested coding.
    monkeypatch.setattr(readers, "parquet_row_count", lambda *a: 200_000)
    with pytest.raises(ValueError, match="32/4"):
        row.fn(spark, "/root/testdata/sf0.001")


def test_srp_guarded_row_uses_metadata_count_not_a_job(monkeypatch, spark):
    """The planner's n comes from parquet footers (driver-side), never a
    Spark count() action per invocation (ADVICE r10)."""
    from data_algorithms_with_pyspark_spark.plans.catalog import get_query
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("count() action in srp_guarded planner wiring")

    monkeypatch.setattr(DataFrame, "count", boom)
    # Building the (lazy) plan must not trigger any action.
    get_query("srp_guarded_cosine_near_dups").fn(spark, "/root/testdata/sf0.001")

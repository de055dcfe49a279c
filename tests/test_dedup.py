

def test_lsh_collision_curve_and_band_planner():
    """The S-curve math the banding design rests on: monotone in s,
    steep near the implied threshold, and the planner recovers the
    engine's 16-hash default and prefers recall on ties."""
    from ds_caselaw_ingester_spark.operators.dedup import (
        lsh_collision_probability,
        plan_lsh_bands,
    )

    # monotone, with the boundary values exact
    probs = [lsh_collision_probability(s / 10, 4, 4) for s in range(11)]
    assert probs == sorted(probs)
    assert probs[0] == 0.0 and probs[-1] == 1.0
    # the implied threshold (1/4)^(1/4) ~ 0.707: well below it the pair
    # is nearly never a candidate, well above nearly always
    assert lsh_collision_probability(0.4, 4, 4) < 0.1
    assert lsh_collision_probability(0.9, 4, 4) > 0.95
    # the registered pipeline's configuration is what the planner picks
    assert plan_lsh_bands(16, 0.7) == (4, 4)
    # lower threshold -> more bands (recall); higher -> more rows
    b_lo, r_lo = plan_lsh_bands(16, 0.3)
    b_hi, r_hi = plan_lsh_bands(16, 0.95)
    assert b_lo > 4 and r_hi > 4
    import pytest

    with pytest.raises(ValueError):
        plan_lsh_bands(16, 1.5)
    with pytest.raises(ValueError):
        lsh_collision_probability(-0.1, 4, 4)

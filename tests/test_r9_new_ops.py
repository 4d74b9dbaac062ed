"""Pure-Python pins for the r9 inference additions (no Spark needed)."""

import math

from etl_mini_dw_spark.plans.experiment import (
    BH_M,
    BH_Q,
    BH_THRESHOLDS,
    _inv_norm_upper,
)


def test_bh_thresholds_match_known_normal_quantiles():
    # Phi^-1(0.95) and Phi^-1(0.998), the textbook values
    assert BH_THRESHOLDS[-1] == 1.644854
    assert BH_THRESHOLDS[0] == 2.878162
    # k=10 -> tail 0.02 -> Phi^-1(0.98)
    assert BH_THRESHOLDS[9] == 2.053749


def test_bh_thresholds_strictly_decreasing_and_complete():
    assert len(BH_THRESHOLDS) == BH_M
    assert all(a > b for a, b in zip(BH_THRESHOLDS, BH_THRESHOLDS[1:]))


def test_inv_norm_upper_roundtrips_through_erf():
    for k in (1, 7, 13, 25):
        tail = k * BH_Q / (2.0 * BH_M)
        z = _inv_norm_upper(tail)
        assert abs(0.5 * (1.0 - math.erf(z / math.sqrt(2.0))) - tail) < 1e-12


def test_rbo_formula_is_one_for_identical_rankings():
    # replicate the op's algebra: overlap_d = d for identical top-k lists
    # -> RBO_ext telescopes to exactly 1 for any p in (0, 1)
    from etl_mini_dw_spark.functions.retrieval import BM25_TOP_K, RBO_P

    k = BM25_TOP_K
    s = sum(RBO_P ** (d - 1) * d / d for d in range(1, k + 1))
    rbo_ext = (1.0 - RBO_P) * s + RBO_P**k * k / k
    assert abs(rbo_ext - 1.0) < 1e-12

"""Independent checks for the round-5 statistics additions: the KS
drift statistic against a direct numpy empirical-CDF computation, and
the Benford audit's distribution identities."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_mini_dw_spark.plans import expectations, stats


def _np_ks(a: np.ndarray, b: np.ndarray) -> tuple[int, float]:
    """Two-sample KS via pooled sort — an independent formulation (no
    grouping/window), returning (integer numerator, statistic)."""
    na, nb = len(a), len(b)
    xs = np.unique(np.concatenate([a, b]))
    cum_a = np.searchsorted(np.sort(a), xs, side="right")
    cum_b = np.searchsorted(np.sort(b), xs, side="right")
    d_num = int(np.max(np.abs(nb * cum_a.astype(np.int64) - na * cum_b.astype(np.int64))))
    return d_num, d_num / (na * nb)


def test_ks_matches_numpy(spark, sf_dir):
    rows = {r["metric"]: r for r in stats.ks_drift_report(spark, sf_dir).collect()}
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderdate"])
    cutoff = pd.Timestamp(stats.PSI_CUTOFF)
    is_a = pd.to_datetime(orders["o_orderdate"]) < cutoff
    vals = orders["o_totalprice"].astype(float).to_numpy()
    d_num, ks = _np_ks(vals[is_a.to_numpy()], vals[~is_a.to_numpy()])
    r = rows["orders.o_totalprice"]
    assert r["d_num"] == d_num
    assert abs(r["ks"] - ks) < 1e-6
    assert r["n_a"] == int(is_a.sum()) and r["n_b"] == int((~is_a).sum())


def test_benford_distribution_identities(spark, sf_dir):
    rows = expectations.benford_digit_audit(spark, sf_dir).collect()
    digits = [r["digit"] for r in rows]
    assert digits == sorted(digits) and set(digits) <= set(range(1, 10))
    total = sum(r["n"] for r in rows)
    assert total > 0
    # shares are exact counts over the total, so they reconstruct n
    for r in rows:
        assert abs(r["share"] - r["n"] / total) < 1e-6
        assert abs(r["dev"] - (r["share"] - r["benford_p"])) < 1e-6
    # the Benford reference itself sums to ~1
    assert abs(sum(float(p) for p in expectations._BENFORD_P.values()) - 1.0) < 1e-5


def test_lexical_diversity_identities(spark, sf_dir):
    from etl_mini_dw_spark.functions import text

    rows = text.lexical_diversity_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_types"] <= r["n_tokens"]
        assert 0 <= r["n_hapax"] <= r["n_types"]
        # Σc² bounds: N ≤ Σc² ≤ N² and HHI ∈ [1/V, 1]
        assert r["n_tokens"] <= r["sum_c2"] <= r["n_tokens"] ** 2
        assert 1.0 / r["n_types"] - 1e-9 <= r["hhi"] <= 1.0
        # Rényi-2 entropy is -ln(hhi): recompute from the exact integers
        expect = -np.log(r["sum_c2"] / (r["n_tokens"] ** 2))
        assert abs(r["renyi2"] - expect) < 1e-5

"""CUPED A/B lift + calibration report: independent derivations and
plan shapes.

The parity suite already pins Spark == DuckDB; these tests pin the
MATH — both operators are replicated from raw parquet with
pandas/numpy float arithmetic and must agree to ~1e-5 (the round-6
outputs), and the CUPED identities (theta minimizes adjusted variance,
rho2 = achieved variance reduction) are asserted from first
principles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_mini_dw_spark.functions.sampling import HASH_MOD, HASH_MULT
from etl_mini_dw_spark.plans import experiment


@pytest.fixture(scope="module")
def cuped_row(spark, sf_dir):
    return experiment.ab_cuped_lift(spark, sf_dir).collect()[0].asDict()


def _units_pandas(sf_dir):
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    cents = np.round(orders.o_totalprice.to_numpy() * 100).astype(np.int64)
    pre = pd.Timestamp(experiment.PERIOD_CUT)
    is_pre = orders.o_orderdate.to_numpy() < np.datetime64(pre)
    per = pd.DataFrame(
        {
            "c_custkey": orders.o_custkey,
            "x": np.where(is_pre, cents, 0),
            "y": np.where(~is_pre, cents, 0),
        }
    ).groupby("c_custkey", as_index=False).sum()
    units = cust.merge(per, on="c_custkey", how="left").fillna(0)
    h = (units.c_custkey.to_numpy().astype(np.int64) * HASH_MULT) % HASH_MOD
    units["arm"] = np.where(h < experiment.AB_ARM_CUT, "A", "B")
    return units


def test_cuped_matches_numpy_reference(cuped_row, sf_dir):
    u = _units_pandas(sf_dir)
    x = u.x.to_numpy(dtype=np.float64)
    y = u.y.to_numpy(dtype=np.float64)
    a = (u.arm == "A").to_numpy()
    assert cuped_row["n_a"] == int(a.sum())
    assert cuped_row["n_b"] == int((~a).sum())
    mean_y_a, mean_y_b = y[a].mean() / 100, y[~a].mean() / 100
    assert cuped_row["mean_y_a"] == pytest.approx(mean_y_a, abs=2e-6)
    assert cuped_row["naive_diff"] == pytest.approx(
        mean_y_a - mean_y_b, abs=5e-6
    )
    n = len(x)
    cov = n * (x * y).sum() - x.sum() * y.sum()
    varx = n * (x * x).sum() - x.sum() ** 2
    vary = n * (y * y).sum() - y.sum() ** 2
    theta = cov / varx
    assert cuped_row["theta"] == pytest.approx(theta, abs=2e-6)
    # the operator derives cuped_diff from the ALREADY-ROUNDED theta and
    # means (so both engines do identical IEEE arithmetic); mirror that
    # order here — theta's 1e-6 rounding scales by the ~1e4-dollar
    # covariate gap, so deriving from the unrounded theta is ~1e-2 off
    cuped = round(
        (round(mean_y_a, 6) - round(mean_y_b, 6))
        - round(theta, 6)
        * (round(x[a].mean() / 100, 6) - round(x[~a].mean() / 100, 6)),
        6,
    )
    assert cuped_row["cuped_diff"] == pytest.approx(cuped, abs=5e-6)
    assert cuped_row["rho2"] == pytest.approx(cov**2 / (varx * vary), abs=2e-6)


def test_cuped_theta_is_the_variance_minimizer(cuped_row, sf_dir):
    """Var(y - t*x) over units is a parabola in t minimized at theta;
    nudging t either way must increase it (first-principles check that
    the reported theta is the right fit, not just the right formula)."""
    u = _units_pandas(sf_dir)
    x = u.x.to_numpy(dtype=np.float64)
    y = u.y.to_numpy(dtype=np.float64)
    theta = cuped_row["theta"]

    def adj_var(t):
        return np.var(y - t * x)

    assert adj_var(theta) <= adj_var(theta * 1.05) + 1e-9
    assert adj_var(theta) <= adj_var(theta * 0.95) + 1e-9
    # achieved variance reduction == rho2 (CUPED's defining identity)
    red = 1 - adj_var(theta) / np.var(y)
    assert cuped_row["rho2"] == pytest.approx(red, abs=1e-6)


def test_calibration_matches_pandas_reference(spark, sf_dir):
    out = (
        experiment.calibration_brier(spark, sf_dir)
        .orderBy("bucket_cents")
        .toPandas()
    )
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_discount", "l_returnflag"],
    )
    bucket = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    yv = (li.l_returnflag == "R").to_numpy().astype(np.int64)
    h = (li.l_orderkey.to_numpy().astype(np.int64) * HASH_MULT) % HASH_MOD
    train = h < experiment.CAL_TRAIN_CUT
    model = {}
    for b in np.unique(bucket[train]):
        m = train & (bucket == b)
        model[b] = (1_000_000 * int(yv[m].sum())) // int(m.sum())
    test = ~train & np.isin(bucket, list(model))
    p6 = np.array([model[b] for b in bucket[test]], dtype=np.int64)
    yt = yv[test]
    brier = float(((p6 - yt * 1_000_000) ** 2).sum()) / (1e12 * test.sum())
    total = out[out.bucket_cents == -1].iloc[0]
    assert total.n_test == int(test.sum())
    assert total.brier == pytest.approx(brier, abs=2e-6)
    # per-bucket reliability rows
    for b, p in model.items():
        m = test & (bucket == b)
        if not m.any():
            continue
        row = out[out.bucket_cents == b].iloc[0]
        assert row.n_test == int(m.sum())
        assert row.p_pred == pytest.approx(p / 1e6, abs=1e-9)
        assert row.p_obs == pytest.approx(yv[m].mean(), abs=2e-6)
    # ECE from the same reference frame
    num = sum(
        abs(model[b] * int((test & (bucket == b)).sum())
            - 1_000_000 * int(yv[test & (bucket == b)].sum()))
        for b in model
    )
    assert total.ece == pytest.approx(num / (1e6 * test.sum()), abs=2e-6)


def test_experiment_plan_shapes(spark, sf_dir):
    import io
    from contextlib import redirect_stdout

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    p = plan_of(experiment.ab_cuped_lift(spark, sf_dir))
    assert "CartesianProduct" not in p
    # corpus reductions stay partial-aggregable (map-side combine)
    assert p.count("HashAggregate") >= 2, p[:2000]
    p2 = plan_of(experiment.calibration_brier(spark, sf_dir))
    assert "CartesianProduct" not in p2
    assert "BroadcastHashJoin" in p2, p2[:2000]
    assert "SortMergeJoin" not in p2


def test_woe_matches_pandas_and_iv_identity(spark, sf_dir):
    out = experiment.woe_encoding(spark, sf_dir).toPandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_returnflag"]
    )
    bucket = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    y = (li.l_returnflag == "R").to_numpy().astype(np.int64)
    ks = np.unique(bucket)
    k = len(ks)
    tpos, tneg = int(y.sum()), int((1 - y).sum())
    iv = 0.0
    for b in ks:
        m = bucket == b
        pos, neg = int(y[m].sum()), int((1 - y[m]).sum())
        row = out[out.bucket_cents == b].iloc[0]
        woe = np.log(((pos + 1) * (tneg + k)) / ((neg + 1) * (tpos + k)))
        assert row.woe == pytest.approx(woe, abs=2e-6)
        p_pos, p_neg = (pos + 1) / (tpos + k), (neg + 1) / (tneg + k)
        assert row.p_pos == pytest.approx(p_pos, abs=2e-6)
        iv += (round(p_pos, 6) - round(p_neg, 6)) * round(woe, 6)
    total = out[out.bucket_cents == -1].iloc[0]
    assert total.iv == pytest.approx(iv, abs=5e-6)
    # WOE sign tracks whether the bucket is positive-enriched
    for _, row in out[out.bucket_cents >= 0].iterrows():
        assert (row.woe > 0) == (row.p_pos > row.p_neg) or row.woe == 0


def test_forecast_backtest_matches_pandas(spark, sf_dir):
    from etl_mini_dw_spark.functions import timeseries

    out = timeseries.forecast_backtest(spark, sf_dir).toPandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_custkey"],
    )
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    cents = np.round(
        j.l_extendedprice.to_numpy() * (1 - j.l_discount.to_numpy()) * 100
    ).astype(np.int64)
    idx = (j.o_orderdate.dt.year - 1995) * 12 + j.o_orderdate.dt.month
    m = (
        pd.DataFrame({"region": j.r_name, "idx": idx, "y": cents})
        .groupby(["region", "idx"], as_index=False)
        .sum()
    )
    for reg in m.region.unique():
        s = dict(zip(m[m.region == reg].idx, m[m.region == reg].y))
        errs = {"naive": [], "seasonal_naive": [], "drift": [], "ses": []}
        for i, yv in s.items():
            lags = list(range(1, 9)) + [12, 13]
            if yv <= 0 or any(i - k not in s for k in lags):
                continue
            y1, y12, y13 = s[i - 1], s[i - 12], s[i - 13]
            ses_num = sum(s[i - k] * (1 << (8 - k)) for k in range(1, 9))
            fc = {
                "naive": y1,
                "seasonal_naive": y12,
                "drift": y1 + (y1 - y13) // 12,
                "ses": ses_num // 255,
            }
            for meth, yh in fc.items():
                errs[meth].append((abs(yv - yh) * 1_000_000) // yv)
        for meth, es in errs.items():
            row = out[(out.region == reg) & (out.method == meth)].iloc[0]
            assert row.n_months == len(es)
            assert row.mape == pytest.approx(
                sum(es) / (1e6 * len(es)), abs=2e-6
            )


def test_did_all_row_consistent_with_cuped(cuped_row, spark, sf_dir):
    """Cross-operator consistency: the DiD ALL row must reproduce the
    CUPED readout's naive_diff as its post_diff and the covariate-mean
    gap as its pre_diff (same units, same arms, same periods)."""
    did = experiment.did_by_segment(spark, sf_dir).toPandas()
    allrow = did[did.segment == "ALL"].iloc[0]
    assert allrow.n_a == cuped_row["n_a"] and allrow.n_b == cuped_row["n_b"]
    assert allrow.post_diff == pytest.approx(cuped_row["naive_diff"], abs=2e-6)
    assert allrow.pre_diff == pytest.approx(
        cuped_row["mean_x_a"] - cuped_row["mean_x_b"], abs=2e-6
    )
    assert allrow.did == pytest.approx(
        round(allrow.post_diff - allrow.pre_diff, 6), abs=2e-6
    )
    # segment rows tile the population
    segs = did[did.segment != "ALL"]
    assert int(segs.n_a.sum()) == cuped_row["n_a"]
    assert int(segs.n_b.sum()) == cuped_row["n_b"]


def test_mde_formula_matches_numpy(spark, sf_dir):
    out = {r.segment: r for r in experiment.mde_power_report(spark, sf_dir).collect()}
    u = _units_pandas(sf_dir)
    y = u.y.to_numpy(np.float64)
    a = (u.arm == "A").to_numpy()
    r = out["ALL"]
    assert r.n_a == int(a.sum()) and r.n_b == int((~a).sum())
    sigma = np.sqrt(((y - y.mean()) ** 2).mean()) / 100
    assert r.sigma == pytest.approx(sigma, rel=1e-6)
    mde = (experiment.Z_975 + experiment.Z_80) * round(sigma, 6) * np.sqrt(
        1 / r.n_a + 1 / r.n_b
    )
    assert r.mde_abs == pytest.approx(mde, abs=2e-6)
    assert r.mde_rel == pytest.approx(
        round(r.mde_abs / r.mean_y, 6), abs=2e-6
    )
    # sanity: a detectable effect shrinks with sqrt(n) — ALL (largest n)
    # must have the smallest relative MDE among segments of same scale
    assert r.mde_abs < min(
        v.mde_abs for k, v in out.items() if k != "ALL"
    )


def test_abc_xyz_census_identities(spark, sf_dir):
    from etl_mini_dw_spark.plans import classic

    out = classic.abc_xyz_matrix(spark, sf_dir).toPandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
    )
    n_parts_sold = li.l_partkey.nunique()
    assert int(out.n_parts.sum()) == n_parts_sold
    assert abs(out.revenue_share.sum() - 1.0) < 1e-4
    # ABC replication in pandas (exact integer revenue, same tie order)
    rev = (
        li.assign(
            r=np.round(
                li.l_extendedprice.to_numpy()
                * (1 - li.l_discount.to_numpy())
                * 10000
            ).astype(np.int64)
        )
        .groupby("l_partkey").r.sum()
        .reset_index()
        .sort_values(["r", "l_partkey"], ascending=[False, True])
    )
    tot = int(rev.r.sum())
    cum = rev.r.cumsum()
    abc = np.where(cum * 100 <= tot * 80, "A",
                   np.where(cum * 100 <= tot * 95, "B", "C"))
    ref_counts = pd.Series(abc).value_counts()
    got_counts = out.groupby("abc").n_parts.sum()
    for cls in ("A", "B", "C"):
        assert int(got_counts.get(cls, 0)) == int(ref_counts.get(cls, 0))
    # A captures at least as much revenue per part as C (Pareto shape)
    ga = out[out.abc == "A"]
    gc = out[out.abc == "C"]
    if not ga.empty and not gc.empty:
        assert (
            ga.revenue_share.sum() / ga.n_parts.sum()
            > gc.revenue_share.sum() / gc.n_parts.sum()
        )


def test_poststratified_lift_identities(cuped_row, spark, sf_dir):
    """TOTAL.contrib must equal the stratum-weighted diff; under the
    (fair) hash assignment the PS estimate lands near the naive diff;
    the TOTAL mean_diff reproduces the CUPED naive_diff."""
    out = experiment.poststratified_lift(spark, sf_dir).toPandas()
    total = out[out.stratum == -1].iloc[0]
    strata = out[out.stratum != -1]
    assert total.contrib == pytest.approx(
        round(float(strata.contrib.sum()), 6), abs=2e-6
    )
    assert total.mean_diff == pytest.approx(cuped_row["naive_diff"], abs=2e-6)
    # fair assignment: PS and naive estimates agree within the scale of
    # the naive diff itself (both are noisy estimates of the same zero
    # true effect; they share the same units)
    assert abs(total.contrib - total.mean_diff) < max(
        2 * abs(total.mean_diff), 1.0
    )
    # weights are population shares of the covered strata
    assert 0.99 <= strata.weight.sum() <= 1.000001


def test_counterfactual_null_intervention_calibration(spark, sf_dir):
    """Nothing actually happened at the cutoff, so the ratio-scaled
    counterfactual should track actuals: cumulative lift stays inside a
    generous band, and the counterfactual reproduces the donor series
    times the exact pre-ratio (pandas replication)."""
    out = experiment.counterfactual_lift(spark, sf_dir).toPandas()
    assert len(out) > 12
    # per-month lift is noisy; the cumulative estimate should calm down
    assert abs(out.cum_lift.iloc[-1]) < 0.5
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate", "o_custkey"])
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    j = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
           .merge(region, left_on="n_regionkey", right_on="r_regionkey"))
    units = np.round(j.l_extendedprice.to_numpy()
                     * (1 - j.l_discount.to_numpy()) * 10000).astype(np.int64)
    treated = (j.r_name == experiment.CF_TREATED_REGION).to_numpy()
    pre = (j.o_orderdate < pd.Timestamp("1998-01-01")).to_numpy()
    ym = j.o_orderdate.dt.strftime("%Y-%m")
    pt = int(units[treated & pre].sum())
    pd_tot = int(units[~treated & pre].sum())
    g = pd.DataFrame({"ym": ym[~treated & ~pre],
                      "u": units[~treated & ~pre]}).groupby("ym").u.sum()
    for _, r in out.iterrows():
        dc = int(g[r.ym])
        cf = (dc * pt) // pd_tot
        assert r.counterfactual == pytest.approx(cf / 1e4, abs=2e-4)


def test_price_elasticity_matches_numpy_wols(spark, sf_dir):
    """Elasticity replicated with numpy weighted least squares from the
    raw rows (unrounded path) — must agree to the rounding budget; the
    TOTAL row's R² is the squared weighted correlation."""
    out = experiment.price_elasticity(spark, sf_dir).toPandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_quantity"]
    )
    b = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    q = np.round(li.l_quantity.to_numpy() * 100).astype(np.int64)
    xs, ys, ws = [], [], []
    for lvl in np.unique(b):
        m = b == lvl
        xs.append(round(np.log((100 - lvl) / 100.0), 6))
        ys.append(round(np.log(q[m].sum() / (100.0 * m.sum())), 6))
        ws.append(int(m.sum()))
    x, y, w = map(np.asarray, (xs, ys, ws))
    W = w.sum()
    cov = W * (w * x * y).sum() - (w * x).sum() * (w * y).sum()
    vx = W * (w * x * x).sum() - (w * x).sum() ** 2
    vy = W * (w * y * y).sum() - (w * y).sum() ** 2
    total = out[out.bucket_cents == -1].iloc[0]
    assert total.elasticity == pytest.approx(cov / vx, abs=5e-6)
    assert total.r2 == pytest.approx(cov**2 / (vx * vy), abs=5e-6)
    # per-level points audit
    for lvl, xi, yi, wi in zip(np.unique(b), x, y, w):
        row = out[out.bucket_cents == lvl].iloc[0]
        assert row.n == wi
        assert row.ln_price == pytest.approx(xi, abs=2e-6)
        assert row.ln_qty == pytest.approx(yi, abs=2e-6)

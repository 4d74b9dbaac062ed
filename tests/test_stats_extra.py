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


def test_auc_matches_searchsorted(spark, sf_dir):
    """AUC via an independent formulation: for each positive, count
    strictly-smaller negatives + half the tied negatives, using sorted
    arrays + searchsorted (no grouping/window)."""
    rows = {r["metric"]: r for r in stats.auc_rank_quality(spark, sf_dir).collect()}
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_returnflag"]
    )
    pos = np.sort(li.loc[li["l_returnflag"] == "R", "l_discount"].astype(float).to_numpy())
    neg = np.sort(li.loc[li["l_returnflag"] != "R", "l_discount"].astype(float).to_numpy())
    below = np.searchsorted(neg, pos, side="left").sum()
    tied = (np.searchsorted(neg, pos, side="right") - np.searchsorted(neg, pos, side="left")).sum()
    u2 = 2 * int(below) + int(tied)
    r = rows["lineitem.discount->returned"]
    assert r["u2"] == u2
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert abs(r["auc"] - u2 / (2 * len(pos) * len(neg))) < 1e-6


def test_spearman_matches_pandas(spark, sf_dir):
    """rho against pandas midranks + numpy corrcoef (float path)."""
    got = {
        (r["var_a"], r["var_b"]): r
        for r in stats.spearman_rank_matrix(spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=stats.CORR_VARS).astype(
        float
    )
    n = len(li)
    ranks = li.rank(method="average")
    for (a, b), r in got.items():
        assert r["n"] == n
        expect = np.corrcoef(ranks[a], ranks[b])[0, 1]
        assert abs(r["rho"] - expect) < 1e-5, (a, b)
    assert len(got) == 6


def test_revenue_acf_matches_numpy(spark, sf_dir):
    from etl_mini_dw_spark.plans import anomaly

    got = {r["lag"]: r for r in anomaly.revenue_acf(spark, sf_dir).collect()}
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    rev = (m["l_extendedprice"].astype(float) * (1 - m["l_discount"].astype(float)))
    day = pd.to_datetime(m["o_orderdate"]).dt.normalize()
    daily = rev.groupby(day).sum()
    idx = {d: v for d, v in daily.items()}
    for lag in anomaly.ACF_LAGS:
        xs, ys = [], []
        for d, v in idx.items():
            d2 = d + pd.Timedelta(days=lag)
            if d2 in idx:
                xs.append(v)
                ys.append(idx[d2])
        r = got[lag]
        assert r["n_pairs"] == len(xs)
        expect = np.corrcoef(np.array(xs), np.array(ys))[0, 1]
        assert abs(r["acf"] - expect) < 1e-4, lag


def test_gains_lift_matches_numpy(spark, sf_dir):
    """Replicate the full chart independently: ntile boundary semantics
    (first n%B tiles one element larger), bucket = B - #bounds<val,
    cumulative gains/lift from raw counts."""
    got = [
        r.asDict()
        for r in stats.gains_lift_chart(spark, sf_dir)
        .filter("metric = 'lineitem.discount->returned'")
        .collect()
    ]
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_returnflag"]
    )
    vals = np.sort(li["l_discount"].astype(float).to_numpy())
    n, B = len(vals), stats.GAINS_BUCKETS
    sizes = [n // B + (1 if i < n % B else 0) for i in range(B)]
    cuts = np.cumsum(sizes)[:-1]
    bounds = sorted({vals[c - 1] for c in cuts})
    score = li["l_discount"].astype(float).to_numpy()
    depth = B - np.searchsorted(np.array(bounds), score, side="left")
    is_pos = (li["l_returnflag"] == "R").to_numpy()
    tot_n, tot_pos = len(score), int(is_pos.sum())
    seen = []
    cum_n = cum_pos = 0
    for d in sorted(set(depth.tolist())):
        m = depth == d
        cum_n += int(m.sum())
        cum_pos += int(is_pos[m].sum())
        seen.append((d, int(m.sum()), int(is_pos[m].sum()), cum_n, cum_pos))
    assert [(r["depth"], r["n"], r["n_pos"], r["cum_n"], r["cum_pos"]) for r in got] == seen
    for r in got:
        assert abs(r["gains"] - r["cum_pos"] / tot_pos) < 1e-6
        assert abs(r["lift"] - (r["cum_pos"] * tot_n) / (r["cum_n"] * tot_pos)) < 1e-6
    assert got[-1]["gains"] == 1.0 and got[-1]["lift"] == 1.0


def _daily_series(sf_dir):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    rev = np.round(
        j.l_extendedprice.to_numpy() * (1 - j.l_discount.to_numpy()) * 10000
    ).astype(np.int64)
    day = j.o_orderdate.dt.normalize()
    g = pd.DataFrame({"day": day, "y": rev}).groupby("day", as_index=False).sum()
    x = (g.day - pd.Timestamp("1992-01-01")).dt.days.to_numpy(np.int64)
    return x, g.y.to_numpy(np.int64), g.day.dt.year.to_numpy()


def _np_theil_sen_fp(x, y, scale=1000):
    xi, xj = np.triu_indices(len(x), k=1)
    fp = np.floor_divide((y[xj] - y[xi]) * scale, (x[xj] - x[xi]))
    fp.sort()
    m = len(fp)
    return int(fp[(m - 1) // 2]), m


def test_theil_sen_matches_numpy(spark, sf_dir):
    got = {
        r["slice"]: r
        for r in stats.theil_sen_trend(spark, sf_dir).collect()
    }
    x, y, yr = _daily_series(sf_dir)
    fp, m = _np_theil_sen_fp(x, y)
    assert got["ALL"]["n_days"] == len(x)
    assert got["ALL"]["n_pairs"] == m
    assert abs(got["ALL"]["ts_slope"] - fp / 1e7) < 1e-6
    for year in np.unique(yr):
        mask = yr == year
        if mask.sum() < 2:
            continue
        fp_y, m_y = _np_theil_sen_fp(x[mask], y[mask])
        r = got[str(year)]
        assert r["n_pairs"] == m_y
        assert abs(r["ts_slope"] - fp_y / 1e7) < 1e-6
    # OLS cross-check on the ALL slice
    n = len(x)
    xs, ys = x.astype(np.float64), y.astype(np.float64)
    ols = (n * (xs * ys).sum() - xs.sum() * ys.sum()) / (
        (n * (xs * xs).sum() - xs.sum() ** 2) * 1e4
    )
    assert abs(got["ALL"]["ols_slope"] - ols) < 1e-5


def test_theil_sen_breakdown_resistance():
    """The estimator's reason to exist: one corrupted day swings OLS
    but leaves the pairwise-slope median in place."""
    rng = np.random.default_rng(7)
    x = np.arange(200, dtype=np.int64)
    y = (1000 * x + rng.integers(-500, 500, 200)).astype(np.int64)
    fp_clean, _ = _np_theil_sen_fp(x, y)
    y_bad = y.copy()
    y_bad[199] += 10_000_000  # one promo-spike day at the high-leverage end
    fp_bad, _ = _np_theil_sen_fp(x, y_bad)
    # TS moves < 5%; OLS moves > 25%
    assert abs(fp_bad - fp_clean) / abs(fp_clean) < 0.05

    def ols(yv):
        n = len(x)
        xs, ys = x.astype(float), yv.astype(float)
        return (n * (xs * ys).sum() - xs.sum() * ys.sum()) / (
            n * (xs * xs).sum() - xs.sum() ** 2
        )

    assert abs(ols(y_bad) - ols(y)) / abs(ols(y)) > 0.25


def test_markov_stationary_is_a_fixed_point(spark, sf_dir):
    """pi must satisfy pi = pi.P of the empirical transition matrix (to
    within the 2^-20 fixed-point granularity x 8 rounds), sum to ~1,
    and match numpy power iteration from the same counts."""
    from etl_mini_dw_spark.plans import behavior

    out = {r.event_type: r for r in behavior.markov_stationary(spark, sf_dir).collect()}
    trans = behavior.event_transitions(spark, sf_dir).collect()
    types = sorted(out)
    idx = {t: i for i, t in enumerate(types)}
    P = np.zeros((len(types), len(types)))
    for r in trans:
        P[idx[r.from_type], idx[r.to_type]] = r.n_transitions
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.array([out[t].pi for t in types])
    assert abs(pi.sum() - 1.0) < 1e-4
    # fixed point: one more step moves pi by at most the accumulated
    # fixed-point error budget
    assert np.abs(pi @ P - pi).max() < 5e-4
    # and numpy power iteration from uniform lands on the same vector
    v = np.full(len(types), 1.0 / len(types))
    for _ in range(50):
        v = v @ P
    assert np.abs(v - pi).max() < 5e-4


def test_pareto_skyline_matches_numpy(spark, sf_dir):
    """Every reported part is non-dominated, and the frontier equals a
    brute-force O(n^2)-free pandas sweep from raw parquet."""
    from etl_mini_dw_spark.plans import classic

    got = classic.pareto_skyline_parts(spark, sf_dir).toPandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )
    part = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"]
    )
    qty = (
        li.assign(q=np.round(li.l_quantity.to_numpy() * 100).astype(np.int64))
        .groupby("l_partkey").q.sum()
    )
    base = part.assign(
        price=np.round(part.p_retailprice.to_numpy() * 100).astype(np.int64)
    )
    base = base[base.p_partkey.isin(qty.index)]
    base["q"] = base.p_partkey.map(qty)
    base = base.sort_values(["price", "p_partkey"]).reset_index(drop=True)
    frontier = []
    for price, grp in base.groupby("price", sort=True):
        mx = grp.q.max()
        cheaper = base[base.price < price]
        cmax = cheaper.q.max() if len(cheaper) else -1
        if mx > cmax:
            frontier.extend(
                grp[grp.q == mx].p_partkey.tolist()
            )
    frontier = sorted(
        frontier,
        key=lambda k: (int(base[base.p_partkey == k].price.iloc[0]), k),
    )
    assert got.skyline_size.nunique() == 1
    assert int(got.skyline_size.iloc[0]) == len(frontier)
    assert got.p_partkey.tolist() == frontier[: len(got)]
    # non-dominance holds for every reported row
    for _, r in got.iterrows():
        dominators = base[
            ((base.price < r.price_c) & (base.q >= r.qty_c))
            | ((base.price <= r.price_c) & (base.q > r.qty_c))
        ]
        assert dominators.empty


def test_hash_uniformity_identity(spark, sf_dir):
    from etl_mini_dw_spark.functions.sampling import HASH_MOD, HASH_MULT
    from etl_mini_dw_spark.plans import expectations as exp

    rows = {r.unit_key: r for r in exp.hash_uniformity_audit(spark, sf_dir).collect()}
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    cells = (
        (cust.c_custkey.to_numpy().astype(np.int64) * HASH_MULT) % HASH_MOD
    ) // (HASH_MOD // exp.HASH_AUDIT_CELLS)
    o = pd.Series(cells).value_counts().to_numpy()
    r = rows["customer.c_custkey"]
    assert r.n == len(cust)
    chi2 = exp.HASH_AUDIT_CELLS * float((o.astype(np.int64) ** 2).sum()) / len(cust) - len(cust)
    assert abs(r.chi2 - chi2) < 1e-4
    assert r.min_cell == int(o.min()) and r.max_cell == int(o.max())


def test_categorical_drift_identities(spark, sf_dir):
    """PSI terms recomputed in numpy from raw counts; PSI >= 0 by
    Gibbs' inequality-adjacent convexity of (q-p)ln(q/p) termwise."""
    rows = {r.metric: r for r in stats.categorical_drift_report(spark, sf_dir).collect()}
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_orderdate"]
    )
    is_a = orders.o_orderdate < pd.Timestamp(stats.PSI_CUTOFF)
    cats = sorted(orders.o_orderpriority.unique())
    k = len(cats)
    na, nb = int(is_a.sum()), int((~is_a).sum())
    psi = 0.0
    chi2 = 0.0
    for c in cats:
        a = int(((orders.o_orderpriority == c) & is_a).sum())
        b = int(((orders.o_orderpriority == c) & ~is_a).sum())
        pa, pb = (a + 1) / (na + k), (b + 1) / (nb + k)
        psi += round((pb - pa) * np.log(pb / pa), 6)
        ea = (a + b) * na / (na + nb)
        eb = (a + b) * nb / (na + nb)
        chi2 += round((a - ea) ** 2 / ea + (b - eb) ** 2 / eb, 6)
    r = rows["orders.o_orderpriority"]
    assert r.n_cats == k and r.n_a == na and r.n_b == nb
    assert abs(r.psi - psi) < 5e-6
    assert abs(r.chi2 - chi2) < 5e-6
    for r in rows.values():
        assert r.psi >= -1e-9  # every (q-p)ln(q/p) term is nonnegative
        assert r.chi2 >= 0

"""k-anonymity report identities and Neyman-allocation optimality,
replicated from raw parquet with pandas/numpy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_mini_dw_spark.plans import allocation, privacy


def _classes_pandas(sf_dir):
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    len_band = j.c_name.str.len() // privacy.NAME_LEN_BAND
    bal = np.round(j.c_acctbal.to_numpy() * 100).astype(np.int64)
    sens = np.floor_divide(bal, privacy.BAL_BAND_CENTS)
    g = pd.DataFrame(
        {
            "seg": j.c_mktsegment,
            "nat": j.n_name,
            "lb": len_band,
            "sens": sens,
        }
    )
    return g.groupby(["seg", "nat", "lb"]).agg(
        size=("sens", "size"), l_div=("sens", "nunique")
    )


def test_k_anonymity_matches_pandas(spark, sf_dir):
    rep = privacy.k_anonymity_report(spark, sf_dir).toPandas()
    cls = _classes_pandas(sf_dir)
    hist = rep[rep.metric == "class_size_hist"]
    # histogram tiles the population and matches the pandas classes
    assert int((hist.k * hist.n).sum()) == int(cls["size"].sum())
    ref_hist = cls["size"].value_counts()
    for _, row in hist.iterrows():
        assert int(ref_hist.get(row.k, 0)) == row.n
    # rows_below_k consistent with the histogram and monotone in k
    below = rep[rep.metric == "rows_below_k"].sort_values("k")
    prev = -1
    for _, row in below.iterrows():
        expect = int(cls[cls["size"] < row.k]["size"].sum())
        assert row.n == expect
        assert row.ratio == pytest.approx(
            expect / len(
                pd.read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_custkey"])
            ),
            abs=2e-6,
        )
        assert row.n >= prev
        prev = row.n
    assert (
        int(rep[rep.metric == "l_diversity_min"].n.iloc[0])
        == int(cls.l_div.min())
    )
    assert int(rep[rep.metric == "homogeneous_classes"].n.iloc[0]) == int(
        (cls.l_div == 1).sum()
    )


def test_neyman_allocation_optimality(spark, sf_dir):
    out = allocation.neyman_allocation(spark, sf_dir).toPandas()
    B = allocation.SAMPLE_BUDGET
    # both allocations spend the budget exactly
    assert int(out.alloc_neyman.sum()) == B
    assert int(out.alloc_prop.sum()) == B
    # sigma matches a numpy replication
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    per = orders.assign(
        y=np.round(orders.o_totalprice.to_numpy() * 100).astype(np.int64)
    ).groupby("o_custkey").y.sum()
    u = cust.assign(y=cust.c_custkey.map(per).fillna(0))
    sig = {}
    for seg, grp in u.groupby("c_mktsegment"):
        y = grp.y.to_numpy(np.float64)
        sig[seg] = np.sqrt(((y - y.mean()) ** 2).mean()) / 100
        row = out[out.segment == seg].iloc[0]
        assert row.sigma == pytest.approx(sig[seg], rel=1e-6)
        assert row.n_h == len(grp)
    # Neyman minimizes Var(stratified mean) = sum (n_h sigma_h)^2 / m_h:
    # its integerized allocation must beat (or tie) proportional
    def variance(col):
        v = 0.0
        for _, r in out.iterrows():
            if r[col] > 0:
                v += (r.n_h * sig[r.segment]) ** 2 / r[col]
        return v

    assert variance("alloc_neyman") <= variance("alloc_prop") * (1 + 1e-9)
    # allocation tracks the exact real-valued Neyman quota within 1 unit
    w = {r.segment: r.n_h * sig[r.segment] for _, r in out.iterrows()}
    wtot = sum(w.values())
    for _, r in out.iterrows():
        assert abs(r.alloc_neyman - B * w[r.segment] / wtot) <= 1.0

"""Kaplan–Meier shipping-latency curve vs an independent product-limit
computation (pandas first-ship + explicit per-event-time loop)."""

import numpy as np
import pandas as pd

from etl_mini_dw_spark.plans import survival


def _naive_km(sf_dir: str) -> dict[str, list[tuple]]:
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    horizon = pd.Timestamp(survival.KM_HORIZON)
    fs = li.groupby("l_orderkey")["l_shipdate"].min().rename("fs")
    m = orders.merge(fs, left_on="o_orderkey", right_index=True)
    m = m[m["o_orderdate"] < horizon]
    event = m["fs"] < horizon
    t = np.where(
        event,
        (m["fs"].dt.normalize() - m["o_orderdate"].dt.normalize()).dt.days,
        (horizon - m["o_orderdate"].dt.normalize()).dt.days,
    )
    out: dict[str, list[tuple]] = {}
    for prio, grp in pd.DataFrame(
        {"prio": m["o_orderpriority"], "t": t, "d": event.astype(int)}
    ).groupby("prio"):
        rows = []
        s = 1.0
        n_risk = len(grp)
        for tt in sorted(grp["t"].unique()):
            at_t = grp[grp["t"] == tt]
            d = int(at_t["d"].sum())
            c = len(at_t) - d
            if d > 0:
                s *= 1.0 - d / n_risk
                rows.append((int(tt), n_risk, d, c, s))
            n_risk -= len(at_t)
        out[prio] = rows
    return out


def test_km_matches_naive_product(spark, sf_dir):
    got = survival.survival_km_shipping(spark, sf_dir).collect()
    expect = _naive_km(sf_dir)
    by_prio: dict[str, list] = {}
    for r in got:
        by_prio.setdefault(r["priority"], []).append(r)
    assert set(by_prio) == set(expect)
    total_censored = 0
    for prio, rows in by_prio.items():
        exp_rows = expect[prio]
        assert len(rows) == len(exp_rows), prio
        for r, (tt, n_risk, d, c, s) in zip(rows, exp_rows):
            assert (r["t_day"], r["n_risk"], r["d_events"], r["c_censored"]) == (
                tt,
                n_risk,
                d,
                c,
            )
            assert abs(r["survival"] - s) < 1e-5, (prio, tt)
            total_censored += c
        # survival is a non-increasing step function from (near) 1
        surv = [r["survival"] for r in rows]
        assert all(a >= b for a, b in zip(surv, surv[1:]))
    # the horizon must right-censor a real tail, or the estimator
    # degenerates to the naive latency histogram
    assert total_censored > 0

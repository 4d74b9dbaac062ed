"""Bradley–Terry brand strengths vs an independent float MM fit."""

import numpy as np
import pandas as pd

from etl_mini_dw_spark.plans import preference


def _float_mm(sf_dir: str):
    """Same duel mining + MM update, but in plain float (no fixed point)."""
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_quantity"]
    )
    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    oq = (
        li.merge(part, left_on="l_partkey", right_on="p_partkey")
        .groupby(["l_orderkey", "p_brand"], as_index=False)["l_quantity"]
        .sum()
    )
    m = oq.merge(oq, on="l_orderkey", suffixes=("_a", "_b"))
    m = m[(m["p_brand_a"] != m["p_brand_b"]) & (m["l_quantity_a"] != m["l_quantity_b"])]
    duels = (
        m.assign(win=(m["l_quantity_a"] > m["l_quantity_b"]).astype(int))
        .groupby(["p_brand_a", "p_brand_b"])
        .agg(n=("win", "size"), w=("win", "sum"))
        .reset_index()
    )
    brands = sorted(duels["p_brand_a"].unique())
    idx = {b: k for k, b in enumerate(brands)}
    N = np.zeros((len(brands), len(brands)))
    W = np.zeros(len(brands))
    G = np.zeros(len(brands))
    for _, r in duels.iterrows():
        i, j = idx[r["p_brand_a"]], idx[r["p_brand_b"]]
        N[i, j] = r["n"]
        W[i] += r["w"]
        G[i] += r["n"]
    pi = np.ones(len(brands))
    for _ in range(preference.BT_ROUNDS):
        denom = np.array(
            [sum(N[i, j] / (pi[i] + pi[j]) for j in range(len(brands)) if N[i, j]) for i in range(len(brands))]
        )
        pi = W / denom
        pi = pi * len(brands) / pi.sum()
    return brands, idx, pi, W, G


def test_bt_matches_float_mm(spark, sf_dir):
    got = {r["brand"]: r for r in preference.bradley_terry_brands(spark, sf_dir).collect()}
    brands, idx, pi, W, G = _float_mm(sf_dir)
    assert set(got) == set(brands)
    for b in brands:
        r = got[b]
        assert r["n_games"] == int(G[idx[b]])
        assert r["n_wins"] == int(W[idx[b]])
        # integer fixed-point (1e-6 quantization per round) vs float MM
        assert abs(r["strength"] - pi[idx[b]]) < 1e-3, b
    # normalization: mean strength 1 (up to floor-division slack)
    mean_s = sum(r["strength"] for r in got.values()) / len(got)
    assert abs(mean_s - 1.0) < 1e-4
    # ranks are a permutation ordered by strength desc
    ranks = sorted(got.values(), key=lambda r: r["bt_rank"])
    assert [r["bt_rank"] for r in ranks] == list(range(1, len(got) + 1))
    strengths = [r["strength"] for r in ranks]
    assert all(a >= b for a, b in zip(strengths, strengths[1:]))

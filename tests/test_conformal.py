"""Split-conformal coverage vs an independent numpy replication and the
finite-sample guarantee itself."""

import numpy as np
import pandas as pd

from etl_mini_dw_spark.plans import conformal


def test_conformal_matches_numpy_and_covers(spark, sf_dir):
    got = {r["alpha"]: r for r in conformal.conformal_coverage(spark, sf_dir).collect()}
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
    )
    h = (li["l_orderkey"].astype(np.int64) * conformal.HASH_MULT) % conformal.HASH_MOD
    role = np.where(
        h < conformal.CONF_TRAIN_CUT, "train",
        np.where(h < conformal.CONF_CAL_CUT, "cal", "test"),
    )
    y = (li["l_extendedprice"].astype(float) * 100).round().astype(np.int64)
    q = li["l_quantity"].astype(float)
    train = pd.DataFrame({"q": q[role == "train"], "y": y[role == "train"]})
    model = {qq: int(g["y"].sum()) // len(g) for qq, g in train.groupby("q")}
    cal_r = np.sort(
        np.abs(y[role == "cal"] - np.array([model[x] for x in q[role == "cal"]]))
    )
    test_r = np.abs(y[role == "test"] - np.array([model[x] for x in q[role == "test"]]))
    for label, num, den in conformal.CONF_ALPHAS:
        r = got[label]
        n_cal = len(cal_r)
        k = ((n_cal + 1) * num + den - 1) // den
        qhat = int(cal_r[k - 1])
        assert r["n_cal"] == n_cal and r["k"] == k
        assert r["qhat_c"] == qhat, label
        cov = float((test_r <= qhat).mean())
        assert abs(r["coverage"] - cov) < 1e-6
        # the split-conformal guarantee, with binomial slack on n_test
        alpha = num / den
        slack = 4 * (alpha * (1 - alpha) / len(test_r)) ** 0.5
        assert r["coverage"] >= alpha - slack, (label, r["coverage"])

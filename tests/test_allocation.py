"""Largest-remainder penny allocation vs an independent pandas
implementation, plus the op's own exactness invariants."""

import numpy as np
import pandas as pd

from etl_mini_dw_spark.plans import allocation


def _naive_alloc(sf_dir: str) -> dict[int, list[int]]:
    """Per-order sorted allocation multiset via a plain python loop."""
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    fee = {
        int(k): (int(round(t * 100)) * allocation.FEE_PERMILLE) // 1000
        for k, t in zip(orders["o_orderkey"], orders["o_totalprice"].astype(float))
    }
    out: dict[int, list[int]] = {}
    w = (li["l_extendedprice"].astype(float) * 100).round().astype(np.int64)
    for ok, grp in pd.DataFrame({"ok": li["l_orderkey"], "w": w}).groupby("ok"):
        T = fee[int(ok)]
        W = int(grp["w"].sum())
        base = [(T * int(x)) // W for x in grp["w"]]
        rems = [(T * int(x)) % W for x in grp["w"]]
        rem = T - sum(base)
        # +1 to the rem largest remainders (any tie choice — multiset only)
        order = sorted(range(len(base)), key=lambda i: -rems[i])
        alloc = list(base)
        for i in order[:rem]:
            alloc[i] += 1
        out[int(ok)] = sorted(alloc)
    return out


def test_penny_allocation_invariants_and_multiset(spark, sf_dir):
    rows = allocation.penny_allocation_audit(spark, sf_dir).collect()
    assert rows, "audit must produce rows"
    for r in rows:
        assert r["n_mismatch"] == 0, r
        assert r["alloc_c"] == r["fee_c"], r
    expect = _naive_alloc(sf_dir)
    # independent check of the aggregate columns from the naive multisets
    by_n: dict[int, dict] = {}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    n_lines = li.groupby("l_orderkey").size()
    for ok, allocs in expect.items():
        n = int(n_lines[ok])
        agg = by_n.setdefault(n, {"n_orders": 0, "alloc": 0, "spread": 0})
        agg["n_orders"] += 1
        agg["alloc"] += sum(allocs)
        agg["spread"] = max(agg["spread"], allocs[-1] - allocs[0])
    got = {r["n_lines"]: r for r in rows}
    assert set(got) == set(by_n)
    for n, e in by_n.items():
        r = got[n]
        assert r["n_orders"] == e["n_orders"], n
        assert r["alloc_c"] == e["alloc"], n
        assert r["max_spread_c"] == e["spread"], n

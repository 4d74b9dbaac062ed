"""Dyadic-decay trending leaderboard vs an independent pandas replay."""

import numpy as np
import pandas as pd

from etl_mini_dw_spark.plans import behavior


def test_trending_parts_matches_pandas(spark, sf_dir):
    got = behavior.trending_parts(spark, sf_dir).collect()
    assert len(got) == behavior.TREND_TOP_K
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_quantity"]
    )
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    ref = pd.Timestamp(behavior.TREND_REF_DATE)
    age_hl = (
        (ref - m["o_orderdate"].dt.normalize()).dt.days // behavior.TREND_HALFLIFE_DAYS
    ).astype(int)
    qty_c = (m["l_quantity"].astype(float) * 100).round().astype(np.int64)
    # python ints per row: scores can exceed int64
    weight = [
        (1 << (behavior.TREND_MAX_HL - int(a))) if a < behavior.TREND_MAX_HL else 0
        for a in age_hl
    ]
    df = pd.DataFrame(
        {
            "pk": m["l_partkey"],
            "wq": [int(q) * int(w) for q, w in zip(qty_c, weight)],
            "recent": np.where(age_hl < 1, qty_c, 0),
            "qty": qty_c,
        }
    )
    agg = df.groupby("pk").agg(
        score=("wq", "sum"), recent=("recent", "sum"), qty=("qty", "sum")
    )
    top = sorted(agg.itertuples(), key=lambda r: (-r.score, r.Index))[
        : behavior.TREND_TOP_K
    ]
    for rank, (r, e) in enumerate(zip(got, top), start=1):
        assert r["trend_rank"] == rank
        assert r["p_partkey"] == e.Index
        assert int(r["score"]) == int(e.score), rank
        assert r["recent_qty_c"] == int(e.recent)
        assert r["total_qty_c"] == int(e.qty)

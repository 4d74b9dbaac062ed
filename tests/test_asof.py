"""Unit tests for the generic union-merge as-of join (operators/asof.py).

The oracle-parity test covers the events⋈orders instantiation; these
cover the operator's edge semantics on hand-built frames:
- left row with no preceding right row → NULL payload (left-join shape)
- inclusive match at equal timestamps
- tie-break picks the greatest tie column among equal-ts right rows
- a legitimately-NULL right attribute is NOT forward-filled past its row
  (the payload travels as one struct)
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from etl_mini_dw_spark.operators.asof import asof_join


def _ts(day: int, hour: int = 0) -> datetime:
    return datetime(2024, 1, day, hour)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lts=_ts(1), lid=1),   # before any right row → NULLs
            Row(k="a", lts=_ts(5), lid=2),   # equal-ts → inclusive match
            Row(k="a", lts=_ts(9), lid=3),   # after both → latest wins
            Row(k="b", lts=_ts(9), lid=4),   # key with no right rows at all
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=_ts(5), rid=10, attr="x"),
            Row(k="a", rts=_ts(5), rid=11, attr=None),  # tie: higher rid, NULL attr
            Row(k="a", rts=_ts(7), rid=12, attr="z"),
        ]
    )
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", tie_break="rid"
        ).collect()
    }
    assert out[1]["rid"] is None and out[1]["attr"] is None
    # equal ts is inclusive; tie-break rid=11 > rid=10 wins, and its NULL
    # attr must come through as NULL (not filled from rid=10's 'x')
    assert out[2]["rid"] == 11 and out[2]["attr"] is None
    assert out[3]["rid"] == 12 and out[3]["attr"] == "z"
    assert out[4]["rid"] is None
    assert len(out) == 4


def test_asof_join_rejects_column_clash(spark):
    left = spark.createDataFrame([Row(k="a", lts=_ts(1), dup=1)])
    right = spark.createDataFrame([Row(k="a", rts=_ts(1), dup=2)])
    try:
        asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
        raise AssertionError("expected ValueError on payload collision")
    except ValueError as e:
        assert "dup" in str(e)

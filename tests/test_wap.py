"""Write-audit-publish: a failing audit must leave the published
generation untouched; a passing audit swaps atomically."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.etl.orchestrate import Warehouse, publish_guarded


def _dup_check(df):
    return df.groupBy("k").count().filter(F.col("count") > 1)


def test_wap_blocks_bad_candidate_and_keeps_prior(spark, sf_dir, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "dw"), sf_dir)
    good = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    res = publish_guarded(wh, good, "t", {"dup_k": _dup_check})
    assert res == {"published": True, "violations": {"dup_k": 0}}
    assert sorted(r.k for r in wh.table("t").collect()) == [1, 2]

    bad = spark.createDataFrame([(7, "x"), (7, "y")], ["k", "v"])
    res = publish_guarded(wh, bad, "t", {"dup_k": _dup_check})
    assert res["published"] is False and res["violations"]["dup_k"] == 1
    # prior generation still the visible one
    assert sorted(r.k for r in wh.table("t").collect()) == [1, 2]

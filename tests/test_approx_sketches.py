"""Approximate aggregates (HLL / t-digest): sanity vs exact answers.

Not oracle-hashable (approximation is engine-specific by design), so the
contract here is tolerance vs the exact operator — the property a user
actually relies on at 100 TB, where approx_count_distinct's fixed-size
sketch replaces a full distinct shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    li = typed_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1, (exact, approx)


def test_percentile_approx_close_to_exact(spark, sf_dir):
    ev = typed_table(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v")
    )
    exact = ev.select(F.expr("percentile(v, 0.5)")).first()[0]
    approx = ev.select(F.percentile_approx("v", 0.5, 10000)).first()[0]
    assert abs(approx - exact) <= max(1.0, 0.05 * abs(exact)), (exact, approx)

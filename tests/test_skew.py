"""Salted aggregation/join produce identical results to unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.operators.skew import salted_agg, salted_join
from etl_mini_dw_spark.sources.tables import typed_table


def test_salted_agg_matches_plain(spark, sf_dir):
    li = typed_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_agg(
        li,
        "l_returnflag",
        aggs=[F.sum("l_quantity").alias("ps"), F.count(F.lit(1)).alias("pn")],
        final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
    )
    a = {r["l_returnflag"]: (r["s"], r["n"]) for r in plain.collect()}
    b = {r["l_returnflag"]: (r["s"], r["n"]) for r in salted.collect()}
    assert a == b


def test_salted_join_matches_plain(spark, sf_dir):
    li = typed_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity"
    )
    part = typed_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = li.join(part, on="p_partkey").groupBy("p_brand").count()
    salted = salted_join(li, part, "p_partkey").groupBy("p_brand").count()
    a = {r["p_brand"]: r["count"] for r in plain.collect()}
    b = {r["p_brand"]: r["count"] for r in salted.collect()}
    assert a == b

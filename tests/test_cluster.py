"""Deterministic k-means + generic connected components (round-2 ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.functions import cluster
from etl_mini_dw_spark.functions.dedup import components_from_pairs


def test_kmeans_deterministic_and_bounded(spark, sf_dir):
    a = cluster.kmeans_assign(spark, sf_dir)
    b = cluster.kmeans_assign(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    row = a.agg(
        F.countDistinct("cluster").alias("k"),
        F.count("*").alias("n"),
        F.min("dist").alias("dmin"),
    ).first()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert row["n"] == n_vecs  # every vector assigned exactly once
    assert row["k"] <= cluster.K
    assert row["dmin"] >= 0


def test_kmeans_improves_or_holds_quantization_error(spark, sf_dir):
    """ITERS rounds must not increase total squared distance vs the
    seed assignment (k-means monotonicity, integer rounding aside)."""
    vecs = cluster._quantized(spark, sf_dir)
    seeds = vecs.filter(F.col("vec_id") < cluster.K).select(
        F.col("vec_id").alias("cluster"), F.col("qv").alias("cv")
    )
    sse0 = cluster._assign(vecs, seeds).agg(F.sum("dist")).first()[0]
    sse2 = cluster.kmeans_assign(spark, sf_dir).agg(F.sum("dist")).first()[0]
    assert sse2 <= sse0


def test_components_from_pairs_synthetic(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "doc_a bigint, doc_b bigint"
    )
    got = {
        (r["doc_id"], r["component"])
        for r in components_from_pairs(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)}

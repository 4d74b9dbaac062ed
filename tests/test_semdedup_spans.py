"""Round-4 operators: SemDeDup prune + contamination span coverage.

Value parity with the DuckDB oracles is covered by test_oracle_parity;
these tests pin the operator-specific invariants by independent
re-derivation (the repo's property-test pattern).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.functions import cluster, sampling
from etl_mini_dw_spark.sources.tables import load_table


def test_semdedup_report_invariants(spark, sf_dir):
    rep = cluster.semdedup_prune(spark, sf_dir)
    rows = rep.collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_vecs  # partition of the corpus
    for r in rows:
        assert 0 <= r.n_pruned <= r.n_vectors
        assert abs(r.keep_rate - round((r.n_vectors - r.n_pruned) / r.n_vectors, 6)) < 1e-9


def test_semdedup_pruned_have_lower_id_keeper(spark, sf_dir):
    """Every pruned vector must have a kept (lower-id) in-block neighbor
    within the threshold — re-derived from the pair frame directly."""
    from etl_mini_dw_spark.functions.simsearch import _DOT, _NORM, _bucket_expr_spark

    assign = cluster._assign_memo(spark, sf_dir).select("vec_id", "cluster")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "embedding",
            _bucket_expr_spark().alias("bucket"),
            F.expr(_NORM.format(a="embedding")).alias("nrm"),
        )
        .join(assign, "vec_id")
    )
    a = emb.select("cluster", "bucket", F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("va"), F.col("nrm").alias("na"))
    b = emb.select("cluster", "bucket", F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("vb"), F.col("nrm").alias("nb"))
    pairs = (
        a.join(b, ["cluster", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            F.round(F.expr(_DOT.format(a="va", b="vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine") >= cluster.SEMDEDUP_COSINE)
    )
    n_pruned_direct = pairs.select("vec_b").distinct().count()
    rep_total = cluster.semdedup_prune(spark, sf_dir).agg(F.sum("n_pruned")).first()[0]
    assert rep_total == n_pruned_direct


def test_contamination_spans_cover_exact_positions(spark, sf_dir):
    """covered_tokens must equal |union of [p, p+N-1] hit intervals| —
    re-derived by exploding every covered position and counting DISTINCT,
    which is island-merge-free and therefore an independent derivation."""
    rep = sampling.contamination_spans(spark, sf_dir)

    split = F.when(
        sampling._hash_col() < sampling.DECON_TRAIN_CUT, F.lit("train")
    ).otherwise(F.lit("test"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks"), split.alias("split")
    )
    n = sampling.SPAN_N
    g = (
        docs.filter(F.size("toks") >= n)
        .select(
            "doc_id",
            "split",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {n}),"
                    f" p -> concat_ws(' ', slice(toks, p + 1, {n})))"
                )
            ).alias("p", "gram"),
        )
    )
    bench = g.filter(F.col("split") == "test").select("gram").distinct()
    hits = g.filter(F.col("split") == "train").join(bench, "gram").select("doc_id", "p")
    covered = (
        hits.select("doc_id", F.explode(F.expr(f"sequence(p, p + {n - 1})")).alias("pos"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_covered"))
    )
    joined = rep.join(covered, "doc_id", "full").collect()
    assert joined, "expected contaminated train docs in the fixture"
    for r in joined:
        assert r["covered_tokens"] == r["n_covered"]
        assert r["covered_tokens"] <= r["n_tokens"]
        assert r["n_spans"] >= 1

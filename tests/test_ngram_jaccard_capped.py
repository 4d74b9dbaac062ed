"""Contract tests for the stop-bucket capped LSH verify arm (r8 VERDICT
task #2): the scale-path sibling of ext_ngram_jaccard_neardups, same
mitigation family as the PPJoin's stop-shingle df cap."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_mini_dw_spark.functions import dedup


def test_capped_pairs_are_subset_with_exact_jaccard(spark, sf_dir):
    """Dropping buckets can only REMOVE candidates, never add or rescore:
    every capped output row must appear in the uncapped output with the
    identical exact-Jaccard value (both pre-LIMIT frames compared)."""
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    # subset-of-top-100 comparisons are only sound when nothing was cut
    # by the LIMIT; the fixture stays well under it
    assert len(uncapped) < 100
    capped = dedup.ngram_jaccard_capped_neardups(spark, sf_dir).collect()
    assert capped, "fixture has near-dups; capped arm must keep some"
    for r in capped:
        assert (r.doc_a, r.doc_b) in uncapped
        assert uncapped[(r.doc_a, r.doc_b)] == r.jaccard


def test_bucket_cap_actually_prunes():
    """A cap below a bucket's size must drop exactly that bucket's pairs
    (pinned on a synthetic frame so the rule can't silently no-op)."""
    # 5 docs share signature s1 (bucket size 5 > cap 3); 2 share s2
    from etl_mini_dw_spark.session import get_spark

    spark = get_spark()
    rows = [(i, 0, "s1") for i in range(5)] + [(10, 0, "s2"), (11, 0, "s2")]
    bands = spark.createDataFrame(rows, "doc_id long, band int, band_sig string")

    def pairs(cap):
        sizes = bands.groupBy("band", "band_sig").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        kept = sizes.filter((F.col("_bn") > 1) & (F.col("_bn") <= cap)).drop("_bn")
        return {
            (r.a, r.b)
            for r in bands.join(kept, ["band", "band_sig"])
            .alias("x")
            .join(
                bands.join(kept, ["band", "band_sig"]).alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.band_sig") == F.col("y.band_sig"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
            .collect()
        }

    assert pairs(3) == {(10, 11)}
    assert len(pairs(5)) == 10 + 1  # C(5,2) + the s2 pair


def test_capped_plan_counts_before_collecting(spark, sf_dir):
    """The cap must be applied via the count-first shape: the mega-bucket
    must never reach a collect_list agg buffer. The plan therefore has a
    count aggregate and a join FEEDING the collect_list aggregate."""
    import io
    from contextlib import redirect_stdout

    df = dedup.lsh_candidate_pairs(spark, sf_dir, bucket_cap=dedup.LSH_BUCKET_CAP)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "collect_list" in plan, plan[:3000]
    # the size rule runs on a count aggregate (partial+final pair) that
    # joins back to bands BEFORE any collect_list buffer is built; the
    # uncapped shape has no count agg and no such join
    assert "partial_count" in plan, plan[:3000]

"""Property test for the gaps-and-islands span-union logic shared by
`sampling.contamination_spans` and `dedup.dup_ngram_coverage`: for
fixed-width-W intervals starting at marked positions, the one-lag rule
(break when start gap > W) must compute EXACTLY the length of the
union of [p, p+W-1] intervals — pinned against a brute-force position
set union over 200 seeded-random cases batched into one Spark job."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

W = 8
N_CASES = 200


def _brute_union(ps: list[int]) -> int:
    covered: set[int] = set()
    for p in ps:
        covered.update(range(p, p + W))
    return len(covered)


def test_island_union_matches_bruteforce(spark):
    rng = random.Random(7)
    cases = []
    for cid in range(N_CASES):
        n = rng.randint(1, 40)
        span = rng.choice([W - 1, W, W + 1, 3 * W, 100])  # gap-boundary mix
        ps = sorted(set(rng.randint(0, span) for _ in range(n)))
        cases.append((cid, ps))
    rows = [(cid, p) for cid, ps in cases for p in ps]
    hits = spark.createDataFrame(rows, ["case_id", "p"])

    w = Window.partitionBy("case_id").orderBy("p")
    brk = F.when(F.col("p") - F.lag("p").over(w) > W, F.lit(1)).otherwise(F.lit(0))
    got = {
        r["case_id"]: r["covered"]
        for r in hits.withColumn("brk", brk)
        .withColumn(
            "island",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("case_id", "island")
        .agg((F.max("p") - F.min("p") + F.lit(W)).alias("cov"))
        .groupBy("case_id")
        .agg(F.sum("cov").alias("covered"))
        .collect()
    }
    for cid, ps in cases:
        assert got[cid] == _brute_union(ps), (cid, ps, got[cid], _brute_union(ps))


def test_winnowing_guarantee(spark, sf_dir):
    """Schleimer et al.'s correctness property: every document pair
    sharing a contiguous run of >= K + W - 1 tokens must share at least
    one WINNOWED fingerprint — found independently in pandas, checked
    against the operator's selection stage."""
    import pandas as pd

    from etl_mini_dw_spark.functions import dedup

    span = dedup.WINNOW_K + dedup.WINNOW_W - 1
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    grams = {}
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        grams[r.doc_id] = {
            " ".join(toks[i : i + span]) for i in range(len(toks) - span + 1)
        }
    inv = {}
    for d, gs in grams.items():
        for g in gs:
            inv.setdefault(g, []).append(d)
    sharing_pairs = {
        (a, b)
        for ds in inv.values()
        if len(ds) > 1
        for i, a in enumerate(ds)
        for b in ds[i + 1 :]
    }
    assert sharing_pairs, "fixture sanity: some span-sharing pair exists"
    fps = (
        dedup._winnow_fingerprints(spark, sf_dir)
        .toPandas()
        .groupby("doc_id")
        .fp.apply(set)
        .to_dict()
    )
    for a, b in sharing_pairs:
        shared = fps.get(a, set()) & fps.get(b, set())
        assert shared, (a, b)

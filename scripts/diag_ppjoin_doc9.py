"""One-shot decomposition of the capped PPJoin at the doc30/doc90 step.

SCALE_PROOF_DOC9 read alpha=1.905 for ext_prefix_filter_capped at
1.5M -> 4.5M docs (90s -> 731s) with a one-straggler-task signature.
This script separates the three candidate explanations:

1. candidate VOLUME growth (occupancy transient on the shingle-df
   distribution: kept tokens with df <= cap whose df is still growing
   contribute df^2 terms that grow quadratically until they cross the
   cap) -> measure kept tokens, sum df^2 (the exact candidate count
   before the pair-distinct), and distinct pairs at both scales;
2. per-candidate cost growth (a real defect: verify join skew, GC) ->
   wall divided by candidates must stay flat if the plan is healthy;
3. stage skew (one hot token partition) -> max single-token df^2 share.

Usage: python scripts/diag_ppjoin_doc9.py [--dirs doc30,doc90]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default=".scaledata/doc30,.scaledata/doc90")
    args = ap.parse_args()

    from etl_mini_dw_spark.functions import dedup
    from etl_mini_dw_spark.session import get_spark
    from etl_mini_dw_spark.sources import tables

    spark = get_spark("ppjoin-diag")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    cap = dedup.PREFIX_DF_CAP
    for d in args.dirs.split(","):
        tables._STAGE_MEMO.clear()
        hashed = (
            dedup._shingle_hash_arrays(spark, d)
            .select("doc_id", F.array_distinct("hs").alias("hs"))
            .filter(F.size("hs") > 0)
        )
        tok = hashed.select("doc_id", F.explode("hs").alias("token"))
        df_tab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        t0 = time.perf_counter()
        stats = (
            df_tab.agg(
                F.count(F.lit(1)).alias("n_types"),
                F.sum(F.when(F.col("df") <= cap, 1).otherwise(0)).alias("kept_types"),
                F.sum(
                    F.when(F.col("df") <= cap, F.col("df").cast("bigint") ** 2)
                ).alias("sum_df2_kept"),
                F.max(F.when(F.col("df") <= cap, F.col("df"))).alias("max_kept_df"),
                F.sum(F.col("df")).alias("total_tokens"),
            )
        ).collect()[0]
        t_df = time.perf_counter() - t0
        # actual prefix-join candidate pairs (pre-distinct) and distinct
        tables._STAGE_MEMO.clear()
        t0 = time.perf_counter()
        _, cands = dedup._prefix_candidates(spark, d, df_cap=cap)
        n_cand = cands.count()
        t_cand = time.perf_counter() - t0
        print(
            f"{d}: types={stats['n_types']} kept={stats['kept_types']} "
            f"sum_df2_kept={stats['sum_df2_kept']} max_kept_df={stats['max_kept_df']} "
            f"tokens={stats['total_tokens']} t_df={t_df:.1f}s "
            f"cands={n_cand} t_cand={t_cand:.1f}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Measured scaling exponents for the heaviest operators (SCALE_PROOF.md).

SCALE.md argues the 100 TB story from plan shapes; this harness measures
it: each selected registry query runs against two generator-identical
datasets 10x apart in size (scripts/gen_scale_data.py), min-of-N wall
floors per (op, scale), and the fitted exponent

    alpha = log(t_big / t_small) / log(size_big / size_small)

is recorded per op. alpha <= ~1 means linear (shuffle-bound lines may
read ~1.1 from the n*log n sort term); alpha >> 1 is a scale-killer
(e.g. an accidental all-pairs would read ~2). Local fixed overhead
(~0.5-1.5 s per action) deflates alpha for fast ops, so small-side
floors < 1 s are flagged low-confidence rather than trusted.

The shared stage memos (sources.tables._STAGE_MEMO) are cleared before
EVERY run so each measurement bills an operator's full standalone cost
— staged builds included — making the two scales comparable.

    python scripts/scale_proof.py --small /root/repo/.scaledata/sf0.1 \
        --big /root/repo/.scaledata/sf1 --reps 3 --out SCALE_PROOF.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the ~15 heaviest / most scale-critical operators (r7 VERDICT task #1):
# fact loads, every dedup candidate generator, retrieval, ANN/PQ, the
# reconciliation digest, the stats heavyweights, and the two rewritten
# boundary-quantile plans whose no-global-sort claim is new this round
DEFAULT_OPS = [
    "fact_sales_initial",
    "fact_sales_two_phase",
    "ext_dedup_exact",
    "ext_minhash_lsh_pairs",
    "ext_prefix_filter_neardups",
    "ext_simhash64_neardups",
    "ext_ngram_jaccard_neardups",
    "ext_bm25_topk",
    "ext_rrf_hybrid_topk",
    "ext_ivf_multiprobe_topk",
    "ext_ann_pq_topk",
    "ext_semdedup_prune",
    "ext_fact_diff_digest",
    "ext_spearman_rank_matrix",
    "ext_part_golden_records",
    "ext_gopher_rule_filter",
    "ext_customer_rfm_segments",
    "ext_abc_xyz_matrix",
    # late-r8 additions (first measured in SCALE_PROOF_R8B.json)
    "ext_embedding_label_drift",
    "ext_mmr_diverse_topk",
    "ext_bootstrap_ci_revenue",
    "ext_item_item_similarity",
    "ext_forecast_reconciliation",
    # continuation-session additions (first measured in SCALE_PROOF_R8C.json)
    "ext_degree_assortativity",
    "ext_distinctive_terms",
    "ext_jl_projection_audit",
    "ext_permutation_test_lift",
    "ext_group_sequential_lift",
    "ext_zipf_fit",
    "ext_lorenz_concentration",
]


def _clear_memos() -> None:
    from etl_mini_dw_spark.sources import tables

    tables._STAGE_MEMO.clear()


def _time_once(spark, name: str, sf_dir: str) -> float:
    from etl_mini_dw_spark.registry import QUERIES

    _clear_memos()
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/repo/.scaledata/sf0.1")
    ap.add_argument("--big", default="/root/repo/.scaledata/sf1")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ops", default="", help="comma-separated override")
    ap.add_argument("--out", default="SCALE_PROOF.json")
    args = ap.parse_args()
    ops = [o for o in args.ops.split(",") if o] or DEFAULT_OPS

    from etl_mini_dw_spark.session import get_spark

    try:
        load_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_start = -1.0
    spark = get_spark("etl_mini_dw_spark-scale-proof")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    def _dump(results: dict) -> None:
        # written after EVERY op: a mid-run crash (e.g. an op whose big-
        # scale shuffle spill fills the disk — bm25 at 500k flat-vocab
        # docs did exactly that) must not lose completed measurements
        try:
            load_now = round(os.getloadavg()[0], 2)
        except OSError:
            load_now = -1.0
        out = {
            "ratio": args.ratio,
            "reps": args.reps,
            "small_dir": args.small,
            "big_dir": args.big,
            "machine_load_avg_1m_at_start": load_start,
            "machine_load_avg_1m_at_end": load_now,
            "ops": results,
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)

    results: dict[str, dict] = {}
    for name in ops:
        row: dict = {}
        for tag, sf_dir in (("small", args.small), ("big", args.big)):
            floor = min(
                _time_once(spark, name, sf_dir) for _ in range(args.reps)
            )
            row[tag] = round(floor, 3)
            print(f"{name} [{tag}]: {row[tag]} s", flush=True)
        alpha = math.log(row["big"] / row["small"]) / math.log(args.ratio)
        row["alpha"] = round(alpha, 3)
        row["low_confidence"] = row["small"] < 1.0
        results[name] = row
        print(f"{name}: alpha={row['alpha']}", flush=True)
        _dump(results)
    bad = [n for n, r in results.items() if r["alpha"] > 1.3 and not r["low_confidence"]]
    print(f"\nscale_proof: {len(results)} ops, superlinear (>1.3): {bad}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Measure isolated min-of-N floors for named registry queries.

Same methodology as the FLOORS table in bench.py: JVM warmed, shared
stage memos warmed first (so per-query lines measure the query's own
plan, not staged builds), min of N noop-forced runs per query, machine
expected idle (check the printed load). Prints a FLOORS-ready dict
fragment to paste into bench.py.

    python scripts/floor_queries.py --reps 3 name1 name2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench
    from etl_mini_dw_spark.registry import QUERIES
    from etl_mini_dw_spark.session import get_spark

    try:
        print(f"# start load {os.getloadavg()[0]:.2f}")
    except OSError:
        pass
    spark = get_spark("etl_mini_dw_spark-floors")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for _, fn in bench._memo_warmers():
        for frame in fn(spark, SF_DIR):
            frame.count()

    for name in args.names:
        if name not in QUERIES:
            print(f"    # {name}: NOT IN REGISTRY")
            continue
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        print(f'    "{name}": {best:.2f},', flush=True)
    try:
        print(f"# end load {os.getloadavg()[0]:.2f}")
    except OSError:
        pass


if __name__ == "__main__":
    main()

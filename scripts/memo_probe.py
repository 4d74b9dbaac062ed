"""Isolated timing of individual memo-warmer lines (bench.py phase 1).

Replicates exactly what bench.py bills to a `memo:<label>` line — build
the staged frame(s) and force with .count() — in a fresh process, after
the same JVM warm-up. One process per invocation so the stage memo is
cold (it is keyed on applicationId). Prints one JSON line.

    python scripts/memo_probe.py dim_states fact_initial_resolved
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("labels", nargs="+")
    ap.add_argument(
        "--warm-first",
        default="",
        help="comma-separated warmer labels to run (untimed) before the timed ones",
    )
    args = ap.parse_args()

    import bench
    from etl_mini_dw_spark.session import get_spark

    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = -1.0
    spark = get_spark("etl_mini_dw_spark-memoprobe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    warmers = dict((label, fn) for label, fn in bench._memo_warmers())
    for label in [x for x in args.warm_first.split(",") if x]:
        for frame in warmers[label](spark, SF_DIR):
            frame.count()

    out: dict[str, float] = {}
    for label in args.labels:
        t0 = time.perf_counter()
        for frame in warmers[label](spark, SF_DIR):
            frame.count()
        out[label] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"load_at_start": load0, "cpus": spark.sparkContext.defaultParallelism, "timings": out}))


if __name__ == "__main__":
    main()

"""Capture .explain("formatted") for named registry queries to files.

    python scripts/capture_plan.py --tag before --out plans/r09 name1 name2 ...

PySpark 4.1.2 has no public explainString accessor; redirect stdout
around df.explain("formatted") (CLAUDE.md session quirk).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default="plans/r09")
    args = ap.parse_args()

    from etl_mini_dw_spark.registry import QUERIES
    from etl_mini_dw_spark.session import get_spark

    spark = get_spark("etl_mini_dw_spark-plans")
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        if name not in QUERIES:
            print(f"# {name}: NOT IN REGISTRY")
            continue
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()

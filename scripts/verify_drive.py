"""Fresh-process end-to-end drive of the public surface (__spark_entry__.py).

Replicates the external driver: entry() smoke at sf0.001, then every
queries()[name] vs oracle_sql()[name] via DuckDB at sf0.01 (row count +
sorted column names + order-insensitive stringified values). Exits
non-zero on any mismatch. Run as:

    timeout 1800 python scripts/verify_drive.py [--sf /root/testdata/sf0.01] [-k substr[,substr...]]
"""

from __future__ import annotations

import argparse
import importlib.util
import math
import sys
from datetime import date, datetime
from decimal import Decimal


def _canon_cell(v):
    """Engine-neutral cell canonicalization (same rules as
    tests/oracle_harness.py): raw str() of numpy arrays is width-padded
    and list-vs-ndarray sensitive — variable-length array columns
    (posting heads, signatures) false-FAIL without this."""
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            v = v.tolist()
        elif isinstance(v, np.generic):
            v = v.item()
    except ImportError:
        pass
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--smoke-sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "-k",
        default="",
        help="only run queries whose name contains one of these comma-separated substrings",
    )
    ap.add_argument(
        "--first",
        type=int,
        default=0,
        help="only run the first N queries() entries (driver window replica)",
    )
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    rows = mod.entry(spark).collect()
    print(f"SMOKE entry(): {len(rows)} rows", flush=True)
    assert len(rows) >= 0

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    failed, skipped = [], []
    pats = [p for p in args.k.split(",") if p] or [""]
    names = [n for n in qs if any(p in n for p in pats)]
    if args.first:
        names = names[: args.first]
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            if name not in osql:
                print(f"[{i+1}/{len(names)}] {name}: rows-only ({len(sdf)})", flush=True)
                skipped.append(name)
                continue
            odf = con.execute(osql[name]).fetchdf()
            ok_rows = len(sdf) == len(odf)
            ok_cols = sorted(sdf.columns) == sorted(odf.columns)
            ok_vals = False
            if ok_rows and ok_cols:
                cols = sorted(sdf.columns)
                sa = sorted(
                    tuple(_canon_cell(v) for v in r)
                    for r in sdf[cols].itertuples(index=False, name=None)
                )
                ob = sorted(
                    tuple(_canon_cell(v) for v in r)
                    for r in odf[cols].itertuples(index=False, name=None)
                )
                ok_vals = sa == ob
            status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
            print(
                f"[{i+1}/{len(names)}] {name}: {status} "
                f"(rows {len(sdf)}/{len(odf)} cols={ok_cols} vals={ok_vals})",
                flush=True,
            )
            if status == "FAIL":
                failed.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"[{i+1}/{len(names)}] {name}: ERROR {type(e).__name__}: {e}", flush=True)
            failed.append(name)
    print(
        f"\nverify_drive: {len(names) - len(failed) - len(skipped)} ok, "
        f"{len(skipped)} rows-only, {len(failed)} FAILED of {len(names)}"
    )
    if failed:
        print("FAILED:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

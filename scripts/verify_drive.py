"""Fresh-process end-to-end drive of the public surface (__spark_entry__.py).

Replicates the external driver: entry() smoke at sf0.001, then every
queries()[name] vs oracle_sql()[name] via DuckDB at sf0.01 (row count +
sorted column names + order-insensitive stringified values). Exits
non-zero on any mismatch. This is the /verify recipe from
.claude/skills/verify/SKILL.md, runnable as:

    timeout 1800 python scripts/verify_drive.py [--sf /root/testdata/sf0.01] [-k substr]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--smoke-sf", default="/root/testdata/sf0.001")
    ap.add_argument("-k", default="", help="only run queries whose name contains this")
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
    names = [n for n in qs if args.k in n]
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
                sa = sorted(map(str, sdf[cols].itertuples(index=False, name=None)))
                ob = sorted(map(str, odf[cols].itertuples(index=False, name=None)))
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

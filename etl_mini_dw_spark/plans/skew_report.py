"""Key-skew diagnostics: the pre-join report behind every salting decision.

`operators/skew.py` FIXES skew (salted aggregation/join); this measures
it — per (table, key): row count, distinct keys, max per-key frequency,
top-1 share, and the skew ratio (max frequency vs the uniform
expectation). At 100 TB this report is what tells you WHICH join keys
need salting / AQE skew thresholds before the job runs, instead of
discovering a 4-hour straggler task in production.

Shape: one groupBy per audited key (partial-aggregable) reduced to a
1-row stats frame, unioned long-form — constant-size output. All
integer/decimal-exact; the two ratios are round-6 doubles from exact
inputs (the repo convention).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

AUDITED_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
    ("events", "event_type"),
]


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = []
    for table, key in AUDITED_KEYS:
        freq = (
            typed_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        stats = freq.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").cast("bigint").alias("max_freq"),
        ).select(
            F.lit(f"{table}.{key}").alias("key"),
            "n_rows",
            "n_keys",
            "max_freq",
            F.round(
                F.col("max_freq").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("top1_share"),
            # max frequency vs uniform expectation (n_rows / n_keys)
            F.round(
                (F.col("max_freq").cast("double") * F.col("n_keys").cast("double"))
                / F.col("n_rows").cast("double"),
                6,
            ).alias("skew_ratio"),
        )
        frames.append(stats)
    return reduce(lambda a, b: a.unionByName(b), frames)


def key_skew_report_sql() -> str:
    parts = []
    for table, key in AUDITED_KEYS:
        src = table
        if table == "events":
            src = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events"
        parts.append(f"""
SELECT '{table}.{key}' AS key,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       COUNT(*) AS n_keys,
       CAST(MAX(c) AS BIGINT) AS max_freq,
       round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top1_share,
       round((CAST(MAX(c) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))
             / CAST(SUM(c) AS DOUBLE), 6) AS skew_ratio
FROM (SELECT {key}, COUNT(*) AS c FROM {src} GROUP BY 1)""")
    return "\nUNION ALL\n".join(parts)

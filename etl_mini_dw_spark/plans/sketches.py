"""Mergeable approximate sketches for pre-aggregated rollups (extension).

THE 100 TB distinct-count pattern: you cannot afford a full distinct
shuffle per (dashboard filter × time range), so the warehouse stores a
fixed-size HLL sketch per finest grain (day × event_type here) and every
coarser rollup MERGES sketches instead of touching raw data — the
classic Druid/Snowflake/BigQuery materialized-rollup design. Spark 3.5+
ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``), all JVM-side partial
aggregates with map-side combine.

Not oracle-hashable by design (the estimate is engine-specific), so the
driver does a rows-only check; the REAL contracts — estimate within rsd
tolerance of the exact count, and merge-of-daily-sketches ≡ one-shot
sketch (the property that makes stored rollups trustworthy) — are pinned
by tests/test_approx_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

HLL_LGK = 14  # 2^14 registers ≈ 0.8% rsd, ~16 KB per sketch


def _daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finest-grain stored rollup: one user-HLL per (day, event_type)."""
    ev = typed_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("user_sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type, computed by MERGING daily sketches.

    Raw data is touched exactly once (the daily grain); the per-type
    answer is a union of ~days sketches — the query a 100 TB dashboard
    actually runs. Exact counterpart for the tolerance test:
    ``countDistinct(user_id) GROUP BY event_type``.
    """
    return (
        _daily_sketches(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("user_sketch", F.lit(False))
            ).alias("approx_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).alias("n_day_sketches"),
        )
    )

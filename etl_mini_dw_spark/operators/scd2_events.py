"""Event-sourced SCD2: rebuild histories from change events; splice late data.

The warehouse-merge loader in `operators/scd2.py` mirrors the reference's
close-out/insert procedures (`code/SQL_1…sql:915–1327`) and assumes edits
arrive in watermark order. Real feeds don't: an upstream outage delivers a
partition of OLD changes after newer ones already loaded, and a
merge-style loader cannot splice a version into the middle of closed
history. The production answer is event-sourcing: keep the attribute
change *events* (nk, attrs, effective-ts) + delete tombstones, and derive
validity windows with a single ``lead()`` — then late data is handled by
REBUILDING exactly the affected keys from their merged event streams,
leaving every other key's rows (and surrogate keys) untouched.

Scale shape: window derivation is one shuffle on nk with per-key
partitions of a few versions; the retro-correction touches
|affected-keys| rows only (semi/anti joins on nk, broadcast-sized in any
realistic late batch) — never a full-dimension rewrite. All engine-exact:
timestamps ordered, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.fixtures_spec import ATTR_TYPES, DIMS, HIGH, DimSpec, attr_cols
from etl_mini_dw_spark.oracle.fixture_sql import _warehouse_shape_sql, versions_sql
from etl_mini_dw_spark.sources import staging


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp")


def _null_attrs(dim: DimSpec) -> list[Column]:
    return [
        F.lit(None).cast("int" if ATTR_TYPES[a] == "int" else "string").alias(a)
        for a in attr_cols(dim)
    ]


def events_from_versions(shaped: DataFrame, dim: DimSpec) -> DataFrame:
    """Versioned rows → change events: one attribute event per version at
    its ``valid_from``, plus a delete tombstone at every GAP END — any
    closed ``valid_to`` that is not some version's ``valid_from`` for the
    same key. On contiguous histories that is exactly the final close
    (the original end-of-history rule), but it also round-trips
    delete-then-reinsert histories: without the mid-history tombstone the
    re-derivation would stretch the pre-gap version across the gap
    (found by ``tests/test_scd2_events_property.py``). Gap-end timestamps
    can never collide with a ``valid_from``, so the (event_ts, tomb)
    window ordering needs no tie-rule change."""
    attrs = attr_cols(dim)
    attr_ev = shaped.select(
        dim.nk,
        *attrs,
        F.col("valid_from").alias("event_ts"),
        F.lit(False).alias("tomb"),
    )
    starts = shaped.select(dim.nk, F.col("valid_from").alias("event_ts")).distinct()
    tombs = (
        shaped.filter(F.col("valid_to") < _ts(HIGH))
        .select(dim.nk, F.col("valid_to").alias("event_ts"))
        .join(starts, [dim.nk, "event_ts"], "left_anti")
        .select(dim.nk, *_null_attrs(dim), "event_ts", F.lit(True).alias("tomb"))
    )
    return attr_ev.unionByName(tombs)


def scd2_from_events(events: DataFrame, dim: DimSpec) -> DataFrame:
    """Derive validity windows: ``active_to`` = next event's ts (tombstones
    close the previous version and then vanish); open tail = current.

    Events must be unique per (nk, event_ts) — idempotent re-delivery is
    deduped upstream (an exact-dedup groupBy, `functions/dedup.py`).
    """
    w = Window.partitionBy(dim.nk).orderBy("event_ts", "tomb")
    with_to = events.withColumn(
        "active_to", F.coalesce(F.lead("event_ts").over(w), _ts(HIGH))
    )
    return with_to.filter(~F.col("tomb")).select(
        dim.nk,
        *attr_cols(dim),
        F.col("event_ts").alias("active_from"),
        "active_to",
        (F.col("active_to") == _ts(HIGH)).alias("is_current"),
    )


def scd2_retro_correct(
    windows: DataFrame, late_events: DataFrame, dim: DimSpec
) -> DataFrame:
    """Splice a LATE event batch into existing SCD2 history.

    Keys untouched by the late batch pass through unchanged; affected keys
    are rebuilt from (their existing windows re-expressed as events) ∪
    (the late events). Truncation, mid-history insertion, and
    late-tombstone close-out all fall out of the single window
    re-derivation — no case analysis, which is exactly why the
    event-sourced form is the robust one.
    """
    affected = late_events.select(dim.nk).distinct()
    untouched = windows.join(affected, dim.nk, "left_anti")
    touched = windows.join(affected, dim.nk, "left_semi")
    shaped_back = touched.select(
        dim.nk,
        *attr_cols(dim),
        "is_current",
        F.col("active_from").alias("valid_from"),
        F.col("active_to").alias("valid_to"),
    )
    merged = events_from_versions(shaped_back, dim).unionByName(late_events)
    return untouched.unionByName(scd2_from_events(merged, dim))


def customer_late_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked scenario: the ARCHIVE partition of the customer edit
    feed arrives late. On-time load sees only live rows (every key one
    open window); the late batch carries the closed v1 versions and the
    deleted keys' full lifecycle. Retro-correction must reproduce the
    true full history — the oracle derives that truth independently.
    """
    dim = DIMS["customer"]
    v = staging.src_versions(spark, sf_dir, dim)
    shaped = staging._warehouse_shape(dim, v)
    on_time = shaped.filter(F.col("is_current"))
    archive = shaped.filter(~F.col("is_current"))
    windows0 = scd2_from_events(events_from_versions(on_time, dim), dim)
    # the late batch: old attribute changes, plus tombstones ONLY for keys
    # with no live row (a tombstone asserts "deleted at ts" — a key whose
    # newer version simply wasn't in THIS batch must not be tombstoned;
    # naively running events_from_versions on the archive alone would
    # close still-live keys with zero-length windows)
    late_attr = archive.select(
        dim.nk,
        *attr_cols(dim),
        F.col("valid_from").alias("event_ts"),
        F.lit(False).alias("tomb"),
    )
    gone = archive.join(on_time.select(dim.nk).distinct(), dim.nk, "left_anti")
    late_tombs = (
        gone.groupBy(dim.nk)
        .agg(F.max("valid_to").alias("event_ts"))
        .select(dim.nk, *_null_attrs(dim), "event_ts", F.lit(True).alias("tomb"))
    )
    corrected = scd2_retro_correct(
        windows0, late_attr.unionByName(late_tombs), dim
    )
    return corrected.select(
        dim.nk,
        *attr_cols(dim),
        F.date_format("active_from", "yyyy-MM-dd HH:mm:ss").alias("active_from"),
        F.date_format("active_to", "yyyy-MM-dd HH:mm:ss").alias("active_to"),
        "is_current",
    )


def customer_late_splice_sql() -> str:
    """Oracle: full event-sourced rebuild over ALL events (= ground truth —
    splicing late data must land exactly here)."""
    dim = DIMS["customer"]
    attrs = ", ".join(attr_cols(dim))
    null_attrs = ", ".join(
        f"CAST(NULL AS {'INTEGER' if ATTR_TYPES[a] == 'int' else 'VARCHAR'}) AS {a}"
        for a in attr_cols(dim)
    )
    return f"""
WITH v AS ({_warehouse_shape_sql(dim, versions_sql(dim))}),
ev AS (
  SELECT {dim.nk}, {attrs}, valid_from AS event_ts, FALSE AS tomb FROM v
  UNION ALL
  SELECT {dim.nk}, {null_attrs}, MAX(valid_to) AS event_ts, TRUE AS tomb
  FROM v GROUP BY {dim.nk} HAVING MAX(valid_to) < TIMESTAMP '{HIGH}'
),
w AS (
  SELECT *, COALESCE(LEAD(event_ts) OVER (PARTITION BY {dim.nk}
                                          ORDER BY event_ts, tomb),
                     TIMESTAMP '{HIGH}') AS active_to
  FROM ev
)
SELECT {dim.nk}, {attrs},
       strftime(event_ts, '%Y-%m-%d %H:%M:%S') AS active_from,
       strftime(active_to, '%Y-%m-%d %H:%M:%S') AS active_to,
       active_to = TIMESTAMP '{HIGH}' AS is_current
FROM w WHERE NOT tomb
"""


# --- Bitemporal as-of matrix --------------------------------------------------

BITEMP_VALID_ASOF = ["1996-06-30", "1997-12-31"]


def bitemporal_asof_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(known_at, valid_asof, category, n_keys): the same valid-time
    snapshot question answered under two TRANSACTION-time states of
    knowledge — the bitemporal query a mono-temporal SCD2 cannot ask.

    `t1_live_only` is the warehouse as first loaded (only the live
    rows had arrived — each key one open window, the late-splice
    scenario's starting state); `t2_full` is after the archive batch
    splices in (ground-truth event-sourced rebuild, the same derivation
    `customer_late_splice` lands on). A key whose v1 only came with the
    archive is MISSING from the t1 reconstruction at an early as-of
    date and present under t2 — i.e. history itself changes along the
    tx axis, and the matrix quantifies by how much, per category, plus
    an ALL rollup row.

    Scale: both reconstructions are the dim-sized event-window
    derivation (one nk-keyed shuffle each); snapshots are filters plus
    GROUPING SETS on dim-sized frames. Facts are never touched.
    Reference parity: extends the reference's SCD2 'current snapshot'
    views (code/SQL_1_Assignment_2_David_Färm.sql:849) with the
    transaction-time axis those views lack by construction.
    """
    dim = DIMS["customer"]
    v = staging.src_versions(spark, sf_dir, dim)
    shaped = staging._warehouse_shape(dim, v)
    on_time = shaped.filter(F.col("is_current"))
    t1 = scd2_from_events(events_from_versions(on_time, dim), dim)
    t2 = scd2_from_events(events_from_versions(shaped, dim), dim)
    snaps = None
    for label, wdf in (("t1_live_only", t1), ("t2_full", t2)):
        for asof in BITEMP_VALID_ASOF:
            s = wdf.filter(
                (F.col("active_from") <= _ts(asof))
                & (F.col("active_to") > _ts(asof))
            ).select(
                F.lit(label).alias("known_at"),
                F.lit(asof).alias("valid_asof"),
                F.col("customer_category_name").alias("category"),
            )
            snaps = s if snaps is None else snaps.unionByName(s)
    return (
        snaps.groupingSets(
            [["known_at", "valid_asof", "category"], ["known_at", "valid_asof"]],
            "known_at",
            "valid_asof",
            "category",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
        .select(
            "known_at",
            "valid_asof",
            F.coalesce(F.col("category"), F.lit("ALL")).alias("category"),
            "n_keys",
        )
        .orderBy("known_at", "valid_asof", "category")
    )


def bitemporal_asof_matrix_sql() -> str:
    dim = DIMS["customer"]
    attrs = ", ".join(attr_cols(dim))
    null_attrs = ", ".join(
        f"CAST(NULL AS {'INTEGER' if ATTR_TYPES[a] == 'int' else 'VARCHAR'}) AS {a}"
        for a in attr_cols(dim)
    )
    snap_selects = []
    for label, tbl in (("t1_live_only", "t1"), ("t2_full", "t2")):
        for asof in BITEMP_VALID_ASOF:
            snap_selects.append(
                f"SELECT '{label}' AS known_at, '{asof}' AS valid_asof,"
                f" customer_category_name AS category FROM {tbl}"
                f" WHERE active_from <= TIMESTAMP '{asof}'"
                f" AND active_to > TIMESTAMP '{asof}'"
            )
    snaps = "\n  UNION ALL\n  ".join(snap_selects)
    return f"""
WITH v AS ({_warehouse_shape_sql(dim, versions_sql(dim))}),
t1 AS (
  SELECT {dim.nk}, {attrs}, valid_from AS active_from,
         TIMESTAMP '{HIGH}' AS active_to
  FROM v WHERE is_current
),
ev AS (
  SELECT {dim.nk}, {attrs}, valid_from AS event_ts, FALSE AS tomb FROM v
  UNION ALL
  SELECT {dim.nk}, {null_attrs}, MAX(valid_to) AS event_ts, TRUE AS tomb
  FROM v GROUP BY {dim.nk} HAVING MAX(valid_to) < TIMESTAMP '{HIGH}'
),
t2 AS (
  SELECT {dim.nk}, {attrs}, event_ts AS active_from, active_to FROM (
    SELECT *, COALESCE(LEAD(event_ts) OVER (PARTITION BY {dim.nk}
                                            ORDER BY event_ts, tomb),
                       TIMESTAMP '{HIGH}') AS active_to
    FROM ev
  ) WHERE NOT tomb
),
snaps AS (
  {snaps}
)
SELECT known_at, valid_asof, COALESCE(category, 'ALL') AS category,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM snaps
GROUP BY GROUPING SETS ((known_at, valid_asof, category),
                        (known_at, valid_asof))
ORDER BY known_at, valid_asof, category
"""

"""Declarative data-contract expectations report (extension).

The Great-Expectations-style suite a warehouse runs on every landed
batch, complementing the structural Stage-5 battery (`plans/
validation.py` — which checks the WAREHOUSE's own invariants) by
checking the SOURCE's contract: ranges, nullability, domain membership,
key uniqueness, referential closure. One report row per expectation:
(check, violations, pass).

Plan shape — the part that matters at 100 TB: all row-level predicates
over one table are folded into a SINGLE conditional-sum aggregate (one
scan, map-side partials), never one pass per check; only the two checks
that need different topology (groupBy uniqueness, anti-join referential)
run their own — still one shuffle each. The report is a union of 1-row
frames: constant-size output regardless of input.

The lineitem PK expectation genuinely FAILS on the driver testdata
(lineitem is not unique on (l_orderkey, l_linenumber) — the quirk
CLAUDE.md warns every total-ordering about): the report proves the suite
actually catches contract breaks, not just prints green.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table


def _cnt(pred: Column) -> Column:
    return F.sum(F.when(pred, 1).otherwise(0)).cast("bigint")


def _report(df: DataFrame) -> DataFrame:
    return df.withColumn("pass", F.col("violations") == 0)


def expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")

    # one scan, all lineitem row-level checks as conditional sums
    li_checks = li.agg(
        _cnt(F.col("l_quantity").isNull() | (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "lineitem_quantity_in_1_50"
        ),
        _cnt(
            F.col("l_discount").isNull()
            | (F.col("l_discount") < 0)
            | (F.col("l_discount") > F.lit("0.50").cast("decimal(4,2)"))
        ).alias("lineitem_discount_in_0_0.5"),
        _cnt(F.col("l_extendedprice") <= 0).alias("lineitem_extendedprice_positive"),
        _cnt(F.col("l_shipdate").isNull()).alias("lineitem_shipdate_not_null"),
    )
    orders_checks = orders.agg(
        _cnt(F.col("o_totalprice") <= 0).alias("orders_totalprice_positive"),
        _cnt(F.col("o_orderdate").isNull()).alias("orders_orderdate_not_null"),
        _cnt(
            ~F.col("o_orderstatus").isin("O", "F", "P") | F.col("o_orderstatus").isNull()
        ).alias("orders_status_in_domain"),
    )

    def _unpivot(agg_df: DataFrame) -> DataFrame:
        cols = agg_df.columns
        stack = ", ".join(f"'{c}', `{c}`" for c in cols)
        return agg_df.select(
            F.expr(f"stack({len(cols)}, {stack}) AS (check, violations)")
        )

    # uniqueness: its own groupBy (can't fold into a scan aggregate)
    pk_dups = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(F.lit("lineitem_pk_unique").alias("check"), "violations")
    )
    # referential closure: anti-join (broadcast the key dictionary at
    # dim scale; here orders is fact-sized so AQE picks the strategy)
    fk_orphans = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(F.lit("lineitem_orderkey_in_orders").alias("check"), "violations")
    )

    frames = [_unpivot(li_checks), _unpivot(orders_checks), pk_dups, fk_orphans]
    return _report(reduce(lambda a, b: a.unionByName(b), frames))


EXPECTATIONS_SQL = """
WITH li AS (
  SELECT SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
                  THEN 1 ELSE 0 END) AS q,
         SUM(CASE WHEN l_discount IS NULL OR l_discount < 0
                       OR CAST(l_discount AS DECIMAL(4,2)) > CAST('0.50' AS DECIMAL(4,2))
                  THEN 1 ELSE 0 END) AS d,
         SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS ep,
         SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS sd
  FROM lineitem
),
o AS (
  SELECT SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS od,
         SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL
                  THEN 1 ELSE 0 END) AS st
  FROM orders
),
pk AS (
  SELECT COUNT(*) AS v FROM (
    SELECT l_orderkey, l_linenumber FROM lineitem
    GROUP BY 1, 2 HAVING COUNT(*) > 1)
),
fk AS (
  SELECT COUNT(*) AS v FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
),
r AS (
  SELECT 'lineitem_quantity_in_1_50' AS check, CAST(q AS BIGINT) AS violations FROM li
  UNION ALL SELECT 'lineitem_discount_in_0_0.5', CAST(d AS BIGINT) FROM li
  UNION ALL SELECT 'lineitem_extendedprice_positive', CAST(ep AS BIGINT) FROM li
  UNION ALL SELECT 'lineitem_shipdate_not_null', CAST(sd AS BIGINT) FROM li
  UNION ALL SELECT 'orders_totalprice_positive', CAST(tp AS BIGINT) FROM o
  UNION ALL SELECT 'orders_orderdate_not_null', CAST(od AS BIGINT) FROM o
  UNION ALL SELECT 'orders_status_in_domain', CAST(st AS BIGINT) FROM o
  UNION ALL SELECT 'lineitem_pk_unique', CAST(v AS BIGINT) FROM pk
  UNION ALL SELECT 'lineitem_orderkey_in_orders', CAST(v AS BIGINT) FROM fk
)
SELECT "check", violations, violations = 0 AS pass FROM r
"""


# --- functional-dependency profiling ----------------------------------------
FD_CHECKS = [
    # (table, determinant cols, dependent col)
    ("customer", ("c_custkey",), "c_nationkey"),
    ("orders", ("o_orderkey",), "o_custkey"),
    ("supplier", ("s_suppkey",), "s_nationkey"),
    ("lineitem", ("l_orderkey", "l_linenumber"), "l_partkey"),
]


def fd_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiler: for each declared X → Y, count the
    determinant values mapping to MORE than one dependent value — the
    schema-inference primitive behind key discovery and denormalization
    checks. The lineitem (orderkey, linenumber) → partkey row genuinely
    fails on this testdata (the PK quirk the expectations suite also
    catches), proving the checker isn't vacuous.

    One partial-aggregable count-distinct per check, keyed by the
    determinant — cardinality-bounded shuffles, unioned into one report.
    """
    out = None
    for table, det, dep in FD_CHECKS:
        df = typed_table(spark, sf_dir, table)
        viol = (
            df.groupBy(*det)
            .agg(F.countDistinct(dep).alias("n_dep"))
            .filter(F.col("n_dep") > 1)
            .agg(F.count(F.lit(1)).alias("n_violating_keys"))
            .select(
                F.lit(table).alias("table_name"),
                F.lit("+".join(det)).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.coalesce(F.col("n_violating_keys"), F.lit(0))
                .cast("bigint")
                .alias("n_violating_keys"),
            )
        )
        out = viol if out is None else out.unionByName(viol)
    return out


FD_VIOLATION_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{table}' AS table_name, '{"+".join(det)}' AS determinant,
       '{dep}' AS dependent,
       CAST(COALESCE(COUNT(*), 0) AS BIGINT) AS n_violating_keys
FROM (
  SELECT {", ".join(det)} FROM {table}
  GROUP BY {", ".join(det)} HAVING COUNT(DISTINCT {dep}) > 1
)"""
    for table, det, dep in FD_CHECKS
)


# --- inclusion-dependency profiling (FK discovery) --------------------------
IND_CHECKS = [
    # (child table, child col, parent table, parent col)
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


def ind_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency profiler: for each declared child ⊆ parent
    column pair, count orphaned child values — FK discovery over the raw
    source schema, the companion of the FD profiler (together they
    recover the star schema's key structure from data alone).

    Each check is a distinct-projection left-anti join: the child side
    reduces to its distinct keys FIRST (partial-aggregable), so the anti
    join compares key sets, never row sets — at 100 TB the anti join's
    inputs are key-cardinality-sized.
    """
    out = None
    for child_t, child_c, parent_t, parent_c in IND_CHECKS:
        child = (
            typed_table(spark, sf_dir, child_t)
            .select(F.col(child_c).alias("k"))
            .filter(F.col("k").isNotNull())  # NULL-key semantics differ
            .distinct()                      # between anti-join and EXCEPT
        )
        parent = typed_table(spark, sf_dir, parent_t).select(
            F.col(parent_c).alias("k")
        ).distinct()
        row = (
            child.join(parent, "k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphan_keys"))
            .select(
                F.lit(f"{child_t}.{child_c}").alias("child"),
                F.lit(f"{parent_t}.{parent_c}").alias("parent"),
                F.coalesce(F.col("n_orphan_keys"), F.lit(0))
                .cast("bigint")
                .alias("n_orphan_keys"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


IND_VIOLATION_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
       CAST(COALESCE(COUNT(*), 0) AS BIGINT) AS n_orphan_keys
FROM (
  SELECT DISTINCT {cc} AS k FROM {ct} WHERE {cc} IS NOT NULL
  EXCEPT
  SELECT DISTINCT {pc} AS k FROM {pt}
)"""
    for ct, cc, pt, pc in IND_CHECKS
)


# --- Benford first-digit audit --------------------------------------------
#
# The forensic data-quality screen: naturally-grown monetary amounts
# follow Benford's law (P(first digit = d) = log10(1 + 1/d)); fabricated
# or truncated feeds don't. Expected shares are ROUND-6 LITERALS (shared
# by both engines — no cross-engine log10 at all); observed shares are
# exact-integer counts with one correctly-rounded <2^53 division each.
#
# Portability: the first digit comes from the STRING of floor(value) —
# DuckDB's decimal→BIGINT cast ROUNDS half-away-from-zero where Spark's
# truncates, so both sides floor() explicitly before casting.

_BENFORD_P = {
    1: "0.301030", 2: "0.176091", 3: "0.124939", 4: "0.096910",
    5: "0.079181", 6: "0.066947", 7: "0.057992", 8: "0.051153",
    9: "0.045757",
}


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(digit, n, share, benford_p, dev): first-digit distribution of
    o_totalprice vs the Benford expectation. Map-only scan → 9-row
    aggregate; at 100 TB the digit extraction is a per-row projection
    and the count is partial-aggregable — nothing else moves."""
    orders = typed_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    total = digits.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    expect = spark.createDataFrame(
        [(d, float(p)) for d, p in sorted(_BENFORD_P.items())],
        "digit int, benford_p double",
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(expect), "digit", "left")
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
            "benford_p",
            F.round(
                F.round(F.col("n").cast("double") / F.col("total"), 6)
                - F.col("benford_p"),
                6,
            ).alias("dev"),
        )
        .orderBy("digit")
    )


BENFORD_AUDIT_SQL = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders
),
counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY 1),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM digits),
expect AS (
  {" UNION ALL ".join(f"SELECT {d} AS digit, CAST({p} AS DOUBLE) AS benford_p" for d, p in sorted(_BENFORD_P.items()))}
)
SELECT c.digit, c.n,
       round(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
       e.benford_p,
       round(round(CAST(c.n AS DOUBLE) / t.total, 6) - e.benford_p, 6) AS dev
FROM counts c CROSS JOIN total t LEFT JOIN expect e ON c.digit = e.digit
ORDER BY c.digit
"""


# --- Split-hash uniformity audit ----------------------------------------------
#
# Everything downstream of the repo's deterministic multiplicative hash
# (train/cal/test splits, A/B arms, reservoir/PPS sampling, leakage-free
# splits) silently assumes the hash spreads keys uniformly. This audit
# MEASURES that: bucket the hash of each unit key into 100 cells and
# report the chi-square statistic against uniform plus the max/min cell
# loads. chi2 = 100·Σo²/n − n — derived purely from integer counts (the
# usual E = n/100 form needs no float until the final division). With
# 99 degrees of freedom, chi2 ≳ 150 means the splits are biased and
# every hash-split experiment inherits that bias.
#
# Scale: one partial-aggregable groupBy per audited key; the report is
# 100 cells per key.

HASH_AUDIT_CELLS = 100


def hash_uniformity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(unit_key, n, cells, chi2, min_cell, max_cell, max_over_min):
    uniformity of the repo's split hash over its three unit keys."""
    from etl_mini_dw_spark.functions.sampling import HASH_MOD, HASH_MULT

    cell_w = HASH_MOD // HASH_AUDIT_CELLS
    specs = [
        ("customer.c_custkey", "customer", "c_custkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
        ("documents.doc_id", "documents", "doc_id"),
    ]
    out = None
    for label, tbl, key in specs:
        t = typed_table(spark, sf_dir, tbl).select(
            (
                F.pmod(F.col(key) * F.lit(HASH_MULT), F.lit(HASH_MOD))
                / F.lit(cell_w)
            )
            .cast("bigint")
            .alias("cell")
        )
        cells = t.groupBy("cell").agg(
            F.count(F.lit(1)).cast("bigint").alias("o")
        )
        row = cells.agg(
            F.sum("o").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("cells"),
            F.sum(F.col("o") * F.col("o")).cast("bigint").alias("sumsq"),
            F.min("o").cast("bigint").alias("min_cell"),
            F.max("o").cast("bigint").alias("max_cell"),
        ).select(
            F.lit(label).alias("unit_key"),
            "n",
            "cells",
            F.round(
                F.lit(HASH_AUDIT_CELLS) * F.col("sumsq")
                / F.col("n").cast("double")
                - F.col("n"),
                6,
            ).alias("chi2"),
            "min_cell",
            "max_cell",
            F.round(
                F.col("max_cell") / F.col("min_cell").cast("double"), 6
            ).alias("max_over_min"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("unit_key")


def hash_uniformity_audit_sql() -> str:
    from etl_mini_dw_spark.functions.sampling import HASH_MOD, HASH_MULT

    cell_w = HASH_MOD // HASH_AUDIT_CELLS
    arms = []
    for label, tbl, key in (
        ("customer.c_custkey", "customer", "c_custkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
        ("documents.doc_id", "documents", "doc_id"),
    ):
        arms.append(f"""
SELECT '{label}' AS unit_key, n, cells,
       round({HASH_AUDIT_CELLS} * CAST(sumsq AS DOUBLE) / n - n, 6) AS chi2,
       min_cell, max_cell,
       round(CAST(max_cell AS DOUBLE) / min_cell, 6) AS max_over_min
FROM (
  SELECT CAST(SUM(o) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS cells,
         CAST(SUM(o * o) AS BIGINT) AS sumsq,
         CAST(MIN(o) AS BIGINT) AS min_cell,
         CAST(MAX(o) AS BIGINT) AS max_cell
  FROM (
    SELECT (({key} * {HASH_MULT}) % {HASH_MOD}) // {cell_w} AS cell,
           CAST(COUNT(*) AS BIGINT) AS o
    FROM {tbl} GROUP BY 1
  )
)""")
    return "\nUNION ALL\n".join(arms) + "\nORDER BY unit_key"


# --- Duplicate-payment audit -----------------------------------------------------
#
# The accounts-payable fraud/error screen: pairs of DISTINCT orders by
# the same customer whose totals agree within 2% and whose dates are
# within 14 days are double-billing candidates. The classic audit query
# (every AP-audit playbook's first pass), expressed with the repo's
# blocking discipline: the self-join is keyed on the CUSTOMER (bounded
# per-key fan-out, the Σb² bound — never a cross join on amounts), the
# residual predicates are exact integer comparisons (|Δcents|·100 ≤
# min(cents) cross-multiplied; |Δdays| ≤ DUPPAY_DAYS).
#
# Scale: one custkey-keyed self-join; candidate volume is Σ per-customer
# orders² (orders-per-customer is bounded in any real ledger); the
# report is a 25-row top-k plus one summary row.

DUPPAY_PCT = 2  # amount tolerance, percent (1%/7d finds zero pairs at sf0.001)
DUPPAY_DAYS = 14  # date proximity window


def duplicate_payment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_a, o_b, custkey, cents_a, cents_b, days_apart): top-25
    double-billing candidate pairs (plus a count-only summary row with
    keys -1), ordered by amount similarity then keys."""
    o = typed_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        (F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        F.datediff(
            "o_orderdate", F.lit("1992-01-01").cast("date")
        ).cast("bigint").alias("d"),
    )
    a = o.select(
        F.col("ck"),
        F.col("ok").alias("o_a"),
        F.col("c").alias("c_a"),
        F.col("d").alias("d_a"),
    )
    b = o.select(
        F.col("ck"),
        F.col("ok").alias("o_b"),
        F.col("c").alias("c_b"),
        F.col("d").alias("d_b"),
    )
    pairs = (
        a.join(b, "ck")
        .filter(
            (F.col("o_a") < F.col("o_b"))
            & (F.abs(F.col("d_a") - F.col("d_b")) <= DUPPAY_DAYS)
            & (
                F.abs(F.col("c_a") - F.col("c_b")) * 100
                <= F.least("c_a", "c_b") * DUPPAY_PCT
            )
        )
        .select(
            F.col("o_a"),
            F.col("o_b"),
            F.col("ck").alias("custkey"),
            F.col("c_a").alias("cents_a"),
            F.col("c_b").alias("cents_b"),
            F.abs(F.col("d_a") - F.col("d_b")).alias("days_apart"),
            F.abs(F.col("c_a") - F.col("c_b")).alias("_gap"),
        )
        .localCheckpoint(eager=False)
    )
    top = (
        pairs.orderBy("_gap", "o_a", "o_b")
        .limit(25)
        .drop("_gap")
    )
    summary = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    ).select(
        F.lit(-1).cast("bigint").alias("o_a"),
        F.lit(-1).cast("bigint").alias("o_b"),
        F.lit(-1).cast("bigint").alias("custkey"),
        F.col("n_pairs").alias("cents_a"),
        F.lit(0).cast("bigint").alias("cents_b"),
        F.lit(0).cast("bigint").alias("days_apart"),
    )
    return top.unionByName(summary).orderBy("o_a", "o_b")


def duplicate_payment_audit_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey AS ok, o_custkey AS ck,
         CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c,
         CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS d
  FROM orders
),
pairs AS MATERIALIZED (
  SELECT a.ok AS o_a, b.ok AS o_b, a.ck AS custkey,
         a.c AS cents_a, b.c AS cents_b,
         abs(a.d - b.d) AS days_apart,
         abs(a.c - b.c) AS gap
  FROM o a JOIN o b ON a.ck = b.ck AND a.ok < b.ok
  WHERE abs(a.d - b.d) <= {DUPPAY_DAYS}
    AND abs(a.c - b.c) * 100 <= least(a.c, b.c) * {DUPPAY_PCT}
)
SELECT o_a, o_b, custkey, cents_a, cents_b, CAST(days_apart AS BIGINT)
         AS days_apart
FROM (SELECT * FROM pairs ORDER BY gap, o_a, o_b LIMIT 25)
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM pairs
ORDER BY o_a, o_b
"""

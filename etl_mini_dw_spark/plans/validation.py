"""Zero-row validation suite (SURVEY §5; reference Stage 5 `code/SQL_1…sql:1616–1795`).

The reference validates itself with assertion queries that must return 0
rows, plus reconciliation totals vs the source. Each check here is a lazy
DataFrame the orchestrator/tests can count; the registry also runs them
through the DuckDB oracle so the *checking queries themselves* are
verified operators (A2/A3/A4, J5/J7, O1/O2, C2–C5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_current_per_nk(dim_df: DataFrame, nk: str) -> DataFrame:
    """C2: >1 current row per NK (`code/SQL_1…sql:1658–1663`). Expect empty."""
    return (
        dim_df.filter(F.col("is_current"))
        .groupBy(nk)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def duplicate_version_windows(dim_df: DataFrame, nk: str) -> DataFrame:
    """C3: duplicate (nk, active_from, active_to) (`code/SQL_1…sql:331–332`)."""
    return (
        dim_df.groupBy(nk, "active_from", "active_to")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .drop("active_from", "active_to")
    )


def overlapping_windows(dim_df: DataFrame, nk: str, sk: str) -> DataFrame:
    """J7 theta self-join: overlapping SCD2 validity windows
    (`code/SQL_1…sql:1668–1683`). Equi on nk keeps it a hash join with a
    range residual; ordered by nk (O1). Expect empty."""
    a = dim_df.select(
        F.col(nk).alias("nk"),
        F.col(sk).alias("id_a"),
        F.col("active_from").alias("from_a"),
        F.col("active_to").alias("to_a"),
    )
    b = dim_df.select(
        F.col(nk).alias("nk"),
        F.col(sk).alias("id_b"),
        F.col("active_from").alias("from_b"),
        F.col("active_to").alias("to_b"),
    )
    return (
        a.join(b, on="nk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("from_a") < F.col("to_b"))
            & (F.col("from_b") < F.col("to_a"))
        )
        .select("nk", "id_a", "id_b")
        .orderBy("nk", "id_a", "id_b")
    )


def null_validity(dim_df: DataFrame, nk: str) -> DataFrame:
    """Non-null validity bounds (`code/SQL_1…sql:1664–1667`). Expect empty."""
    return dim_df.filter(
        F.col("active_from").isNull() | F.col("active_to").isNull()
    ).select(nk)


def duplicate_fact_nk(fact_df: DataFrame) -> DataFrame:
    """C4: unique fact NK (`code/SQL_1…sql:1739–1743`). Expect empty."""
    return (
        fact_df.groupBy("sales_nk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def fact_orphans(fact_df: DataFrame, dim_df: DataFrame, fk: str, sk: str) -> DataFrame:
    """C5 soft referential integrity: fact FK with no dim row (J5 anti-join
    + O2 TOP-100 cap, `code/SQL_1…sql:1753–1783`). Expect empty."""
    return (
        fact_df.select("sales_nk", F.col(fk).alias("_fk"))
        .join(dim_df.select(F.col(sk).alias("_fk")), on="_fk", how="left_anti")
        .orderBy("sales_nk")
        .limit(100)
        .select("sales_nk")
    )


def distinct_day_names(dim_date_df: DataFrame) -> DataFrame:
    """A3: enumerate the (Swedish) day names (`code/SQL_1…sql:1652–1654`)."""
    return dim_date_df.select("day_of_week_name").distinct()


def distinct_month_names(dim_date_df: DataFrame) -> DataFrame:
    """A3: enumerate the (Swedish) month names (`code/SQL_1…sql:1655–1656`)."""
    return dim_date_df.select("month_name").distinct()


def duplicate_dates(dim_date_df: DataFrame) -> DataFrame:
    """Stage 5.2 unique-dates check (`code/SQL_1…sql:1640–1650`). Expect
    empty. Grouped on the ISO-string ``full_date`` (1:1 with date_value)
    so the compared output carries no raw DATE column."""
    return (
        dim_date_df.groupBy("full_date")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def current_member_counts(dim_df: DataFrame) -> DataFrame:
    """Observability companion: row counts by is_current (non-empty)."""
    return dim_df.groupBy("is_current").agg(F.count(F.lit(1)).alias("cnt"))


def reconcile_fact_vs_source(fact_value_sum: DataFrame, source_sum: DataFrame) -> DataFrame:
    """Stage X reconciliation shape (`code/SQL_1…sql:1820–1839`)."""
    return fact_value_sum.crossJoin(source_sum)

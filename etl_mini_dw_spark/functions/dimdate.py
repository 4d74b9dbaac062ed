"""DimDate generation (SURVEY §2 G1/P4/P8/X1; reference `code/SQL_1…sql:182–237`).

The reference generates one row per calendar day 2000-01-01..2050-12-31
with a *recursive CTE* capped by ``MAXRECURSION 20000`` and derives 19
calendar attributes under ``SET LANGUAGE Svenska; SET DATEFIRST 1``
(Swedish day/month names, Monday-first weeks, `code/SQL_1…sql:191–228`).

Spark-first re-expression:
- No recursion: ``explode(sequence(start, end, interval 1 day))`` — a
  single narrow projection, no 18k-deep iteration, no recursion cap.
  Scale: generated *in the engine*, one row per day — at any horizon this
  is thousands of rows; it is broadcast to every fact join.
- Locale: ``date_format`` honors the JVM default locale, which is
  environment-dependent — so Swedish names come from an explicit CASE
  mapping (deterministic, identical on the DuckDB oracle side), exactly
  the "mapping-table join" alternative SURVEY §7 hard-part 3 chose.
- Monday-first day numbers via ``weekday()+1`` (≡ ISO ``isodow``),
  avoiding the reference's ``@@DATEFIRST`` arithmetic (P4,
  `code/SQL_1…sql:224–226`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SWEDISH_DAYS = {
    1: ("måndag", "mån"),
    2: ("tisdag", "tis"),
    3: ("onsdag", "ons"),
    4: ("torsdag", "tor"),
    5: ("fredag", "fre"),
    6: ("lördag", "lör"),
    7: ("söndag", "sön"),
}
SWEDISH_MONTHS = {
    1: ("januari", "jan"),
    2: ("februari", "feb"),
    3: ("mars", "mar"),
    4: ("april", "apr"),
    5: ("maj", "maj"),
    6: ("juni", "jun"),
    7: ("juli", "jul"),
    8: ("augusti", "aug"),
    9: ("september", "sep"),
    10: ("oktober", "okt"),
    11: ("november", "nov"),
    12: ("december", "dec"),
}

DEFAULT_START = "2000-01-01"
DEFAULT_END = "2050-12-31"  # reference horizon → 18,628 rows (BASELINE.md)


def _case_map(num_col, mapping: dict[int, str]):
    out = None
    for k, v in mapping.items():
        out = F.when(num_col == k, v) if out is None else out.when(num_col == k, v)
    return out


def build_dim_date(
    spark: SparkSession, start: str = DEFAULT_START, end: str = DEFAULT_END
) -> DataFrame:
    """One row per day in [start, end] with the reference's 19 attributes."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 day")
            )
        ).alias("date_value")
    )
    d = F.col("date_value")
    dow = F.weekday(d) + 1  # Monday=1 … Sunday=7 (DATEFIRST 1, `code/SQL_1…sql:192`)
    mon = F.month(d)
    q = F.quarter(d)
    y = F.year(d)
    return days.select(
        (y * 10000 + mon * 100 + F.dayofmonth(d)).cast("int").alias("date_key"),
        d.alias("date_value"),
        F.date_format(d, "yyyy-MM-dd").alias("full_date"),
        _case_map(dow, {k: v[0] for k, v in SWEDISH_DAYS.items()}).alias("day_of_week_name"),
        _case_map(dow, {k: v[1] for k, v in SWEDISH_DAYS.items()}).alias("day_of_week_short"),
        dow.cast("int").alias("day_of_week_number"),
        F.dayofmonth(d).cast("int").alias("day_number_in_month"),
        F.dayofyear(d).cast("int").alias("day_number_in_year"),
        F.weekofyear(d).cast("int").alias("week"),
        _case_map(mon, {k: v[0] for k, v in SWEDISH_MONTHS.items()}).alias("month_name"),
        _case_map(mon, {k: v[1] for k, v in SWEDISH_MONTHS.items()}).alias("month_name_short"),
        mon.cast("int").alias("month_number"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        F.concat(F.lit("Q"), q.cast("string")).alias("quarter_name"),
        q.cast("int").alias("quarter_number"),
        F.concat(y.cast("string"), F.lit("-Q"), q.cast("string")).alias("year_quarter_name"),
        (y * 10 + q).cast("string").alias("year_quarter_number"),
        y.cast("int").alias("year_value"),
        # P4 weekday/weekend classifier (`code/SQL_1…sql:224–226`)
        F.when(dow <= 5, "weekday").otherwise("weekend").alias("weekday_flag"),
    )


def dim_date_oracle_sql(start: str = DEFAULT_START, end: str = DEFAULT_END) -> str:
    day_name = " ".join(
        f"WHEN {k} THEN '{v[0]}'" for k, v in SWEDISH_DAYS.items()
    )
    day_short = " ".join(f"WHEN {k} THEN '{v[1]}'" for k, v in SWEDISH_DAYS.items())
    mon_name = " ".join(f"WHEN {k} THEN '{v[0]}'" for k, v in SWEDISH_MONTHS.items())
    mon_short = " ".join(f"WHEN {k} THEN '{v[1]}'" for k, v in SWEDISH_MONTHS.items())
    return f"""
    WITH days AS (
      SELECT CAST(unnest(generate_series(DATE '{start}', DATE '{end}',
                                         INTERVAL 1 DAY)) AS DATE) AS date_value
    )
    SELECT CAST(year(date_value)*10000 + month(date_value)*100
                + dayofmonth(date_value) AS INTEGER)        AS date_key,
           date_value,
           strftime(date_value, '%Y-%m-%d')                 AS full_date,
           CASE isodow(date_value) {day_name} END           AS day_of_week_name,
           CASE isodow(date_value) {day_short} END          AS day_of_week_short,
           CAST(isodow(date_value) AS INTEGER)              AS day_of_week_number,
           CAST(dayofmonth(date_value) AS INTEGER)          AS day_number_in_month,
           CAST(dayofyear(date_value) AS INTEGER)           AS day_number_in_year,
           CAST(weekofyear(date_value) AS INTEGER)          AS week,
           CASE month(date_value) {mon_name} END            AS month_name,
           CASE month(date_value) {mon_short} END           AS month_name_short,
           CAST(month(date_value) AS INTEGER)               AS month_number,
           strftime(date_value, '%Y-%m')                    AS year_month,
           'Q' || CAST(quarter(date_value) AS VARCHAR)      AS quarter_name,
           CAST(quarter(date_value) AS INTEGER)             AS quarter_number,
           CAST(year(date_value) AS VARCHAR) || '-Q'
             || CAST(quarter(date_value) AS VARCHAR)        AS year_quarter_name,
           CAST(year(date_value)*10 + quarter(date_value) AS VARCHAR)
                                                            AS year_quarter_number,
           CAST(year(date_value) AS INTEGER)                AS year_value,
           CASE WHEN isodow(date_value) <= 5 THEN 'weekday'
                ELSE 'weekend' END                          AS weekday_flag
    FROM days
    """

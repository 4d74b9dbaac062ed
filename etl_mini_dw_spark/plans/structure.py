"""Warehouse structure check (Stage 5.1, reference `code/SQL_1…sql:1626–1638`).

The reference validates its catalog with a VALUES list of expected table
names NOT-EXISTS-joined against ``sys.tables``. This engine's queryable
"catalog" is the set of plan-producing functions, so the check compares a
LITERAL (table, column) contract manifest — the engine's declared DDL,
S9 — against the schemas those plans actually resolve to:

- Spark side: analysis-only — each table's lazy DataFrame is built and
  its resolved ``columns`` anti-joined against the manifest (G3 VALUES
  constructor + J5 anti-join, zero jobs run).
- Oracle side: DuckDB ``DESCRIBE`` of each table's oracle SQL (binds,
  never executes) EXCEPT the same VALUES manifest.

Both report missing (table, column) pairs — expect 0 rows. The store-
level variant (are the parquet generations actually on disk, including
the pytest-only tracker/runlog tables) is ``Warehouse.missing_tables``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_mini_dw_spark import fixtures_spec as spec
from etl_mini_dw_spark.functions import dimdate
from etl_mini_dw_spark.operators import fact, scd2
from etl_mini_dw_spark.oracle import warehouse_sql

# The declared warehouse contract — a literal manifest, deliberately NOT
# derived from the plan code it checks (mirrors the reference's VALUES
# list; extended to column granularity).
WAREHOUSE_CONTRACT: dict[str, list[str]] = {
    "dim_date": [
        "date_key", "date_value", "full_date",
        "day_of_week_name", "day_of_week_short", "day_of_week_number",
        "day_number_in_month", "day_number_in_year", "week",
        "month_name", "month_name_short", "month_number", "year_month",
        "quarter_name", "quarter_number", "year_quarter_name",
        "year_quarter_number", "year_value", "weekday_flag",
    ],
    "dim_customer": [
        "customer_id", "customer_nk", "customer_name",
        "customer_main_sellerid", "customer_category_name",
        "is_current", "active_from", "active_to",
    ],
    "dim_salesperson": [
        "salesperson_id", "salesperson_nk", "salesperson_fullname",
        "salesperson_lastname", "is_current", "active_from", "active_to",
    ],
    "dim_product": [
        "product_id", "product_skunumber_nk", "product_name",
        "is_current", "active_from", "active_to",
    ],
    "fact_sales": [
        "sales_id", "sales_nk", "sales_customerid", "sales_salespersonid",
        "sales_productid", "sales_order_datekey", "sales_quantity",
        "sales_unitprice", "sales_taxrate", "sales_value",
        "sales_value_aftertax", "sales_lasteditedwhen",
    ],
}


def _table_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        "dim_date": dimdate.build_dim_date(spark),
        "dim_customer": scd2.dim_initial(spark, sf_dir, spec.CUSTOMER),
        "dim_salesperson": scd2.dim_initial(spark, sf_dir, spec.SALESPERSON),
        "dim_product": scd2.dim_initial(spark, sf_dir, spec.PRODUCT),
        # r09: the memoized resolved fact — this check only reads
        # .columns, so the shared frame avoids re-analyzing the full
        # build plan (schema is identical by construction)
        "fact_sales": fact.fact_initial_memo(spark, sf_dir),
    }


def expected_tables_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table, column) pairs in the contract absent from the resolved
    plan schemas. Expect empty."""
    pair_schema = "table_name string, column_name string"
    expected = spark.createDataFrame(
        [(t, c) for t, cols in WAREHOUSE_CONTRACT.items() for c in cols], pair_schema
    )
    actual = spark.createDataFrame(
        [(t, c) for t, df in _table_plans(spark, sf_dir).items() for c in df.columns],
        pair_schema,
    )
    return (
        expected.join(actual, ["table_name", "column_name"], "left_anti")
        .orderBy("table_name", "column_name")
    )


def expected_tables_sql() -> str:
    table_sql = {
        "dim_date": dimdate.dim_date_oracle_sql(),
        "dim_customer": warehouse_sql.dim_initial_sql(spec.CUSTOMER),
        "dim_salesperson": warehouse_sql.dim_initial_sql(spec.SALESPERSON),
        "dim_product": warehouse_sql.dim_initial_sql(spec.PRODUCT),
        "fact_sales": warehouse_sql.fact_initial_sql(),
    }
    actual = "\n  UNION ALL\n  ".join(
        f"SELECT '{t}' AS table_name, column_name FROM (DESCRIBE ({sql}))"
        for t, sql in table_sql.items()
    )
    values = ", ".join(
        f"('{t}', '{c}')" for t, cols in WAREHOUSE_CONTRACT.items() for c in cols
    )
    return f"""
    WITH actual AS (
      {actual}
    ),
    expected(table_name, column_name) AS (VALUES {values})
    SELECT table_name, column_name FROM expected
    EXCEPT
    SELECT table_name, column_name FROM actual
    ORDER BY table_name, column_name
    """

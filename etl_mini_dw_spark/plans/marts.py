"""BI mart views (SURVEY §2.1 S4; reference Stage 4 `code/SQL_1…sql:1548–1612`).

Thin, lazy current-rows-only projections of the dims plus a passthrough
fact view — the reference keeps these as database views; here they are
DataFrame-returning functions (and can be registered as temp views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_mini_dw_spark.fixtures_spec import DimSpec, attr_cols


def mart_dim_current(dim_df: DataFrame, dim: DimSpec) -> DataFrame:
    """Current-members-only projection (`code/SQL_1…sql:1555–1593`)."""
    return dim_df.filter(F.col("is_current")).select(dim.sk, dim.nk, *attr_cols(dim))


def mart_fact(fact_df: DataFrame) -> DataFrame:
    """Passthrough fact view (`code/SQL_1…sql:1597–1612`)."""
    return fact_df.select(
        "sales_id",
        "sales_nk",
        "sales_customerid",
        "sales_salespersonid",
        "sales_productid",
        "sales_order_datekey",
        "sales_quantity",
        "sales_unitprice",
        "sales_taxrate",
        "sales_value",
        "sales_value_aftertax",
        "sales_lasteditedwhen",
    )


def register_mart_views(spark, dims: dict[str, DataFrame], fact_df: DataFrame) -> None:
    from etl_mini_dw_spark import fixtures_spec as spec

    for key, df in dims.items():
        mart_dim_current(df, spec.DIMS[key]).createOrReplaceTempView(f"mart_{key}")
    mart_fact(fact_df).createOrReplaceTempView("mart_fact_sales")

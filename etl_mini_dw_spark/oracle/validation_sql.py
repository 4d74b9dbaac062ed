"""DuckDB-SQL mirrors for the validation suite + marts (Stage 4/5/X)."""

from __future__ import annotations

from etl_mini_dw_spark.fixtures_spec import DimSpec, attr_cols


def dup_current_sql(dim_sql: str, nk: str) -> str:
    return f"""
    WITH dim AS ({dim_sql})
    SELECT {nk}, COUNT(*) AS cnt FROM dim WHERE is_current
    GROUP BY {nk} HAVING COUNT(*) > 1
    """


def dup_versions_sql(dim_sql: str, nk: str) -> str:
    return f"""
    WITH dim AS ({dim_sql})
    SELECT {nk}, cnt FROM (
      SELECT {nk}, active_from, active_to, COUNT(*) AS cnt FROM dim
      GROUP BY {nk}, active_from, active_to HAVING COUNT(*) > 1)
    """


def overlaps_sql(dim_sql: str, nk: str, sk: str) -> str:
    return f"""
    WITH dim AS ({dim_sql})
    SELECT a.{nk} AS nk, a.{sk} AS id_a, b.{sk} AS id_b
    FROM dim a JOIN dim b ON a.{nk} = b.{nk}
    WHERE a.{sk} < b.{sk}
      AND a.active_from < b.active_to AND b.active_from < a.active_to
    ORDER BY nk, id_a, id_b
    """


def fact_nk_dups_sql(fact_sql: str) -> str:
    return f"""
    WITH f AS ({fact_sql})
    SELECT sales_nk, COUNT(*) AS cnt FROM f GROUP BY sales_nk HAVING COUNT(*) > 1
    """


def fact_orphans_sql(fact_sql: str, dim_sql: str, fk: str, sk: str) -> str:
    return f"""
    WITH f AS ({fact_sql}), dim AS ({dim_sql})
    SELECT sales_nk FROM f LEFT JOIN dim ON f.{fk} = dim.{sk}
    WHERE dim.{sk} IS NULL
    ORDER BY sales_nk LIMIT 100
    """


def null_validity_sql(dim_sql: str, nk: str) -> str:
    return f"""
    WITH dim AS ({dim_sql})
    SELECT {nk} FROM dim WHERE active_from IS NULL OR active_to IS NULL
    """


def dimdate_dup_dates_sql(dim_date_sql: str) -> str:
    return f"""
    WITH dd AS ({dim_date_sql})
    SELECT full_date, COUNT(*) AS cnt FROM dd GROUP BY full_date HAVING COUNT(*) > 1
    """


def current_counts_sql(dim_sql: str) -> str:
    return f"""
    WITH dim AS ({dim_sql})
    SELECT is_current, COUNT(*) AS cnt FROM dim GROUP BY is_current
    """


def mart_dim_sql(dim_sql: str, dim: DimSpec) -> str:
    cols = ", ".join([dim.sk, dim.nk, *attr_cols(dim)])
    return f"""
    WITH dim AS ({dim_sql})
    SELECT {cols} FROM dim WHERE is_current
    """


def mart_fact_sql(fact_sql: str) -> str:
    """Passthrough fact view (`code/SQL_1…sql:1597–1612`)."""
    cols = ", ".join(
        [
            "sales_id", "sales_nk", "sales_customerid", "sales_salespersonid",
            "sales_productid", "sales_order_datekey", "sales_quantity",
            "sales_unitprice", "sales_taxrate", "sales_value",
            "sales_value_aftertax", "sales_lasteditedwhen",
        ]
    )
    return f"""
    WITH f AS ({fact_sql})
    SELECT {cols} FROM f
    """

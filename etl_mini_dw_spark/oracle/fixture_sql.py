"""DuckDB-SQL mirror of ``sources/staging.py`` (the oracle side of the gate).

Every function returns SQL text equivalent — value for value — to the
Spark-side staging DataFrames. The shared single source of truth is
``fixtures_spec.py``; tests/test_oracle_parity.py proves the two sides
never drift.
"""

from __future__ import annotations

from etl_mini_dw_spark.fixtures_spec import (
    EPOCH1,
    EPOCH2,
    HIGH,
    HIGH_GUARD,
    SALESPERSON_FILTER_MOD,
    DimSpec,
)

_BASE_SQL = {
    "customer": """
        SELECT c_custkey AS k, c_name AS name,
               CAST(c_nationkey AS INTEGER) AS main_sellerid,
               n_name AS category_name
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
    "supplier": f"""
        SELECT s_suppkey AS k, s_name AS name
        FROM supplier WHERE s_suppkey % {SALESPERSON_FILTER_MOD} <> 0
    """,
    "part": """
        SELECT p_partkey AS k, p_name AS name FROM part
    """,
}


def versions_sql(dim: DimSpec) -> str:
    """Full SCD2 history as one sub-select (mirror of ``src_versions``)."""
    base = _BASE_SQL[dim.source]
    extras = {
        "customer": ", main_sellerid, category_name",
        "supplier": "",
        "part": "",
    }[dim.source]
    vf1 = f"TIMESTAMP '{EPOCH1}' + (k % 28) * INTERVAL 1 DAY"
    vf2 = f"TIMESTAMP '{EPOCH2}' + (k % 28) * INTERVAL 1 DAY"
    return f"""
    WITH base AS ({base})
    SELECT k,
           CASE WHEN k % 53 = 0 THEN NULL ELSE name END AS name{extras},
           CASE WHEN k % 10 = 0 THEN {vf2} ELSE {vf1} END AS valid_from,
           TIMESTAMP '{HIGH}' AS valid_to,
           FALSE AS from_archive
    FROM base WHERE k % 97 <> 0
    UNION ALL
    SELECT k, name || ' #v1' AS name{extras},
           {vf1} AS valid_from, {vf2} AS valid_to, TRUE AS from_archive
    FROM base WHERE k % 10 = 0 AND k % 97 <> 0
    UNION ALL
    SELECT k, name{extras},
           {vf1} AS valid_from, {vf2} AS valid_to, TRUE AS from_archive
    FROM base WHERE k % 97 = 0
    """


def versions_as_of_sql(dim: DimSpec, as_of: str | None) -> str:
    if as_of is None:
        return versions_sql(dim)
    return f"""
    SELECT * REPLACE (
        NOT (valid_to > TIMESTAMP '{as_of}') AS from_archive,
        CASE WHEN valid_to > TIMESTAMP '{as_of}' THEN TIMESTAMP '{HIGH}'
             ELSE valid_to END AS valid_to)
    FROM ({versions_sql(dim)})
    WHERE valid_from <= TIMESTAMP '{as_of}'
    """


def _warehouse_shape_sql(dim: DimSpec, versions: str) -> str:
    if dim.name == "dim_customer":
        cols = """
           k AS customer_nk,
           COALESCE(name, '') AS customer_name,
           CAST(COALESCE(main_sellerid, -1) AS INTEGER) AS customer_main_sellerid,
           COALESCE(category_name, '') AS customer_category_name"""
    elif dim.name == "dim_salesperson":
        cols = """
           k AS salesperson_nk,
           COALESCE(name, '') AS salesperson_fullname,
           regexp_extract(trim(COALESCE(name, '')), '([^ ]*)$', 1) AS salesperson_lastname"""
    elif dim.name == "dim_product":
        cols = """
           k AS product_skunumber_nk,
           COALESCE(name, '') AS product_name"""
    else:
        raise ValueError(dim.name)
    return f"""
    SELECT {cols},
           NOT from_archive AS is_current,
           valid_from, valid_to
    FROM ({versions})
    """


def delta_extract_sql(
    dim: DimSpec,
    watermark: str | None = None,
    as_of: str | None = None,
    watermark_expr: str | None = None,
) -> str:
    """Mirror of ``delta_extract`` (S2 view + F1 watermark predicate).

    ``watermark`` is a timestamp literal; ``watermark_expr`` an arbitrary
    SQL scalar expression (e.g. a scalar subquery reading a tracker CTE,
    the reference's P11 pattern `code/SQL_1…sql:263–265`).
    """
    wm = f"TIMESTAMP '{watermark}'" if watermark is not None else watermark_expr
    assert wm is not None
    qualifying = f"""
    SELECT * FROM ({versions_as_of_sql(dim, as_of)})
    WHERE valid_from > {wm}
       OR (valid_to > {wm} AND valid_to < TIMESTAMP '{HIGH}')
    """
    return _warehouse_shape_sql(dim, qualifying)


def current_snapshot_sql(dim: DimSpec, as_of: str | None = None) -> str:
    """Mirror of ``current_snapshot`` (S3 view, sentinel guard F3)."""
    return f"""
    SELECT k AS {dim.nk}
    FROM ({versions_as_of_sql(dim, as_of)})
    WHERE valid_to > TIMESTAMP '{HIGH_GUARD}'
    """

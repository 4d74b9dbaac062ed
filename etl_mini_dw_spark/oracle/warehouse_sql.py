"""DuckDB-SQL mirror of ``operators/scd2.py`` (dim builds) for the oracle gate.

Value-for-value equivalent SQL for: initial SCD2 load (X2–X4 initial,
`code/SQL_1…sql:602–659`) and the full two-phase lifecycle (initial as-of a
split + one incremental close-out/insert/delete pass,
`code/SQL_1…sql:927–987`). tests/test_oracle_parity.py proves equivalence.
"""

from __future__ import annotations

from etl_mini_dw_spark.fixtures_spec import (
    ATTR_TYPES,
    HIGH,
    LOW,
    DimSpec,
    attr_cols,
)
from etl_mini_dw_spark.oracle.fixture_sql import (
    current_snapshot_sql,
    delta_extract_sql,
)


def _unknown_select(dim: DimSpec) -> str:
    attrs = []
    for a in attr_cols(dim):
        if ATTR_TYPES[a] == "int":
            attrs.append(f"CAST(-1 AS INTEGER) AS {a}")
        else:
            attrs.append(f"'Unknown' AS {a}")
    attr_sql = ", ".join(attrs)
    return f"""
    SELECT CAST(-1 AS BIGINT) AS {dim.nk}, {attr_sql}, TRUE AS is_current,
           TIMESTAMP '{LOW}' AS active_from, TIMESTAMP '{HIGH}' AS active_to
    """


def _shaped_staged(dim: DimSpec) -> str:
    cols = ", ".join([dim.nk, *attr_cols(dim)])
    return f"""
    SELECT {cols}, is_current,
           valid_from AS active_from, valid_to AS active_to
    FROM staged
    """


def dim_initial_sql(dim: DimSpec, as_of: str | None = None) -> str:
    return f"""
    WITH staged AS ({delta_extract_sql(dim, LOW, as_of)}),
    unioned AS (
      {_shaped_staged(dim)}
      UNION ALL
      {_unknown_select(dim)}
    )
    SELECT CAST(row_number() OVER (ORDER BY {dim.nk}, active_from) AS INTEGER) AS {dim.sk}, *
    FROM unioned
    """


def dim_two_phase_sql(dim: DimSpec, split: str, now_ts: str) -> str:
    nk, sk = dim.nk, dim.sk
    attrs = ", ".join(attr_cols(dim))
    f5_close = " OR ".join(f"cur.{a} IS DISTINCT FROM s.{a}" for a in dim.tracked)
    f5_ins = " OR ".join(f"s.{a} IS DISTINCT FROM cur.{a}" for a in dim.tracked)
    d_attrs = ", ".join(f"d.{a}" for a in attr_cols(dim))
    return f"""
    WITH dim0 AS ({dim_initial_sql(dim, as_of=split)}),
    wm AS (SELECT max(active_from) AS wm FROM dim0 WHERE {nk} <> -1),
    staged AS ({delta_extract_sql(dim, watermark_expr="(SELECT wm FROM wm)")}),
    snapshot AS ({current_snapshot_sql(dim)}),
    cur AS (SELECT * FROM dim0 WHERE is_current),
    closeout AS (
      SELECT cur.{nk} AS co_nk, s.valid_from AS co_to
      FROM cur JOIN staged s ON cur.{nk} = s.{nk} AND s.is_current
      WHERE {f5_close}
    ),
    ins AS (
      SELECT s.* FROM staged s LEFT JOIN cur ON s.{nk} = cur.{nk}
      WHERE cur.{nk} IS NULL OR ({f5_ins})
    ),
    ins_shaped AS (
      SELECT {nk}, {attrs}, is_current,
             valid_from AS active_from, valid_to AS active_to
      FROM ins
    ),
    deleted AS (
      SELECT cur.{nk} AS del_nk FROM cur LEFT JOIN snapshot sn ON cur.{nk} = sn.{nk}
      WHERE sn.{nk} IS NULL AND cur.{nk} <> -1
    ),
    base AS (
      SELECT d.{sk}, d.{nk}, {d_attrs},
        CASE WHEN d.is_current AND co.co_nk IS NOT NULL THEN FALSE
             WHEN d.is_current AND del.del_nk IS NOT NULL THEN FALSE
             ELSE d.is_current END AS is_current,
        d.active_from,
        CASE WHEN d.is_current AND co.co_nk IS NOT NULL THEN co.co_to
             WHEN d.is_current AND del.del_nk IS NOT NULL THEN TIMESTAMP '{now_ts}'
             ELSE d.active_to END AS active_to,
        CASE WHEN d.is_current AND co.co_nk IS NOT NULL THEN 'closed'
             WHEN d.is_current AND del.del_nk IS NOT NULL THEN 'deleted'
             ELSE 'kept' END AS change_tag
      FROM dim0 d
      LEFT JOIN closeout co ON d.{nk} = co.co_nk
      LEFT JOIN deleted del ON d.{nk} = del.del_nk
    ),
    ins_guarded AS (
      -- overlap guard vs the POST-close-out state (mirror of the
      -- library's strengthened J6; see operators/scd2.py)
      SELECT * FROM ins_shaped i
      WHERE NOT EXISTS (SELECT 1 FROM base b
                        WHERE b.{nk} = i.{nk}
                          AND i.active_from < b.active_to
                          AND b.active_from < i.active_to)
    ),
    maxsk AS (SELECT max({sk}) AS msk FROM dim0),
    inserted AS (
      SELECT CAST(row_number() OVER (ORDER BY {nk}, active_from) + msk AS INTEGER) AS {sk},
             {nk}, {attrs}, is_current, active_from, active_to,
             'inserted' AS change_tag
      FROM ins_guarded, maxsk
    )
    SELECT * FROM base
    UNION ALL
    SELECT * FROM inserted
    """


# --- FactSales mirrors (operators/fact.py) --------------------------------

from etl_mini_dw_spark import fixtures_spec as spec
from etl_mini_dw_spark.fixtures_spec import CUSTOMER, PRODUCT, SALESPERSON

_MEASURES = [
    "sales_quantity",
    "sales_unitprice",
    "sales_taxrate",
    "sales_value",
    "sales_value_aftertax",
]


def _raw_hist_ctes() -> str:
    return f"""
    raw AS (
      SELECT l_orderkey, l_linenumber, o_custkey, l_suppkey, l_partkey, o_orderdate,
             CAST(l_quantity AS DECIMAL(12,2)) AS qty,
             CAST(l_extendedprice AS DECIMAL(14,2)) AS price,
             CAST(l_tax AS DECIMAL(4,2)) AS tax,
             greatest(l_shipdate, o_orderdate) AS lastedit
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    hist AS (
      SELECT * FROM raw
      UNION ALL
      SELECT l_orderkey, l_linenumber, o_custkey, l_suppkey, l_partkey, o_orderdate,
             CAST(qty + 1 AS DECIMAL(12,2)) AS qty, price, tax,
             lastedit + {spec.FACT_EDIT_DAYS} * INTERVAL 1 DAY AS lastedit
      FROM raw WHERE l_orderkey % {spec.FACT_EDIT_MOD} = 0
    )"""


def _src_ctes(sfx: str, as_of: str | None, wm_sql: str) -> str:
    visible = f"SELECT * FROM hist"
    if as_of is not None:
        visible += f" WHERE lastedit <= TIMESTAMP '{as_of}'"
    return f"""
    latest{sfx} AS (
      SELECT * FROM ({visible})
      QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                                 ORDER BY lastedit DESC, l_partkey DESC,
                                          l_suppkey DESC, qty DESC,
                                          price DESC, tax DESC) = 1
    ),
    src{sfx} AS (
      SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS sales_id,
             CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS sales_nk,
             o_custkey AS customer_nk,
             CASE WHEN l_orderkey % {spec.UNKNOWN_SUPP_MOD} = 0
                  THEN l_suppkey + {spec.UNKNOWN_SUPP_OFFSET}
                  ELSE l_suppkey END AS salesperson_nk,
             l_partkey AS product_nk,
             o_orderdate AS order_date,
             qty AS sales_quantity,
             CAST(price AS DECIMAL(14,4)) AS sales_unitprice,
             CAST(tax * 100 AS DECIMAL(10,4)) AS sales_taxrate,
             CAST(qty * price AS DECIMAL(18,4)) AS sales_value,
             CAST(CAST(qty * price AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(4,2)) - tax) AS DECIMAL(18,6)) AS sales_value_aftertax,
             lastedit AS sales_lasteditedwhen
      FROM latest{sfx} WHERE lastedit > {wm_sql}
    )"""


def _dim_ctes() -> str:
    return f"""
    dimc AS ({dim_initial_sql(CUSTOMER)}),
    dimsp AS ({dim_initial_sql(SALESPERSON)}),
    dimp AS ({dim_initial_sql(PRODUCT)}),
    dd AS (
      SELECT CAST(d AS DATE) AS date_value,
             CAST(year(d)*10000 + month(d)*100 + dayofmonth(d) AS INTEGER) AS date_key
      FROM (SELECT unnest(generate_series(DATE '{spec.DATE_START}',
                                          DATE '{spec.DATE_END}',
                                          INTERVAL 1 DAY)) AS d)
    )"""


def _resolved_cte(name: str, src: str) -> str:
    return f"""
    {name} AS (
      SELECT s.sales_id, s.sales_nk,
             COALESCE(dc.customer_id,
                      (SELECT customer_id FROM dimc WHERE customer_nk = -1))
               AS sales_customerid,
             COALESCE(dsp.salesperson_id,
                      (SELECT salesperson_id FROM dimsp WHERE salesperson_nk = -1))
               AS sales_salespersonid,
             COALESCE(dp.product_id,
                      (SELECT product_id FROM dimp WHERE product_skunumber_nk = -1))
               AS sales_productid,
             dd.date_key AS sales_order_datekey,
             s.sales_quantity, s.sales_unitprice, s.sales_taxrate,
             s.sales_value, s.sales_value_aftertax, s.sales_lasteditedwhen
      FROM {src} s
      LEFT JOIN dimc dc ON s.customer_nk = dc.customer_nk
        AND s.sales_lasteditedwhen >= dc.active_from
        AND s.sales_lasteditedwhen < dc.active_to
      LEFT JOIN dimsp dsp ON s.salesperson_nk = dsp.salesperson_nk
        AND s.sales_lasteditedwhen >= dsp.active_from
        AND s.sales_lasteditedwhen < dsp.active_to
      LEFT JOIN dimp dp ON s.product_nk = dp.product_skunumber_nk
        AND s.sales_lasteditedwhen >= dp.active_from
        AND s.sales_lasteditedwhen < dp.active_to
      JOIN dd ON CAST(s.order_date AS DATE) = dd.date_value
    )"""


def _double_measures(prefix: str = "") -> str:
    return ", ".join(f"CAST({prefix}{m} AS DOUBLE) AS {m}" for m in _MEASURES)


# the Spark frames' exact measure dtypes (operators/fact.py) — used when a
# consumer needs the oracle to render DECIMAL strings identically to Spark
# (the diff-digest oracle) instead of the compare-surface DOUBLE cast
_MEASURE_TYPES = {
    "sales_quantity": "DECIMAL(12,2)",
    "sales_unitprice": "DECIMAL(14,4)",
    "sales_taxrate": "DECIMAL(10,4)",
    "sales_value": "DECIMAL(18,4)",
    "sales_value_aftertax": "DECIMAL(18,6)",
}


def _decimal_measures(prefix: str = "") -> str:
    return ", ".join(
        f"CAST({prefix}{m} AS {t}) AS {m}" for m, t in _MEASURE_TYPES.items()
    )


def fact_initial_sql(decimal_measures: bool = False) -> str:
    measures = _decimal_measures() if decimal_measures else _double_measures()
    return f"""
    WITH {_raw_hist_ctes()},
    {_src_ctes("0", None, f"TIMESTAMP '{LOW}'")},
    {_dim_ctes()},
    {_resolved_cte("resolved0", "src0")}
    SELECT sales_id, sales_nk, sales_customerid, sales_salespersonid, sales_productid,
           sales_order_datekey, {measures}, sales_lasteditedwhen
    FROM resolved0
    """


def fact_two_phase_sql(decimal_measures: bool = False) -> str:
    measures = _decimal_measures() if decimal_measures else _double_measures()
    upd_measures = " OR ".join(f"st.{m} IS DISTINCT FROM r.{m}" for m in _MEASURES)
    was_unknown = """
         st.sales_customerid = (SELECT customer_id FROM dimc WHERE customer_nk = -1)
      OR st.sales_salespersonid = (SELECT salesperson_id FROM dimsp WHERE salesperson_nk = -1)
      OR st.sales_productid = (SELECT product_id FROM dimp WHERE product_skunumber_nk = -1)"""
    upd = f"""(r.sales_nk IS NOT NULL
      AND (({upd_measures}) OR ({was_unknown}))
      AND r.sales_lasteditedwhen > st.sales_lasteditedwhen)"""
    upd_cols = ",\n             ".join(
        f"CASE WHEN {upd} THEN r.{m} ELSE st.{m} END AS {m}"
        for m in [
            "sales_customerid",
            "sales_salespersonid",
            "sales_productid",
            *_MEASURES,
            "sales_lasteditedwhen",
        ]
    )
    return f"""
    WITH {_raw_hist_ctes()},
    {_src_ctes("0", spec.FACT_SPLIT, f"TIMESTAMP '{LOW}'")},
    {_dim_ctes()},
    {_resolved_cte("resolved0", "src0")},
    state0 AS (SELECT * FROM resolved0),
    wmf AS (SELECT max(sales_lasteditedwhen) AS wm FROM state0),
    {_src_ctes("f", None, "(SELECT wm FROM wmf)")},
    {_resolved_cte("resolvedf", "srcf")},
    base AS (
      SELECT st.sales_id, st.sales_nk,
             {upd_cols},
             st.sales_order_datekey,
             CASE WHEN {upd} THEN 'updated' ELSE 'kept' END AS change_tag
      FROM state0 st
      LEFT JOIN resolvedf r ON st.sales_nk = r.sales_nk
    ),
    inserted AS (
      SELECT r.sales_id,
             r.sales_nk, r.sales_customerid, r.sales_salespersonid, r.sales_productid,
             r.sales_quantity, r.sales_unitprice, r.sales_taxrate,
             r.sales_value, r.sales_value_aftertax, r.sales_lasteditedwhen,
             r.sales_order_datekey, 'inserted' AS change_tag
      FROM resolvedf r
      WHERE NOT EXISTS (SELECT 1 FROM state0 st WHERE st.sales_nk = r.sales_nk)
    )
    SELECT sales_id, sales_nk, sales_customerid, sales_salespersonid, sales_productid,
           sales_order_datekey, {measures}, sales_lasteditedwhen, change_tag
    FROM (SELECT * FROM base UNION ALL SELECT * FROM inserted)
    """


def reconcile_sql() -> str:
    """Stage X reconciliation (`code/SQL_1…sql:1814–1839`): source totals
    vs warehouse totals in one row."""
    src_side = f"""
    WITH {_raw_hist_ctes()},
    {_src_ctes("0", None, f"TIMESTAMP '{LOW}'")}
    SELECT CAST(SUM(sales_value) AS DOUBLE) AS src_total_value,
           COUNT(*) AS src_rows
    FROM src0
    """
    # fact side sums the DECIMAL measure (resolved0), not the final
    # double projection — a double SUM would be summation-order-dependent
    fact_side = f"""
    WITH {_raw_hist_ctes()},
    {_src_ctes("0", None, f"TIMESTAMP '{LOW}'")},
    {_dim_ctes()},
    {_resolved_cte("resolved0", "src0")}
    SELECT CAST(SUM(sales_value) AS DOUBLE) AS fact_total_value,
           COUNT(*) AS fact_rows
    FROM resolved0
    """
    return f"""
    WITH s AS ({src_side}),
    ft AS ({fact_side})
    SELECT s.src_total_value, s.src_rows, ft.fact_total_value, ft.fact_rows
    FROM s, ft
    """

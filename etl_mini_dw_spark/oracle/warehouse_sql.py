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
    ins_guarded AS (
      SELECT * FROM ins_shaped i
      WHERE NOT EXISTS (SELECT 1 FROM dim0 d
                        WHERE d.{nk} = i.{nk}
                          AND d.active_from = i.active_from
                          AND d.active_to = i.active_to)
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

"""SQL-surface API: the warehouse as temp views for raw ``spark.sql``.

The reference IS a SQL warehouse — its users live in SELECT statements
over staging views, dims, and marts (`code/SQL_1…sql:1555–1612`). This
module gives the Spark engine the same front door: one call registers
the full layer stack as (lazy) temp views, and anything a reference user
typed against the mart schema runs verbatim through ``spark.sql``.

Registration is free: views are unevaluated DataFrames, so the catalog
holds plans, not data — a query pays only for the views it touches, with
Catalyst folding view plans into the consumer (predicate pushdown works
THROUGH the view boundary; the plan-shape tests on the underlying frames
keep holding when reached via SQL).

Layers registered (names = the reference's mental model):
- typed sources:  region … embeddings           (S1, decimal-typed)
- staging:        src_customer/…, snap_customer/…  (S2/S3 views)
- dimensions:     dim_customer/…, dim_date         (SCD2 two-phase state)
- marts:          mart_customer_current/…, mart_fact (S4)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_mini_dw_spark import fixtures_spec as spec
from etl_mini_dw_spark.functions import dimdate
from etl_mini_dw_spark.operators import scd2
from etl_mini_dw_spark.plans import marts
from etl_mini_dw_spark.sources import staging
from etl_mini_dw_spark.sources.tables import TABLES, stage_memo, typed_table


def dim_state(spark: SparkSession, sf_dir: str, key: str) -> DataFrame:
    """One shared two-phase dim state per (session, sf-dir, dim).

    Consumers: view registration here, the warehouse-health summary
    (registry), and bench.py's memo warm-up phase (which bills the build
    to its own `memo:` line so per-query bench timings stay
    order-independent)."""
    dim = spec.DIMS[key]
    return stage_memo(
        spark,
        sf_dir,
        f"api_dim_{key}",
        lambda: scd2.dim_two_phase(
            spark, sf_dir, dim, spec.MID, spec.NOW_FIXED
        ).localCheckpoint(eager=False),
    )


def register_warehouse_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the full warehouse layer stack; returns the view names."""
    names: list[str] = []

    def _reg(name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
        names.append(name)

    for t in TABLES:
        _reg(t, typed_table(spark, sf_dir, t))
    _reg("dim_date", dimdate.build_dim_date(spark))
    for key, dim in spec.DIMS.items():
        _reg(f"src_{key}", staging.delta_extract(spark, sf_dir, dim, spec.LOW))
        _reg(f"snap_{key}", staging.current_snapshot(spark, sf_dir, dim))
        # two_phase runs eager actions (watermark collect, checkpoint) at
        # plan-build time, so the dim state is staged once per (session,
        # sf-dir) — repeated registration, and every view that reads a
        # dim, share one build instead of paying three dim loads each
        dim_df = dim_state(spark, sf_dir, key)
        _reg(f"dim_{key}", dim_df)
        _reg(f"mart_{key}_current", marts.mart_dim_current(dim_df, dim))
    return names


def sql_mart_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-UX proof: a raw SQL SELECT over the registered mart.

    This is deliberately a ``spark.sql`` string, not DataFrame calls —
    the query a reference user would paste after switching engines.
    """
    register_warehouse_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT customer_category_name AS category,
               COUNT(*) AS n_customers,
               CAST(MIN(customer_nk) AS BIGINT) AS min_nk
        FROM mart_customer_current
        GROUP BY customer_category_name
        """
    )


def sql_mart_category_counts_sql() -> str:
    from etl_mini_dw_spark.oracle import validation_sql, warehouse_sql

    mart = validation_sql.mart_dim_sql(
        warehouse_sql.dim_two_phase_sql(spec.DIMS["customer"], spec.MID, spec.NOW_FIXED),
        spec.DIMS["customer"],
    )
    return f"""
WITH mart AS ({mart})
SELECT customer_category_name AS category,
       COUNT(*) AS n_customers,
       CAST(MIN(customer_nk) AS BIGINT) AS min_nk
FROM mart
GROUP BY customer_category_name
"""

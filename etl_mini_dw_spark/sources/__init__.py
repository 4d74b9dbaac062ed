from etl_mini_dw_spark.sources.tables import (  # noqa: F401
    TABLES,
    TYPED_DECIMALS,
    load_table,
    register_sources,
    typed_source_sql,
    typed_table,
)

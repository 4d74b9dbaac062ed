"""etl_mini_dw_spark — a PySpark-native mini-data-warehouse engine.

A from-scratch Spark-first re-expression of the capabilities of the
reference repo ``DavidFarm/etl-mini-dw`` (a single-file T-SQL star-schema
ETL warehouse, see SURVEY.md): watermark-driven incremental loads, SCD2
dimensions (close-out / versioned insert / delete detection), a fact load
with temporal as-of dimension resolution and unknown-member fallback,
DimDate generation, mart views, run logging, and a zero-row validation
suite — plus large-scale data-pipeline extensions (dedup, similarity
search, text analysis, streaming) the reference does not have.

Design stance (SURVEY §7): DataFrame / Spark SQL only, Catalyst + AQE do
the physical planning; zero Python UDFs on the parity hot path; state is
plain Parquet tables with an atomic read→transform→swap protocol (Delta
Lake is not on the classpath in this environment).
"""

__version__ = "0.1.0"

from etl_mini_dw_spark.session import get_spark  # noqa: F401

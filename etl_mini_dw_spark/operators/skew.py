"""Skew-mitigation utilities (SCALE.md; SURVEY §4 "our action" column).

AQE's skew-join splitting handles sort-merge joins automatically; these
helpers cover the cases it doesn't: a hot-key *aggregation* and an
explicit salted join when the skewed side must hash-join.

- ``salted_agg``: two-phase aggregation — partial agg on (key, salt)
  spreads a hot key over N reducers, then the tiny (key, salt) partials
  re-aggregate on key. Works for any commutative re-aggregable measure
  (sum/count/min/max); exact-decimal sums keep it value-identical to the
  unsalted plan.
- ``salted_join``: replicate the small side N× (one copy per salt), salt
  the big side uniformly — the hot key's rows land on N partitions
  instead of one.

Both are pure DataFrame transforms; correctness vs the unsalted plan is
pytest-checked (tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` aggregate within (key, salt); ``final_aggs`` re-aggregate the
    partials per key (their input column names must match the partial
    aliases).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(*aggs)
    return partial.groupBy(key).agg(*final_aggs)


def salted_user_value_totals(df_or_spark, sf_dir: str | None = None) -> DataFrame:
    """Registered demonstration of ``salted_agg`` on the events hot keys:
    per-user totals computed as (user, salt) partials re-aggregated per
    user. Value-identical to the single-phase oracle because the measures
    are exact-decimal / count — re-aggregation order can't change them.

    At 100 TB: a viral user's events land on 16 reducers instead of one;
    the second shuffle moves only |users|×16 partial rows.
    """
    from etl_mini_dw_spark.sources.tables import typed_table

    ev = typed_table(df_or_spark, sf_dir, "events")
    return salted_agg(
        ev,
        "user_id",
        aggs=[
            F.sum("value").alias("_pv"),
            F.count(F.lit(1)).alias("_pn"),
        ],
        final_aggs=[
            F.sum("_pv").cast("decimal(38,2)").cast("double").alias("total_value"),
            F.sum("_pn").cast("bigint").alias("n_events"),
        ],
    )


SALTED_USER_TOTALS_SQL = """
SELECT user_id,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value,
       COUNT(*) AS n_events
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
GROUP BY user_id
"""


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated ``n_salts``× — a hot key spreads over ``n_salts`` tasks."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    return big_salted.join(small_rep, on=[key, "_salt"]).drop("_salt")

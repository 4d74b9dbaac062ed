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

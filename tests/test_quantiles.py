"""Equivalence tests for quantiles.ntile_bounds / ntile_label_cols.

The two-pass bucket selection must be VALUE-IDENTICAL to the ntile
spelling it replaced (r6 VERDICT task #2) — same boundary arrays
(duplicates preserved) and same per-row labels — across heavy ties,
n < K, and n % K != 0 shapes. Seeded generators, no fixture data.
"""

from __future__ import annotations

import random

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.quantiles import ntile_bounds, ntile_label_cols


def _bounds_via_ntile(df, k):
    tile = F.ntile(k).over(Window.orderBy("val"))
    return (
        df.select("val", tile.alias("tile"))
        .filter(F.col("tile") < k)
        .groupBy("tile")
        .agg(F.max("val").alias("b"))
        .agg(F.array_sort(F.collect_list("b")).alias("barr"))
        .collect()[0]["barr"]
    )


def test_ntile_bounds_matches_ntile_across_shapes(spark):
    rng = random.Random(20260815)
    cases = [
        # (values, k): heavy ties, spread, n % k != 0, n < k,
        # constant column (min == max → width floor kicks in)
        ([rng.randint(0, 10) for _ in range(257)], 10),
        ([rng.uniform(0, 1000) for _ in range(301)], 10),
        ([5.0] * 40 + [7.0] * 3, 10),  # one value spans many tiles
        ([rng.randint(0, 3) for _ in range(23)], 5),
        ([1.0, 2.0, 3.0], 10),  # n < k: only n-1 edges exist
        ([4.2], 4),  # single row: no edges
        ([9.0] * 31, 4),  # constant: zero range
        ([rng.uniform(-1e9, 1e9) for _ in range(101)], 7),  # wide range
    ]
    for vals, k in cases:
        df = spark.createDataFrame([Row(val=float(v)) for v in vals])
        expected = _bounds_via_ntile(df, k)
        got = ntile_bounds(df, k).collect()[0]["barr"]
        assert got == expected, (vals[:10], k, got, expected)


def test_ntile_bounds_empty_input(spark):
    df = spark.createDataFrame([], "val double")
    got = ntile_bounds(df, 10).collect()[0]["barr"]
    assert got == []


def test_ceil_rank_bounds_matches_row_number_rank(spark):
    """ceil_rank_bounds must equal the value at sorted rank ⌈i·n/K⌉ —
    the RFM quintile spelling (min val whose row_number == rank, with
    any total ordering: boundary VALUES are multiset-determined)."""
    from etl_mini_dw_spark.functions.quantiles import ceil_rank_bounds

    rng = random.Random(99)
    cases = [
        ([rng.randint(0, 6) for _ in range(83)], 5),
        ([rng.uniform(0, 100) for _ in range(40)], 5),
        ([2.0] * 17, 5),  # all-ties
        ([1.0, 2.0], 5),  # n < k: ranks repeat
    ]
    for vals, k in cases:
        df = spark.createDataFrame([Row(val=float(v)) for v in vals])
        n = len(vals)
        sv = sorted(vals)
        expected = sorted(sv[((i * n + k - 1) // k) - 1] for i in range(1, k))
        got = ceil_rank_bounds(df, k).collect()[0]["barr"]
        assert got == expected, (vals[:10], k, got, expected)


def test_ntile_label_cols_matches_ntile(spark):
    rng = random.Random(7)
    rows = []
    for g, n in (("a", 25), ("b", 7), ("c", 100), ("d", 10), ("e", 1)):
        for i in range(n):
            rows.append(Row(g=g, id=i, val=float(rng.randint(0, 5))))
    df = spark.createDataFrame(rows)
    k = 10
    w = Window.partitionBy("g").orderBy("val", "id")
    expected = df.withColumn("decile", F.ntile(k).over(w).cast("int"))
    # closed-form path: exact rank within g via the same total ordering
    ranked = df.withColumn("rank", F.row_number().over(w).cast("bigint")).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g")).cast("bigint")
    )
    got = ranked.select(
        "g", "id", "val", ntile_label_cols(F.col("n"), F.col("rank"), k).alias("decile")
    )
    exp = {(r.g, r.id): r.decile for r in expected.collect()}
    for r in got.collect():
        assert r.decile == exp[(r.g, r.id)], (r, exp[(r.g, r.id)])

"""Skew discipline: salted plans match unsalted results, and the
degree-oriented triangle plan's per-vertex work stays bounded on
ADVERSARIAL hub input, not just the uniform testdata (VERDICT r04
task #7 — the O(|E|^1.5) claim in SCALE.md, demonstrated)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from etl_mini_dw_spark.operators.skew import salted_agg, salted_join
from etl_mini_dw_spark.plans import graph
from etl_mini_dw_spark.sources.tables import typed_table


def test_salted_agg_matches_plain(spark, sf_dir):
    li = typed_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_agg(
        li,
        "l_returnflag",
        aggs=[F.sum("l_quantity").alias("ps"), F.count(F.lit(1)).alias("pn")],
        final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
    )
    a = {r["l_returnflag"]: (r["s"], r["n"]) for r in plain.collect()}
    b = {r["l_returnflag"]: (r["s"], r["n"]) for r in salted.collect()}
    assert a == b


def test_salted_join_matches_plain(spark, sf_dir):
    li = typed_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity"
    )
    part = typed_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = li.join(part, on="p_partkey").groupBy("p_brand").count()
    salted = salted_join(li, part, "p_partkey").groupBy("p_brand").count()
    a = {r["p_brand"]: r["count"] for r in plain.collect()}
    b = {r["p_brand"]: r["count"] for r in salted.collect()}
    assert a == b


# --- degree orientation under a deliberate hub (VERDICT r04 task #7) ---------
def _hub_incidence(spark):
    """Synthetic (l_orderkey, l_partkey) incidence with one hub part in
    10% of orders: 2,000 orders × 3 parts from a 60-part pool, plus part
    0 appended to every 10th order. The co-occurrence graph then has a
    hub adjacent to (nearly) every other part — the exact shape that
    makes an UNORIENTED wedge join quadratic in the hub degree."""
    rng = random.Random(42)
    rows = []
    for o in range(2_000):
        for p in rng.sample(range(1, 61), 3):
            rows.append((o, p))
        if o % 10 == 0:
            rows.append((o, 0))
    return spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])


def test_oriented_outdegree_bounded_on_hub_graph(spark):
    """The load-bounding theorem behind the O(|E|^1.5) wedge bound, on
    adversarial input: (a) every oriented out-degree ≤ √(2|E|) — this is
    what caps any single task's wedge fan-out at scale; (b) the hub
    itself ends with out-degree 0 (all its edges orient inward, because
    it has the highest degree); (c) the oriented wedge total Σ outdeg²
    is a small fraction of the unoriented Σ deg² an orientation-free
    plan would materialize."""
    g = graph.cooccurrence_edges(_hub_incidence(spark)).cache()
    n_edges = g.count()
    assert n_edges > 100, "fixture too sparse to be meaningful"
    hub_deg = g.filter((F.col("pa") == 0) | (F.col("pb") == 0)).count()
    assert hub_deg >= 50, "hub did not become a hub"

    oriented = graph.orient_edges(g)
    outdeg = {
        r["src"]: r["d"]
        for r in oriented.groupBy("src").agg(F.count(F.lit(1)).alias("d")).collect()
    }
    bound = math.sqrt(2 * n_edges)
    assert max(outdeg.values()) <= bound, (max(outdeg.values()), bound)
    assert outdeg.get(0, 0) == 0, f"hub kept out-edges: {outdeg.get(0)}"

    deg = {}
    for r in g.collect():
        deg[r["pa"]] = deg.get(r["pa"], 0) + 1
        deg[r["pb"]] = deg.get(r["pb"], 0) + 1
    oriented_wedges = sum(d * (d - 1) // 2 for d in outdeg.values())
    naive_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert oriented_wedges <= 2 * n_edges**1.5, (oriented_wedges, n_edges)
    # the hub alone gives the naive plan ≥ C(hub_deg, 2) wedges; the
    # oriented plan must beat it decisively, not marginally
    assert oriented_wedges * 2 < naive_wedges, (oriented_wedges, naive_wedges)


def test_triangle_counts_correct_on_hub_graph(spark):
    """Orientation must not change the ANSWER on the skewed graph: the
    oriented corner counts equal a naive unoriented triple join's."""
    g = graph.cooccurrence_edges(_hub_incidence(spark)).cache()
    e1 = g.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = g.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    e3 = g.select(F.col("pa").alias("x"), F.col("pb").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"]).select("x", "y", "z")
    naive = {
        r["p"]: r["n"]
        for r in tris.select(F.col("x").alias("p"))
        .unionAll(tris.select(F.col("y").alias("p")))
        .unionAll(tris.select(F.col("z").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r["p_partkey"]: r["n_triangles"]
        for r in graph.triangle_corner_counts(g).collect()
    }
    assert got == naive


# --- measured hot-key drill (r6 VERDICT task #8) ------------------------------
#
# One key carrying 20% of all rows — the adversarial shape AQE skew
# handling and the salting helpers exist for. Timing guards are useless
# under this machine's 2-3x load variance (CLAUDE.md), so the drill
# measures the MECHANISM instead: rows arriving at the most-loaded
# reducer under the aggregate's hash partitioning, with and without the
# salt in the key. The salted layout must cut the hot reducer's load by
# >= 4x AND stay value-identical.


def _hot_key_rows(spark, n=100_000, hot_every=5):
    """n rows; key 0 owns 1/hot_every of them; the rest spread uniformly."""
    return spark.range(n).select(
        F.when(F.col("id") % hot_every == 0, F.lit(0))
        .otherwise(F.col("id") % 5_000 + 1)
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 97).cast("bigint").alias("v"),
    )


def _max_reducer_rows(df, cols, parts=32):
    sizes = (
        df.repartition(parts, *[F.col(c) for c in cols])
        .select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    return max(r["count"] for r in sizes)


def test_salted_agg_hot_key_load_measured(spark):
    df = _hot_key_rows(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_agg(
        df,
        "k",
        aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pn")],
        final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
    )
    a = {r["k"]: (r["s"], r["n"]) for r in plain.collect()}
    b = {r["k"]: (r["s"], r["n"]) for r in salted.collect()}
    assert a == b
    unsalted_max = _max_reducer_rows(df, ["k"])
    salted_max = _max_reducer_rows(
        df.withColumn("_salt", (F.rand(seed=42) * 16).cast("int")),
        ["k", "_salt"],
    )
    # hot reducer held ~20k + background rows; salting spreads the hot
    # key over 16 reducers — demand a decisive, not marginal, reduction
    assert unsalted_max >= 20_000, unsalted_max
    assert salted_max * 4 <= unsalted_max, (salted_max, unsalted_max)


def test_salted_join_hot_key_load_measured(spark):
    big = _hot_key_rows(spark)
    small = spark.range(5_001).select(
        F.col("id").cast("bigint").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 7).cast("string")).alias("grp"),
    )
    plain = big.join(small, "k").groupBy("grp").count()
    salted = salted_join(big, small, "k").groupBy("grp").count()
    a = {r["grp"]: r["count"] for r in plain.collect()}
    b = {r["grp"]: r["count"] for r in salted.collect()}
    assert a == b
    unsalted_max = _max_reducer_rows(big, ["k"])
    salted_max = _max_reducer_rows(
        big.withColumn("_salt", (F.rand(seed=42) * 16).cast("int")),
        ["k", "_salt"],
    )
    assert salted_max * 4 <= unsalted_max, (salted_max, unsalted_max)

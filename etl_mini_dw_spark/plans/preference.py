"""Bradley–Terry preference ranking from pairwise comparisons.

The aggregation model behind preference data in RLHF-style pipelines
(Bradley & Terry 1952; the same likelihood a reward model fits):
given pairwise win counts w_ij, find strengths π with
P(i beats j) = π_i / (π_i + π_j). Fitted here with the classical
MM/Zermelo update

    π_i ← W_i / Σ_j n_ij / (π_i + π_j),  then renormalize Σπ.

Comparisons are mined from the warehouse: within each order, brand A
beats brand B when A's total quantity in that order exceeds B's
(equal-quantity pairs are dropped). Candidate generation is keyed by
orderkey, so the fan-out per order is C(brands-in-order, 2) — bounded
by order size², the repo's Σb² blocking argument; the duel matrix
itself is ≤ |brands|² rows.

Portability: the ENTIRE iteration is integer arithmetic — strengths are
10⁶-scaled BIGINTs, each reciprocal term is an exact BIGINT floor
division (n_ij·10⁹) div (p_i+p_j), so the per-group sums are order-free
and both engines produce bit-identical strengths after any number of
rounds (the integer-k-means discipline; a float MM sum over j would be
summation-order-sensitive). Magnitudes: n·10⁹ ≤ ~3e16 at sf1 « 2⁶³.

Scale: one corpus shuffle to (orderkey, brand, qty), one orderkey-keyed
self-join with bounded fan-out, then 5 unrolled rounds over the
|brands|²-row duel frame (broadcast-sized; checkpointed per round to
keep the plan shallow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

BT_SCALE = 1_000_000  # strength fixed-point scale
BT_TERM = 1_000_000_000  # reciprocal-term fixed-point scale
BT_ROUNDS = 5


def bradley_terry_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand, n_games, n_wins, strength, bt_rank): Bradley–Terry brand
    strengths after 5 integer MM rounds over within-order quantity
    duels; strength is the 10⁻⁶-quantized π (mean 1 by construction)."""
    li = typed_table(spark, sf_dir, "lineitem")
    part = typed_table(spark, sf_dir, "part")
    oq = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    a = oq.select(F.col("ok"), F.col("brand").alias("ba"), F.col("qty").alias("qa"))
    b = oq.select(F.col("ok"), F.col("brand").alias("bb"), F.col("qty").alias("qb"))
    # directed duels: one row per ordered pair with a strict winner
    duels = (
        a.join(b, "ok")
        .filter((F.col("ba") != F.col("bb")) & (F.col("qa") != F.col("qb")))
        .groupBy(F.col("ba").alias("i"), F.col("bb").alias("j"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("qa") > F.col("qb"), 1).otherwise(0))
            .cast("bigint")
            .alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    wins = duels.groupBy("i").agg(
        F.sum("n").cast("bigint").alias("G"), F.sum("w").cast("bigint").alias("W")
    )
    p = wins.select("i", F.lit(BT_SCALE).cast("bigint").alias("p"))
    target = p.agg(F.sum("p").cast("bigint").alias("target"))
    for _ in range(BT_ROUNDS):
        pa = p.select(F.col("i"), F.col("p").alias("pi"))
        pb = p.select(F.col("i").alias("j"), F.col("p").alias("pj"))
        denom = (
            duels.join(F.broadcast(pa), "i")
            .join(F.broadcast(pb), "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.expr(f"(n * {BT_TERM}) div (greatest(pi, 1) + greatest(pj, 1))")
                )
                .cast("bigint")
                .alias("d")
            )
        )
        # denom/p are tiny DERIVED frames (no stats) — without the explicit
        # hint they compile to SortMergeJoin (CLAUDE.md trap, seen in the
        # plan test)
        praw = (
            wins.join(F.broadcast(denom), "i")
            .select("i", F.expr(f"(W * {BT_TERM}) div d").alias("praw"))
        )
        tot = praw.agg(F.sum("praw").cast("bigint").alias("tot"))
        p = (
            praw.crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(target))
            .select("i", F.expr("(praw * target) div tot").cast("bigint").alias("p"))
            .localCheckpoint(eager=False)
        )
    ranked = (
        wins.join(F.broadcast(p), "i")
        .select(
            F.col("i").alias("brand"),
            F.col("G").alias("n_games"),
            F.col("W").alias("n_wins"),
            F.round(F.col("p").cast("double") / BT_SCALE, 6).alias("strength"),
            F.col("p").alias("_p"),
        )
    )
    w = Window.orderBy(F.col("_p").desc(), F.col("brand"))
    return (
        ranked.withColumn("bt_rank", F.row_number().over(w))
        .drop("_p")
        .orderBy("bt_rank")
    )


def bradley_terry_brands_sql() -> str:
    rounds = []
    prev = "p0"
    for r in range(1, BT_ROUNDS + 1):
        rounds.append(
            f"""
denom{r} AS MATERIALIZED (
  SELECT d.i,
         CAST(SUM((d.n * {BT_TERM}) // (greatest(pa.p, 1) + greatest(pb.p, 1))) AS BIGINT) AS d
  FROM duels d JOIN {prev} pa ON pa.i = d.i JOIN {prev} pb ON pb.i = d.j
  GROUP BY d.i
),
praw{r} AS MATERIALIZED (
  SELECT w.i, CAST((w.W * {BT_TERM}) // d.d AS BIGINT) AS praw
  FROM wins w JOIN denom{r} d ON d.i = w.i
),
p{r} AS MATERIALIZED (
  SELECT i, CAST((praw * (SELECT SUM(p) FROM p0)) // (SELECT SUM(praw) FROM praw{r}) AS BIGINT) AS p
  FROM praw{r}
)"""
        )
        prev = f"p{r}"
    chain = ",".join(rounds)
    return f"""
WITH oq AS MATERIALIZED (
  SELECT l_orderkey AS ok, p_brand AS brand, SUM(l_quantity) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
duels AS MATERIALIZED (
  SELECT a.brand AS i, b.brand AS j,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a.qty > b.qty THEN 1 ELSE 0 END) AS BIGINT) AS w
  FROM oq a JOIN oq b ON a.ok = b.ok AND a.brand <> b.brand AND a.qty <> b.qty
  GROUP BY 1, 2
),
wins AS MATERIALIZED (
  SELECT i, CAST(SUM(n) AS BIGINT) AS G, CAST(SUM(w) AS BIGINT) AS W
  FROM duels GROUP BY i
),
p0 AS MATERIALIZED (
  SELECT i, CAST({BT_SCALE} AS BIGINT) AS p FROM wins
),{chain}
SELECT brand, n_games, n_wins, strength,
       CAST(row_number() OVER (ORDER BY _p DESC, brand) AS INTEGER) AS bt_rank
FROM (
  SELECT w.i AS brand, w.G AS n_games, w.W AS n_wins,
         round(CAST(p.p AS DOUBLE) / {BT_SCALE}, 6) AS strength, p.p AS _p
  FROM wins w JOIN {prev} p ON p.i = w.i
)
ORDER BY bt_rank
"""

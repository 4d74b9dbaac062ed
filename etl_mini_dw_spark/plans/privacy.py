"""k-anonymity / l-diversity audit of a quasi-identifier set.

The privacy gate a curation pipeline runs before releasing or training
on user-linked tables (Sweeney 2002; Machanavajjhala et al. 2007): rows
whose QUASI-IDENTIFIER combination (segment × nation × name-length
band) is shared by fewer than k individuals are re-identifiable by
linkage, and equivalence classes whose SENSITIVE attribute (account-
balance band) is homogeneous leak it outright even at high k. This
operator reports the equivalence-class size histogram, the share of
rows below standard k thresholds, and the l-diversity floor.

Complements the redaction op (`sampling.pii_redaction_report`): that
one scrubs direct identifiers from text; this one measures the residual
linkage risk in the structured columns.

Everything is integer counting off ONE two-level groupBy (the
(QI, sensitive) pre-aggregate keeps distinct-counting partial-
aggregable — no COUNT DISTINCT expand); ratios are final round-6.
Scale: class keys are low-cardinality; both aggregates are map-side
combinable; nothing global but the histogram assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

K_THRESHOLDS = [2, 5, 10]
NAME_LEN_BAND = 4  # QI band width for length(c_name)
BAL_BAND_CENTS = 200_000  # sensitive attr: $2000 account-balance bands


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(metric, k, n, ratio): 'class_size_hist' rows (k = class size,
    n = classes of that size), 'rows_below_k' rows for k in {2,5,10}
    (n = re-identifiable rows, ratio = their population share),
    'l_diversity_min' and 'homogeneous_classes' summary rows."""
    cust = typed_table(spark, sf_dir, "customer")
    nation = typed_table(spark, sf_dir, "nation")
    qi = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("n_name").alias("nat"),
        F.expr(
            f"(length(c_name) - pmod(length(c_name), {NAME_LEN_BAND}))"
            f" div {NAME_LEN_BAND}"
        ).alias("len_band"),
        F.expr(
            "(CAST(c_acctbal * 100 AS BIGINT)"
            f" - pmod(CAST(c_acctbal * 100 AS BIGINT), {BAL_BAND_CENTS}))"
            f" div {BAL_BAND_CENTS}"
        ).alias("sens"),
    )
    # two-level: (QI, sensitive) first, so the distinct count never expands
    cells = qi.groupBy("seg", "nat", "len_band", "sens").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    classes = cells.groupBy("seg", "nat", "len_band").agg(
        F.sum("c").cast("bigint").alias("size"),
        F.count(F.lit(1)).cast("bigint").alias("l_div"),
    )
    classes = classes.localCheckpoint(eager=False)  # 3 report branches
    hist = classes.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select(
        F.lit("class_size_hist").alias("metric"),
        F.col("size").alias("k"),
        "n",
        F.lit(None).cast("double").alias("ratio"),
    )
    tot = classes.agg(
        F.sum("size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("l_div").cast("bigint").alias("min_l"),
        F.sum(F.when(F.col("l_div") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("homog"),
    )
    below = None
    for kt in K_THRESHOLDS:
        b = (
            classes.filter(F.col("size") < kt)
            .agg(F.coalesce(F.sum("size"), F.lit(0)).cast("bigint").alias("n"))
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit("rows_below_k").alias("metric"),
                F.lit(kt).cast("bigint").alias("k"),
                "n",
                F.round(F.col("n") / F.col("n_rows").cast("double"), 6).alias(
                    "ratio"
                ),
            )
        )
        below = b if below is None else below.unionByName(b)
    summary = tot.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_diversity_min").alias("metric"),
                    F.lit(-1).cast("bigint").alias("k"),
                    F.col("min_l").alias("n"),
                    F.lit(None).cast("double").alias("ratio"),
                ),
                F.struct(
                    F.lit("homogeneous_classes").alias("metric"),
                    F.lit(-1).cast("bigint").alias("k"),
                    F.col("homog").alias("n"),
                    F.round(
                        F.col("homog") / F.col("n_classes").cast("double"), 6
                    ).alias("ratio"),
                ),
            )
        ).alias("s")
    ).select("s.metric", "s.k", "s.n", "s.ratio")
    return (
        hist.unionByName(below).unionByName(summary).orderBy("metric", "k")
    )


K_ANONYMITY_SQL = f"""
WITH qi AS (
  SELECT c_mktsegment AS seg, n_name AS nat,
         (length(c_name) - ((length(c_name) % {NAME_LEN_BAND}
            + {NAME_LEN_BAND}) % {NAME_LEN_BAND})) // {NAME_LEN_BAND}
           AS len_band,
         (CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)
          - ((CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)
              % {BAL_BAND_CENTS} + {BAL_BAND_CENTS}) % {BAL_BAND_CENTS}))
           // {BAL_BAND_CENTS} AS sens
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
cells AS (
  SELECT seg, nat, len_band, sens, CAST(COUNT(*) AS BIGINT) AS c
  FROM qi GROUP BY 1, 2, 3, 4
),
classes AS MATERIALIZED (
  SELECT seg, nat, len_band,
         CAST(SUM(c) AS BIGINT) AS size,
         CAST(COUNT(*) AS BIGINT) AS l_div
  FROM cells GROUP BY 1, 2, 3
),
tot AS (
  SELECT CAST(SUM(size) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(MIN(l_div) AS BIGINT) AS min_l,
         CAST(SUM(CASE WHEN l_div = 1 THEN 1 ELSE 0 END) AS BIGINT) AS homog
  FROM classes
)
SELECT 'class_size_hist' AS metric, size AS k,
       CAST(COUNT(*) AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS ratio
FROM classes GROUP BY size
UNION ALL
SELECT 'rows_below_k', t.k, COALESCE(b.n, 0),
       round(CAST(COALESCE(b.n, 0) AS DOUBLE) / tot.n_rows, 6)
FROM (VALUES (CAST(2 AS BIGINT)), (CAST(5 AS BIGINT)),
             (CAST(10 AS BIGINT))) t(k)
LEFT JOIN (
  SELECT kt.k, CAST(SUM(c.size) AS BIGINT) AS n
  FROM (VALUES (CAST(2 AS BIGINT)), (CAST(5 AS BIGINT)),
               (CAST(10 AS BIGINT))) kt(k)
  JOIN classes c ON c.size < kt.k
  GROUP BY kt.k
) b ON b.k = t.k, tot
UNION ALL
SELECT 'l_diversity_min', CAST(-1 AS BIGINT), min_l, CAST(NULL AS DOUBLE)
FROM tot
UNION ALL
SELECT 'homogeneous_classes', CAST(-1 AS BIGINT), homog,
       round(CAST(homog AS DOUBLE) / n_classes, 6)
FROM tot
ORDER BY metric, k
"""

"""Corpus curation: budgeted selection and curriculum staging (extension).

Two ops a training pipeline runs AFTER scoring (text.py) and dedup
(dedup.py) to decide what actually enters the mixture:

- budget_curation: within each source, greedily keep the best-quality
  documents until that source's character budget is spent — the
  per-stratum knapsack-greedy that enforces "no source dominates" while
  maximizing kept quality. Window is partitioned by SOURCE (running sum
  per stratum), never global.
- quality_deciles: per-language decile staging of the quality score
  (curriculum ordering / stratified eval splits). ``ntile`` needs a
  per-partition sort; at 100 TB per-language partitions are corpus-
  sized, so the cluster path swaps ntile for the approximate-threshold
  join (compute 9 per-lang quantile cut points, broadcast, map-side
  bucket assign — the `layout.equidepth_histogram` shape). The ntile
  form is the exact, oracle-checkable semantics both share.

Determinism: quality_score is the shared `text.quality_score_col`
expression (round-6 double, engine-identical); orderings always
tie-break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.text import QUALITY_SQL, quality_score_col
from etl_mini_dw_spark.sources.tables import load_table

BUDGET_CHARS_PER_SOURCE = 2000
N_DECILES = 10


def budget_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept documents per source under the character budget, best first."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", quality_score_col().alias("quality_score")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality_score").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum_chars", F.sum("n_chars").over(w).cast("bigint"))
        .filter(F.col("cum_chars") <= BUDGET_CHARS_PER_SOURCE)
        .select("doc_id", "source", "quality_score", "n_chars", "cum_chars")
    )


BUDGET_CURATION_SQL = f"""
WITH scored AS (
  SELECT doc_id, source, n_chars, {QUALITY_SQL} AS quality_score FROM documents
),
cum AS (
  SELECT *, CAST(SUM(n_chars) OVER (PARTITION BY source
                                    ORDER BY quality_score DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
  FROM scored
)
SELECT doc_id, source, quality_score, n_chars, cum_chars
FROM cum WHERE cum_chars <= {BUDGET_CHARS_PER_SOURCE}
"""


def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality decile for curriculum staging (1 = worst)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", quality_score_col().alias("quality_score")
    )
    w = Window.partitionBy("lang").orderBy("quality_score", "doc_id")
    return docs.withColumn("decile", F.ntile(N_DECILES).over(w).cast("int"))


QUALITY_DECILES_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang, {QUALITY_SQL} AS quality_score FROM documents
)
SELECT doc_id, lang, quality_score,
       CAST(ntile({N_DECILES}) OVER (PARTITION BY lang
                                     ORDER BY quality_score, doc_id) AS INTEGER) AS decile
FROM scored
"""

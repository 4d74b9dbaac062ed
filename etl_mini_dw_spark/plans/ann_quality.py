"""ANN index quality: recall of the approximate indexes vs ground truth.

The measurement an index deployment runs after every (re)build: how much
of the EXACT top-k does each approximate path (multi-probe IVF, product
quantization) actually return? Recall@k is the recall knob's feedback
loop — probe depth, codebook size, and band width all get tuned against
this number, so it belongs in the engine as a first-class query, not a
notebook afterthought.

Exactness: recall here is a pure set-overlap count between two
deterministic top-k result sets (both tie-broken on cand_id), so the
report is integer-exact and oracle-checkable even though the indexes are
"approximate" — approximation lives in WHICH neighbors are returned, not
in any floating-point nondeterminism.

Scale: each branch is its existing top-k plan (bounded outputs:
queries×k rows); the overlap join is k-row-per-query against
k-row-per-query. The report costs three index lookups, nothing more.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions import pq, simsearch
from etl_mini_dw_spark.functions.simsearch import TOP_K


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(method, query_id, n_overlap, recall_at_k) per approximate index."""
    truth = simsearch.ann_bruteforce_topk(spark, sf_dir).select(
        "query_id", "cand_id"
    ).localCheckpoint(eager=False)
    queries = truth.select("query_id").distinct()
    methods = {
        "ivf_multiprobe": simsearch.ivf_multiprobe_topk(spark, sf_dir),
        "pq_adc": pq.ann_pq_topk(spark, sf_dir),
        # r5: the other two compression tiers join the same scoreboard
        "int8_dot": simsearch.ann_int8_topk(spark, sf_dir),
        "sign_hamming": simsearch.ann_hamming_topk(spark, sf_dir),
    }

    def _one(name: str, approx: DataFrame) -> DataFrame:
        hits = (
            truth.join(approx.select("query_id", "cand_id"), ["query_id", "cand_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
        )
        return queries.join(hits, "query_id", "left").select(
            F.lit(name).alias("method"),
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
        )
    out = reduce(
        lambda a, b: a.unionByName(b), [_one(n, df) for n, df in methods.items()]
    )
    return out.withColumn(
        "recall_at_k", F.col("n_overlap").cast("double") / F.lit(float(TOP_K))
    )


def ann_recall_report_sql() -> str:
    branches = {
        "ivf_multiprobe": simsearch.IVF_MULTIPROBE_SQL,
        "pq_adc": pq.ann_pq_topk_sql(),
        "int8_dot": simsearch.ANN_INT8_SQL,
        "sign_hamming": simsearch.ann_hamming_topk_sql(),
    }
    ctes = ",\n".join(
        f"a_{m} AS (SELECT query_id, cand_id FROM ({sql})),\n"
        f"h_{m} AS (SELECT t.query_id, COUNT(*) AS n FROM truth t\n"
        f"  JOIN a_{m} a ON t.query_id = a.query_id AND t.cand_id = a.cand_id\n"
        f"  GROUP BY 1)"
        for m, sql in branches.items()
    )
    union = "\nUNION ALL\n".join(
        f"SELECT '{m}' AS method, qs.query_id,"
        f" CAST(COALESCE(h_{m}.n, 0) AS BIGINT) AS n_overlap"
        f" FROM qs LEFT JOIN h_{m} USING (query_id)"
        for m in branches
    )
    return f"""
WITH truth AS (SELECT query_id, cand_id FROM ({simsearch.ANN_BRUTEFORCE_SQL})),
qs AS (SELECT DISTINCT query_id FROM truth),
{ctes},
r AS (
{union}
)
SELECT method, query_id, n_overlap,
       CAST(n_overlap AS DOUBLE) / CAST({TOP_K} AS DOUBLE) AS recall_at_k
FROM r
"""

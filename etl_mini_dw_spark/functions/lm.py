"""Statistical language-model scoring of documents (extension).

The CCNet/Gopher-style quality gate a training-data pipeline runs after
the cheap heuristics in `functions/text.py`: train an n-gram language
model ON the corpus itself, then score every document by its average
per-token surprisal — documents full of globally-rare transitions
(boilerplate soup, OCR noise, wrong-language fragments) score high and
get filtered or down-weighted.

Determinism: real perplexity needs ``ln p`` and libm logs legitimately
differ by 1 ulp across engines — unacceptable under the oracle gate (and
for reproducible corpus filtering generally). Instead the surprisal of a
bigram with corpus count c out of T total is bucketed to the INTEGER
``⌊log2 T⌋ − ⌊log2 c⌋``, computed as ``length(bin(x)) − 1`` — pure
integer/string ops, bit-identical everywhere, monotone in 1/c like the
real thing (the same trade the linear-idf variant in text.py makes).

Scale shape: tokenize+bigram assembly are map-only over a lazily
checkpointed array (the Generate trap — CLAUDE.md); one (doc, bigram)
hash aggregate; the model itself is the (bigram → count) aggregate of
the SAME frame (no second corpus scan); the score join shuffles on the
bigram key — high-cardinality, and a skewed stop-bigram head at 100 TB
would AQE-split or salt exactly like operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.text import WORD_RE


def _log2b(col: F.Column) -> F.Column:
    """⌊log2 x⌋ for x ≥ 1 via binary-string length — integer-exact."""
    return F.length(F.bin(col)) - F.lit(1)


def lm_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average bigram surprisal under the corpus bigram LM.

    Returns (doc_id, n_bigrams, surprisal_sum, avg_surprisal) for every
    document with ≥ 2 tokens; higher avg_surprisal = rarer transitions =
    lower-quality/out-of-domain text.
    """
    from etl_mini_dw_spark.functions.text import _word_frame

    docs = _word_frame(spark, sf_dir).select("doc_id", "w").filter(F.size("w") >= 2)
    # stage the bigram array BEFORE the explode (Generate re-evaluates
    # pipelined child expressions per OUTPUT row — CLAUDE.md invariant)
    arrs = docs.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))"
        ).alias("bg_arr"),
    ).localCheckpoint(eager=False)
    inst = arrs.select("doc_id", F.explode("bg_arr").alias("bg"))
    # (doc, bigram) term frequencies — the single aggregate every other
    # frame below derives from (one pass over the instances)
    tf = (
        inst.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    cnt = tf.groupBy("bg").agg(F.sum("tf").cast("bigint").alias("c"))
    tot = cnt.agg(F.sum("c").cast("bigint").alias("t"))
    bucket = _log2b(F.col("t")) - _log2b(F.col("c"))
    return (
        tf.join(cnt, "bg")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("tf") * bucket).cast("bigint").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


LM_SURPRISAL_SQL = f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS w FROM documents
),
inst AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(w), 1)),
                               i -> w[i] || ' ' || w[i+1])) AS bg
  FROM words WHERE len(w) >= 2
),
tf AS (SELECT doc_id, bg, COUNT(*) AS tf FROM inst GROUP BY 1, 2),
cnt AS (SELECT bg, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       CAST(SUM(tf * ((length(bin(t)) - 1) - (length(bin(c)) - 1))) AS BIGINT)
         AS surprisal_sum,
       CAST(CAST(SUM(tf * ((length(bin(t)) - 1) - (length(bin(c)) - 1))) AS BIGINT)
            AS DOUBLE)
         / CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
FROM tf JOIN cnt USING (bg), tot
GROUP BY doc_id, t
"""

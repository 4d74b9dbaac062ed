"""Training-corpus assembly operators: chunking, packing, data mixing.

The last mile of a pre-training data pipeline, after cleaning/dedup
(functions/dedup.py, sampling.py, text.py): turn documents into
model-ready units and hit a token-mixture target. The reference has no
analogue (its corpus surface is zero); these follow the shapes the
public pipeline literature describes (GPT-3 §2.2 mixture weights,
Gopher §A1 chunking, T5 pack-and-split).

All three are exact-integer arithmetic end-to-end so the DuckDB oracle
hash-matches bit-for-bit — and, at 100 TB, so results are independent
of partitioning and reduction order:

- ``doc_chunks`` — fixed-size token windows with overlap. Map-only fan
  out (no shuffle); the chunk arrays are materialized via a lazy
  ``localCheckpoint`` BEFORE the explode (the repo's Generate rule —
  a pipelined explode re-evaluates its child per OUTPUT row).
- ``sequence_packing`` — document-level concat-and-split packing:
  docs concatenate in deterministic (source, doc_id) order and each doc
  lands in the training sequence where its first token falls. ONE
  shuffle (window partition by source) + running sum — the same
  single-shuffle shape as the windows battery. At 100 TB the partition
  key becomes (source, shard) so no single source serializes a task.
- ``mixture_sampling`` — per-source keep-thresholds hit a target token
  mixture under a global budget: thresholds derive from per-source
  token mass (one tiny aggregate, broadcast back), membership is the
  same multiplicative doc-id hash as ``sampling.py`` — reproducible
  across engines, runs, and partitionings; never ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.sampling import _HASH_SQL, _hash_col
from etl_mini_dw_spark.functions.text import TOKEN_RE
from etl_mini_dw_spark.sources.tables import fanout_scan, load_table

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # overlap = CHUNK_TOKENS - CHUNK_STRIDE = 8 tokens
SEQ_LEN = 512
HASH_MOD = 1_000_000  # must match sampling.HASH_MOD (hash values in [0, 1e6))
BUDGET_PCT = 60  # global token budget as % of corpus tokens
# target mixture in ppm: 4 favored sources get 6× the tail's share
# (sums to 1e6 across the 20 sources: 4×150k + 16×25k)
FAVORED_SOURCES = ("src0", "src1", "src2", "src3")
FAVORED_PPM = 150_000
TAIL_PPM = 25_000


def _tokens_col() -> F.Column:
    return F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token-window chunks per document.

    Output: (doc_id, chunk_idx, n_chunk_tokens, chunk_sig) where
    ``chunk_sig`` is the md5 of the space-joined chunk tokens — the
    value a downstream tokenizer shard would key on.
    """
    docs = fanout_scan(spark, load_table(spark, sf_dir, "documents"))
    staged = docs.select("doc_id", _tokens_col().alias("t")).filter(F.size("t") > 0)
    arrs = staged.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, size(t) - 1, {CHUNK_STRIDE}),"
            f" s -> slice(t, s + 1, {CHUNK_TOKENS}))"
        ).alias("chunks"),
    ).localCheckpoint(eager=False)  # materialize BEFORE the explode (Generate rule)
    return arrs.select(
        "doc_id", F.posexplode("chunks").alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("chunk").cast("int").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_sig"),
    )


DOC_CHUNKS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS t FROM documents
),
starts AS (
  SELECT doc_id, t,
         unnest(generate_series(0, len(t) - 1, {CHUNK_STRIDE})) AS s
  FROM t WHERE len(t) > 0
)
SELECT doc_id,
       CAST(s // {CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(len(t[s + 1 : s + {CHUNK_TOKENS}]) AS INT) AS n_chunk_tokens,
       md5(array_to_string(t[s + 1 : s + {CHUNK_TOKENS}], ' ')) AS chunk_sig
FROM starts
"""


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level concat-and-split packing into SEQ_LEN-token
    training sequences, one stream per source.

    Each doc is assigned to the sequence where its first token lands
    when the source's docs concatenate in doc_id order (running-sum
    window → integer division). Output is per-sequence packing stats:
    docs packed, token fill, and the fill ratio a packing-efficiency
    dashboard would alert on.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(_tokens_col()).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = docs.withColumn(
        "seq_id", (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(SEQ_LEN)).cast("bigint")
    )
    return assigned.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.round(F.sum("n_tokens").cast("double") / F.lit(float(SEQ_LEN)), 6).alias(
            "fill_ratio"
        ),
    )


SEQUENCE_PACKING_SQL = f"""
WITH docs AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens
  FROM documents
),
assigned AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) // {SEQ_LEN} AS seq_id
  FROM docs
)
SELECT source, CAST(seq_id AS BIGINT) AS seq_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       round(CAST(SUM(n_tokens) AS DOUBLE) / {SEQ_LEN}, 6) AS fill_ratio
FROM assigned GROUP BY source, seq_id
"""


def mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixing: per-source keep-thresholds that hit a
    target token mixture under a BUDGET_PCT global token budget.

    needed(source)   = budget × target_ppm ÷ 1e6        (integer)
    threshold(source)= min(MOD, MOD × needed ÷ tokens)  (integer)
    keep(doc)        = doc-id hash < threshold(source)

    The per-source token-mass aggregate is a 20-row frame, broadcast
    back against the corpus — the plan is one partial-aggregable
    shuffle plus a map-side probe, regardless of corpus size. Output is
    the per-source mixing report (threshold, docs/tokens kept).
    """
    # one corpus pass: the per-doc token counts feed three consumers
    # (per-source mass, the global total, the kept-side filter) — stage
    # them once instead of re-running the regex extraction per consumer
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(_tokens_col()).cast("bigint").alias("n_tokens"),
            _hash_col().alias("h"),
        )
        .localCheckpoint(eager=False)
    )
    ppm = (
        F.when(F.col("source").isin(*FAVORED_SOURCES), F.lit(FAVORED_PPM))
        .otherwise(F.lit(TAIL_PPM))
        .cast("bigint")
    )
    per_source = docs.groupBy("source").agg(
        F.sum("n_tokens").alias("source_tokens"), F.count(F.lit(1)).alias("source_docs")
    )
    total = per_source.agg(F.sum("source_tokens").cast("bigint").alias("total_tokens"))
    thresholds = (
        per_source.crossJoin(F.broadcast(total))
        .withColumn("ppm_v", ppm)
        .withColumn("budget", F.expr(f"total_tokens * {BUDGET_PCT} div 100"))
        .withColumn("needed", F.expr("budget * ppm_v div 1000000"))
        .withColumn(
            "keep_threshold",
            F.least(
                F.lit(HASH_MOD).cast("bigint"),
                F.expr(f"{HASH_MOD} * needed div greatest(source_tokens, 1)"),
            ),
        )
        .select("source", "source_docs", "source_tokens", "keep_threshold")
    )
    kept = (
        docs.join(F.broadcast(thresholds.select("source", "keep_threshold")), "source")
        .filter(F.col("h") < F.col("keep_threshold"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
        )
    )
    return (
        thresholds.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            "source_docs",
            F.col("source_tokens").cast("bigint").alias("source_tokens"),
            F.col("keep_threshold").cast("bigint").alias("keep_threshold"),
            F.coalesce("kept_docs", F.lit(0)).cast("bigint").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("bigint").alias("kept_tokens"),
        )
    )


MIXTURE_SAMPLING_SQL = f"""
WITH docs AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
         {_HASH_SQL} AS h
  FROM documents
),
per_source AS (
  SELECT source, SUM(n_tokens) AS source_tokens, COUNT(*) AS source_docs
  FROM docs GROUP BY source
),
thresholds AS (
  SELECT source, source_docs, source_tokens,
         least(
           {HASH_MOD},
           {HASH_MOD} * (((SELECT SUM(source_tokens) FROM per_source) * {BUDGET_PCT} // 100)
                         * CASE WHEN source IN {FAVORED_SOURCES}
                                THEN {FAVORED_PPM} ELSE {TAIL_PPM} END // 1000000)
           // greatest(source_tokens, 1)
         ) AS keep_threshold
  FROM per_source
),
kept AS (
  SELECT d.source, COUNT(*) AS kept_docs, SUM(d.n_tokens) AS kept_tokens
  FROM docs d JOIN thresholds t ON d.source = t.source AND d.h < t.keep_threshold
  GROUP BY d.source
)
SELECT t.source,
       CAST(source_docs AS BIGINT) AS source_docs,
       CAST(source_tokens AS BIGINT) AS source_tokens,
       CAST(keep_threshold AS BIGINT) AS keep_threshold,
       CAST(COALESCE(kept_docs, 0) AS BIGINT) AS kept_docs,
       CAST(COALESCE(kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM thresholds t LEFT JOIN kept k ON t.source = k.source
"""

"""Lexical top-k retrieval (BM25) over the document corpus (extension).

The retrieval side of a training-data pipeline that `simsearch.py`
covers for embeddings: score candidate documents against a query by
Okapi BM25 over shared tokens — the operator behind hard-negative
mining, near-benchmark lookup, and "find the corpus docs most like
this one" audits. Query set here: every 100th document, its query being
the distinct tokens among its first ``QUERY_TERMS`` tokens.

Determinism (the lm.py trade, engine-exact): libm ``ln`` differs by
1 ulp across engines and a float score SUM is reduction-order-
dependent, so BM25 is evaluated in INTEGER arithmetic end-to-end:

- idf is the LINEAR variant ``N/df`` on a 10^6 fixed-point grid,
  ``idf_scaled = (N·10^6) div df`` — the same trade `text.py`'s tf-idf
  makes. (The first cut used lm.py's ⌊log2⌋ bucketing, but on this
  corpus's ~30-word shared vocabulary every df lands in the top log2
  bucket and ALL scores collapse to 0 — linear idf keeps the full
  df resolution with no float ops. A real web corpus has the df spread
  where log2 bucketing suffices; both are documented engine-exact
  choices at the same seam.)
- the tf-saturation term with k1 = 1.2 = 12/10, b = 0.75 = 3/4 and
  avgdl = T/N is cleared of ALL fractions by multiplying through by
  10·N (T = total corpus tokens, N = docs):

      idf · tf·(k1+1) / (tf + k1·(1−b+b·len/avgdl))
    = idf · 22·tf·T / (10·tf·T + 3·T + 9·len·N)

  with idf_scaled as the numerator's idf, each term floored by ONE
  integer division — the per-term value and the summed score are
  bit-identical on any engine and any partitioning. int64 headroom:
  idf_scaled ≤ N·10^6 and the numerator ≈ N·10^6·22·tf·T stays under
  2^63 through bench scale; at cluster scale it promotes to
  DECIMAL(38,0) exactly like the pagerank rank sums (SCALE.md).

100 TB shape: this is an inverted-index join — the postings frame
(token, doc, tf, len) is ONE partial-aggregable shuffle of the corpus;
queries ⋈ df is dim-sized and broadcast into the postings join, so
candidate volume is Σ df over query terms, never corpus × queries.
The production upgrades (WAND/rare-term-first pruning, df cutoffs for
stop tokens) drop into the same plan at the broadcast seam.

Reference scope: extension beyond etl-mini-dw (no text ops in the
reference); published operator (Robertson & Zaragoza 2009) re-expressed
Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.text import TOKEN_RE, _token_frame
from etl_mini_dw_spark.sources.tables import load_table

BM25_TOP_K = 10
QUERY_STRIDE = 100  # every 100th doc_id poses a query
QUERY_TERMS = 12  # first 12 tokens of the query doc, distinct
BM25_SCALE = 1_000_000  # fixed-point grid for per-term scores


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_doc, rank, doc_id, n_shared_terms, score_scaled): top-10 BM25
    matches per query doc (self excluded), integer-exact scoring.

    r09: staged once per (session, sf-dir) — four registered queries
    consume this ranking (the BM25 line itself, RRF fusion, RBO arm
    agreement, hard-negative mining); the output is (queries × k) rows,
    so the checkpoint is tiny while each re-build costs a full postings
    pass (guide §2.4). `ext_bm25_topk` runs before its consumers in the
    bench's sorted order, so its line is the one that pays the build.
    """
    from etl_mini_dw_spark.sources.tables import stage_memo

    return stage_memo(
        spark,
        sf_dir,
        "bm25_topk",
        lambda: _bm25_topk_build(spark, sf_dir).localCheckpoint(eager=False),
    )


def _bm25_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _token_frame(spark, sf_dir).select("doc_id", "toks")
    postings = (
        toks.select(
            "doc_id",
            F.size("toks").cast("bigint").alias("len"),
            F.explode("toks").alias("token"),
        )
        .groupBy("doc_id", "len", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("t_tokens"),
    )
    df = postings.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    qterms = (
        toks.filter(F.col("doc_id") % QUERY_STRIDE == 0)
        .select(
            F.col("doc_id").alias("q_doc"),
            F.explode(F.slice("toks", 1, QUERY_TERMS)).alias("token"),
        )
        .distinct()
        .join(df, "token")
    )
    # scalar hoist (the P12 pattern) then per-term integer BM25
    scored = (
        postings.join(F.broadcast(qterms), "token")
        .filter(F.col("doc_id") != F.col("q_doc"))
        .crossJoin(F.broadcast(stats))
        .select(
            "q_doc",
            "doc_id",
            F.expr(
                f"(((n_docs * CAST({BM25_SCALE} AS BIGINT)) div df)"
                " * 22 * tf * t_tokens)"
                " div (10 * tf * t_tokens + 3 * t_tokens + 9 * len * n_docs)"
            ).alias("term_scaled"),
        )
    )
    agg = scored.groupBy("q_doc", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shared_terms"),
        F.sum("term_scaled").cast("bigint").alias("score_scaled"),
    )
    # the scored-candidate set per query is df-bounded, but a flat vocab
    # (this fixture's worst case: every df = n_docs) makes it corpus-
    # sized — shard-prune before the per-query ranking window (r8)
    from etl_mini_dw_spark.functions.simsearch import shard_topk_prune

    agg = shard_topk_prune(
        agg,
        ["q_doc"],
        [F.col("score_scaled").desc(), F.col("doc_id")],
        BM25_TOP_K,
        "doc_id",
    )
    w = Window.partitionBy("q_doc").orderBy(
        F.col("score_scaled").desc(), F.col("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("q_doc", "rank", "doc_id", "n_shared_terms", "score_scaled")
    )


BM25_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '{TOKEN_RE}'), t -> lower(t)) AS toks
  FROM documents
),
postings AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS len, token,
         CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, toks, unnest(toks) AS token FROM toks)
  GROUP BY doc_id, len, token
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(toks)) AS BIGINT) AS t_tokens
  FROM toks
),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY token),
qterms AS (
  SELECT DISTINCT q_doc, token FROM (
    SELECT doc_id AS q_doc, unnest(toks[1:{QUERY_TERMS}]) AS token
    FROM toks WHERE doc_id % {QUERY_STRIDE} = 0)
),
qdf AS (SELECT q.q_doc, q.token, df.df FROM qterms q JOIN df USING (token)),
scored AS (
  SELECT q.q_doc, p.doc_id,
         (((s.n_docs * CAST({BM25_SCALE} AS BIGINT)) // q.df)
          * 22 * p.tf * s.t_tokens)
         // (10 * p.tf * s.t_tokens + 3 * s.t_tokens + 9 * p.len * s.n_docs)
           AS term_scaled
  FROM postings p JOIN qdf q USING (token), stats s
  WHERE p.doc_id <> q.q_doc
),
agg AS (
  SELECT q_doc, doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
         CAST(SUM(term_scaled) AS BIGINT) AS score_scaled
  FROM scored GROUP BY q_doc, doc_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_doc
                                    ORDER BY score_scaled DESC, doc_id)
                 AS INTEGER) AS rank
  FROM agg
)
SELECT q_doc, rank, doc_id, n_shared_terms, score_scaled
FROM ranked WHERE rank <= {BM25_TOP_K}
"""


# --- trigram-indexed substring search (pg_trgm shape) ------------------------
# "grep at corpus scale": a LIKE '%pattern%' scan reads every byte of
# every document; the production shape (PostgreSQL pg_trgm, code-search
# engines) is a TRIGRAM posting index — candidates are docs containing
# ALL of the pattern's character trigrams (a superset of true matches),
# verified by one substring probe each. Patterns chosen to cover the
# selectivity spectrum on this corpus: rare / few / common / ABSENT
# (the absent one pins the zero-candidate path).
TRGM_PATTERNS = [
    "fast merge batch",   # 1 doc at sf0.01
    "merge batch part",   # few docs
    "window table",       # common
    "spark sql",          # no matches — index must yield nothing
]


def trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pattern, n_candidates, n_matches, min_doc_id, max_doc_id):
    trigram-index candidate generation + exact substring verification
    per pattern. min/max over VERIFIED matches (NULL-free: -1 when no
    match, keeping the compared output scalar and portable).

    Scale: the trigram posting build is ONE distinct+explode pass over
    the corpus (the index a real deployment materializes once and
    reuses); the pattern side is a handful of literals broadcast into
    the posting join, so per-query cost is Σ df over pattern trigrams
    + one `locate` per candidate — never a full-corpus LIKE scan. The
    trigram arrays are checkpointed ahead of the explode
    (Generate-collapse rule).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    tri_arr = docs.select(
        "doc_id",
        F.expr(
            "array_distinct(transform(sequence(1, length(t) - 2),"
            " i -> substring(t, i, 3)))"
        ).alias("tris"),
    ).localCheckpoint(eager=False)
    postings = tri_arr.select("doc_id", F.explode("tris").alias("tri"))

    pats = spark.createDataFrame(
        [(p,) for p in TRGM_PATTERNS], ["pattern"]
    ).select(
        "pattern",
        F.expr(
            "array_distinct(transform(sequence(1, length(pattern) - 2),"
            " i -> substring(pattern, i, 3)))"
        ).alias("ptris"),
    )
    pat_tri = pats.select(
        "pattern", F.size("ptris").alias("n_tris"), F.explode("ptris").alias("tri")
    )
    cands = (
        postings.join(F.broadcast(pat_tri), "tri")
        .groupBy("pattern", "n_tris", "doc_id")
        .agg(F.count(F.lit(1)).alias("hit_tris"))
        .filter(F.col("hit_tris") == F.col("n_tris"))
        .select("pattern", "doc_id")
    )
    verified = cands.join(docs, "doc_id").select(
        "pattern",
        "doc_id",
        (F.expr("locate(pattern, t)") > 0).alias("is_match"),
    )
    agg = verified.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("is_match"), 1).otherwise(0)).cast("bigint").alias("n_matches"),
        F.coalesce(
            F.min(F.when(F.col("is_match"), F.col("doc_id"))), F.lit(-1)
        ).cast("bigint").alias("min_doc_id"),
        F.coalesce(
            F.max(F.when(F.col("is_match"), F.col("doc_id"))), F.lit(-1)
        ).cast("bigint").alias("max_doc_id"),
    )
    # absent patterns produce no candidate rows at all — restore them as
    # explicit zero rows so the report always has one row per pattern
    # (agg is ≤ |patterns| rows — broadcast it; left-outer won't pick
    # broadcast for a statless derived frame on its own)
    spine = pats.select("pattern")
    return spine.join(F.broadcast(agg), "pattern", "left").select(
        "pattern",
        F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
        F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
        F.coalesce("min_doc_id", F.lit(-1)).cast("bigint").alias("min_doc_id"),
        F.coalesce("max_doc_id", F.lit(-1)).cast("bigint").alias("max_doc_id"),
    )


def trigram_search_sql() -> str:
    pat_values = ", ".join(f"('{p}')" for p in TRGM_PATTERNS)
    return f"""
WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
tri AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - 1, 1)),
           i -> substr(t, CAST(i AS INT), 3)))) AS tri
  FROM docs
),
pats AS (
  SELECT pattern,
         list_distinct(list_transform(range(1, greatest(len(pattern) - 1, 1)),
           i -> substr(pattern, CAST(i AS INT), 3))) AS ptris
  FROM (VALUES {pat_values}) v(pattern)
),
pat_tri AS (
  SELECT pattern, len(ptris) AS n_tris, unnest(ptris) AS tri FROM pats
),
cands AS (
  SELECT p.pattern, p.n_tris, t.doc_id, COUNT(*) AS hit_tris
  FROM tri t JOIN pat_tri p USING (tri)
  GROUP BY 1, 2, 3
  HAVING COUNT(*) = p.n_tris
),
verified AS (
  SELECT c.pattern, c.doc_id,
         position(c.pattern IN d.t) > 0 AS is_match
  FROM cands c JOIN docs d USING (doc_id)
),
agg AS (
  SELECT pattern,
         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
         COALESCE(MIN(CASE WHEN is_match THEN doc_id END), -1) AS min_doc_id,
         COALESCE(MAX(CASE WHEN is_match THEN doc_id END), -1) AS max_doc_id
  FROM verified GROUP BY pattern
)
SELECT s.pattern,
       COALESCE(a.n_candidates, 0) AS n_candidates,
       COALESCE(a.n_matches, 0) AS n_matches,
       CAST(COALESCE(a.min_doc_id, -1) AS BIGINT) AS min_doc_id,
       CAST(COALESCE(a.max_doc_id, -1) AS BIGINT) AS max_doc_id
FROM (SELECT pattern FROM pats) s LEFT JOIN agg a USING (pattern)
"""


# --- Reciprocal-rank-fusion hybrid retrieval ----------------------------------
#
# The hybrid-search fusion step every RAG/retrieval stack runs: combine
# a LEXICAL ranking (BM25 above) with a SEMANTIC ranking (sign-bit
# hamming over the document embeddings — vec_id is doc_id in this
# corpus) by reciprocal rank fusion (Cormack et al. 2009):
#     rrf(d) = Σ_r 1 / (K + rank_r(d)),  K = 60.
# Fusion is rank-only, so the two scorers' incomparable score scales
# never touch — which is exactly why RRF is the production default.
#
# Engine-exactness: rrf is evaluated on a 10^12 fixed-point grid with
# ONE integer division per list — rrf_scaled = Σ 10^12 div (K + rank) —
# so the fused ordering is integer-total (ties → doc_id) and the driver
# hash never sees a float.
#
# 100 TB shape (re-derived in r8 after SCALE_PROOF measured alpha=1.54
# on the brute-force semantic arm): the lexical arm is bounded by the
# Σ df postings join; the semantic arm now generates candidates by the
# SAME multiprobe sign-LSH discipline as `simsearch.ivf_multiprobe_topk`
# — each query probes its own 8-bit bucket plus the 8 buckets at bit
# distance 1 (~3.5% of the corpus), ranks by exact sign-bit hamming
# within the probed cells, and shard-prunes before its window. This is
# the production hybrid-retrieval shape (ANN candidates + exact re-rank),
# not a brute-force scan: per-query work is probe-bounded, and fusion
# itself is a union + aggregate of two (queries × k)-row frames plus one
# bounded per-query window. The exact-hamming full-scan ranking remains
# available as `ext_ann_hamming_topk` (the recall baseline).

RRF_K = 60
RRF_SCALE = 10**12
RRF_TOP_K = 10


def _sem_arm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_doc, doc_id, r_sem) — the multiprobe sign-LSH hamming arm's
    top-10 per query (shared by the RRF fusion and the RBO agreement
    report; extracted verbatim so the two stay value-locked).

    r09: staged once per (session, sf-dir) — same rationale as
    ``bm25_topk`` (two consumers, tiny output, expensive build)."""
    from etl_mini_dw_spark.sources.tables import stage_memo

    return stage_memo(
        spark,
        sf_dir,
        "sem_arm_topk",
        lambda: _sem_arm_topk_build(spark, sf_dir).localCheckpoint(eager=False),
    )


def _sem_arm_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mini_dw_spark.functions.simsearch import (
        LSH_DIMS,
        _bucket_expr_spark,
        _sig_expr_spark,
        shard_topk_prune,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        _sig_expr_spark(True).alias("sig_lo"),
        _sig_expr_spark(False).alias("sig_hi"),
        _bucket_expr_spark().alias("bucket"),
    )
    probes = [F.col("bucket")] + [
        F.expr(f"CAST(bucket ^ {1 << i} AS INT)") for i in range(len(LSH_DIMS))
    ]
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("q_doc"),
        F.col("sig_lo").alias("q_lo"),
        F.col("sig_hi").alias("q_hi"),
        F.explode(F.array(*probes)).alias("probe_bucket"),
    )
    c = emb.select(
        F.col("vec_id").alias("doc_id"),
        "sig_lo",
        "sig_hi",
        F.col("bucket").alias("probe_bucket"),
    )
    ham = F.expr("bit_count(q_lo ^ sig_lo) + bit_count(q_hi ^ sig_hi)")
    w_sem = Window.partitionBy("q_doc").orderBy("hamming", "doc_id")
    # candidates = the 9 probed cells per query (each candidate's own
    # bucket matches exactly one probe — no duplicate pairs); the
    # per-query window then ranks ≤ 64·k shard-prune survivors
    scored = (
        q.join(c, "probe_bucket")
        .filter(F.col("q_doc") != F.col("doc_id"))
        .select("q_doc", "doc_id", ham.alias("hamming"))
    )
    pruned = shard_topk_prune(
        scored, ["q_doc"], [F.col("hamming"), F.col("doc_id")], BM25_TOP_K, "doc_id"
    )
    return (
        pruned.withColumn("r_sem", F.row_number().over(w_sem).cast("int"))
        .filter(F.col("r_sem") <= BM25_TOP_K)
        .select("q_doc", "doc_id", "r_sem")
    )


def rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_doc, rank, doc_id, r_lex, r_sem, rrf_scaled): top-10 fused
    candidates per query doc from BM25 ∪ multiprobe-LSH hamming rankings
    (semantic arm re-blocked in r8 — see the module note above; values
    changed vs the pre-r8 brute-force arm, registry recheck entry)."""
    lex = bm25_topk(spark, sf_dir).select(
        "q_doc", "doc_id", F.col("rank").alias("r_lex")
    )
    sem = _sem_arm_topk(spark, sf_dir)
    # fuse by UNION + one tiny aggregate rather than a full-outer join:
    # a full outer of two derived frames compiles to SortMergeJoin
    # (Spark cannot broadcast FullOuter), and the union form needs no
    # join at all — same values, one k-bounded shuffle
    contrib = lex.select(
        "q_doc", "doc_id", F.col("r_lex").alias("r"), F.lit("lex").alias("src")
    ).unionByName(
        sem.select(
            "q_doc", "doc_id", F.col("r_sem").alias("r"), F.lit("sem").alias("src")
        )
    )
    fused = contrib.groupBy("q_doc", "doc_id").agg(
        F.min(F.when(F.col("src") == "lex", F.col("r"))).cast("int").alias("r_lex"),
        F.min(F.when(F.col("src") == "sem", F.col("r"))).cast("int").alias("r_sem"),
        F.sum(F.expr(f"CAST({RRF_SCALE} AS BIGINT) div ({RRF_K} + r)"))
        .cast("bigint")
        .alias("rrf_scaled"),
    )
    w = Window.partitionBy("q_doc").orderBy(F.col("rrf_scaled").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= RRF_TOP_K)
        .select("q_doc", "rank", "doc_id", "r_lex", "r_sem", "rrf_scaled")
    )


def rrf_hybrid_topk_sql() -> str:
    from etl_mini_dw_spark.functions.simsearch import (
        _bucket_expr_sql,
        _probe_buckets_expr_sql,
        _sig_expr_sql,
    )

    return f"""
WITH lex AS (
  SELECT q_doc, doc_id, rank AS r_lex FROM ({BM25_TOPK_SQL})
),
sig AS (
  SELECT vec_id, {_sig_expr_sql(True)} AS sig_lo, {_sig_expr_sql(False)} AS sig_hi,
         {_bucket_expr_sql()} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS q_doc, sig_lo AS q_lo, sig_hi AS q_hi,
         unnest({_probe_buckets_expr_sql("bucket")}) AS probe_bucket
  FROM sig WHERE vec_id % {QUERY_STRIDE} = 0
),
sem0 AS (
  SELECT q.q_doc, s.vec_id AS doc_id,
         bit_count(xor(q.q_lo, s.sig_lo)) + bit_count(xor(q.q_hi, s.sig_hi))
           AS hamming
  FROM q JOIN sig s ON s.bucket = q.probe_bucket AND s.vec_id <> q.q_doc
),
sem AS (
  SELECT q_doc, doc_id, CAST(r AS INTEGER) AS r_sem FROM (
    SELECT *, row_number() OVER (PARTITION BY q_doc ORDER BY hamming, doc_id)
              AS r
    FROM sem0) WHERE r <= {BM25_TOP_K}
),
contrib AS (
  SELECT q_doc, doc_id, r_lex AS r, 'lex' AS src FROM lex
  UNION ALL
  SELECT q_doc, doc_id, r_sem AS r, 'sem' AS src FROM sem
),
fused AS (
  SELECT q_doc, doc_id,
         CAST(MIN(CASE WHEN src = 'lex' THEN r END) AS INTEGER) AS r_lex,
         CAST(MIN(CASE WHEN src = 'sem' THEN r END) AS INTEGER) AS r_sem,
         CAST(SUM(CAST({RRF_SCALE} AS BIGINT) // ({RRF_K} + r)) AS BIGINT)
           AS rrf_scaled
  FROM contrib GROUP BY 1, 2
)
SELECT q_doc, CAST(r AS INTEGER) AS rank, doc_id, r_lex, r_sem, rrf_scaled
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_doc
                               ORDER BY rrf_scaled DESC, doc_id) AS r
  FROM fused)
WHERE r <= {RRF_TOP_K}
"""


# --- Hard-negative mining ------------------------------------------------------
#
# The contrastive-training sampler: for each query document, keep the
# candidates that score HIGH lexically but come from a DIFFERENT source
# than the query (same-source hits are the positives/duplicates family
# a retrieval trainer must not use as negatives — the standard
# in-batch-negatives hygiene rule, BM25-mined as in DPR's hard-negative
# recipe). Mined from the deterministic BM25 top-10 pool above, so the
# whole query is a dim-sized re-rank of an already-bounded frame.
#
# 100 TB shape: candidates are queries × k rows; the two source lookups
# broadcast the (doc_id, source) projection of the dimension-sized doc
# catalog; the re-rank window is ≤ k rows per query.

HN_TOP = 5


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_doc, neg_rank, doc_id, lex_rank, score_scaled, q_source,
    cand_source): top cross-source hard negatives per query doc."""
    cand = bm25_topk(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q_src = docs.select(
        F.col("doc_id").alias("q_doc"), F.col("source").alias("q_source")
    )
    c_src = docs.select("doc_id", F.col("source").alias("cand_source"))
    j = (
        cand.join(F.broadcast(q_src), "q_doc")
        .join(F.broadcast(c_src), "doc_id")
        .filter(F.col("q_source") != F.col("cand_source"))
    )
    w = Window.partitionBy("q_doc").orderBy("rank")
    return (
        j.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("neg_rank") <= HN_TOP)
        .select(
            "q_doc",
            "neg_rank",
            "doc_id",
            F.col("rank").alias("lex_rank"),
            "score_scaled",
            "q_source",
            "cand_source",
        )
    )


def hard_negative_mining_sql() -> str:
    return f"""
WITH cand AS ({BM25_TOPK_SQL}),
j AS (
  SELECT c.q_doc, c.doc_id, c.rank AS lex_rank, c.score_scaled,
         dq.source AS q_source, dc.source AS cand_source
  FROM cand c
  JOIN documents dq ON dq.doc_id = c.q_doc
  JOIN documents dc ON dc.doc_id = c.doc_id
  WHERE dq.source <> dc.source
)
SELECT q_doc, CAST(r AS INTEGER) AS neg_rank, doc_id, lex_rank,
       score_scaled, q_source, cand_source
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_doc ORDER BY lex_rank) AS r
  FROM j)
WHERE r <= {HN_TOP}
"""


# --- Rank-biased overlap between the two hybrid arms -------------------------
#
# Webber, Moffat & Zobel (2010): RBO is the top-weighted agreement
# measure between two rankings — the diagnostic a retrieval owner reads
# BEFORE tuning RRF fusion weights ("do the arms even disagree enough
# for fusion to matter?"). Kendall/Spearman need conjoint lists; RBO is
# defined on truncated, non-conjoint top-k lists, which is exactly what
# the two arms produce.
#
#   RBO_base = (1-p) * SUM_{d=1..k} p^(d-1) * |L_d ∩ S_d| / d
#   RBO_ext  = RBO_base + p^k * |L_k ∩ S_k| / k   (residual extrapolation)
#
# A doc contributes to every depth d >= max(r_lex, r_sem), so overlap_d
# needs only the inner join of the two k-bounded arm lists — never the
# corpora. Determinism: overlaps are exact integers; the <= k-term
# weighted sum is round-6'd (p^(d-1) is one libm pow per depth on both
# engines — sub-ulp risk absorbed by the rounding).
#
# 100 TB shape: both arms are the already-bounded (queries x k) frames
# (BM25 postings-bounded, LSH probe-bounded, both shard-pruned); the
# depth grid explodes k rows per overlap pair. Nothing data-sized.

RBO_P = 0.9


def rbo_arm_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(q_doc, n_both, rbo_base, rbo_ext): per-query rank-biased overlap
    between the lexical (BM25) and semantic (multiprobe-LSH) arm
    rankings at depth k=BM25_TOP_K."""
    k = BM25_TOP_K
    lex = bm25_topk(spark, sf_dir).select(
        "q_doc", "doc_id", F.col("rank").alias("r_lex")
    )
    sem = _sem_arm_topk(spark, sf_dir)
    both = lex.join(sem, ["q_doc", "doc_id"]).select(
        "q_doc", F.greatest("r_lex", "r_sem").alias("m")
    )
    # every query that appears in EITHER arm gets a row (0 overlap kept)
    qs = (
        lex.select("q_doc").unionByName(sem.select("q_doc")).distinct()
    )
    depth = both.select(
        "q_doc", F.explode(F.sequence(F.col("m"), F.lit(k))).alias("d")
    )
    per_depth = depth.groupBy("q_doc", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("overlap_d")
    )
    wsum = per_depth.groupBy("q_doc").agg(
        F.sum(
            F.pow(F.lit(RBO_P), F.col("d").cast("double") - F.lit(1.0))
            * F.col("overlap_d").cast("double")
            / F.col("d").cast("double")
        ).alias("_s"),
        F.max(F.when(F.col("d") == k, F.col("overlap_d")))
        .cast("bigint")
        .alias("_nk"),
    )
    return (
        qs.join(F.broadcast(wsum), "q_doc", "left")
        .select(
            "q_doc",
            F.coalesce(F.col("_nk"), F.lit(0)).cast("bigint").alias("n_both"),
            F.round(
                (F.lit(1.0) - F.lit(RBO_P)) * F.coalesce(F.col("_s"), F.lit(0.0)), 6
            ).alias("rbo_base"),
            F.round(
                (F.lit(1.0) - F.lit(RBO_P)) * F.coalesce(F.col("_s"), F.lit(0.0))
                + F.pow(F.lit(RBO_P), F.lit(float(k)))
                * F.coalesce(F.col("_nk"), F.lit(0)).cast("double")
                / F.lit(float(k)),
                6,
            ).alias("rbo_ext"),
        )
        .orderBy("q_doc")
    )


def rbo_arm_agreement_sql() -> str:
    from etl_mini_dw_spark.functions.simsearch import (
        _bucket_expr_sql,
        _probe_buckets_expr_sql,
        _sig_expr_sql,
    )

    k = BM25_TOP_K
    return f"""
WITH lex AS (
  SELECT q_doc, doc_id, rank AS r_lex FROM ({BM25_TOPK_SQL})
),
sig AS (
  SELECT vec_id, {_sig_expr_sql(True)} AS sig_lo, {_sig_expr_sql(False)} AS sig_hi,
         {_bucket_expr_sql()} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS q_doc, sig_lo AS q_lo, sig_hi AS q_hi,
         unnest({_probe_buckets_expr_sql("bucket")}) AS probe_bucket
  FROM sig WHERE vec_id % {QUERY_STRIDE} = 0
),
sem0 AS (
  SELECT q.q_doc, s.vec_id AS doc_id,
         bit_count(xor(q.q_lo, s.sig_lo)) + bit_count(xor(q.q_hi, s.sig_hi))
           AS hamming
  FROM q JOIN sig s ON s.bucket = q.probe_bucket AND s.vec_id <> q.q_doc
),
sem AS (
  SELECT q_doc, doc_id, CAST(r AS INTEGER) AS r_sem FROM (
    SELECT *, row_number() OVER (PARTITION BY q_doc ORDER BY hamming, doc_id)
              AS r
    FROM sem0) WHERE r <= {k}
),
ovl AS (
  SELECT q_doc, GREATEST(r_lex, r_sem) AS m
  FROM lex JOIN sem USING (q_doc, doc_id)
),
qs AS (
  SELECT DISTINCT q_doc FROM (
    SELECT q_doc FROM lex UNION ALL SELECT q_doc FROM sem)
),
per_depth AS (
  SELECT q_doc, d, CAST(COUNT(*) AS BIGINT) AS overlap_d
  FROM (SELECT q_doc, unnest(range(m, {k} + 1)) AS d FROM ovl)
  GROUP BY 1, 2
),
wsum AS (
  SELECT q_doc,
         SUM(pow({RBO_P}, CAST(d AS DOUBLE) - 1.0)
             * CAST(overlap_d AS DOUBLE) / d) AS s,
         CAST(MAX(CASE WHEN d = {k} THEN overlap_d END) AS BIGINT) AS nk
  FROM per_depth GROUP BY 1
)
SELECT qs.q_doc,
       CAST(COALESCE(nk, 0) AS BIGINT) AS n_both,
       round((1.0 - {RBO_P}) * COALESCE(s, 0.0), 6) AS rbo_base,
       round((1.0 - {RBO_P}) * COALESCE(s, 0.0)
             + pow({RBO_P}, {float(k)}) * CAST(COALESCE(nk, 0) AS DOUBLE) / {float(k)}, 6)
         AS rbo_ext
FROM qs LEFT JOIN wsum USING (q_doc)
ORDER BY q_doc
"""

"""Product quantization (PQ) ANN — the memory-scale path of the index family.

Completes the quantization story beside `simsearch.embedding_quantize`
(int8 scalar: 4× smaller) and `cluster.kmeans_assign` (trained coarse
IVF): PQ splits each 64-dim vector into M=4 subspaces of 16 dims, trains
an independent K=8 codebook per subspace (same deterministic integer
k-means as the coarse quantizer), and stores each vector as M small codes
— 4 bytes instead of 256, the compression that lets a 100 TB corpus keep
its whole index in executor memory. Queries score candidates with the
asymmetric distance computation (ADC): one (M×K)-entry lookup table of
exact integer sub-distances per query, then a code-indexed sum — no
original vectors touched at query time.

Everything is the repo's integer k-means arithmetic (×1000 quantized
coordinates, LONG sums, floor(s/n + 0.5) centroid updates), so training,
codes, and ADC scores are bit-identical on any cluster layout and fully
replayable by the DuckDB oracle (per-subspace unrolled CTE iterations).

Scale shape: training = M independent small-loop jobs (K×16 longs per
round); encoding = M broadcast-argmin map stages; ADC = codes (long form,
M rows/vector) ⋈ broadcast query tables (N_QUERIES×M×K rows) → per-pair
sum → per-query top-k window. The corpus-sized frames carry only codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.simsearch import N_QUERIES, TOP_K
from etl_mini_dw_spark.sources.tables import load_table, stage_memo

PQ_M = 4  # subspaces
PQ_SUB = 16  # dims per subspace (4 × 16 = 64)
PQ_K = 8  # centroids per subspace codebook
PQ_ITERS = 2
SCALE = 1000

_QUANT = (
    f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} + 0.5D) AS BIGINT))"
)
_DIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
)


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # staged once per (session, sf-dir): codes and query tables both read it
    return stage_memo(
        spark,
        sf_dir,
        "pq_quantized",
        lambda: (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", F.expr(_QUANT).alias("qv"))
            .localCheckpoint(eager=False)
        ),
    )


def _codebooks_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL subspace codebooks trained in one fused loop: (m, code, cv).

    r09 optimization (guide §1.2 — fix the distributed algorithm first):
    the four per-subspace k-means loops are independent and structurally
    identical, so one loop over the exploded (vec_id, m, sv) frame runs
    the SAME integer arithmetic per (m, code) key with 4× fewer jobs,
    checkpoints and shuffles (2 iterations total instead of 8). The
    per-(m, code) sums are value-identical to the per-subspace runs —
    grouping by m cannot mix subspaces — so the trained centroids are
    bit-identical (pq oracle-parity tests re-run green).
    """
    return stage_memo(
        spark,
        sf_dir,
        "pq_codebooks_all",
        lambda: _train_all(_subs_all(_quantized(spark, sf_dir))),
    )


def _codebook(spark: SparkSession, sf_dir: str, m: int) -> DataFrame:
    """Subspace-m codebook, trained ONCE per (session, sf-dir).

    Both consumers (vector encoding and the per-query ADC tables) and
    both registered queries share the same staged centroids — training
    is the expensive stage and must not re-run per consumer (the same
    staged-frame rule as `dedup._memo`; first cut of this module trained
    every codebook twice and benched 2x slower). Since r09 the training
    itself is fused across subspaces (`_codebooks_all`); this returns
    the m-slice of the shared staged frame.
    """
    return stage_memo(
        spark,
        sf_dir,
        f"pq_codebook_{m}",
        lambda: _codebooks_all(spark, sf_dir)
        .filter(F.col("m") == m)
        .select("code", "cv"),
    )


def _sub(df: DataFrame, m: int) -> DataFrame:
    """Subspace slice m: columns (vec_id, sv)."""
    return df.select("vec_id", F.slice("qv", m * PQ_SUB + 1, PQ_SUB).alias("sv"))


def _assign_sub(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, code, dist): nearest sub-centroid, ties → lowest code."""
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "code", F.expr(_DIST.format(a="sv", b="cv")).alias("dist")
    )
    best = scored.groupBy("vec_id").agg(F.min(F.struct("dist", "code")).alias("w"))
    return best.select(
        "vec_id", F.col("w.code").alias("code"), F.col("w.dist").alias("dist")
    )


def _subs_all(df: DataFrame) -> DataFrame:
    """All subspace slices in one frame: (vec_id, m, sv)."""
    return df.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("qv", m * PQ_SUB + 1, PQ_SUB) for m in range(PQ_M)])
        ).alias("m", "sv"),
    )


def _assign_all_lit(
    vecs: DataFrame, cents: list[tuple[int, int, list[int]]]
) -> DataFrame:
    """(m, vec_id, code, sv): nearest sub-centroid against LITERAL
    codebooks — map-only, no join (the r10 k-means literal-argmin shape;
    `array_min` over (dist, code) structs ties to the lowest code like
    `min(struct(dist, code))` in `_assign_sub`)."""
    per_m: dict[int, list[str]] = {}
    for m, code, cv in cents:
        arr = "array(" + ", ".join(f"{int(v)}L" for v in cv) + ")"
        per_m.setdefault(int(m), []).append(
            f"named_struct('dist', {_DIST.format(a='sv', b=arr)},"
            f" 'code', CAST({int(code)} AS BIGINT))"
        )
    best = None
    for m in sorted(per_m):
        cand = F.expr(f"array_min(array({', '.join(per_m[m])}))")["code"]
        # every row's m matches exactly one branch (every vector carries
        # every subspace), so the when-chain needs no otherwise
        best = (
            F.when(F.col("m") == m, cand)
            if best is None
            else best.when(F.col("m") == m, cand)
        )
    return vecs.select("m", "vec_id", best.alias("code"), "sv")


def _train_all(vecs: DataFrame) -> DataFrame:
    """Deterministic integer k-means for ALL subspaces at once:
    (m, code, cv) — per-(m, code) arithmetic identical to the previous
    per-subspace `_train_sub` loops (see `_codebooks_all`).

    r10 shape (same planning-cost fix as `cluster.kmeans_assign`): each
    round inlines the 32-row codebook as literals (it was already
    driver-collected for the broadcast), assigns map-only, and updates
    via posexplode + ONE sum per (m, code, i) instead of a 17-column
    aggregate — the wide spelling spent its time compiling plans, not on
    the 8 k-row data. The floor(s/n + 0.5) update stays in Spark so the
    double-division semantics remain engine-pinned; centroids are
    bit-identical (pq parity tests + exceptAll pins)."""
    spark = vecs.sparkSession
    seed = (
        vecs.filter(F.col("vec_id") < PQ_K)
        .select("m", F.col("vec_id").alias("code"), "sv")
        .collect()
    )
    cents = sorted((int(r["m"]), int(r["code"]), list(r["sv"])) for r in seed)
    for _ in range(PQ_ITERS):
        upd = (
            _assign_all_lit(vecs, cents)
            .select("m", "code", F.posexplode("sv").alias("i", "v"))
            .groupBy("m", "code", "i")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .select(
                "m",
                "code",
                "i",
                F.floor(F.col("s").cast("double") / F.col("n") + F.lit(0.5))
                .cast("long")
                .alias("c"),
            )
        )
        by_mc: dict[tuple[int, int], dict[int, int]] = {}
        for r in upd.collect():
            by_mc.setdefault((int(r["m"]), int(r["code"])), {})[int(r["i"])] = int(
                r["c"]
            )
        cents = sorted(
            (m, code, [d[i] for i in range(PQ_SUB)]) for (m, code), d in by_mc.items()
        )
    return spark.createDataFrame(
        [(m, code, cv) for m, code, cv in cents],
        "m int, code bigint, cv array<bigint>",
    )


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector PQ code word: (vec_id, code_0 … code_{M-1}).

    r10: ONE map-only projection with the trained codebooks inlined as
    literals (32 rows, read back from the staged frame) — the previous
    spelling ran 4 crossJoin+groupBy argmin chains and 4 self-joins to
    reassemble the columns. `array_min` over (dist, code) structs ties
    identically to `_assign_sub`'s min(struct); codes exceptAll 0/0."""
    cb = _codebooks_all(spark, sf_dir).collect()
    by_m: dict[int, list[tuple[int, list[int]]]] = {}
    for r in cb:
        by_m.setdefault(int(r["m"]), []).append((int(r["code"]), list(r["cv"])))
    emb = _quantized(spark, sf_dir)
    # slices hoisted to columns so each of the 8 folds per subspace
    # reads an attribute, not a re-evaluated slice
    staged = emb.select(
        "vec_id",
        *[
            F.slice("qv", m * PQ_SUB + 1, PQ_SUB).alias(f"sv{m}")
            for m in range(PQ_M)
        ],
    )
    cols = [F.col("vec_id")]
    for m in range(PQ_M):
        terms = []
        for code, cv in sorted(by_m[m]):
            arr = "array(" + ", ".join(f"{int(v)}L" for v in cv) + ")"
            terms.append(
                f"named_struct('dist', {_DIST.format(a=f'sv{m}', b=arr)},"
                f" 'code', CAST({int(code)} AS BIGINT))"
            )
        cols.append(
            F.expr(f"array_min(array({', '.join(terms)}))")["code"]
            .cast("int")
            .alias(f"code_{m}")
        )
    return staged.select(*cols)


def _adc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, cand_id, adc_dist): every candidate's asymmetric PQ
    distance to every query — shared by the one-stage top-k and the
    refined (shortlist → exact re-rank) retrieval below."""
    emb = _quantized(spark, sf_dir)
    codes = pq_codes(spark, sf_dir)
    # long-form codes: (vec_id, m, code)
    codes_long = None
    for m in range(PQ_M):
        part = codes.select(
            "vec_id", F.lit(m).alias("m"), F.col(f"code_{m}").alias("code")
        )
        codes_long = part if codes_long is None else codes_long.unionByName(part)
    # per-query distance tables: (query_id, m, code, d) — M×K rows per query
    qtab = None
    for m in range(PQ_M):
        sub = _sub(emb, m)
        q = sub.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("sv").alias("qsv")
        )
        t = q.crossJoin(F.broadcast(_codebook(spark, sf_dir, m))).select(
            "query_id",
            F.lit(m).alias("m"),
            "code",
            F.expr(_DIST.format(a="qsv", b="cv")).alias("d"),
        )
        qtab = t if qtab is None else qtab.unionByName(t)
    return (
        codes_long.join(F.broadcast(qtab), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("d").cast("bigint").alias("adc_dist"))
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-memoized since r09 (see simsearch.ann_bruteforce_topk)."""
    from etl_mini_dw_spark.sources.tables import stage_memo

    return stage_memo(
        spark,
        sf_dir,
        "ann_pq_topk",
        lambda: _ann_pq_topk_build(spark, sf_dir).localCheckpoint(eager=False),
    )


def _ann_pq_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k neighbors per query by asymmetric PQ distance (ADC).

    Queries are the same ``vec_id < N_QUERIES`` set as the brute-force
    baseline, so recall against `ext_ann_bruteforce_topk` is directly
    inspectable. adc_dist is the exact integer Σ_m ‖q_m − c[code_m]‖².
    """
    from etl_mini_dw_spark.functions.simsearch import shard_topk_prune

    scored = shard_topk_prune(
        _adc_scored(spark, sf_dir),
        ["query_id"],
        [F.col("adc_dist"), F.col("cand_id")],
        TOP_K,
        "cand_id",
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "adc_dist", "rank")
    )


SHORTLIST = 50
_DIM = PQ_M * PQ_SUB
_DIST_FULL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
)


def ann_pq_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: PQ-ADC shortlist → EXACT integer re-rank.

    The production ANN serving shape (compressed-index shortlist, then a
    refinement pass over the few surviving full vectors): stage 1 ranks
    every candidate by ADC and keeps SHORTLIST=50 per query; stage 2
    fetches only those candidates' full quantized vectors and re-ranks
    by exact Σ‖q−v‖² over all 64 dims, returning TOP_K.

    Scale shape: the shortlist (N_QUERIES×50 rows) is broadcast against
    the corpus for the fetch — the corpus-sized side is touched once,
    map-side, with no shuffle; the exact math runs on |shortlist| rows
    only. All arithmetic stays in the repo's ×1000 integer quantization,
    so the result is layout-invariant and the oracle replays it exactly.
    """
    from etl_mini_dw_spark.functions.simsearch import shard_topk_prune

    emb = _quantized(spark, sf_dir)
    scored = shard_topk_prune(
        _adc_scored(spark, sf_dir),
        ["query_id"],
        [F.col("adc_dist"), F.col("cand_id")],
        SHORTLIST,
        "cand_id",
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    short = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SHORTLIST)
        .select("query_id", "cand_id")
    )
    qvecs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    cand = emb.join(
        F.broadcast(short), emb["vec_id"] == short["cand_id"]
    ).select("query_id", "cand_id", "qv")
    exact = cand.join(F.broadcast(qvecs), "query_id").select(
        "query_id",
        "cand_id",
        F.expr(_DIST_FULL.format(a="qv", b="q_qv")).cast("bigint").alias("exact_dist"),
    )
    w2 = Window.partitionBy("query_id").orderBy("exact_dist", "cand_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "exact_dist", "rank")
    )


# --- DuckDB mirrors ---------------------------------------------------------

_SQL_QUANT = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} + 0.5) AS BIGINT))"
)


def _sql_dist(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {PQ_SUB + 1}),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )


def _sql_sub_views(m: int) -> str:
    """CTE text for subspace m: slice + unrolled training + code assignment.

    Produces views e{m} (vec_id, sv), c{m}_{PQ_ITERS} (code, cv) and
    code{m} (vec_id, code).
    """
    lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
    out = f"e{m} AS (SELECT vec_id, qv[{lo}:{hi}] AS sv FROM e),\n"
    out += (
        f"c{m}_0 AS (SELECT vec_id AS code, sv AS cv FROM e{m} WHERE vec_id < {PQ_K}),\n"
    )
    prev = f"c{m}_0"
    for r in range(1, PQ_ITERS + 1):
        out += f"""c{m}_{r} AS (
  SELECT code, list(s ORDER BY i) AS cv FROM (
    SELECT a.code, t.i,
           CAST(floor(SUM(v.sv[t.i]) * 1.0 / COUNT(*) + 0.5) AS BIGINT) AS s
    FROM (
      SELECT vec_id, code FROM (
        SELECT v.vec_id, c.code,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_sql_dist("v.sv", "c.cv")}, c.code) AS rn
        FROM e{m} v, {prev} c) WHERE rn = 1) a
    JOIN e{m} v USING (vec_id), range(1, {PQ_SUB + 1}) t(i)
    GROUP BY a.code, t.i)
  GROUP BY code
),
"""
        prev = f"c{m}_{r}"
    out += f"""code{m} AS (
  SELECT vec_id, CAST(code AS INTEGER) AS code FROM (
    SELECT v.vec_id, c.code,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_sql_dist("v.sv", "c.cv")}, c.code) AS rn
    FROM e{m} v, {prev} c) WHERE rn = 1
)"""
    return out


def pq_codes_sql() -> str:
    subs = ",\n".join(_sql_sub_views(m) for m in range(PQ_M))
    joins = " ".join(f"JOIN code{m} USING (vec_id)" for m in range(1, PQ_M))
    cols = ", ".join(f"code{m}.code AS code_{m}" for m in range(PQ_M))
    return f"""
WITH e AS (SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings),
{subs}
SELECT code0.vec_id, {cols}
FROM code0 {joins}
"""


def ann_pq_topk_sql() -> str:
    subs = ",\n".join(_sql_sub_views(m) for m in range(PQ_M))
    codes_long = "\nUNION ALL\n".join(
        f"SELECT vec_id, {m} AS m, code FROM code{m}" for m in range(PQ_M)
    )
    qtabs = "\nUNION ALL\n".join(
        f"""SELECT v.vec_id AS query_id, {m} AS m, c.code,
       {_sql_dist("v.sv", "c.cv")} AS d
FROM e{m} v, c{m}_{PQ_ITERS} c WHERE v.vec_id < {N_QUERIES}"""
        for m in range(PQ_M)
    )
    return f"""
WITH e AS (SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings),
{subs},
codes_long AS ({codes_long}),
qtab AS ({qtabs}),
scored AS (
  SELECT q.query_id, cl.vec_id AS cand_id, CAST(SUM(q.d) AS BIGINT) AS adc_dist
  FROM codes_long cl JOIN qtab q ON cl.m = q.m AND cl.code = q.code
  WHERE cl.vec_id <> q.query_id
  GROUP BY 1, 2
)
SELECT query_id, cand_id, adc_dist, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_dist, cand_id) AS rank
  FROM scored)
WHERE rank <= {TOP_K}
"""


def ann_pq_refined_topk_sql() -> str:
    subs = ",\n".join(_sql_sub_views(m) for m in range(PQ_M))
    codes_long = "\nUNION ALL\n".join(
        f"SELECT vec_id, {m} AS m, code FROM code{m}" for m in range(PQ_M)
    )
    qtabs = "\nUNION ALL\n".join(
        f"""SELECT v.vec_id AS query_id, {m} AS m, c.code,
       {_sql_dist("v.sv", "c.cv")} AS d
FROM e{m} v, c{m}_{PQ_ITERS} c WHERE v.vec_id < {N_QUERIES}"""
        for m in range(PQ_M)
    )
    dist_full = (
        f"CAST(list_sum(list_transform(range(1, {_DIM + 1}),"
        f" i -> (ev.qv[i] - eq.qv[i]) * (ev.qv[i] - eq.qv[i]))) AS BIGINT)"
    )
    return f"""
WITH e AS (SELECT vec_id, {_SQL_QUANT} AS qv FROM embeddings),
{subs},
codes_long AS ({codes_long}),
qtab AS ({qtabs}),
scored AS (
  SELECT q.query_id, cl.vec_id AS cand_id, CAST(SUM(q.d) AS BIGINT) AS adc_dist
  FROM codes_long cl JOIN qtab q ON cl.m = q.m AND cl.code = q.code
  WHERE cl.vec_id <> q.query_id
  GROUP BY 1, 2
),
shortlist AS (
  SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, cand_id) AS rn
    FROM scored)
  WHERE rn <= {SHORTLIST}
),
exact AS (
  SELECT s.query_id, s.cand_id, {dist_full} AS exact_dist
  FROM shortlist s
  JOIN e ev ON ev.vec_id = s.cand_id
  JOIN e eq ON eq.vec_id = s.query_id
)
SELECT query_id, cand_id, exact_dist, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY exact_dist, cand_id) AS rank
  FROM exact)
WHERE rank <= {TOP_K}
"""

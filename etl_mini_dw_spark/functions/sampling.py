"""Deterministic corpus sampling / splitting / decontamination / PII scrub.

Training-data pipeline operators beyond the reference (which has no
sampling surface at all — its only "subset" operator is the watermark
delta predicate, `code/SQL_1_Assignment_2_David_Färm.sql:280–281`).

Everything here is keyed on a **deterministic multiplicative hash** of
the document id (Knuth: ``(doc_id * 2654435761) mod 1e6``) instead of
``rand()``: reproducible across engines (the DuckDB oracle computes the
identical integer), across runs, across partitionings, and at 100 TB it
means membership of a document in train/test is a pure function of its
id — re-sampling after a backfill cannot silently move documents across
the split boundary. On a production corpus the id would be a content
fingerprint and the multiplier a seeded xxhash64; the arithmetic-hash
form keeps the oracle exact while exercising the identical plan shape.

Scale notes per operator:

- stratified sample / split: map-only projections (no shuffle at all) —
  the filter is pushed into the parquet scan.
- decontamination: shingle explode → doc-frequency filter (drops the
  stop-shingle heavy hitters that would otherwise quadratically blow up
  the posting-list self-join — the same reason the LSH banding in
  `functions/dedup.py` exists) → train⋈test equi-join on rare shingles
  only. The df cap bounds per-shingle join fan-out at df², and rare
  shingles are precisely the high-signal ones for leakage detection.
- PII redaction: pure regexp projections, whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.dedup import _SHINGLES_SQL, _shingles_df
from etl_mini_dw_spark.sources.tables import load_table

HASH_MULT = 2654435761
HASH_MOD = 1_000_000
TRAIN_CUT = 900_000  # [0, 900k) train
VALID_CUT = 950_000  # [900k, 950k) valid, rest test
DECON_TRAIN_CUT = 800_000  # coarser 80/20 split for the leakage check
MAX_SHINGLE_DF = 5  # rare-shingle cap for the contamination join

# per-language sample keep-thresholds out of HASH_MOD (en downsampled hard,
# tail languages kept at 30% — the usual rebalancing shape)
STRATA_THRESHOLDS = {"en": 100_000, "_default": 300_000}


def _hash_col() -> F.Column:
    return F.pmod(F.col("doc_id") * F.lit(HASH_MULT), F.lit(HASH_MOD))


_HASH_SQL = f"(doc_id * {HASH_MULT}) % {HASH_MOD}"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsample of ``documents``."""
    docs = load_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", F.lit(STRATA_THRESHOLDS["en"])).otherwise(
        F.lit(STRATA_THRESHOLDS["_default"])
    )
    return (
        docs.withColumn("__h", _hash_col())
        .filter(F.col("__h") < thr)
        .select("doc_id", "lang", "source", "n_chars")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_HASH_SQL} < CASE WHEN lang = 'en'
                         THEN {STRATA_THRESHOLDS["en"]}
                         ELSE {STRATA_THRESHOLDS["_default"]} END
"""


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/valid/test assignment per document."""
    docs = load_table(spark, sf_dir, "documents")
    h = _hash_col()
    return docs.select(
        "doc_id",
        "lang",
        F.when(h < TRAIN_CUT, F.lit("train"))
        .when(h < VALID_CUT, F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


TRAIN_TEST_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN {_HASH_SQL} < {TRAIN_CUT} THEN 'train'
            WHEN {_HASH_SQL} < {VALID_CUT} THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test documents sharing a *rare* 8-char shingle with any train doc.

    Returns (test_doc_id, n_train_sharers, min_train_doc) for leaked test
    documents — the standard pre-training decontamination report.
    """
    split = F.when(_hash_col() < DECON_TRAIN_CUT, F.lit("train")).otherwise(F.lit("test"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", split.alias("split"))
    sh = _shingles_df(spark, sf_dir).join(docs, "doc_id")
    # ONE pass over the shingle explode: posting list per shingle, df cap
    # on the list size, then in-list train×test pair expansion. The
    # equivalent rare-filter + two-sided self-join plan recomputes the
    # shingle pipeline three times (measured 3× slower at sf0.1).
    per_shingle = (
        sh.groupBy("shingle")
        .agg(F.collect_list(F.struct("split", "doc_id")).alias("members"))
        .filter(F.size("members") <= MAX_SHINGLE_DF)
    )
    pairs = (
        per_shingle.select(
            F.explode(
                F.expr(
                    "flatten(transform(filter(members, m -> m.split = 'test'),"
                    " t -> transform(filter(members, m -> m.split = 'train'),"
                    " r -> struct(t.doc_id AS test_doc_id, r.doc_id AS train_doc_id))))"
                )
            ).alias("p")
        )
        .select("p.test_doc_id", "p.train_doc_id")
        .distinct()
    )
    return pairs.groupBy("test_doc_id").agg(
        F.count(F.lit(1)).alias("n_train_sharers"),
        F.min("train_doc_id").alias("min_train_doc"),
    )


DECONTAMINATE_SQL = f"""
WITH split AS (
  SELECT doc_id,
         CASE WHEN {_HASH_SQL} < {DECON_TRAIN_CUT} THEN 'train' ELSE 'test' END AS split
  FROM documents
),
sh AS (
  SELECT s.doc_id, s.shingle, sp.split
  FROM ({_SHINGLES_SQL}) s JOIN split sp USING (doc_id)
),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {MAX_SHINGLE_DF}
),
pairs AS (
  SELECT DISTINCT t.doc_id AS test_doc_id, tr.doc_id AS train_doc_id
  FROM sh t
  JOIN rare USING (shingle)
  JOIN sh tr ON tr.shingle = t.shingle AND tr.split = 'train'
  WHERE t.split = 'test'
)
SELECT test_doc_id, COUNT(*) AS n_train_sharers, MIN(train_doc_id) AS min_train_doc
FROM pairs GROUP BY test_doc_id
"""

# appended to every document so the redaction has known PII to find (the
# synthetic corpus is PII-free); doc_id makes the email per-doc unique
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9 -]{7,}[0-9]"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone scrub: count PII hits, return the redacted-text digest."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call +1 555 010 9999 now"),
    )
    with_aug = docs.select("doc_id", aug.alias("aug"))
    n_pii = F.size(F.regexp_extract_all("aug", F.lit(_EMAIL_RE), F.lit(0))) + F.size(
        F.regexp_extract_all("aug", F.lit(_PHONE_RE), F.lit(0))
    )
    redacted = F.regexp_replace(
        F.regexp_replace("aug", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return with_aug.select(
        "doc_id", n_pii.alias("n_pii"), F.md5(redacted).alias("redacted_sig")
    )


PII_REDACTION_SQL = f"""
WITH a AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call +1 555 010 9999 now' AS aug
  FROM documents
)
SELECT doc_id,
       CAST(length(regexp_extract_all(aug, '{_EMAIL_RE}'))
          + length(regexp_extract_all(aug, '{_PHONE_RE}')) AS INT) AS n_pii,
       md5(regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_sig
FROM a
"""


RESERVOIR_K = 10


def reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k per-stratum sample — a "reservoir" with the
    randomness replaced by the multiplicative hash, so membership is a
    pure function of doc_id (re-runs and backfills agree).

    Unlike fraction-based ``stratified_sample`` this guarantees EXACTLY
    ``RESERVOIR_K`` docs per source (when the stratum is big enough) —
    the balanced-eval-set builder. Rank window partitions by source
    (bounded state, no global sort); ties broken by doc_id for a total
    order. At 100 TB the per-stratum top-k would use the two-level
    top-k shape instead of a full rank: same output, partial-aggregable.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(_hash_col(), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("source", "doc_id", "rk")
    )


RESERVOIR_SQL = f"""
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {_HASH_SQL}, doc_id) AS rk
  FROM documents
) WHERE rk <= {RESERVOIR_K}
"""


# --- Poisson PPS (probability-proportional-to-size) weighted sampling -------

PPS_TARGET_K = 50  # expected sample size


def pps_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted document sample, inclusion ∝ document cost (``n_chars``).

    The training-mixture sampler: each document enters the sample
    independently with probability min(1, k·w/W) where w is its cost
    and W the corpus total — expected size k, heavy documents always
    kept, and the Horvitz–Thompson weight 1/p makes any downstream sum
    unbiased. The inclusion decision is the pure INTEGER comparison
    ``u·W < k·w·MOD`` on the deterministic id-hash uniform u ∈ [0, MOD):
    no floating point anywhere in the decision, so the sample is a pure
    function of (id, weight, corpus total) — identical across engines,
    runs, and partitionings.

    Plan shape: one partial-agg for the scalar W, broadcast back via a
    1-row cross join (the J4 hoist), then a map-only filter+projection —
    no shuffle of the corpus itself at any scale. At 100 TB `u·W` can
    exceed int64; promote the comparison to DECIMAL(38,0)/HUGEINT there
    (same plan shape); at gate scales int64 has 6 orders of headroom.
    """
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(F.sum("n_chars").cast("bigint").alias("w_total"))
    keep = (_hash_col() * F.col("w_total")) < (
        F.lit(PPS_TARGET_K) * F.col("n_chars") * F.lit(HASH_MOD)
    )
    p = F.least(
        F.lit(1.0),
        (F.lit(float(PPS_TARGET_K)) * F.col("n_chars").cast("double"))
        / F.col("w_total").cast("double"),
    )
    return (
        docs.crossJoin(F.broadcast(tot))
        .filter(keep)
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("n_chars").alias("w"),
            (F.lit(1.0) / p).alias("ht_weight"),
        )
    )


PPS_SAMPLE_SQL = f"""
WITH t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS w_total FROM documents)
SELECT doc_id, lang, source, n_chars AS w,
       CAST(1 AS DOUBLE) / least(CAST(1 AS DOUBLE),
            ({PPS_TARGET_K}.0 * CAST(n_chars AS DOUBLE)) / CAST(w_total AS DOUBLE)
       ) AS ht_weight
FROM documents, t
WHERE ({_HASH_SQL}) * w_total < {PPS_TARGET_K} * n_chars * {HASH_MOD}
"""


# --- Bloom-filter membership: the decontamination sketch at scale -----------
BLOOM_BITS = 65536  # M — 2048 × 32-bit words
BLOOM_WORD = 32  # 32-bit words: (1 << bit) never touches a sign bit in either engine
# two engine-portable 28-bit hashes from ONE md5 per shingle (dedup's
# conv-vs-0x trick); double hashing pos_i = (h1 + i·h2) mod M gives the
# standard k-probe Bloom from two base hashes
_BLOOM_H1_SPARK = "CAST(conv(substr(md5(shingle), 1, 7), 16, 10) AS BIGINT)"
_BLOOM_H2_SPARK = "CAST(conv(substr(md5(shingle), 9, 7), 16, 10) AS BIGINT)"
_BLOOM_H1_DUCK = "('0x' || substr(md5(shingle), 1, 7))::BIGINT"
_BLOOM_H2_DUCK = "('0x' || substr(md5(shingle), 9, 7))::BIGINT"


def bloom_membership_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination: build a 64 Kbit Bloom filter over the
    TRAIN side's shingles, probe it with every TEST document's shingles,
    and report per test doc the Bloom-positive count beside the exact
    count (so the false-positive overhead is visible in the output).

    This is how decontamination actually ships at 100 TB: the train-side
    n-gram set is petabyte-scale, but its Bloom filter is a few GB of
    (word, bits) rows — buildable with one ``bit_or`` aggregate (2048
    groups here; sized to the real corpus in production), mergeable
    across corpus shards by the same ``bit_or``, broadcastable to every
    probe task. The probe side is a broadcast join + bitwise AND — the
    test stream never shuffles. All math is integer (md5 → 28-bit ints →
    double-hashed positions), so the filter bits are BIT-IDENTICAL on
    both engines and the oracle replays the whole sketch, not a
    tolerance check.
    """
    split = F.when(_hash_col() < DECON_TRAIN_CUT, F.lit("train")).otherwise(F.lit("test"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", split.alias("split"))
    sh = _shingles_df(spark, sf_dir).join(docs, "doc_id")

    hashed = sh.select(
        "doc_id",
        "split",
        "shingle",
        F.expr(_BLOOM_H1_SPARK).alias("h1"),
        F.expr(_BLOOM_H2_SPARK).alias("h2"),
    ).localCheckpoint(eager=False)  # h1/h2 referenced by both probe positions

    probes = hashed.select(
        "doc_id",
        "split",
        "shingle",
        F.explode(
            F.array(
                F.pmod(F.col("h1"), F.lit(BLOOM_BITS)),
                F.pmod(F.col("h1") + F.col("h2"), F.lit(BLOOM_BITS)),
            )
        ).alias("pos"),
    ).select(
        "doc_id",
        "split",
        "shingle",
        F.expr(f"pos div {BLOOM_WORD}").alias("word"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))").alias("mask"),
    )
    bloom = (
        probes.filter(F.col("split") == "train")
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    test_probe = (
        probes.filter(F.col("split") == "test")
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("doc_id", "shingle")
        .agg(
            F.sum(
                F.when((F.col("bits").isNotNull()) & (F.col("bits").bitwiseAND(F.col("mask")) != 0), 1).otherwise(0)
            ).alias("n_set")
        )
    )
    train_shingles = (
        sh.filter(F.col("split") == "train").select("shingle").distinct()
    )
    exact = (
        sh.filter(F.col("split") == "test")
        .select("doc_id", "shingle")
        .join(train_shingles, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_hits"))
    )
    per_doc = test_probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(F.when(F.col("n_set") == 2, 1).otherwise(0)).cast("bigint").alias("n_bloom_hits"),
    )
    return per_doc.join(exact, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        "n_bloom_hits",
        F.coalesce("n_exact_hits", F.lit(0)).cast("bigint").alias("n_exact_hits"),
    )


BLOOM_MEMBERSHIP_SQL = f"""
WITH split AS (
  SELECT doc_id,
         CASE WHEN {_HASH_SQL} < {DECON_TRAIN_CUT} THEN 'train' ELSE 'test' END AS split
  FROM documents
),
sh AS (
  SELECT s.doc_id, s.shingle, sp.split
  FROM ({_SHINGLES_SQL}) s JOIN split sp USING (doc_id)
),
hashed AS (
  SELECT doc_id, split, shingle,
         {_BLOOM_H1_DUCK} AS h1, {_BLOOM_H2_DUCK} AS h2
  FROM sh
),
probes AS (
  SELECT doc_id, split, shingle,
         pos // {BLOOM_WORD} AS word,
         (CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD} AS INTEGER)) AS mask
  FROM (
    SELECT doc_id, split, shingle,
           unnest([h1 % {BLOOM_BITS}, (h1 + h2) % {BLOOM_BITS}]) AS pos
    FROM hashed
  )
),
bloom AS (
  SELECT word, bit_or(mask) AS bits FROM probes WHERE split = 'train' GROUP BY word
),
test_probe AS (
  SELECT p.doc_id, p.shingle,
         SUM(CASE WHEN b.bits IS NOT NULL AND (b.bits & p.mask) <> 0 THEN 1 ELSE 0 END) AS n_set
  FROM probes p LEFT JOIN bloom b USING (word)
  WHERE p.split = 'test'
  GROUP BY 1, 2
),
exact AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_exact_hits
  FROM (SELECT doc_id, shingle FROM sh WHERE split = 'test') t
  WHERE t.shingle IN (SELECT shingle FROM sh WHERE split = 'train')
  GROUP BY 1
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN n_set = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits
  FROM test_probe GROUP BY 1
)
SELECT p.doc_id, p.n_shingles, p.n_bloom_hits,
       CAST(COALESCE(e.n_exact_hits, 0) AS BIGINT) AS n_exact_hits
FROM per_doc p LEFT JOIN exact e USING (doc_id)
"""


# --- contamination SPAN coverage (gaps-and-islands over matched n-grams) ----
SPAN_N = 5  # token n-gram width; 3-grams are all-noise on a ~30-word vocab


def contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contaminated-SPAN report for the train split.

    `decontaminate` answers WHICH train docs leak benchmark content;
    this answers HOW MUCH of each: every train token 5-gram that also
    occurs in any test-split document marks positions [p, p+4], and
    overlapping/adjacent marks merge into maximal spans (the classic
    gaps-and-islands window — equal-width spans merge iff the start gap
    ≤ SPAN_N, so one `lag` comparison replaces a running max-end). The
    Dolma/open-pretraining contamination reports are exactly this shape:
    (doc, n_spans, covered_tokens, contaminated_frac).

    Scale: the benchmark gram set (test suites, not the corpus) is the
    small side and is broadcast — the train-side explode never shuffles
    on gram; the per-doc window is doc-length-bounded. The gram arrays
    are lazily checkpointed ahead of the explode (the Generate-collapse
    trap, see `dedup._shingle_arrays`).
    """
    from pyspark.sql import Window

    split = F.when(_hash_col() < DECON_TRAIN_CUT, F.lit("train")).otherwise(F.lit("test"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks"), split.alias("split")
    )
    grams_arr = (
        docs.filter(F.size("toks") >= SPAN_N)
        .select(
            "doc_id",
            "split",
            F.size("toks").cast("bigint").alias("n_tokens"),
            F.expr(
                f"transform(sequence(0, size(toks) - {SPAN_N}),"
                f" p -> struct(CAST(p AS BIGINT) AS p,"
                f" concat_ws(' ', slice(toks, p + 1, {SPAN_N})) AS gram))"
            ).alias("grams"),
        )
        .localCheckpoint(eager=False)
    )
    g = grams_arr.select(
        "doc_id", "split", "n_tokens", F.explode("grams").alias("g")
    ).select("doc_id", "split", "n_tokens", F.col("g.p").alias("p"), F.col("g.gram").alias("gram"))
    bench = g.filter(F.col("split") == "test").select("gram").distinct()
    hits = (
        g.filter(F.col("split") == "train")
        .join(F.broadcast(bench), "gram")
        .select("doc_id", "n_tokens", "p")
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    brk = F.when(F.col("p") - F.lag("p").over(w) > SPAN_N, F.lit(1)).otherwise(F.lit(0))
    isl = hits.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_island = isl.groupBy("doc_id", "n_tokens", "island").agg(
        (F.max("p") - F.min("p") + F.lit(SPAN_N)).alias("covered")
    )
    return per_island.groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("covered").cast("bigint").alias("covered_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "covered_tokens",
        F.round(F.col("covered_tokens").cast("double") / F.col("n_tokens"), 6).alias(
            "contaminated_frac"
        ),
    )


CONTAMINATION_SPANS_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CASE WHEN {_HASH_SQL} < {DECON_TRAIN_CUT} THEN 'train' ELSE 'test' END AS split
  FROM documents
),
g0 AS (
  SELECT doc_id, split, CAST(len(toks) AS BIGINT) AS n_tokens,
         unnest(list_transform(range(0, len(toks) - {SPAN_N} + 1),
           i -> struct_pack(p := CAST(i AS BIGINT),
                            gram := array_to_string(
                              toks[CAST(i AS INT) + 1 : CAST(i AS INT) + {SPAN_N}],
                              ' ')))) AS s
  FROM d WHERE len(toks) >= {SPAN_N}
),
g AS (SELECT doc_id, split, n_tokens, s.p AS p, s.gram AS gram FROM g0),
hits AS (
  SELECT doc_id, n_tokens, p FROM g
  WHERE split = 'train'
    AND gram IN (SELECT DISTINCT gram FROM g WHERE split = 'test')
),
isl AS (
  SELECT doc_id, n_tokens, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > {SPAN_N}
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl2 AS (
  SELECT doc_id, n_tokens, p,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING)
           AS island
  FROM isl
),
per_island AS (
  SELECT doc_id, n_tokens, island, MAX(p) - MIN(p) + {SPAN_N} AS covered
  FROM isl2 GROUP BY doc_id, n_tokens, island
)
SELECT doc_id, n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(covered) AS BIGINT) AS covered_tokens,
       round(CAST(SUM(covered) AS DOUBLE) / n_tokens, 6) AS contaminated_frac
FROM per_island GROUP BY doc_id, n_tokens
"""


# --- dedup-aware (leakage-free) train/test split (r5) ------------------------
def leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_train, n_test, n_leaky_train, n_clean_train, leak_frac):
    the split-hygiene report composing the hash split with the near-dup
    component labels — a train document LEAKS if any member of its
    near-dup component landed in the test split (`decontaminate` catches
    verbatim 8-gram overlap; this catches whole-document near-duplicates
    that n-gram membership misses, the Lee et al. 2022 eval-inflation
    failure). Pipelines drop `n_leaky_train` docs before training.

    Scale: the component frame only covers docs that appear in some
    verified near-dup pair (everything else is its own singleton and can
    never leak), so the extra joins are near-dup-population-sized — tiny
    relative to the corpus — and broadcast; the split itself stays the
    pure hash map-only predicate. Oracle replays the same recursive-CTE
    components the dedup family already pins.

    Reference scope: extension beyond etl-mini-dw; standard
    dedup-aware-split practice re-expressed Spark-first.
    """
    from etl_mini_dw_spark.functions.dedup import neardup_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    split = F.when(_hash_col() < DECON_TRAIN_CUT, F.lit("train")).otherwise(
        F.lit("test")
    )
    comp = neardup_components(spark, sf_dir)
    labeled = (
        docs.select("doc_id", "source", split.alias("split"))
        .join(F.broadcast(comp), "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
    )
    test_comps = (
        labeled.filter(F.col("split") == "test").select("component").distinct()
    )
    leaky = (
        labeled.filter(F.col("split") == "train")
        .join(F.broadcast(test_comps), "component", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaky_train"))
    )
    base = labeled.groupBy("source").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("bigint")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("bigint")
        .alias("n_test"),
    )
    return (
        base.join(leaky, "source", "left")
        .select(
            "source",
            "n_train",
            "n_test",
            F.coalesce("n_leaky_train", F.lit(0)).cast("bigint").alias("n_leaky_train"),
        )
        .select(
            "*",
            (F.col("n_train") - F.col("n_leaky_train")).alias("n_clean_train"),
            F.round(
                F.col("n_leaky_train").cast("double") / F.col("n_train"), 6
            ).alias("leak_frac"),
        )
    )


def leakage_free_split_sql() -> str:
    from etl_mini_dw_spark.functions.dedup import neardup_components_sql

    return f"""
WITH comp AS ({neardup_components_sql()}),
labeled AS (
  SELECT d.doc_id, d.source,
         CASE WHEN {_HASH_SQL} < {DECON_TRAIN_CUT} THEN 'train' ELSE 'test' END AS split,
         COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
test_comps AS (SELECT DISTINCT component FROM labeled WHERE split = 'test'),
leaky AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_leaky_train
  FROM labeled
  WHERE split = 'train' AND component IN (SELECT component FROM test_comps)
  GROUP BY source
),
base AS (
  SELECT source,
         CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
  FROM labeled GROUP BY source
)
SELECT b.source, b.n_train, b.n_test,
       COALESCE(l.n_leaky_train, 0) AS n_leaky_train,
       b.n_train - COALESCE(l.n_leaky_train, 0) AS n_clean_train,
       round(CAST(COALESCE(l.n_leaky_train, 0) AS DOUBLE) / b.n_train, 6) AS leak_frac
FROM base b LEFT JOIN leaky l USING (source)
"""


# --- N-gram novelty rate --------------------------------------------------------
#
# The generalization-side twin of the contamination report: of the
# n-grams in the held-out split, what fraction was NEVER seen in the
# training split? Low novelty means the eval set mostly re-tests
# memorized surface forms (its scores will overstate generalization);
# per-source novelty localizes which slice of the corpus is too
# self-similar to hold out from. Uses the repo's deterministic doc-hash
# split, 5-gram grain shared with the contamination op.
#
# Scale: gram frames are one partial-aggregable distinct per side; the
# unseen test is ONE anti-join keyed on the gram (at 100 TB the join
# key becomes the 64-bit gram hash — same note as dup_ngram_coverage;
# exact strings here keep the oracle collision-free).

NOVELTY_N = 5
NOVELTY_TRAIN_CUT = 800_000  # doc-hash < cut -> train, else heldout


def ngram_novelty_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_test_grams, n_novel, novelty): distinct held-out
    5-grams never seen in train, per source plus an ALL row."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split(F.col("text"), " ").alias("toks"),
        F.pmod(F.col("doc_id") * F.lit(HASH_MULT), F.lit(HASH_MOD)).alias("h"),
    )
    grams_arr = (
        docs.filter(F.size("toks") >= NOVELTY_N)
        .select(
            "source",
            (F.col("h") < NOVELTY_TRAIN_CUT).alias("is_train"),
            F.expr(
                f"transform(sequence(0, size(toks) - {NOVELTY_N}),"
                f" p -> concat_ws(' ', slice(toks, p + 1, {NOVELTY_N})))"
            ).alias("grams"),
        )
        .localCheckpoint(eager=False)  # Generate-collapse trap
    )
    g = grams_arr.select(
        "source", "is_train", F.explode("grams").alias("gram")
    )
    train_grams = (
        g.filter(F.col("is_train")).select("gram").distinct()
    )
    test_grams = (
        g.filter(~F.col("is_train")).select("source", "gram").distinct()
    )
    novel = test_grams.join(train_grams, "gram", "left_anti")
    per_src = (
        test_grams.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_test_grams"))
        .join(
            novel.groupBy("source").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_novel")
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "n_test_grams",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        )
    )
    # ALL row over DISTINCT grams corpus-wide (not the per-source sum —
    # a gram held out in two sources counts once)
    all_test = test_grams.select("gram").distinct()
    all_row = (
        all_test.agg(F.count(F.lit(1)).cast("bigint").alias("n_test_grams"))
        .crossJoin(
            F.broadcast(
                all_test.join(train_grams, "gram", "left_anti").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_novel")
                )
            )
        )
        .select(F.lit("ALL").alias("source"), "n_test_grams", "n_novel")
    )
    return (
        per_src.unionByName(all_row)
        .select(
            "source",
            "n_test_grams",
            "n_novel",
            F.round(
                F.col("n_novel") / F.col("n_test_grams").cast("double"), 6
            ).alias("novelty"),
        )
        .orderBy("source")
    )


def ngram_novelty_report_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks,
         (doc_id * {HASH_MULT}) % {HASH_MOD} AS h
  FROM documents
),
g0 AS (
  SELECT source, h < {NOVELTY_TRAIN_CUT} AS is_train,
         unnest(list_transform(range(0, len(toks) - {NOVELTY_N} + 1),
           i -> array_to_string(
             toks[CAST(i AS INT) + 1 : CAST(i AS INT) + {NOVELTY_N}], ' ')))
           AS gram
  FROM d WHERE len(toks) >= {NOVELTY_N}
),
train_grams AS MATERIALIZED (
  SELECT DISTINCT gram FROM g0 WHERE is_train
),
test_grams AS MATERIALIZED (
  SELECT DISTINCT source, gram FROM g0 WHERE NOT is_train
),
novel AS MATERIALIZED (
  SELECT t.source, t.gram FROM test_grams t
  WHERE NOT EXISTS (SELECT 1 FROM train_grams x WHERE x.gram = t.gram)
),
per_src AS (
  SELECT t.source,
         CAST(COUNT(*) AS BIGINT) AS n_test_grams,
         CAST(COALESCE(MAX(nv.n), 0) AS BIGINT) AS n_novel
  FROM test_grams t
  LEFT JOIN (SELECT source, COUNT(*) AS n FROM novel GROUP BY source) nv
    ON nv.source = t.source
  GROUP BY t.source
),
all_row AS (
  SELECT 'ALL' AS source,
         CAST((SELECT COUNT(DISTINCT gram) FROM test_grams) AS BIGINT)
           AS n_test_grams,
         CAST((SELECT COUNT(*) FROM (
             SELECT DISTINCT gram FROM novel)) AS BIGINT) AS n_novel
)
SELECT source, n_test_grams, n_novel,
       round(CAST(n_novel AS DOUBLE) / n_test_grams, 6) AS novelty
FROM (SELECT * FROM per_src UNION ALL SELECT * FROM all_row)
ORDER BY source
"""

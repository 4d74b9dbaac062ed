"""Deduplication operators over ``documents`` (extension M8c).

Training-data dedup at 100 TB, Spark-first:

- **Exact**: hash-groupBy on a normalized-content fingerprint — one
  shuffle keyed by the hash, map-side partial agg, no text comparison.
- **MinHash + LSH**: char-shingle → K permutation-free min-hashes
  (``min(md5(seed || shingle))``; lexicographic min over hex digests is a
  valid uniform min-hash and — deliberately — engine-portable) → band
  signatures → candidate pairs from band-bucket self-join → exact n-gram
  Jaccard verification on candidates only. The LSH step is what makes
  100 TB feasible: the self-join is per-band-bucket, never all-pairs.
- **SimHash**: per-hex-position majority vote over shingle digests → a
  16-bit locality-sensitive sketch; identical sketches ⇒ near-dup group.
  (64-bit + hamming-≤k bucket search is the production variant; 16-bit
  keeps the oracle join tractable and the plumbing identical.)

Everything is built-in functions (explode / groupBy / HOFs) — no Python
UDFs — with value-identical DuckDB mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import load_table

SHINGLE_K = 8
N_HASHES = 8
BAND_ROWS = 2  # → 4 bands
JACCARD_THRESHOLD = 0.35


def _norm_text() -> F.Column:
    return F.lower(F.regexp_replace("text", r"\s+", " "))


_NORM_SQL = r"lower(regexp_replace(text, '\s+', ' ', 'g'))"


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — distinct k-char shingles of normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length({_NORM_EXPR}) - {SHINGLE_K - 1}, 1)),"
                    f" i -> substring({_NORM_EXPR}, i, {SHINGLE_K}))"
                )
            )
        ).alias("shingle"),
    )


_NORM_EXPR = r"lower(regexp_replace(text, '\\s+', ' '))"

_SHINGLES_SQL = f"""
SELECT doc_id, unnest(list_distinct(list_transform(
         range(1, 1 + greatest(length({_NORM_SQL}) - {SHINGLE_K - 1}, 1)),
         i -> substr({_NORM_SQL}, CAST(i AS INT), {SHINGLE_K})))) AS shingle
FROM documents
"""


def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized-fingerprint groups with >1 member."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(_norm_text()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("cnt") > 1)
    )


EXACT_DUP_SQL = f"""
SELECT md5({_NORM_SQL}) AS fingerprint, COUNT(*) AS cnt,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seed, minhash): K permutation-free min-hashes per doc."""
    sh = _shingles_df(spark, sf_dir)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("seed")
    return (
        sh.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))).alias(
                "h"
            ),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


MINHASH_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
seeded AS (
  SELECT doc_id, unnest(range(0, {N_HASHES})) AS seed, shingle FROM sh
)
SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS minhash
FROM seeded GROUP BY doc_id, seed
"""


def _band_sigs(minhash_df: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig): md5 over the band's ordered minhashes."""
    return (
        minhash_df.withColumn("band", (F.col("seed") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                        lambda s: s["minhash"],
                    ),
                )
            ).alias("band_sig")
        )
    )


_BAND_SQL = f"""
WITH mh AS ({MINHASH_SQL})
SELECT doc_id, CAST(seed // {BAND_ROWS} AS INT) AS band,
       md5(string_agg(minhash, ',' ORDER BY seed)) AS band_sig
FROM mh GROUP BY doc_id, CAST(seed // {BAND_ROWS} AS INT)
"""


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct candidate pairs sharing ≥1 LSH band bucket (a < b)."""
    bands = _band_sigs(minhash_signatures(spark, sf_dir))
    a = bands.select(
        F.col("band"), F.col("band_sig"), F.col("doc_id").alias("doc_a")
    )
    b = bands.select(
        F.col("band"), F.col("band_sig"), F.col("doc_id").alias("doc_b")
    )
    return (
        a.join(b, on=["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


LSH_PAIRS_SQL = f"""
WITH bands AS ({_BAND_SQL})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
WHERE a.doc_id < b.doc_id
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard verification of the LSH candidates (near-dups).

    The join is candidates ⋈ shingles (twice) — proportional to candidate
    count, not corpus²; this is the scale path.
    """
    sh = _shingles_df(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cands = lsh_candidate_pairs(spark, sf_dir)
    common = (
        cands.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), on="doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(100)
    )
    return out


NGRAM_JACCARD_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
cands AS ({LSH_PAIRS_SQL}),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS common
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(za.n + zb.n - common AS DOUBLE), 6) AS jaccard
FROM common
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
WHERE round(CAST(common AS DOUBLE) / CAST(za.n + zb.n - common AS DOUBLE), 6)
      >= {JACCARD_THRESHOLD}
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 100
"""


def simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-hex-position majority over shingle digests."""
    sh = _shingles_df(spark, sf_dir).withColumn("h", F.md5("shingle"))
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in range(16):
        digit = F.expr(f"locate(substring(h, {p + 1}, 1), '0123456789abcdef') - 1")
        aggs.append(F.sum(digit).alias(f"s{p}"))
    per_doc = sh.groupBy("doc_id").agg(*aggs)
    bits = None
    for p in range(16):
        # majority: 2*sum >= 15*n  (avg digit ≥ 7.5)
        bit = F.when(F.col(f"s{p}") * 2 >= F.col("n") * 15, F.lit(1 << p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return per_doc.select("doc_id", bits.cast("bigint").alias("simhash"))


SIMHASH_SQL = f"""
WITH sh AS (SELECT doc_id, md5(shingle) AS h FROM ({_SHINGLES_SQL})),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n,
         {", ".join(f"SUM(strpos('0123456789abcdef', substr(h, {p + 1}, 1)) - 1) AS s{p}" for p in range(16))}
  FROM sh GROUP BY doc_id
)
SELECT doc_id,
       CAST({" + ".join(f"CASE WHEN s{p} * 2 >= n * 15 THEN {1 << p} ELSE 0 END" for p in range(16))}
            AS BIGINT) AS simhash
FROM per_doc
"""


def simhash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical-sketch groups (hamming-0 near-dup candidates)."""
    return (
        simhash16(spark, sf_dir)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("cnt") > 1)
    )


SIMHASH_GROUPS_SQL = f"""
WITH s AS ({SIMHASH_SQL})
SELECT simhash, COUNT(*) AS cnt, MIN(doc_id) AS min_doc_id
FROM s GROUP BY simhash HAVING COUNT(*) > 1
"""

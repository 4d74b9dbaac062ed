"""Deduplication operators over ``documents`` (extension M8c).

Training-data dedup at 100 TB, Spark-first:

- **Exact**: hash-groupBy on a normalized-content fingerprint — one
  shuffle keyed by the hash, map-side partial agg, no text comparison.
- **MinHash + LSH**: char-shingle → ONE md5 per shingle truncated to a
  28-bit integer fingerprint → K affine universal-hash permutations
  ``min((a·h + b) mod P)`` (integer-only, engine-portable, and K× less
  hashing than md5-per-seed) → band signatures → candidate pairs from
  band-bucket grouping → exact n-gram Jaccard verification on candidates
  only. The LSH step is what makes 100 TB feasible: the pair expansion
  is per-band-bucket, never all-pairs.
- **SimHash**: per-hex-position majority vote over shingle digests → a
  16-bit locality-sensitive sketch; identical sketches ⇒ near-dup group
  (the didactic hamming-0 form), PLUS the production variant: 64-bit
  per-bit-majority sketch with hamming-≤3 banded search (4×16-bit bands,
  pigeonhole candidate generation, exact popcount verification).

Everything is built-in functions (explode / groupBy / HOFs) — no Python
UDFs — with value-identical DuckDB mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import fanout_scan, load_table, stage_memo

SHINGLE_K = 8
N_HASHES = 8
# 2 bands × 4 rows: candidate probability ≈ 2·j⁴ — steep enough that a
# shared-vocabulary corpus (every doc overlaps every doc a little) does
# not explode the candidate set; near-dups (j ≥ 0.5) still surface.
BAND_ROWS = 4
JACCARD_THRESHOLD = 0.35


def _norm_text() -> F.Column:
    return F.lower(F.regexp_replace("text", r"\s+", " "))


_NORM_SQL = r"lower(regexp_replace(text, '\s+', ' ', 'g'))"


# Staged-intermediate memo: every dedup/sketch query consumes the same
# shingle/minhash frames, and a lazy localCheckpoint is only shared if
# consumers hold the SAME DataFrame object. Keyed by (session id, sf_dir)
# so repeated queries in one session (bench, driver, a real pipeline run)
# materialize the staging work once — the in-session analog of writing a
# staged table, which is exactly what this would be at 100 TB.
# per-(session, sf-dir) staged-frame memo — shared engine-wide helper
_memo = stage_memo


def _shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh_arr) — distinct k-char shingle array per document.

    Two hard-won plan rules live here:

    - The normalization is hoisted into its own projection: inlining it
      in the transform lambda would re-run the regex once PER SHINGLE
      (Spark does no subexpression elimination inside HOF lambdas) — a
      300× slowdown measured at sf0.1.
    - The result is a **lazy localCheckpoint**: ``explode`` over a
      pipelined expensive array expression re-evaluates that expression
      per OUTPUT row (measured 19 s vs 0.3 s at sf0.1 — Generate's
      child collapses into the generator), and the dedup queries
      reference this frame up to 3× in one plan (candidate lineage +
      both verification join sides). Materializing once is the same
      order of storage as the shingle shuffle the consumers do anyway;
      at 100 TB the equivalent is a staged intermediate table.
    """
    def build() -> DataFrame:
        docs = fanout_scan(spark, load_table(spark, sf_dir, "documents")).select(
            "doc_id", F.expr(_NORM_EXPR).alias("norm")
        )
        arrs = docs.select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length(norm) - {SHINGLE_K - 1}, 1)),"
                    f" i -> substring(norm, i, {SHINGLE_K}))"
                )
            ).alias("sh_arr"),
        )
        return arrs.localCheckpoint(eager=False)

    return _memo(spark, sf_dir, "sh_arr", build)


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — exploded distinct shingles."""
    return _shingle_arrays(spark, sf_dir).select(
        "doc_id", F.explode("sh_arr").alias("shingle")
    )


_NORM_EXPR = r"lower(regexp_replace(text, '\\s+', ' '))"

_SHINGLE_ARRAYS_SQL = f"""
SELECT doc_id, list_distinct(list_transform(
         range(1, 1 + greatest(length(norm) - {SHINGLE_K - 1}, 1)),
         i -> substr(norm, CAST(i AS INT), {SHINGLE_K}))) AS sh_arr
FROM (SELECT doc_id, {_NORM_SQL} AS norm FROM documents)
"""

_SHINGLES_SQL = f"""
SELECT doc_id, unnest(sh_arr) AS shingle FROM ({_SHINGLE_ARRAYS_SQL})
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


# universal-hashing minhash: ONE md5 per shingle → 28-bit integer
# fingerprint, then K affine permutations (a·h + b) mod P over ints.
# 28 bits keeps a·h < 2^56 — no bigint overflow in EITHER engine
# (DuckDB errors on overflow where the JVM wraps, so this bound is a
# portability requirement, not just hygiene). P = largest prime < 2^28.
MINHASH_P = 268435399
MINHASH_A = [98764321, 123456791, 87654323, 44560093, 199990021, 150094637, 66600049, 31415927]
MINHASH_B = [12345701, 98765431, 55555561, 10000019, 77777807, 24681359, 13579111, 86420423]

# Spark: conv(hex,16,10) → decimal string → BIGINT; DuckDB: '0x'-prefixed
# cast. Verified value-identical (e.g. md5('abc')[:7] → 151000329 both).
_HASH28_SPARK = "CAST(conv(substr(md5(e), 1, 7), 16, 10) AS BIGINT)"
_HASH28_DUCK = "('0x' || substr(md5(e), 1, 7))::BIGINT"


def _shingle_hash_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hs): 28-bit integer fingerprint per distinct shingle.

    Checkpointed for the same reason as the shingle arrays: the K
    permutation min-folds each reference ``hs``, and collapsed
    projections would re-run the md5+conv per reference (no
    subexpression elimination). One md5 per shingle TOTAL is the whole
    point — the previous scheme hashed every shingle K times.
    """
    def build() -> DataFrame:
        arrs = _shingle_arrays(spark, sf_dir)
        hs = arrs.select(
            "doc_id", F.expr(f"transform(sh_arr, e -> {_HASH28_SPARK})").alias("hs")
        )
        return hs.localCheckpoint(eager=False)

    return _memo(spark, sf_dir, "hash28", build)


def _minhash_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mh_arr): all K min-hashes as ONE small array per doc.

    K integer min-folds in a single projection over the checkpointed
    fingerprint array; the surviving row is ~80 bytes. (The original
    row-per-seed formulation exploded K seed rows FIRST, so the
    Generate copied the multi-KB shingle array K× per doc — at sf0.1
    that allocation shape drove G1 young-GC pauses past 15 s.)
    """
    def build() -> DataFrame:
        hs = _shingle_hash_arrays(spark, sf_dir)
        folds = ", ".join(
            f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {MINHASH_P}L))"
            for a, b in zip(MINHASH_A, MINHASH_B)
        )
        mh = hs.select("doc_id", F.expr(f"array({folds})").alias("mh_arr"))
        return mh.localCheckpoint(eager=False)

    return _memo(spark, sf_dir, "minhash", build)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seed, minhash): K permutation-free min-hashes per doc.

    Map-only: no aggregation exchange at all. At 100 TB this is a
    narrow projection pipelined with the scan.
    """
    mh = _minhash_arrays(spark, sf_dir)
    return mh.select(
        "doc_id", F.posexplode("mh_arr").alias("seed", "minhash")
    )


_A_LIST = ", ".join(str(a) for a in MINHASH_A)
_B_LIST = ", ".join(str(b) for b in MINHASH_B)

MINHASH_SQL = f"""
WITH arrs AS ({_SHINGLE_ARRAYS_SQL}),
hsa AS (
  SELECT doc_id, list_transform(sh_arr, e -> {_HASH28_DUCK}) AS hs FROM arrs
),
seeded AS (
  SELECT doc_id, unnest(range(0, {N_HASHES})) AS seed, hs FROM hsa
)
SELECT doc_id, CAST(seed AS INTEGER) AS seed,
       list_min(list_transform(hs,
                h -> (([{_A_LIST}])[CAST(seed AS INT) + 1] * h
                      + ([{_B_LIST}])[CAST(seed AS INT) + 1]) % {MINHASH_P})) AS minhash
FROM seeded
"""


def _band_sigs(mh_df: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig): md5 over the band's ordered minhashes.

    Map-side over the per-doc minhash array — the (doc_id, band)
    collect_list groupBy the row-per-seed formulation needed is gone
    entirely (one less shuffle, no aggregation buffers; seeds are
    already ordered inside ``mh_arr``).
    """
    n_bands = N_HASHES // BAND_ROWS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.expr(
                        f"concat_ws(',', transform(slice(mh_arr, {b * BAND_ROWS + 1},"
                        f" {BAND_ROWS}), v -> cast(v AS string)))"
                    )
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return mh_df.select(
        "doc_id", F.explode(bands).alias("bs")
    ).select("doc_id", "bs.band", "bs.band_sig")


_BAND_SQL = f"""
WITH mh AS ({MINHASH_SQL})
SELECT doc_id, CAST(seed // {BAND_ROWS} AS INT) AS band,
       md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_sig
FROM mh GROUP BY doc_id, CAST(seed // {BAND_ROWS} AS INT)
"""


def lsh_candidate_pairs(
    spark: SparkSession, sf_dir: str, bucket_cap: int | None = None
) -> DataFrame:
    """Distinct candidate pairs sharing ≥1 LSH band bucket (a < b).

    ``bucket_cap`` is the stop-bucket rule (the LSH analog of the
    PPJoin's stop-shingle df cap): a bucket holding more than cap docs
    is a non-discriminative signature collision — on a saturated
    vocabulary bucket sizes grow with the corpus and pairs quadratically
    (measured α 1.22 at 500 k docs, r8 SCALE_PROOF) — so the capped
    variant skips it, bounding expansion to cap·Σb ∝ corpus. Capped
    buckets are ≤cap members, so the map-side HOF pair expansion is the
    optimal plan there (one shuffle, ≤cap·(cap−1)/2 structs per buffer).

    The UNCAPPED (exact-contract) arm must instead STREAM: the HOF
    expansion materializes a bucket's full m(m−1)/2 pair array in one
    buffer, and on a saturated signature space bucket sizes grow with
    the corpus — at 4.5 M fixture docs concurrent mega-bucket buffers
    exhausted a 48 g heap and killed the JVM via a full-GC heartbeat
    storm (SCALE_PROOF.md r9). The band-key self-join below is
    value-identical (it is exactly the oracle's formulation) and
    sort-merge/shuffled-hash joins buffer one O(m) key group with disk
    spill, so a mega-bucket degrades to slow-but-streaming; Σb² output
    rows remain the exact contract's own lower bound.
    """
    bands = _band_sigs(_minhash_arrays(spark, sf_dir))
    if bucket_cap is not None:
        # count-first, THEN collect: filtering after collect_list would
        # still build the mega-bucket in one agg buffer (a corpus-sized
        # single-task allocation on a saturated signature). The count
        # agg partial-aggregates map-side, so the skewed signature never
        # concentrates rows; collect_list then only sees ≤cap groups.
        sizes = bands.groupBy("band", "band_sig").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        kept = sizes.filter(
            (F.col("_bn") > 1) & (F.col("_bn") <= bucket_cap)
        ).drop("_bn")
        bands = bands.join(kept, ["band", "band_sig"])
        buckets = bands.groupBy("band", "band_sig").agg(
            F.array_sort(F.collect_list("doc_id")).alias("ds")
        )
        return (
            buckets.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ds, (a, i) ->"
                        " transform(slice(ds, i + 2, size(ds) - i - 1),"
                        " b -> struct(a AS doc_a, b AS doc_b))))"
                    )
                ).alias("p")
            )
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
    # both join sides are the SAME DataFrame over the checkpointed
    # minhash frame, so the signature pipeline is computed once and the
    # per-side band projection is 4 cached-array md5s per doc.
    b_a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    b_b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    return (
        b_a.join(b_b, ["band", "band_sig"])
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


def _ngram_jaccard(
    spark: SparkSession, sf_dir: str, bucket_cap: int | None
) -> DataFrame:
    """Exact shingle-Jaccard verification of the LSH candidates (near-dups).

    Candidate pairs join back to the per-doc shingle ARRAYS and the
    overlap is ``array_intersect`` per pair — work ∝ candidates (a few
    hundred here), never corpus², and no shingle-level shuffle at all.
    """
    arrs = _shingle_arrays(spark, sf_dir)
    cands = lsh_candidate_pairs(spark, sf_dir, bucket_cap=bucket_cap)
    common = F.size(F.array_intersect("arr_a", "arr_b"))
    return (
        cands.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a")), "doc_a"
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b")), "doc_b"
        )
        .withColumn("common", common)
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.size("arr_a") + F.size("arr_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(100)
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-contract arm: every LSH candidate verified, whatever the
    bucket sizes. On a saturated vocabulary candidate count IS the
    exact-output lower bound (measured α 1.22 at 500 k docs);
    ``ngram_jaccard_capped_neardups`` below is the scale-path sibling."""
    return _ngram_jaccard(spark, sf_dir, bucket_cap=None)


LSH_BUCKET_CAP = 64  # stop-bucket cap for the capped scale-path variant


def ngram_jaccard_capped_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path LSH verify: band buckets holding > LSH_BUCKET_CAP docs
    are treated as non-discriminative signature collisions and skipped
    before pair expansion (the LSH analog of the PPJoin stop-shingle df
    cap, prefix_filter_capped_neardups). Deterministic — the kept-bucket
    rule is a pure function of the data — and survivors get the same
    exact Jaccard + threshold + top-100; candidate count is bounded by
    cap·(band entries) ∝ corpus instead of Σb²."""
    return _ngram_jaccard(spark, sf_dir, bucket_cap=LSH_BUCKET_CAP)


NGRAM_JACCARD_SQL = f"""
WITH arrs AS ({_SHINGLE_ARRAYS_SQL}),
cands AS ({LSH_PAIRS_SQL}),
scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(aa.sh_arr, ab.sh_arr)) AS common,
         len(aa.sh_arr) AS na, len(ab.sh_arr) AS nb
  FROM cands c
  JOIN arrs aa ON aa.doc_id = c.doc_a
  JOIN arrs ab ON ab.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM scored
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)
      >= {JACCARD_THRESHOLD}
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 100
"""

LSH_PAIRS_CAPPED_SQL = f"""
WITH bands AS MATERIALIZED ({_BAND_SQL}),
kept AS (
  SELECT band, band_sig FROM bands GROUP BY band, band_sig
  HAVING COUNT(*) > 1 AND COUNT(*) <= {LSH_BUCKET_CAP}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN kept k ON a.band = k.band AND a.band_sig = k.band_sig
JOIN bands b ON b.band = k.band AND b.band_sig = k.band_sig
WHERE a.doc_id < b.doc_id
"""

NGRAM_JACCARD_CAPPED_SQL = f"""
WITH arrs AS ({_SHINGLE_ARRAYS_SQL}),
cands AS ({LSH_PAIRS_CAPPED_SQL}),
scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(aa.sh_arr, ab.sh_arr)) AS common,
         len(aa.sh_arr) AS na, len(ab.sh_arr) AS nb
  FROM cands c
  JOIN arrs aa ON aa.doc_id = c.doc_a
  JOIN arrs ab ON ab.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM scored
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)
      >= {JACCARD_THRESHOLD}
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 100
"""


def _digest16_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hs): full md5 hex digest per distinct shingle, staged.

    Checkpointed because projection collapse would inline the md5
    transform into EVERY one of simhash16's 16 fold expressions below
    (no subexpression elimination) — 16 md5s per shingle instead of 1.
    Named so bench.py can warm it as its own `memo:` line.
    """
    return _memo(
        spark,
        sf_dir,
        "digests16",
        lambda: _shingle_arrays(spark, sf_dir)
        .select("doc_id", F.expr("transform(sh_arr, e -> md5(e))").alias("hs"))
        .localCheckpoint(eager=False),
    )


def simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-hex-position majority over shingle digests.

    Map-only: digests are computed once per shingle (``transform`` into a
    column — md5 is the dominant cost, 3× the fold itself), then the 16
    positional sums fold over the digest array per document. No explode,
    no shuffle, no wide aggregate.
    """
    arrs = _digest16_arrays(spark, sf_dir)
    cols = [F.col("doc_id"), F.size("hs").alias("n")]
    for p in range(16):
        cols.append(
            F.expr(
                f"aggregate(hs, 0L, (acc, h) -> acc"
                f" + locate(substring(h, {p + 1}, 1), '0123456789abcdef') - 1)"
            ).alias(f"s{p}")
        )
    per_doc = arrs.select(*cols)
    bits = None
    for p in range(16):
        # majority: 2*sum >= 15*n  (avg digit ≥ 7.5)
        bit = F.when(F.col(f"s{p}") * 2 >= F.col("n") * 15, F.lit(1 << p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return per_doc.select("doc_id", bits.cast("bigint").alias("simhash"))


SIMHASH_SQL = f"""
WITH arrs AS (
  SELECT doc_id, list_transform(sh_arr, e -> md5(e)) AS hs FROM ({_SHINGLE_ARRAYS_SQL})
),
per_doc AS (
  SELECT doc_id, len(hs) AS n,
         {", ".join(f"list_sum(list_transform(hs, h -> strpos('0123456789abcdef', substr(h, {p + 1}, 1)) - 1)) AS s{p}" for p in range(16))}
  FROM arrs
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


# --- 64-bit SimHash + hamming-≤k banded search (the production variant) ----
#
# Google-style near-dup detection (Manku et al., WWW'07 — public paper):
# 64-bit sketch, two sketches are near-dups iff hamming(a, b) <= K. The
# banded search exploits the pigeonhole principle: split 64 bits into
# K+1 = 4 disjoint 16-bit bands; any pair within hamming 3 agrees EXACTLY
# on at least one band, so candidate generation is 4 equi-joins on band
# value — never corpus². At 100 TB (band_idx, band_val) is the storage
# partition key and each band join is partition-local.
SIMHASH64_K = 3
SIMHASH64_BANDS = 4  # 4 × 16 bits

_MINLONG = "(-9223372036854775807 - 1)"  # sign-safe bit-63 term, both engines


def _simhash64_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): 64-bit per-bit-majority sketch over shingle md5s.

    The md5 is split into two 32-bit halves per shingle (hi = hex[1:8],
    lo = hex[9:16]) so every intermediate stays unsigned-32 in a signed
    64 — identical arithmetic on the JVM and DuckDB (a packed 64-bit
    shingle hash would need sign-wrap semantics DuckDB rejects). Bit 63
    of the final sketch is added as MINLONG (two's complement) — in-range
    on both engines. Map-only: no shuffle, digests computed once per
    shingle (checkpointed array, folds per bit are integer-only).
    """
    arrs = _shingle_arrays(spark, sf_dir).select(
        "doc_id",
        F.expr("transform(sh_arr, e -> CAST(conv(substr(md5(e), 1, 8), 16, 10) AS BIGINT))").alias("hi"),
        F.expr("transform(sh_arr, e -> CAST(conv(substr(md5(e), 9, 8), 16, 10) AS BIGINT))").alias("lo"),
    ).localCheckpoint(eager=False)
    cols = [F.col("doc_id"), F.size("lo").alias("n")]
    for p in range(64):
        src, sh = ("lo", p) if p < 32 else ("hi", p - 32)
        cols.append(
            F.expr(
                f"aggregate({src}, 0L, (acc, h) -> acc + (shiftright(h, {sh}) & 1))"
            ).alias(f"s{p}")
        )
    per_doc = arrs.select(*cols)
    bits = None
    for p in range(63):
        bit = F.when(F.col(f"s{p}") * 2 >= F.col("n"), F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bits = bit if bits is None else bits + bit
    h = F.when(
        F.col("s63") * 2 >= F.col("n"), bits + F.expr(_MINLONG)
    ).otherwise(bits)
    return per_doc.select("doc_id", h.alias("simhash"))


_SIMHASH64_BLOCK_WIDTHS = [11, 11, 11, 11, 10, 10]  # six blocks over 64 bits


def _simhash64_probe_keys() -> list[tuple[int, int, int]]:
    """All C(6,3)=20 block triples — the Manku multiprobe combinations."""
    from itertools import combinations

    return list(combinations(range(len(_SIMHASH64_BLOCK_WIDTHS)), 3))


def simhash64_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at hamming ≤ K=3 via Manku-style multiprobe blocks.

    The r9 scale measurement KILLED the previous 4×16-bit banded form at
    4.5 M docs: a 16-bit band domain is 4·65 536 = 262 144 cells TOTAL,
    and the diag measured it already saturated at 1.5 M docs (260 572
    occupied cells; max cell 459 → 1338 and Σc² 294 M → 2.61 B across a
    ×3 step — candidate volume ∝ n² FOREVER, the fixed-cardinality
    blocking-key defect class from r8's entity-resolution fix, plus a
    heap OOM in the 2.6 B-row candidate stream). The pigeonhole itself
    was the bottleneck, not the pair-expansion mechanics.

    Fix (Manku, Jain & Das Sarma 2007, the simhash dedup paper): split
    the sketch into SIX blocks (~11 bits) instead of four; hamming ≤ 3
    flips bits in at most 3 blocks, so some specific TRIPLE of blocks
    matches exactly — probe all C(6,3) = 20 triples with ~32-bit
    compound keys. The compound key space is ~2^32 (non-saturating at
    any realistic corpus), so cell occupancy stays O(n/2^32) and
    candidates are collision- or true-duplicate-driven, never
    band-domain-driven. Value-identical to the banded form (both are
    exact supersets of hamming ≤ 3 → same verified output); the oracle
    keeps the simpler 4-band spelling as the executable spec.
    Per-doc fan-out rises 4 → 20 probe rows — the linear price for the
    quadratic cure (same trade as IVF multiprobe).
    """
    sk = _simhash64_sketches(spark, sf_dir).localCheckpoint(eager=False)
    offs = []
    off = 0
    for w in _SIMHASH64_BLOCK_WIDTHS:
        offs.append((off, (1 << w) - 1))
        off += w
    blk = [
        F.expr(f"shiftright(simhash, {o}) & {m}") for o, m in offs
    ]
    probes = F.array(
        *[
            F.struct(
                F.lit(ci).alias("combo"),
                blk[i].alias("v1"),
                blk[j].alias("v2"),
                blk[k].alias("v3"),
            )
            for ci, (i, j, k) in enumerate(_simhash64_probe_keys())
        ]
    )
    keyed = sk.select("doc_id", F.explode(probes).alias("p")).select(
        "doc_id", "p.combo", "p.v1", "p.v2", "p.v3"
    )
    cands = (
        keyed.select(F.col("doc_id").alias("doc_a"), "combo", "v1", "v2", "v3")
        .join(
            keyed.select(F.col("doc_id").alias("doc_b"), "combo", "v1", "v2", "v3"),
            ["combo", "v1", "v2", "v3"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return (
        cands.join(sk.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha")), "doc_a")
        .join(sk.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb")), "doc_b")
        .withColumn("hamming", F.expr("CAST(bit_count(ha ^ hb) AS INT)"))
        .filter(F.col("hamming") <= SIMHASH64_K)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("hamming", "doc_a", "doc_b")
        .limit(100)
    )


def _simhash64_sql() -> str:
    hsa = f"""
    SELECT doc_id,
           list_transform(sh_arr, e -> ('0x' || substr(md5(e), 1, 8))::BIGINT) AS hi,
           list_transform(sh_arr, e -> ('0x' || substr(md5(e), 9, 8))::BIGINT) AS lo
    FROM ({_SHINGLE_ARRAYS_SQL})
    """
    sums = ", ".join(
        f"list_sum(list_transform({'lo' if p < 32 else 'hi'}, h -> (h >> {p if p < 32 else p - 32}) & 1)) AS s{p}"
        for p in range(64)
    )
    bits = " + ".join(f"CASE WHEN s{p} * 2 >= n THEN CAST({1 << p} AS BIGINT) ELSE 0 END" for p in range(63))
    return f"""
    SELECT doc_id,
           CAST(({bits})
                + CASE WHEN s63 * 2 >= n THEN {_MINLONG} ELSE 0 END AS BIGINT) AS simhash
    FROM (SELECT doc_id, len(lo) AS n, {sums} FROM ({hsa}))
    """


def simhash64_neardups_sql() -> str:
    band_vals = ", ".join(str(b) for b in range(SIMHASH64_BANDS))
    return f"""
    WITH sk AS ({_simhash64_sql()}),
    bands AS (
      SELECT doc_id, simhash, band_idx, (simhash >> (band_idx * 16)) & 65535 AS band_val
      FROM (SELECT doc_id, simhash, unnest([{band_vals}]) AS band_idx FROM sk)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
    FROM cands c
    JOIN sk sa ON sa.doc_id = c.doc_a
    JOIN sk sb ON sb.doc_id = c.doc_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {SIMHASH64_K}
    ORDER BY hamming, doc_a, doc_b
    LIMIT 100
    """


def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster assignment: connected components over the verified
    near-dup pair graph — every member labeled with its component's min
    doc_id (the canonical survivor a training pipeline keeps).

    Iterative min-label propagation (the only iterative operator in the
    engine): each round joins labels across edges and keeps the min;
    stops at fixpoint. Rounds are O(component diameter) — near-dup
    clusters are shallow, so a handful of broadcast-sized iterations;
    at 100 TB you'd switch to the large-star/small-star variant but the
    loop/checkpoint structure is identical. Oracle: DuckDB expresses the
    same fixpoint as a recursive CTE.
    """
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return components_from_pairs(pairs)


def components_from_pairs(pairs: DataFrame) -> DataFrame:
    """Generic min-label-propagation connected components over an
    undirected edge list (columns ``doc_a``, ``doc_b``); returns
    (doc_id, component = min node id of the component). Shared by the
    text (jaccard) and embedding (cosine) near-dup graphs."""
    # edges/labels stay EAGER: round 0's single job references labels at
    # three points (neighbor join, union self-branch, composition) — a
    # lazy block would race its own first materialization there and
    # could recompute an expensive caller-supplied `pairs` lineage
    # (ext_neardup_components passes the raw jaccard-pair plan)
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    while True:
        # r09: pointer-doubling hop (guide §1.2 — fewer rounds beats
        # cheaper rounds). A label is always a node id of the same
        # component, so composing through the label table (label →
        # labels[label], which is ≤ label and still in-component) lets
        # propagation distance double per round: convergence in
        # O(log diameter) rounds instead of O(diameter). The fixpoint is
        # unchanged (all nodes at the component min), so the returned
        # values are identical; only the trajectory shortens.
        # r10 (VERDICT r9 item 5): the union's self-branch carries an
        # is_self flag so the node's OLD label rides the same aggregate
        # (old = the self row's label) — one labels-join per round
        # instead of two — and the round's checkpoint is lazy, so the
        # convergence count is the job that materializes it: 2 jobs and
        # 4 shuffles per round collapse to 1 job and 3 shuffles, with
        # value-identical labels (pinned by the components parity tests).
        one = (
            edges.join(labels, edges.doc_b == labels.node)
            .select(
                F.col("doc_a").alias("node"),
                F.col("label"),
                F.lit(0).alias("is_self"),
            )
            .unionByName(
                labels.select("node", "label", F.lit(1).alias("is_self"))
            )
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("is_self") == 1, F.col("label"))).alias("old"),
            )
        )
        prop_old = (
            one.join(
                labels.select(
                    F.col("node").alias("label"), F.col("label").alias("label2")
                ),
                "label",
            )
            .select(
                "node", F.least("label", "label2").alias("label"), "old"
            )
            .localCheckpoint(eager=False)
        )
        changed = prop_old.filter(F.col("label") != F.col("old")).count()
        labels = prop_old.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


NEARDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE pairs AS ({{pairs}}),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, other) AS (
  SELECT doc_a, doc_b FROM edges
  UNION
  SELECT r.node, e.doc_b FROM reach r JOIN edges e ON r.other = e.doc_a
)
SELECT node AS doc_id, LEAST(node, MIN(other)) AS component
FROM reach GROUP BY node
"""


def neardup_components_sql() -> str:
    return NEARDUP_COMPONENTS_SQL.format(pairs=f"SELECT doc_a, doc_b FROM ({NGRAM_JACCARD_SQL})")


def neardup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup decision: one keep/drop flag per document.

    The operator a training pipeline actually runs: label every doc with
    its near-dup component (singletons keep their own id), then keep the
    best representative per component — longest text wins, ties broken by
    lowest doc_id. The ranking window partitions by component, whose size
    is bounded by cluster width, so no global sort at any scale; the
    component labels come from the shared min-label-propagation loop.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    comp = neardup_components(spark, sf_dir)
    labeled = docs.join(comp, "doc_id", "left").withColumn(
        "component", F.coalesce("component", F.col("doc_id"))
    )
    rank_w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return labeled.select(
        "doc_id",
        "component",
        (F.row_number().over(rank_w) == 1).alias("keep"),
    )


def neardup_keep_canonical_sql() -> str:
    return f"""
WITH comp AS ({neardup_components_sql()}),
labeled AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars
  FROM documents d LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, component,
       ROW_NUMBER() OVER (PARTITION BY component
                          ORDER BY n_chars DESC, doc_id) = 1 AS keep
FROM labeled
"""


# --- edit-distance near-dups (blocked, thresholded Levenshtein) -------------
# The third dedup family beside set-based MinHash/Jaccard and bitwise
# SimHash: edit distance catches small in-place mutations (typos,
# re-orderings inside a window) that shingle sets blur out. All-pairs
# Levenshtein is O(n²·len²) and impossible at corpus scale; the standard
# production shape is block → thresholded verify, which is what this does.

EDIT_PREFIX_LEN = 40
# per-block membership cap (first N by doc_id): the leading-word block
# DOMAIN is fixed, so uncapped blocks grow with the corpus and pair work
# quadratically (SCALE_PROOF r8). Never binds at driver gate scales.
EDIT_BLOCK_CAP = 1024
EDIT_MAX_DIST = 10


def edit_distance_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein near-duplicate candidates over ``documents``.

    1. Normalize to a fixed-length key (lowercased 40-char prefix) so
       per-pair cost is bounded regardless of document length.
    2. Block on the leading word: candidate pairs only form inside a
       block, so the self-join is bounded by Σ b² (the same argument as
       the LSH bands above — never all-pairs). The leading-word DOMAIN
       is data-independent though (31 words on this corpus), so block
       sizes grow ∝ corpus and pairs ∝ corpus² — SCALE_PROOF r8 measured
       the uncapped join as DNF (>10 min for one rep) at 50 k docs. The
       promised block cap is therefore now real: each block pairs only
       its first ``EDIT_BLOCK_CAP`` members by doc_id (deterministic
       total order, mirrored in the oracle), bounding pair work at
       Σ min(b, cap)² while the cap never binds at the driver gate
       scales (max block ≈ 160 docs at sf0.1) — values there unchanged.
    3. Verify with the 3-arg thresholded ``levenshtein``: Spark abandons
       the DP row once the running minimum exceeds the bound — O(len·k)
       per pair, not O(len²) — and returns -1 past the threshold, which
       the filter drops. The DuckDB mirror filters the plain distance to
       the same bound, so the survivor set is value-identical.
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.substring(F.lower(F.col("text")), 1, EDIT_PREFIX_LEN).alias("pfx"),
        )
        .withColumn("blk", F.regexp_extract("pfx", "^[a-z]+", 0))
    )
    w_blk = Window.partitionBy("blk").orderBy("doc_id")
    d = (
        d.withColumn("_bn", F.row_number().over(w_blk))
        .filter(F.col("_bn") <= EDIT_BLOCK_CAP)
        .drop("_bn")
    )
    # the capped frame is KB-scale, so AQE's byte-based coalescing would
    # run the whole Levenshtein fan-out in ~1 task (measured 128 s vs
    # 14 s, r8) — broadcast one side and spread the probe side across
    # all cores; a shuffle join on blk would cap parallelism at #blocks
    a = d.alias("a").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    b = F.broadcast(d.alias("b"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            F.levenshtein(F.col("a.pfx"), F.col("b.pfx"), EDIT_MAX_DIST).alias("d_raw"),
        )
        .filter(F.col("d_raw") >= 0)
        .select("doc_id_1", "doc_id_2", F.col("d_raw").cast("bigint").alias("dist"))
    )


EDIT_DISTANCE_SQL = f"""
WITH d0 AS (
  SELECT doc_id,
         substr(lower(text), 1, {EDIT_PREFIX_LEN}) AS pfx,
         regexp_extract(substr(lower(text), 1, {EDIT_PREFIX_LEN}), '^[a-z]+') AS blk
  FROM documents
),
d AS (
  SELECT doc_id, pfx, blk FROM (
    SELECT *, row_number() OVER (PARTITION BY blk ORDER BY doc_id) AS _bn
    FROM d0)
  WHERE _bn <= {EDIT_BLOCK_CAP}
)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= {EDIT_MAX_DIST}
"""


# --- incremental ingest dedup: new batch vs the stored corpus index ---------

NEWBATCH_MOD = 17  # doc_id % 17 == 0 simulates the arriving batch


def incremental_newbatch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an ARRIVING batch against the existing corpus — the shape
    every continuously-ingesting pipeline actually runs (the batch joins
    the STORED band index; the corpus is never re-signatured and the
    batch never all-pairs with anything).

    Candidates = new-batch band signatures ⋈ corpus band index on
    (band, band_sig) — cost ∝ batch size × band collision rate; verify =
    exact shingle Jaccard on candidates only (same verify as the batch
    family). In production the corpus side IS the persisted index table,
    here stood in by the per-session staged frames (`_memo`) — identical
    plan shape either way.
    """
    bands = _band_sigs(_minhash_arrays(spark, sf_dir))
    is_new = (F.col("doc_id") % NEWBATCH_MOD) == 0
    new_b = bands.filter(is_new).select(
        F.col("doc_id").alias("new_id"), "band", "band_sig"
    )
    old_b = bands.filter(~is_new).select(
        F.col("doc_id").alias("old_id"), "band", "band_sig"
    )
    cands = new_b.join(old_b, ["band", "band_sig"]).select("new_id", "old_id").distinct()
    arrs = _shingle_arrays(spark, sf_dir)
    common = F.size(F.array_intersect("arr_a", "arr_b"))
    return (
        cands.join(
            arrs.select(F.col("doc_id").alias("new_id"), F.col("sh_arr").alias("arr_a")),
            "new_id",
        )
        .join(
            arrs.select(F.col("doc_id").alias("old_id"), F.col("sh_arr").alias("arr_b")),
            "old_id",
        )
        .withColumn("common", common)
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.size("arr_a") + F.size("arr_b") - F.col("common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("new_id", F.col("old_id").alias("dup_of"), "jaccard")
        .orderBy(F.col("jaccard").desc(), "new_id", "dup_of")
        .limit(100)
    )


INCREMENTAL_NEWBATCH_SQL = f"""
WITH bands AS ({_BAND_SQL}),
cands AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM bands n JOIN bands o ON n.band = o.band AND n.band_sig = o.band_sig
  WHERE n.doc_id % {NEWBATCH_MOD} = 0 AND o.doc_id % {NEWBATCH_MOD} <> 0
),
arrs AS ({_SHINGLE_ARRAYS_SQL}),
scored AS (
  SELECT c.new_id, c.old_id,
         len(list_intersect(aa.sh_arr, ab.sh_arr)) AS common,
         len(aa.sh_arr) AS na, len(ab.sh_arr) AS nb
  FROM cands c
  JOIN arrs aa ON aa.doc_id = c.new_id
  JOIN arrs ab ON ab.doc_id = c.old_id
)
SELECT new_id, old_id AS dup_of,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM scored
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)
      >= {JACCARD_THRESHOLD}
ORDER BY jaccard DESC, new_id, dup_of
LIMIT 100
"""


# --- containment near-dups: the subset-duplication case ---------------------
CONTAINMENT_THRESHOLD = 0.6
CONTAIN_MAX_DF = 5  # posting-list cap for candidate generation


def containment_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups: ``|A∩B| / min(|A|,|B|)``.

    Jaccard under-scores a short document wholly embedded in a longer one
    (union is dominated by the long doc), so Jaccard-tuned LSH bands
    under-recall exactly the boilerplate-inclusion case that matters for
    training corpora. Candidates here come instead from RARE-shingle
    posting lists (the decontaminate pattern, intra-corpus): one pass
    over the shingle explode, posting lists capped at ``CONTAIN_MAX_DF``
    members, ordered in-list pair expansion — candidate work is bounded
    by Σ df² over rare shingles, never corpus². Verification is exact
    ``array_intersect`` over the memoized shingle arrays, work ∝
    candidates. Deterministic despite ``collect_list`` order: the pair
    set is symmetric-closed (a<b) and ``distinct``-ed before scoring.
    """
    sh = _shingles_df(spark, sf_dir)
    per = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= CONTAIN_MAX_DF))
    )
    pairs = (
        per.select(
            F.explode(
                F.expr(
                    "flatten(transform(members, a -> transform("
                    "filter(members, b -> b > a),"
                    " b -> struct(a AS doc_a, b AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    arrs = _shingle_arrays(spark, sf_dir)
    common = F.size(F.array_intersect("arr_a", "arr_b"))
    score = F.round(
        F.col("common").cast("double")
        / F.least(F.size("arr_a"), F.size("arr_b")).cast("double"),
        6,
    )
    return (
        pairs.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a")), "doc_a"
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b")), "doc_b"
        )
        .withColumn("common", common)
        .withColumn("containment", score)
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", "containment")
        .orderBy(F.col("containment").desc(), "doc_a", "doc_b")
        .limit(100)
    )


CONTAINMENT_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {CONTAIN_MAX_DF}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a
  JOIN rare USING (shingle)
  JOIN sh b ON b.shingle = a.shingle AND b.doc_id > a.doc_id
),
arrs AS ({_SHINGLE_ARRAYS_SQL}),
scored AS (
  SELECT p.doc_a, p.doc_b,
         len(list_intersect(aa.sh_arr, ab.sh_arr)) AS common,
         least(len(aa.sh_arr), len(ab.sh_arr)) AS mn
  FROM pairs p
  JOIN arrs aa ON aa.doc_id = p.doc_a
  JOIN arrs ab ON ab.doc_id = p.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(mn AS DOUBLE), 6) AS containment
FROM scored
WHERE round(CAST(common AS DOUBLE) / CAST(mn AS DOUBLE), 6) >= {CONTAINMENT_THRESHOLD}
ORDER BY containment DESC, doc_a, doc_b
LIMIT 100
"""

# --- prefix-filter set-similarity join (PPJoin-style) -----------------------
PREFIX_JACCARD_T = 0.9  # similarity threshold (corpus near-dups are all ≥0.92)
PREFIX_DF_CAP = 256  # stop-shingle cap for the capped scale-path variant


def prefix_filter_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (the PPJoin family,
    Xiao et al. / Chaudhuri et al.): two documents with shingle-set
    Jaccard ≥ t MUST share at least one element among the first
    ``L = n − ⌈t·n⌉ + 1`` elements of their global-rarity-sorted sets —
    so candidates come from a PREFIX equi-join instead of any all-pairs
    step, tightened further by PPJoin's length filter (|A| ≥ t·|B|) and
    positional filter (the overlap still reachable from the shared
    position must reach α = ⌈(t/(1+t))(n_a+n_b)⌉).

    Engineering notes, all measured at sf0.1:
    - runs on the memoized 28-bit INTEGER shingle fingerprints
      (``_shingle_hash_arrays``), not shingle strings: the exact verify
      is ``array_intersect`` over ~200 k candidate pairs, and long
      arrays hash ~10× cheaper than UTF8 arrays (30 s → ~4 s); the
      oracle applies the identical md5-substring hash, so parity is
      exact (same trick the minhash family already pins).
    - the doc→sorted-array table is BROADCAST into the verify joins —
      shuffling multi-KB arrays to a narrow pair stream was the next
      bottleneck (wide-rows-through-joins rule). On a cluster where the
      array table outgrows broadcast, bucket both sides by doc_id.
    - word tokens are NOT usable here: this corpus's 31-word vocabulary
      makes word prefixes non-discriminative (near-all-pairs candidates,
      31 s); 8-char shingle dfs are Zipfian and the prefix prunes.

    Scale (measured, SCALE_PROOF_DOCS r8): exact prefix filtering read
    alpha=1.35 at a 50 k → 500 k doc step — this corpus's shingle DOMAIN
    is bounded (31-word vocabulary), so per-shingle dfs grow ∝ corpus
    and the Σ df_prefix² candidate volume grows ∝ corpus². That is the
    textbook PPJoin failure mode on low-entropy corpora; the production
    mitigation is stop-shingle df-capped prefixes —
    ``prefix_filter_capped_neardups`` below, the scale-path sibling.
    """
    return _prefix_filter(spark, sf_dir, df_cap=None)


def prefix_filter_capped_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin with STOP-SHINGLE df-capped prefixes — the scale path.

    Identical pipeline to ``prefix_filter_neardups`` except shingles with
    df > PREFIX_DF_CAP are excluded from the PREFIX equi-join (they stay
    in the sets, so surviving pairs get the exact Jaccard): candidate
    volume is then Σ_{df ≤ cap} df² ≤ cap · Σ df = cap · corpus-tokens —
    LINEAR in the corpus by construction, at the cost of missing pairs
    whose every prefix shingle is a stop-shingle (the standard
    stop-word/rare-feature tradeoff; precedent: the containment op's
    rare-shingle postings). Deterministic and oracle-replayed, so the
    recall tradeoff is visible: diff against the exact sibling.
    """
    return _prefix_filter(spark, sf_dir, df_cap=PREFIX_DF_CAP)


def _prefix_candidates(
    spark: SparkSession, sf_dir: str, df_cap: int | None
) -> tuple[DataFrame, DataFrame]:
    """(ranked, cands) — the shared candidate-generation half of the
    PPJoin pipeline, split out so diagnostics can count/time the
    candidate stage in isolation (scripts/diag_ppjoin_doc9.py)."""
    hashed = (
        _shingle_hash_arrays(spark, sf_dir)
        .select("doc_id", F.array_distinct("hs").alias("hs"))
        .filter(F.size("hs") > 0)
    )
    tok = hashed.select("doc_id", F.explode("hs").alias("token"))
    df_tab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        tok.join(F.broadcast(df_tab), "token")
        .groupBy("doc_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(df, token))), s -> s.token)").alias(
                "sorted_toks"
            )
        )
        .select(
            "doc_id",
            "sorted_toks",
            F.size("sorted_toks").alias("n"),
            # L = n − ⌈t·n⌉ + 1, with ⌈0.9·n⌉ = (9n + 9) div 10
            F.expr("size(sorted_toks) - ((9 * size(sorted_toks) + 9) div 10) + 1").alias("L"),
        )
        .localCheckpoint(eager=False)
    )
    prefixes = ranked.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("sorted_toks", 1, F.col("L"))).alias("pos0", "token"),
    ).select("doc_id", "n", "token", (F.col("n") - F.col("pos0")).alias("rem"))
    if df_cap is not None:
        # stop-shingle cap: drop non-discriminative prefix entries
        prefixes = prefixes.join(
            F.broadcast(df_tab.filter(F.col("df") <= df_cap).select("token")),
            "token",
        )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    # positional filter (PPJoin): overlap upper bound from the shared
    # prefix position must reach α = ⌈(t/(1+t))·(n_a+n_b)⌉ = ⌈9(n_a+n_b)/19⌉
    alpha = F.expr("(9 * (a.n + b.n) + 18) div 19")
    cands = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: |A| ≥ t·|B| ⇔ 10·n_a ≥ 9·n_b (and symmetric)
            & (F.col("a.n") * 10 >= F.col("b.n") * 9)
            & (F.col("b.n") * 10 >= F.col("a.n") * 9)
            & (F.least(F.col("a.rem"), F.col("b.rem")) >= alpha),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return ranked, cands


def _prefix_filter(
    spark: SparkSession, sf_dir: str, df_cap: int | None
) -> DataFrame:
    ranked, cands = _prefix_candidates(spark, sf_dir, df_cap)
    arrs = ranked.select("doc_id", "sorted_toks", "n")
    common = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = F.round(
        F.col("common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        6,
    )
    # verify joins are SHUFFLE hash joins on the doc keys, NOT broadcasts:
    # arrs carries the per-doc sorted shingle arrays for the WHOLE corpus,
    # and a broadcast collects it to the driver — measured failure at
    # 1.5M docs (serialized results 1 GiB > spark.driver.maxResultSize,
    # SCALE_PROOF doc10→doc30). Never broadcast per-doc ARRAY frames;
    # candidate-pairs ⋈ corpus on a doc key distributes perfectly.
    return (
        cands.join(
            arrs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sorted_toks").alias("arr_a"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sorted_toks").alias("arr_b"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn("common", common)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= PREFIX_JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(100)
    )


_HASHED_SETS_SQL = f"""
SELECT doc_id,
       list_distinct(list_transform(sh_arr, e -> {_HASH28_DUCK})) AS hs
FROM ({_SHINGLE_ARRAYS_SQL})
WHERE len(sh_arr) > 0
"""

def _prefix_filter_sql(df_cap: int | None) -> str:
    capped = (
        f"""prefixes AS (
  SELECT p.* FROM prefixes0 p JOIN df_tab d USING (token)
  WHERE d.df <= {df_cap}
),"""
        if df_cap is not None
        else "prefixes AS (SELECT * FROM prefixes0),"
    )
    return f"""
WITH hashed AS ({_HASHED_SETS_SQL}),
tok AS (SELECT doc_id, unnest(hs) AS token FROM hashed),
df_tab AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY 1),
ranked AS (
  SELECT t.doc_id,
         list(t.token ORDER BY d.df, t.token) AS sorted_toks,
         COUNT(*) AS n,
         COUNT(*) - ((9 * COUNT(*) + 9) // 10) + 1 AS L
  FROM tok t JOIN df_tab d USING (token)
  GROUP BY t.doc_id
),
prefixes0 AS (
  SELECT doc_id, n,
         unnest(sorted_toks[1:CAST(L AS INT)]) AS token,
         n - unnest(range(CAST(L AS INT))) AS rem
  FROM ranked
),
{capped}
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefixes a JOIN prefixes b
    ON a.token = b.token AND a.doc_id < b.doc_id
   AND a.n * 10 >= b.n * 9 AND b.n * 10 >= a.n * 9
   AND least(a.rem, b.rem) >= (9 * (a.n + b.n) + 18) // 19
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(ra.sorted_toks, rb.sorted_toks)) AS common,
         ra.n AS na, rb.n AS nb
  FROM cands c
  JOIN ranked ra ON ra.doc_id = c.doc_a
  JOIN ranked rb ON rb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM scored
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)
      >= {PREFIX_JACCARD_T}
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 100
"""


PREFIX_FILTER_SQL = _prefix_filter_sql(None)
PREFIX_FILTER_CAPPED_SQL = _prefix_filter_sql(PREFIX_DF_CAP)


def neardup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: verified near-dup PAIR counts per
    (source, source) combination — the corpus-observability view that
    tells you whether duplication is intra-source boilerplate or one
    source mirroring another (which changes the dedup KEEP policy).

    Reuses the memoized LSH candidates + exact-Jaccard verify (no limit
    — the matrix wants ALL verified pairs); source labels broadcast on,
    pair key ordered lexicographically so (a,b) and (b,a) land in one
    cell. One extra tiny aggregate on top of the existing pipeline.
    """
    arrs = _shingle_arrays(spark, sf_dir)
    cands = lsh_candidate_pairs(spark, sf_dir)
    common = F.size(F.array_intersect("arr_a", "arr_b"))
    verified = (
        cands.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b")),
            "doc_b",
        )
        .withColumn("common", common)
        .filter(
            F.round(
                F.col("common").cast("double")
                / (F.size("arr_a") + F.size("arr_b") - F.col("common")).cast("double"),
                6,
            )
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    labeled = (
        verified.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


NEARDUP_SOURCE_MATRIX_SQL = f"""
WITH arrs AS ({_SHINGLE_ARRAYS_SQL}),
cands AS ({LSH_PAIRS_SQL}),
verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cands c
  JOIN arrs aa ON aa.doc_id = c.doc_a
  JOIN arrs ab ON ab.doc_id = c.doc_b
  WHERE round(CAST(len(list_intersect(aa.sh_arr, ab.sh_arr)) AS DOUBLE)
              / CAST(len(aa.sh_arr) + len(ab.sh_arr)
                     - len(list_intersect(aa.sh_arr, ab.sh_arr)) AS DOUBLE), 6)
        >= {JACCARD_THRESHOLD}
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM verified v
JOIN documents da ON da.doc_id = v.doc_a
JOIN documents db ON db.doc_id = v.doc_b
GROUP BY 1, 2
"""


# --- corpus-internal duplicated n-gram span coverage (r5) --------------------
# Exact-substring duplication profiling (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): instead of whole-doc or
# near-dup decisions, measure WHAT FRACTION of each document's tokens
# sits inside a token window that occurs more than once anywhere in the
# corpus — the signal behind substring-level dedup of boilerplate,
# licenses, and templated spans that whole-doc dedup cannot see.
DUPG_N = 8  # window width; 8-grams are non-noise on the ~30-word vocab


def dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_dup_docs, n_half_dup_docs, dup_tokens,
    total_tokens, dup_token_frac): per-source rollup of duplicated-span
    coverage. A position is duplicated iff some ``DUPG_N``-gram covering
    it occurs ≥ 2 times corpus-wide (within-doc repeats count — repeated
    boilerplate inside one doc is equally dedupable); overlapping marks
    merge via the same one-lag gaps-and-islands as contamination spans.

    Scale: this is the suffix-array alternative that actually
    distributes — (1) gram counts are ONE partial-aggregable shuffle,
    (2) the hit join is keyed on the gram (linear in corpus positions,
    never all-pairs; at 100 TB the join key becomes a 64-bit gram hash
    so shuffled bytes stay bounded — exact strings here keep the oracle
    collision-free), (3) island merging is a doc-partitioned window,
    bounded by doc length. The gram arrays are lazily checkpointed
    ahead of the explode (Generate-collapse trap, CLAUDE.md).

    Reference scope: extension beyond etl-mini-dw (no text ops there);
    the published operator re-expressed Spark-first.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("toks")
    )
    base = docs.select(
        "doc_id", "source", F.size("toks").cast("bigint").alias("n_tokens"), "toks"
    )
    grams_arr = (
        base.filter(F.size("toks") >= DUPG_N)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, size(toks) - {DUPG_N}),"
                f" p -> struct(CAST(p AS BIGINT) AS p,"
                f" concat_ws(' ', slice(toks, p + 1, {DUPG_N})) AS gram))"
            ).alias("grams"),
        )
        .localCheckpoint(eager=False)
    )
    g = grams_arr.select("doc_id", F.explode("grams").alias("s")).select(
        "doc_id", F.col("s.p").alias("p"), F.col("s.gram").alias("gram")
    )
    dup_grams = (
        g.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") >= 2).select("gram")
    )
    hits = g.join(dup_grams, "gram").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    brk = F.when(F.col("p") - F.lag("p").over(w) > DUPG_N, F.lit(1)).otherwise(F.lit(0))
    isl = hits.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_doc = (
        isl.groupBy("doc_id", "island")
        .agg((F.max("p") - F.min("p") + F.lit(DUPG_N)).alias("covered"))
        .groupBy("doc_id")
        .agg(F.sum("covered").cast("bigint").alias("dup_tokens"))
    )
    joined = base.select("doc_id", "source", "n_tokens").join(
        per_doc, "doc_id", "left"
    ).select(
        "source",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("dup_tokens") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.sum(
            F.when(F.col("dup_tokens") * 2 >= F.col("n_tokens"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_half_dup_docs"),
        F.sum("dup_tokens").cast("bigint").alias("dup_tokens"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("dup_tokens").cast("double") / F.sum("n_tokens"), 6
        ).alias("dup_token_frac"),
    )


DUP_NGRAM_COVERAGE_SQL = f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
base AS (
  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM d
),
g0 AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(toks) - {DUPG_N} + 1),
           i -> struct_pack(p := CAST(i AS BIGINT),
                            gram := array_to_string(
                              toks[CAST(i AS INT) + 1 : CAST(i AS INT) + {DUPG_N}],
                              ' ')))) AS s
  FROM base WHERE len(toks) >= {DUPG_N}
),
g AS (SELECT doc_id, s.p AS p, s.gram AS gram FROM g0),
dupg AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, p FROM g WHERE gram IN (SELECT gram FROM dupg)),
isl AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > {DUPG_N}
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl2 AS (
  SELECT doc_id, p,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING)
           AS island
  FROM isl
),
per_doc AS (
  SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS dup_tokens FROM (
    SELECT doc_id, island, MAX(p) - MIN(p) + {DUPG_N} AS covered
    FROM isl2 GROUP BY doc_id, island)
  GROUP BY doc_id
),
joined AS (
  SELECT b.source, b.n_tokens, COALESCE(pd.dup_tokens, 0) AS dup_tokens
  FROM base b LEFT JOIN per_doc pd USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN dup_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(SUM(CASE WHEN dup_tokens * 2 >= n_tokens THEN 1 ELSE 0 END) AS BIGINT)
         AS n_half_dup_docs,
       CAST(SUM(dup_tokens) AS BIGINT) AS dup_tokens,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(SUM(dup_tokens) AS DOUBLE) / CAST(SUM(n_tokens) AS BIGINT), 6)
         AS dup_token_frac
FROM joined GROUP BY source
"""


# --- MinHash estimator quality (r5) -----------------------------------------
def minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_match_components, est_jaccard, exact_jaccard,
    abs_error): estimated-vs-exact Jaccard for every LSH candidate pair,
    top-50 by exact similarity — the sketch-error readout that tells you
    whether K = 8 min-hashes is enough before trusting estimate-only
    dedup at a scale where exact verification is unaffordable. Same
    measured-error discipline as the ANN recall scoreboard and the CMS
    overestimate columns.

    All inputs are the memoized staged frames (signatures, candidate
    pairs, shingle arrays) — this report adds per-doc-keyed shuffle
    joins and one component-compare, nothing beyond candidate scale."""
    cands = lsh_candidate_pairs(spark, sf_dir)
    mh = _minhash_arrays(spark, sf_dir)
    arrs = _shingle_arrays(spark, sf_dir)
    # shuffle joins, not broadcasts: mh/arrs carry per-doc ARRAYS for the
    # whole corpus, and a broadcast collects them to the driver (the
    # measured maxResultSize failure class, see _prefix_filter verify)
    paired = (
        cands.join(
            mh.select(F.col("doc_id").alias("doc_a"), F.col("mh_arr").alias("ma")),
            "doc_a",
        )
        .join(
            mh.select(F.col("doc_id").alias("doc_b"), F.col("mh_arr").alias("mb")),
            "doc_b",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b")),
            "doc_b",
        )
    )
    n_match = F.size(
        F.expr("filter(zip_with(ma, mb, (x, y) -> x = y), m -> m)")
    )
    common = F.size(F.array_intersect("arr_a", "arr_b"))
    exact = F.round(
        F.col("common").cast("double")
        / (F.size("arr_a") + F.size("arr_b") - F.col("common")).cast("double"),
        6,
    )
    return (
        paired.withColumn("n_match_components", n_match.cast("bigint"))
        .withColumn("common", common)
        .withColumn(
            "est_jaccard",
            F.round(F.col("n_match_components").cast("double") / N_HASHES, 6),
        )
        .withColumn("exact_jaccard", exact)
        .withColumn(
            "abs_error", F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6)
        )
        .select(
            "doc_a",
            "doc_b",
            "n_match_components",
            "est_jaccard",
            "exact_jaccard",
            "abs_error",
        )
        .orderBy(F.col("exact_jaccard").desc(), "doc_a", "doc_b")
        .limit(50)
    )


MINHASH_QUALITY_SQL = f"""
WITH cands AS ({LSH_PAIRS_SQL}),
sig AS ({MINHASH_SQL}),
arrs AS ({_SHINGLE_ARRAYS_SQL}),
matches AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_match_components
  FROM cands c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
  WHERE sa.minhash = sb.minhash
  GROUP BY 1, 2
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         COALESCE(m.n_match_components, 0) AS n_match_components,
         len(list_intersect(aa.sh_arr, ab.sh_arr)) AS common,
         len(aa.sh_arr) AS na, len(ab.sh_arr) AS nb
  FROM cands c
  LEFT JOIN matches m ON m.doc_a = c.doc_a AND m.doc_b = c.doc_b
  JOIN arrs aa ON aa.doc_id = c.doc_a
  JOIN arrs ab ON ab.doc_id = c.doc_b
)
SELECT doc_a, doc_b, n_match_components,
       round(CAST(n_match_components AS DOUBLE) / {N_HASHES}, 6) AS est_jaccard,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)
         AS exact_jaccard,
       round(abs(round(CAST(n_match_components AS DOUBLE) / {N_HASHES}, 6)
                 - round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)),
             6) AS abs_error
FROM scored
ORDER BY exact_jaccard DESC, doc_a, doc_b
LIMIT 50
"""


# --- Winnowing fingerprints (MOSS) --------------------------------------------
#
# Eighth dedup candidate family: WINNOWED substring fingerprints
# (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm).
# Where `dup_ngram_coverage` asks "how much of this doc is duplicated
# anywhere", winnowing produces a SPARSE, position-robust fingerprint
# SET per document — from every window of WINNOW_W consecutive k-gram
# hashes, keep the minimum (rightmost on ties) — with the guarantee
# that any shared substring of length ≥ k + W − 1 contributes at least
# one shared fingerprint. Matching is then an inverted-index join over
# ~|positions|/W selected fingerprints instead of all positions.
#
# The rightmost-min tie rule is encoded arithmetically so both engines
# agree bit-for-bit: key = hash·2^20 + (2^20 − 1 − p) — minimizing key
# minimizes the hash and, among ties, maximizes the position (doc
# positions are « 2^20; the gram hash is the repo's standard 28-bit md5
# integer). Over-common fingerprints (document frequency > WINNOW_DFCAP)
# are dropped before pairing, MOSS's own boilerplate guard, which also
# bounds the inverted-index join at Σ df² with df ≤ cap.

WINNOW_K = 5  # gram width (tokens)
WINNOW_W = 4  # winnowing window (grams) -> guarantee length K + W - 1 = 8
WINNOW_DFCAP = 50  # drop fingerprints shared by more docs than this
WINNOW_POS_BITS = 20  # doc positions < 2^20 (fixture docs are ~1e2 tokens)


def winnowing_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, shared_fp, fp_a, fp_b, sim): top-25 document pairs
    by shared winnowed fingerprints (≥ 2), with fingerprint-set sizes
    and Jaccard-style similarity of the fingerprint sets.

    Scale: selection is per-doc window work over gram positions (map
    side after one doc-keyed shuffle); the pair join is inverted-index
    keyed on fingerprint hash with df ≤ WINNOW_DFCAP, so candidate
    volume is Σ df² ≤ cap·|fingerprints| — never all-pairs. The gram
    arrays are lazily checkpointed ahead of the explode
    (Generate-collapse trap, CLAUDE.md).
    """
    sel = _winnow_fingerprints(spark, sf_dir)
    sel = sel.localCheckpoint(eager=False)  # reused: df-cap, sizes, pairs
    keep = (
        sel.groupBy("fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .filter(F.col("df") <= WINNOW_DFCAP)
        .select("fp")
    )
    idx = sel.join(keep, "fp")
    sizes = idx.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp")
    )
    a = idx.select(F.col("doc_id").alias("doc_a"), "fp")
    b = idx.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
        .filter(F.col("shared_fp") >= 2)
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"),
                                     F.col("n_fp").alias("fp_a"))),
            "doc_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"),
                                     F.col("n_fp").alias("fp_b"))),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            "fp_a",
            "fp_b",
            F.round(
                F.col("shared_fp")
                / (F.col("fp_a") + F.col("fp_b") - F.col("shared_fp")).cast(
                    "double"
                ),
                6,
            ).alias("sim"),
        )
        .orderBy(F.col("shared_fp").desc(), "doc_a", "doc_b")
        .limit(25)
    )


def _winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp): the distinct winnowed fingerprint set per document
    (selection stage only — no df cap, no pairing)."""
    from pyspark.sql import Window

    pos_mod = 1 << WINNOW_POS_BITS
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    grams_arr = (
        docs.filter(F.size("toks") >= WINNOW_K + WINNOW_W - 1)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, size(toks) - {WINNOW_K}),"
                f" p -> struct(CAST(p AS BIGINT) AS p,"
                f" CAST(conv(substr(md5(concat_ws(' ',"
                f" slice(toks, p + 1, {WINNOW_K}))), 1, 7), 16, 10)"
                f" AS BIGINT) AS h))"
            ).alias("grams"),
        )
        .localCheckpoint(eager=False)
    )
    g = grams_arr.select("doc_id", F.explode("grams").alias("s")).select(
        "doc_id",
        F.col("s.p").alias("p"),
        (
            F.col("s.h") * pos_mod + (F.lit(pos_mod - 1) - F.col("s.p"))
        ).alias("key"),
    )
    wdoc = Window.partitionBy("doc_id")
    wlead = wdoc.orderBy("p").rowsBetween(0, WINNOW_W - 1)
    sel = (
        g.select(
            "doc_id",
            "p",
            F.min("key").over(wlead).alias("kmin"),
            F.max("p").over(wdoc).alias("pmax"),
        )
        .filter(F.col("p") + (WINNOW_W - 1) <= F.col("pmax"))
        .select(
            "doc_id",
            F.expr(f"kmin div {pos_mod}").alias("fp"),
        )
        .distinct()
    )
    return sel


WINNOWING_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g0 AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(toks) - {WINNOW_K} + 1),
           i -> struct_pack(p := CAST(i AS BIGINT),
                            h := ('0x' || substr(md5(array_to_string(
                              toks[CAST(i AS INT) + 1 :
                                   CAST(i AS INT) + {WINNOW_K}], ' ')),
                              1, 7))::BIGINT))) AS s
  FROM d WHERE len(toks) >= {WINNOW_K + WINNOW_W - 1}
),
g AS MATERIALIZED (
  SELECT doc_id, s.p AS p,
         s.h * {1 << WINNOW_POS_BITS}
           + ({(1 << WINNOW_POS_BITS) - 1} - s.p) AS key
  FROM g0
),
sel AS MATERIALIZED (
  SELECT DISTINCT doc_id, kmin // {1 << WINNOW_POS_BITS} AS fp
  FROM (
    SELECT doc_id, p,
           MIN(key) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW
                          AND {WINNOW_W - 1} FOLLOWING) AS kmin,
           MAX(p) OVER (PARTITION BY doc_id) AS pmax
    FROM g
  ) WHERE p + {WINNOW_W - 1} <= pmax
),
keep AS (
  SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) <= {WINNOW_DFCAP}
),
idx AS MATERIALIZED (
  SELECT s.doc_id, s.fp FROM sel s JOIN keep USING (fp)
),
sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM idx GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS shared_fp
  FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT p.doc_a, p.doc_b, p.shared_fp,
       sa.n_fp AS fp_a, sb.n_fp AS fp_b,
       round(CAST(p.shared_fp AS DOUBLE)
             / (sa.n_fp + sb.n_fp - p.shared_fp), 6) AS sim
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
ORDER BY p.shared_fp DESC, p.doc_a, p.doc_b
LIMIT 25
"""


# --- Dedup threshold sweep -----------------------------------------------------
#
# The operating-point chooser: before committing a corpus to ONE
# Jaccard cutoff, sweep the verified LSH candidates across the standard
# thresholds and read off how many pairs fire and what fraction of the
# corpus gets flagged at each. The knee of this curve (pairs exploding
# while flagged-docs saturates) is where boilerplate starts matching —
# the number teams actually argue about when tuning dedup.
#
# Cost: rides the SAME memoized shingle/minhash pipeline and candidate
# set as `ngram_jaccard_pairs` — the sweep itself is a tiny cross join
# of |candidates| × |thresholds| and two rollups. Comparing round-6
# jaccards against 2-dp literals is engine-identical (the doubles are
# identical on both sides).

SWEEP_THRESHOLDS = ["0.50", "0.70", "0.80", "0.90", "0.95"]


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(threshold, n_pairs, n_docs_flagged, frac_docs): near-dup pair
    and flagged-document counts at each candidate Jaccard cutoff."""
    arrs = _shingle_arrays(spark, sf_dir)
    cands = lsh_candidate_pairs(spark, sf_dir)
    common = F.size(F.array_intersect("arr_a", "arr_b"))
    scored = (
        cands.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b")),
            "doc_b",
        )
        .withColumn("common", common)
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common").cast("double")
                / (
                    F.size("arr_a") + F.size("arr_b") - F.col("common")
                ).cast("double"),
                6,
            ).alias("j"),
        )
        .localCheckpoint(eager=False)  # reused per threshold
    )
    ths = None
    for t in SWEEP_THRESHOLDS:
        tt = F.lit(float(t))
        hits = scored.filter(F.col("j") >= tt)
        pairs_n = hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        docs_n = (
            hits.select(F.explode(F.array("doc_a", "doc_b")).alias("d"))
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_flagged"))
        )
        row = pairs_n.crossJoin(F.broadcast(docs_n)).select(
            F.lit(t).alias("threshold"), "n_pairs", "n_docs_flagged"
        )
        ths = row if ths is None else ths.unionByName(row)
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus")
    )
    return (
        ths.crossJoin(F.broadcast(n_docs))
        .select(
            "threshold",
            "n_pairs",
            "n_docs_flagged",
            F.round(
                F.col("n_docs_flagged") / F.col("n_corpus").cast("double"), 6
            ).alias("frac_docs"),
        )
        .orderBy("threshold")
    )


def dedup_threshold_sweep_sql() -> str:
    arms = []
    for t in SWEEP_THRESHOLDS:
        arms.append(f"""
SELECT '{t}' AS threshold,
       CAST((SELECT COUNT(*) FROM scored WHERE j >= {t}) AS BIGINT) AS n_pairs,
       CAST((SELECT COUNT(DISTINCT d) FROM (
           SELECT doc_a AS d FROM scored WHERE j >= {t}
           UNION ALL
           SELECT doc_b FROM scored WHERE j >= {t})) AS BIGINT)
         AS n_docs_flagged""")
    return f"""
WITH arrs AS ({_SHINGLE_ARRAYS_SQL}),
cands AS ({LSH_PAIRS_SQL}),
scored AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b,
         round(CAST(len(list_intersect(aa.sh_arr, ab.sh_arr)) AS DOUBLE)
               / (len(aa.sh_arr) + len(ab.sh_arr)
                  - len(list_intersect(aa.sh_arr, ab.sh_arr))), 6) AS j
  FROM cands c
  JOIN arrs aa ON aa.doc_id = c.doc_a
  JOIN arrs ab ON ab.doc_id = c.doc_b
),
n_corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM documents),
sweep AS ({' UNION ALL '.join(arms)})
SELECT s.threshold, s.n_pairs, s.n_docs_flagged,
       round(CAST(s.n_docs_flagged AS DOUBLE) / n.n_corpus, 6) AS frac_docs
FROM sweep s, n_corpus n
ORDER BY s.threshold
"""

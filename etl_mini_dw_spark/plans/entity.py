"""Entity resolution over the product catalog (extension).

The master-data-management twin of the document dedup family: find
DIFFERENT keys that describe the SAME real-world entity, using
multi-attribute blocking + a weighted match score — the Fellegi–Sunter
shape every ER system (record linkage, catalog dedup, householding)
runs.

Pipeline: block on the coarse exact attributes (brand × type — candidate
pairs only form inside a block, Σ b² bound, same argument as the LSH
bands and the edit-distance blocks), then score each candidate pair on
the fuzzy attributes with INTEGER weights: name edit-distance (3-arg
thresholded Levenshtein), size proximity, price proximity (exact decimal
difference). Integer scores ⇒ bit-identical ranking on both engines and
any partitioning.

Scale (re-blocked in r8 after SCALE_PROOF measured alpha=1.53 on the
brand×type-only join): brand×type has FIXED cardinality (~150 cells),
so block sizes grow linearly with the catalog and pairs quadratically —
the one blocking scheme that cannot survive a 10× catalog. The score
algebra rescues it exactly: ``score ≥ MIN_SCORE`` requires name_close
AND (size_close OR price_close), so every qualifying pair sits within
SIZE_TOL on size OR within PRICE_TOL on price. Candidates are therefore
the UNION of two BAND self-joins — (brand, type, size band ± 1) and
(brand, type, price band ± 1), band widths = the tolerances — which is
value-identical to the coarse join (no qualifying pair can escape both
bands) while block granularity now scales with the attribute range.
The measured result (SCALE_PROOF.md): candidates track the true match
count instead of (catalog/150)².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

NAME_DIST_MAX = 4  # thresholded Levenshtein cutoff
SIZE_TOL = 2  # |size difference| considered "close"
PRICE_TOL = "50.00"  # |retail price difference| considered "close"
W_NAME, W_SIZE, W_PRICE = 4, 2, 1  # integer match weights
MIN_SCORE = 5  # emit pairs scoring at least this


def _band_candidates(p: DataFrame, bucket: F.Column) -> DataFrame:
    """(key_a, key_b) candidate pairs within the same (brand, type) AND
    within ±1 of the given band bucket — one side probes its own bucket
    plus both neighbors, so any pair whose attribute gap fits inside one
    band width is generated exactly once (the candidate doc's own bucket
    matches exactly one of the three probes)."""
    keyed = p.select("p_partkey", "p_brand", "p_type", bucket.alias("bb"))
    a = keyed.select(
        F.col("p_partkey").alias("key_a"),
        "p_brand",
        "p_type",
        F.explode(
            F.array(F.col("bb") - 1, F.col("bb"), F.col("bb") + 1)
        ).alias("bb"),
    )
    b = keyed.select(F.col("p_partkey").alias("key_b"), "p_brand", "p_type", "bb")
    return (
        a.join(b, ["p_brand", "p_type", "bb"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )


def part_entity_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate duplicate products: (key_a, key_b, per-attribute signals,
    integer match score ≥ MIN_SCORE).

    Candidate generation is the size-band ∪ price-band union (module
    docstring): exact, because MIN_SCORE is unreachable without
    size_close or price_close. The coarse-join spelling stays as the
    DuckDB oracle — the executable spec the banded plan must equal.
    """
    p = typed_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
    )
    # band widths = the tolerances: |Δ| ≤ TOL ⟹ bucket distance ≤ 1
    size_band = F.floor(F.col("p_size").cast("double") / F.lit(float(SIZE_TOL)))
    price_band = F.floor(
        F.col("p_retailprice").cast("double")
        / F.lit(float(PRICE_TOL))
    )
    cands = (
        _band_candidates(p, size_band)
        .unionByName(_band_candidates(p, price_band))
        .distinct()
    )
    a_attrs = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_size").alias("size_a"),
        F.col("p_retailprice").alias("price_a"),
    )
    b_attrs = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_size").alias("size_b"),
        F.col("p_retailprice").alias("price_b"),
    )
    pairs = cands.join(a_attrs, "key_a").join(b_attrs, "key_b")
    name_d = F.levenshtein(F.col("name_a"), F.col("name_b"), NAME_DIST_MAX)
    name_close = (name_d >= 0) & (name_d <= NAME_DIST_MAX)
    size_close = F.abs(F.col("size_a") - F.col("size_b")) <= SIZE_TOL
    price_close = (
        F.abs(F.col("price_a") - F.col("price_b"))
        <= F.lit(PRICE_TOL).cast("decimal(14,2)")
    )
    score = (
        F.when(name_close, W_NAME).otherwise(0)
        + F.when(size_close, W_SIZE).otherwise(0)
        + F.when(price_close, W_PRICE).otherwise(0)
    )
    return (
        pairs.select(
            "key_a",
            "key_b",
            name_close.alias("name_close"),
            size_close.alias("size_close"),
            price_close.alias("price_close"),
            score.cast("int").alias("score"),
        )
        .filter(F.col("score") >= MIN_SCORE)
    )


PART_ENTITY_SQL = f"""
WITH pairs AS (
  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         levenshtein(a.p_name, b.p_name) <= {NAME_DIST_MAX} AS name_close,
         abs(a.p_size - b.p_size) <= {SIZE_TOL} AS size_close,
         abs(CAST(a.p_retailprice AS DECIMAL(14,2))
             - CAST(b.p_retailprice AS DECIMAL(14,2)))
           <= CAST('{PRICE_TOL}' AS DECIMAL(14,2)) AS price_close
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_type = b.p_type
   AND a.p_partkey < b.p_partkey
)
SELECT key_a, key_b, name_close, size_close, price_close,
       CAST((CASE WHEN name_close THEN {W_NAME} ELSE 0 END)
          + (CASE WHEN size_close THEN {W_SIZE} ELSE 0 END)
          + (CASE WHEN price_close THEN {W_PRICE} ELSE 0 END) AS INTEGER) AS score
FROM pairs
WHERE (CASE WHEN name_close THEN {W_NAME} ELSE 0 END)
    + (CASE WHEN size_close THEN {W_SIZE} ELSE 0 END)
    + (CASE WHEN price_close THEN {W_PRICE} ELSE 0 END) >= {MIN_SCORE}
"""


def part_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden records: cluster the match pairs into entities and pick one
    survivor view per entity — the MDM deliverable downstream of the
    match scores.

    Entities = connected components over the match graph (the SAME
    min-label-propagation loop the document near-dup family uses —
    `dedup.components_from_pairs`); survivorship rules are explicit
    aggregates: canonical attributes from the lowest-key member (the
    oldest record wins — `min_by`), price range across members.
    Singletons are their own entity. Cost: components over |match pairs|
    (tiny relative to the catalog) + one catalog-sized groupBy.
    """
    from etl_mini_dw_spark.functions.dedup import components_from_pairs
    from etl_mini_dw_spark.sources.tables import stage_memo

    # r09: the match-pair frame is staged once per (session, sf-dir) —
    # the components loop reads the edge list many times and previously
    # re-ran the band-join + levenshtein scoring inside the loop's
    # checkpoint lineage. ext_part_entity_matches itself keeps building
    # fresh so its bench line measures the real operator.
    pairs = stage_memo(
        spark,
        sf_dir,
        "part_match_pairs",
        lambda: part_entity_matches(spark, sf_dir)
        .select(F.col("key_a").alias("doc_a"), F.col("key_b").alias("doc_b"))
        .localCheckpoint(eager=False),
    )
    comp = components_from_pairs(pairs)
    parts = typed_table(spark, sf_dir, "part")
    labeled = parts.join(
        comp, parts.p_partkey == comp.doc_id, "left"
    ).withColumn("entity_id", F.coalesce(F.col("component"), F.col("p_partkey")))
    return labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.expr("min_by(p_name, p_partkey)").alias("canonical_name"),
        F.expr("min_by(p_brand, p_partkey)").alias("canonical_brand"),
        F.min("p_retailprice").cast("double").alias("min_price"),
        F.max("p_retailprice").cast("double").alias("max_price"),
    )


def part_golden_records_sql() -> str:
    from etl_mini_dw_spark.functions.dedup import NEARDUP_COMPONENTS_SQL

    comp = NEARDUP_COMPONENTS_SQL.format(
        pairs=f"SELECT key_a AS doc_a, key_b AS doc_b FROM ({PART_ENTITY_SQL})"
    )
    return f"""
WITH comp AS ({comp}),
labeled AS (
  SELECT p.*, COALESCE(c.component, p.p_partkey) AS entity_id
  FROM part p LEFT JOIN comp c ON p.p_partkey = c.doc_id
)
SELECT entity_id,
       COUNT(*) AS n_members,
       arg_min(p_name, p_partkey) AS canonical_name,
       arg_min(p_brand, p_partkey) AS canonical_brand,
       CAST(MIN(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) AS max_price
FROM labeled
GROUP BY entity_id
"""

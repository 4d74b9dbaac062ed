"""Data-mixture diagnostics — the per-source / per-language readouts a
training-corpus owner uses to SET the sampling mix, not just audit it
(extension family; complements text.lexical_diversity_report, which
audits within-source health).

Three operators:

- ``source_js_divergence`` — Jensen–Shannon divergence of each source's
  unigram distribution against the corpus distribution: the standard
  "how far has this slice drifted from the mix" number (Lin 1991).
- ``temperature_sampling_weights`` — the multilingual temperature-scaled
  sampling weights w_l ∝ p_l^τ (Lample & Conneau 2019, XLM; Conneau et
  al. 2020, XLM-R) for the two commonly-quoted temperatures, plus the
  resulting up/down-sampling factor per language.
- ``loo_source_contribution`` — leave-one-source-out data valuation on
  the corpus duplication rate: for each source, the exact-dup rate the
  corpus would have WITHOUT it. The group-level analogue of influence
  functions that large-corpus curation actually runs (per-source, not
  per-example — per-example is intractable at 100 TB).

Determinism: every sufficient statistic is an exact integer off one
partial-aggregable shuffle; doubles appear only in final per-row
expressions written with the same tree on both engines, rounded to the
repo's 6-dp convention before compare. The JS sum accumulates ≤|vocab|
tiny double terms (each |t| ≤ ln2·p) — cross-engine drift is bounded by
vocab·ulp, far under the 6-dp round; the closed form below avoids any
outer join for words absent from a source.

Scale: each operator is ONE (source/lang, key) count shuffle plus
metadata-sized rollups (|vocab| rows, 5-25 group rows). No corpus-sized
window, no all-pairs, no per-doc-array broadcast (CLAUDE.md rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.text import WORD_RE, _word_frame

# the two temperatures the multilingual-pretraining literature actually
# quotes: τ=0.7 (XLM-R's mix) and τ=0.3 (aggressive low-resource boost)
MIX_TEMPERATURES = (0.7, 0.3)


def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, n_types, coverage, js) — Jensen–Shannon
    divergence (nats) between each source's unigram distribution p and
    the corpus distribution q.

    Words absent from the source contribute q·ln2 in closed form:
    with m=(p+q)/2, the q-side term at p=0 is q·ln(q/(q/2)) = q·ln2, so

        JS = ½·Σ_{w∈src} p·ln(p/m) + ½·[Σ_{w∈src} q·ln(q/m) + ln2·(1−Q)]

    where Q = Σ_{w∈src} q is the corpus mass the source covers — no
    outer join against the full vocabulary is ever needed.
    """
    wc = (
        _word_frame(spark, sf_dir)
        .select("source", F.explode("w").alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # word marginals + per-source frame
    )
    ww = wc.groupBy("word").agg(F.sum("c").cast("bigint").alias("cw"))
    ws = wc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("ns"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    tot = wc.agg(F.sum("c").cast("bigint").alias("n"))
    base = (
        wc.join(ww, "word")
        .join(F.broadcast(ws), "source")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("c").cast("double") / F.col("ns").cast("double")
    q = F.col("cw").cast("double") / F.col("n").cast("double")
    m = (p + q) / F.lit(2.0)
    per = base.groupBy("source").agg(
        F.sum(p * F.log(p / m)).alias("_sp"),
        F.sum(q * F.log(q / m)).alias("_sq"),
        F.sum(q).alias("_cov"),
    )
    js = (F.col("_sp") + F.col("_sq") + F.log(F.lit(2.0)) * (F.lit(1.0) - F.col("_cov"))) / F.lit(
        2.0
    )
    return (
        per.join(F.broadcast(ws), "source")
        .select(
            "source",
            F.col("ns").alias("n_tokens"),
            "n_types",
            F.round(F.col("_cov"), 6).alias("coverage"),
            F.round(js, 6).alias("js"),
        )
        .orderBy("source")
    )


SOURCE_JS_SQL = f"""
WITH wc AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT source, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
    FROM documents)
  GROUP BY 1, 2
),
ww AS (SELECT word, CAST(SUM(c) AS BIGINT) AS cw FROM wc GROUP BY 1),
ws AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns,
              CAST(COUNT(*) AS BIGINT) AS n_types FROM wc GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM wc),
per AS (
  SELECT source,
         SUM((CAST(c AS DOUBLE) / ns) * ln((CAST(c AS DOUBLE) / ns)
             / ((CAST(c AS DOUBLE) / ns + CAST(cw AS DOUBLE) / n) / 2.0))) AS _sp,
         SUM((CAST(cw AS DOUBLE) / n) * ln((CAST(cw AS DOUBLE) / n)
             / ((CAST(c AS DOUBLE) / ns + CAST(cw AS DOUBLE) / n) / 2.0))) AS _sq,
         SUM(CAST(cw AS DOUBLE) / n) AS _cov
  FROM wc JOIN ww USING (word) JOIN ws USING (source) CROSS JOIN tot
  GROUP BY source
)
SELECT source, ns AS n_tokens, n_types,
       round(_cov, 6) AS coverage,
       round((_sp + _sq + ln(2.0) * (1.0 - _cov)) / 2.0, 6) AS js
FROM per JOIN ws USING (source)
ORDER BY source
"""


def temperature_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, n_tokens, p, w_t07, w_t03, boost_t07) — token share
    p per language and the temperature-scaled sampling weights
    w_τ = p^τ / Σ_l p^τ; ``boost_t07`` = w_07/p is the up/down-sampling
    factor τ=0.7 applies to each language."""
    from etl_mini_dw_spark.sources.tables import load_table

    per = (
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), 0)).alias(
                "_nt"
            ),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
        )
    )
    tot = per.agg(F.sum("n_tokens").cast("bigint").alias("n"))
    base = per.crossJoin(F.broadcast(tot)).withColumn(
        "p", F.col("n_tokens").cast("double") / F.col("n").cast("double")
    )
    for t in MIX_TEMPERATURES:
        tag = f"t{str(t).replace('.', '')}"
        pw = F.pow(F.col("p"), F.lit(t))
        den = base.agg(F.sum(F.pow(F.col("p"), F.lit(t))).alias(f"_d_{tag}"))
        base = base.crossJoin(F.broadcast(den)).withColumn(
            f"w_{tag}", pw / F.col(f"_d_{tag}")
        )
    return base.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round("p", 6).alias("p"),
        F.round("w_t07", 6).alias("w_t07"),
        F.round("w_t03", 6).alias("w_t03"),
        F.round(F.col("w_t07") / F.col("p"), 6).alias("boost_t07"),
    ).orderBy("lang")


TEMPERATURE_WEIGHTS_SQL = f"""
WITH per AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_extract_all(lower(text), '{WORD_RE}'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n FROM per),
base AS (
  SELECT lang, n_docs, n_tokens, CAST(n_tokens AS DOUBLE) / n AS p
  FROM per CROSS JOIN tot
),
dens AS (
  SELECT SUM(pow(p, 0.7)) AS d07, SUM(pow(p, 0.3)) AS d03 FROM base
)
SELECT lang, n_docs, n_tokens,
       round(p, 6) AS p,
       round(pow(p, 0.7) / d07, 6) AS w_t07,
       round(pow(p, 0.3) / d03, 6) AS w_t03,
       round(pow(p, 0.7) / d07 / p, 6) AS boost_t07
FROM base CROSS JOIN dens
ORDER BY lang
"""


def loo_source_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, doc_share, excl_distinct, dup_rate_without,
    delta_dup_rate) — leave-one-source-out duplication-rate valuation.

    For the corpus: dup_rate = 1 − D/N (D = distinct texts by md5,
    N = docs). Removing source s removes its n_s docs and exactly the
    hashes EXCLUSIVE to it (excl_s = hashes whose corpus count equals
    their in-s count), so

        dup_rate_without(s) = 1 − (D − excl_s) / (N − n_s)

    in closed form off one (hash, source) count — no per-source rescan,
    no N×S join. delta = dup_rate_full − dup_rate_without: positive
    means the source ADDS duplication pressure to the mix.
    """
    from etl_mini_dw_spark.sources.tables import fanout_scan, load_table

    hs = (
        fanout_scan(spark, load_table(spark, sf_dir, "documents"))
        .select(F.md5(F.col("text")).alias("h"), "source")
        .groupBy("h", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # totals + exclusivity both read it
    )
    ht = hs.groupBy("h").agg(F.sum("c").cast("bigint").alias("ct"))
    glob = ht.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum("ct").cast("bigint").alias("n"),
    )
    per = (
        hs.join(ht, "h")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("c") == F.col("ct"), 1).otherwise(0))
            .cast("bigint")
            .alias("excl_distinct"),
        )
        .crossJoin(F.broadcast(glob))
    )
    nd = F.col("n_docs").cast("double")
    d = F.col("d").cast("double")
    n = F.col("n").cast("double")
    ex = F.col("excl_distinct").cast("double")
    full_rate = F.lit(1.0) - d / n
    wo_rate = F.lit(1.0) - (d - ex) / (n - nd)
    return per.select(
        "source",
        "n_docs",
        F.round(nd / n, 6).alias("doc_share"),
        "excl_distinct",
        F.round(wo_rate, 6).alias("dup_rate_without"),
        F.round(full_rate - wo_rate, 6).alias("delta_dup_rate"),
    ).orderBy("source")


LOO_SOURCE_SQL = """
WITH hs AS (
  SELECT md5(text) AS h, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
ht AS (SELECT h, CAST(SUM(c) AS BIGINT) AS ct FROM hs GROUP BY 1),
g_all AS (SELECT CAST(COUNT(*) AS BIGINT) AS d, CAST(SUM(ct) AS BIGINT) AS n FROM ht),
per AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN c = ct THEN 1 ELSE 0 END) AS BIGINT) AS excl_distinct
  FROM hs JOIN ht USING (h)
  GROUP BY source
)
SELECT source, n_docs,
       round(CAST(n_docs AS DOUBLE) / n, 6) AS doc_share,
       excl_distinct,
       round(1.0 - (CAST(d AS DOUBLE) - excl_distinct) / (CAST(n AS DOUBLE) - n_docs), 6)
         AS dup_rate_without,
       round((1.0 - CAST(d AS DOUBLE) / n)
             - (1.0 - (CAST(d AS DOUBLE) - excl_distinct) / (CAST(n AS DOUBLE) - n_docs)), 6)
         AS delta_dup_rate
FROM per CROSS JOIN g_all
ORDER BY source
"""

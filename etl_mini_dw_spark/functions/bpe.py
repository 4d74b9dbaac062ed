"""Distributed BPE vocabulary training (byte-pair-encoding merges).

The tokenizer-training stage of an LLM data pipeline (Sennrich et al.
2016): start from the corpus WORD HISTOGRAM, then repeatedly (1) count
adjacent-symbol pairs weighted by word frequency, (2) take the argmax
pair, (3) merge it everywhere. Production trainers (subword-nmt,
HuggingFace tokenizers) do exactly this — the corpus-scale part is ONLY
the word histogram; the merge loop runs over the vocabulary table.

That split is the 100 TB story: one shuffle aggregates TBs of text down
to a |vocab|-row histogram (partial-aggregable count), and every merge
round after it touches |vocab| rows — two tiny aggregates per round,
unrolled lazily like the k-means / PageRank loops (localCheckpoint per
round cuts lineage). Nothing data-sized moves after the first stage.

Portability trick — the merge step WITHOUT a UDF: symbols are joined
with DOUBLE spaces and the string gets double-space sentinels at both
ends ('  s  p  a  r  k  '). A merge of (a, b) is then one plain
``replace(sym, ' a  b ', ' ab ')``: the pattern consumes one space of
each double separator, leaving the other intact, so ADJACENT merge
sites keep their boundary and a single left-to-right non-overlapping
replace() — identical semantics in Spark and DuckDB — performs exactly
the greedy BPE merge ('a a a' + (a,a) → [aa, a]). With single-space
separators the shared delimiter is consumed and 'a b a b' merges only
once; RE2 (DuckDB) has no lookbehind, so the double-space encoding is
the portable fix.

Ties at max pair frequency break to the lexicographically LARGEST
(a, b) — ``max(struct(freq, a, b))`` in Spark, ``ORDER BY pf DESC,
a DESC, b DESC LIMIT 1`` in DuckDB — deterministic on any layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.text import WORD_RE, _word_frame

R_MERGES = 6

_SYMS = "filter(split(sym, '  '), x -> x <> '')"


def _word_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq): the only corpus-scale stage — one count shuffle."""
    return (
        _word_frame(spark, sf_dir)
        .select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, pf): adjacent-symbol pair frequencies over the vocab table.

    Note: the explode pipelines a transform() over ``syms`` (itself a
    filter(split(...))) — the Generate-collapse pattern CLAUDE.md
    forbids on corpus-scale frames because the child projection is
    re-evaluated per OUTPUT row. It is deliberately tolerated HERE ONLY
    because the input is the |vocab|-row histogram (thousands of rows,
    O(word-length) expressions), never the corpus; do not copy this
    shape into a corpus-scale path — checkpoint the array first.
    """
    return (
        vocab.select("freq", F.expr(_SYMS).alias("syms"))
        .filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pf"))
    )


def train_merges_from_hist(hist: DataFrame, rounds: int = R_MERGES) -> DataFrame:
    """Merge table from ANY (word, freq) frame — the training loop proper
    (separated so property tests can drive it with synthetic histograms).

    Exhaustion-safe: when ``rounds`` exceeds the merges available (every
    word already a single symbol → the pair frame is empty), Spark's
    ``agg(max(struct))`` yields one all-NULL row where DuckDB's
    ``ORDER BY … LIMIT 1`` yields zero rows. The NULL merge row is
    filtered out of the output and the vocab update is CASE-guarded so a
    NULL pattern can't null the whole vocab — both engines then emit
    exactly the rounds that exist. (The registered R_MERGES=6 queries
    never exhaust on real corpora; this guard is for arbitrary
    histograms driven through this public entry point.)"""
    vocab = hist.select(
        F.concat(F.lit("  "), F.regexp_replace("word", "(.)", "$1  ")).alias("sym"),
        "freq",
    ).localCheckpoint(eager=False)
    merges = []
    for r in range(1, rounds + 1):
        best = (
            _pair_counts(vocab)
            .agg(F.max(F.struct("pf", "a", "b")).alias("m"))
            .select(F.col("m.pf").alias("pf"), F.col("m.a").alias("a"), F.col("m.b").alias("b"))
        ).localCheckpoint(eager=False)
        merges.append(
            best.select(
                F.lit(r).cast("int").alias("merge_round"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.col("pf").alias("pair_freq"),
                F.concat("a", "b").alias("merged"),
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                F.expr(
                    "CASE WHEN a IS NULL THEN sym ELSE"
                    " replace(sym, concat(' ', a, '  ', b, ' '),"
                    " concat(' ', a, b, ' ')) END"
                ).alias("sym"),
                "freq",
            )
            .localCheckpoint(eager=False)
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out.filter(F.col("sym_a").isNotNull())


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(merge_round, sym_a, sym_b, pair_freq, merged): the learned merge
    table after R_MERGES rounds — the artifact a tokenizer ships."""
    return train_merges_from_hist(_word_hist(spark, sf_dir))


_SQL_WORD_HIST = f"""
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
    FROM documents)
  GROUP BY word
"""


def _sql_pairs(vocab_from: str) -> str:
    return f"""
  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pf FROM (
    SELECT s.a AS a, s.b AS b, freq FROM (
      SELECT freq, unnest(list_transform(range(0, len(syms) - 1),
               i -> struct_pack(a := syms[CAST(i AS INT) + 1],
                                b := syms[CAST(i AS INT) + 2]))) AS s
      FROM (SELECT list_filter(string_split(sym, '  '), x -> x <> '') AS syms,
                   freq FROM {vocab_from})
      WHERE len(syms) >= 2))
  GROUP BY a, b
"""


def bpe_train_merges_sql() -> str:
    """Unrolled R_MERGES-round oracle with identical merge semantics."""
    sql = f"""
WITH wh AS ({_SQL_WORD_HIST}),
s0 AS (SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS sym, freq FROM wh),
"""
    prev = "s0"
    for r in range(1, R_MERGES + 1):
        sql += f"""p{r} AS ({_sql_pairs(prev)}),
b{r} AS (SELECT a, b, pf FROM p{r} ORDER BY pf DESC, a DESC, b DESC LIMIT 1),
s{r} AS (
  SELECT replace(sym, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS sym,
         freq
  FROM {prev}, b{r}
),
"""
        prev = f"s{r}"
    sql = sql.rstrip().rstrip(",")
    sql += "\n" + "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_round, a AS sym_a, b AS sym_b,"
        f" pf AS pair_freq, a || b AS merged FROM b{r}"
        for r in range(1, R_MERGES + 1)
    )
    return sql


def bpe_apply_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(merge_round, corpus_subword_tokens, compression_ratio): corpus
    token count after applying the first r learned merges, r = 0..R.

    The APPLY side of tokenizer training at scale: segmentation is
    dictionary-encoded — merges are applied to the |vocab|-row histogram
    and corpus totals are Σ freq × |symbols(word)|, so the corpus itself
    is never re-touched (the same reason production tokenizers segment
    against a word cache). compression_ratio is subword tokens per
    whitespace word, rounded to 6 dp on both engines.
    """
    hist = _word_hist(spark, sf_dir)
    n_words = hist.agg(F.sum("freq").alias("nw"))
    vocab = hist.select(
        F.concat(F.lit("  "), F.regexp_replace("word", "(.)", "$1  ")).alias("sym"),
        "freq",
    ).localCheckpoint(eager=False)

    def report(v: DataFrame, r: int) -> DataFrame:
        toks = v.agg(
            F.sum(F.expr(f"freq * size({_SYMS})")).alias("corpus_subword_tokens")
        )
        return toks.crossJoin(F.broadcast(n_words)).select(
            F.lit(r).cast("int").alias("merge_round"),
            "corpus_subword_tokens",
            F.round(
                F.col("corpus_subword_tokens").cast("double") / F.col("nw"), 6
            ).alias("compression_ratio"),
        )

    out = report(vocab, 0)
    for r in range(1, R_MERGES + 1):
        best = (
            _pair_counts(vocab)
            .agg(F.max(F.struct("pf", "a", "b")).alias("m"))
            .select(F.col("m.a").alias("a"), F.col("m.b").alias("b"))
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                F.expr(
                    "replace(sym, concat(' ', a, '  ', b, ' '),"
                    " concat(' ', a, b, ' '))"
                ).alias("sym"),
                "freq",
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(report(vocab, r))
    return out


def bpe_apply_report_sql() -> str:
    sql = f"""
WITH wh AS ({_SQL_WORD_HIST}),
nw AS (SELECT CAST(SUM(freq) AS BIGINT) AS nw FROM wh),
s0 AS (SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS sym, freq FROM wh),
"""
    prev = "s0"
    for r in range(1, R_MERGES + 1):
        sql += f"""p{r} AS ({_sql_pairs(prev)}),
b{r} AS (SELECT a, b FROM p{r} ORDER BY pf DESC, a DESC, b DESC LIMIT 1),
s{r} AS (
  SELECT replace(sym, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS sym,
         freq
  FROM {prev}, b{r}
),
"""
        prev = f"s{r}"
    sql = sql.rstrip().rstrip(",")
    counts = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_round,"
        f" CAST(SUM(freq * len(list_filter(string_split(sym, '  '),"
        f" x -> x <> ''))) AS BIGINT) AS corpus_subword_tokens FROM s{r}"
        for r in range(0, R_MERGES + 1)
    )
    sql += f"""
SELECT merge_round, corpus_subword_tokens,
       round(CAST(corpus_subword_tokens AS DOUBLE) / nw.nw, 6) AS compression_ratio
FROM ({counts}) c, nw
"""
    return sql


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_words, subword_tokens, fertility): tokens-per-word per
    language label after applying the full R_MERGES merge table — the
    multilingual-tokenizer equity report (languages under-represented in
    training text get higher fertility, i.e. more subword tokens per
    word, which inflates their compute cost downstream).

    The merge table is trained on the GLOBAL histogram (same artifact as
    ``bpe_train_merges``); application runs on a (lang, word) histogram,
    so the corpus is still touched exactly once and every merge round is
    vocabulary-sized. The per-round argmax is a 1-row broadcast applied
    to both frames' lineage identically."""
    from etl_mini_dw_spark.functions.text import _word_frame

    base = _word_frame(spark, sf_dir)
    # (lang, word, freq) histogram — lang rides the same explode
    hist_lang = (
        base.join(_lang_frame(spark, sf_dir), "doc_id")
        .select("lang", F.explode("w").alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    hist_global = hist_lang.groupBy("word").agg(F.sum("freq").alias("freq"))
    sym = F.concat(F.lit("  "), F.regexp_replace("word", "(.)", "$1  ")).alias("sym")
    vocab_g = hist_global.select(sym, "freq").localCheckpoint(eager=False)
    vocab_l = hist_lang.select("lang", sym, "freq").localCheckpoint(eager=False)
    for _ in range(R_MERGES):
        best = (
            _pair_counts(vocab_g)
            .agg(F.max(F.struct("pf", "a", "b")).alias("m"))
            .select(F.col("m.a").alias("a"), F.col("m.b").alias("b"))
        ).localCheckpoint(eager=False)
        merge_expr = (
            "replace(sym, concat(' ', a, '  ', b, ' '), concat(' ', a, b, ' '))"
        )
        vocab_g = (
            vocab_g.crossJoin(F.broadcast(best))
            .select(F.expr(merge_expr).alias("sym"), "freq")
            .localCheckpoint(eager=False)
        )
        vocab_l = (
            vocab_l.crossJoin(F.broadcast(best))
            .select("lang", F.expr(merge_expr).alias("sym"), "freq")
            .localCheckpoint(eager=False)
        )
    return vocab_l.groupBy("lang").agg(
        F.sum("freq").cast("bigint").alias("n_words"),
        F.sum(F.expr(f"freq * size({_SYMS})")).cast("bigint").alias("subword_tokens"),
    ).select(
        "lang",
        "n_words",
        "subword_tokens",
        F.round(
            F.col("subword_tokens").cast("double") / F.col("n_words"), 6
        ).alias("fertility"),
    )


def _lang_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mini_dw_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "lang")


def bpe_fertility_by_lang_sql() -> str:
    """Unrolled oracle: global chain picks each round's argmax pair, a
    parallel lang-keyed chain applies the same merges."""
    sql = f"""
WITH wl AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT lang, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
    FROM documents)
  GROUP BY lang, word
),
wh AS (SELECT word, CAST(SUM(freq) AS BIGINT) AS freq FROM wl GROUP BY word),
s0 AS (SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS sym, freq FROM wh),
t0 AS (SELECT lang, '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS sym, freq FROM wl),
"""
    prev_g, prev_l = "s0", "t0"
    for r in range(1, R_MERGES + 1):
        sql += f"""p{r} AS ({_sql_pairs(prev_g)}),
b{r} AS (SELECT a, b FROM p{r} ORDER BY pf DESC, a DESC, b DESC LIMIT 1),
s{r} AS (
  SELECT replace(sym, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS sym,
         freq
  FROM {prev_g}, b{r}
),
t{r} AS (
  SELECT lang,
         replace(sym, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS sym,
         freq
  FROM {prev_l}, b{r}
),
"""
        prev_g, prev_l = f"s{r}", f"t{r}"
    sql = sql.rstrip().rstrip(",")
    sql += f"""
SELECT lang,
       CAST(SUM(freq) AS BIGINT) AS n_words,
       CAST(SUM(freq * len(list_filter(string_split(sym, '  '),
            x -> x <> ''))) AS BIGINT) AS subword_tokens,
       round(CAST(SUM(freq * len(list_filter(string_split(sym, '  '),
             x -> x <> ''))) AS BIGINT)
             / CAST(CAST(SUM(freq) AS BIGINT) AS DOUBLE), 6) AS fertility
FROM {prev_l}
GROUP BY lang
"""
    return sql

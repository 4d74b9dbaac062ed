"""Semantic properties of the round-8 additions (value parity with the
DuckDB oracles is covered for all three by tests/test_oracle_parity.py):

- ``ext_embedding_label_drift`` — per-label centroid cosine matrix,
- ``ext_mmr_diverse_topk``      — greedy integer-exact MMR selection,
- ``ext_bootstrap_ci_revenue``  — deterministic Poisson bootstrap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.functions import simsearch
from etl_mini_dw_spark.plans import stats
from etl_mini_dw_spark.sources.tables import typed_table


def test_label_drift_matrix_shape_and_diagonal(spark, sf_dir):
    rows = simsearch.embedding_label_drift(spark, sf_dir).collect()
    labels = sorted({r.label_a for r in rows} | {r.label_b for r in rows})
    n = len(labels)
    # upper-triangular incl. diagonal over every label pair
    assert len(rows) == n * (n + 1) // 2
    for r in rows:
        assert r.label_a <= r.label_b
        assert -1.0 <= r.centroid_cos <= 1.0
        if r.label_a == r.label_b:
            assert r.centroid_cos == 1.0
            assert r.n_a == r.n_b


def test_mmr_picks_are_distinct_relevant_and_diversified(spark, sf_dir):
    sel = simsearch.mmr_diverse_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in sel:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(simsearch.N_QUERIES))
    diversified = 0
    # pure relevance top-k over the same int8 algebra, for comparison
    emb = typed_table(spark, sf_dir, "embeddings")
    coded = emb.select(
        "vec_id", F.expr(simsearch._CODE.format(a="embedding")).alias("codes")
    )
    q = coded.filter(F.col("vec_id") < simsearch.N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("codes").alias("qc")
    )
    c = coded.select(F.col("vec_id").alias("cid"), F.col("codes").alias("cc"))
    rel = (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.expr(simsearch._QDOT.format(a="qc", b="cc")).cast("bigint").alias("rel"),
        )
        .collect()
    )
    rel_by_q: dict[int, dict[int, int]] = {}
    for r in rel:
        rel_by_q.setdefault(r.qid, {})[r.cid] = r.rel
    for qid, picks in by_q.items():
        picks.sort(key=lambda r: r.pick_round)
        ids = [p.cand_id for p in picks]
        assert len(ids) == simsearch.MMR_K
        assert len(set(ids)) == simsearch.MMR_K  # no repeats
        # round 1 is the pure relevance argmax (ties by cand_id)
        best = min(
            rel_by_q[qid].items(), key=lambda kv: (-kv[1], kv[0])
        )
        assert picks[0].cand_id == best[0]
        assert picks[0].score == simsearch._MMR_L * picks[0].rel
        # reported rel matches the recomputed dot for every pick
        for p in picks:
            assert p.rel == rel_by_q[qid][p.cand_id]
        top_k_rel = {
            cid
            for cid, _ in sorted(
                rel_by_q[qid].items(), key=lambda kv: (-kv[1], kv[0])
            )[: simsearch.MMR_K]
        }
        if set(ids) != top_k_rel:
            diversified += 1
    # the penalty term must actually change at least one selection set
    assert diversified >= 1


def test_bootstrap_point_estimate_and_replicate_spread(spark, sf_dir):
    rows = stats.bootstrap_ci_revenue(spark, sf_dir).collect()
    assert len(rows) == stats.BOOT_REPS + 1
    by_rep = {r.rep: r.boot_total for r in rows}
    exact = (
        typed_table(spark, sf_dir, "orders")
        .agg(F.sum("o_totalprice").cast("double").alias("t"))
        .collect()[0]
        .t
    )
    assert by_rep[-1] == exact
    # Poisson(1) replicate totals concentrate around the point estimate
    reps = [v for k, v in by_rep.items() if k >= 0]
    assert all(abs(v - exact) / exact < 0.10 for v in reps)
    mean = sum(reps) / len(reps)
    assert abs(mean - exact) / exact < 0.02
    # deterministic: a recompute returns identical totals
    again = {
        r.rep: r.boot_total
        for r in stats.bootstrap_ci_revenue(spark, sf_dir).collect()
    }
    assert again == by_rep


def test_forecast_reconciliation_is_coherent_to_the_cent(spark, sf_dir):
    from etl_mini_dw_spark.functions import timeseries

    rows = timeseries.forecast_reconciliation(spark, sf_dir).collect()
    regions = {r.region for r in rows}
    for reg in regions:
        nat = [r for r in rows if r.region == reg and r.nation != "ALL"]
        all_row = next(r for r in rows if r.region == reg and r.nation == "ALL")
        # history rolls up exactly
        assert sum(r.hist_cents for r in nat) == all_row.hist_cents
        # the reconciled set is coherent TO THE CENT (Hamilton exactness)
        assert (
            sum(r.fc_reconciled_cents for r in nat)
            == all_row.fc_reconciled_cents
        )
        # ALL row's adj is the measured incoherence the base set had
        assert all_row.adj_cents == all_row.fc_base_cents - sum(
            r.fc_base_cents for r in nat
        )
    # independent per-level drift forecasts genuinely disagree somewhere
    assert any(
        r.adj_cents != 0 for r in rows if r.nation == "ALL"
    ), "fixture produced perfectly coherent forecasts — test is vacuous"


def test_bootstrap_weights_follow_poisson_pmf(spark, sf_dir):
    """The integer CDF thresholds must actually encode Poisson(1) — a
    wrong constant would still hash-match the oracle (both engines
    would share the bug), so pin the weight DISTRIBUTION itself: over
    n_orders x 32 md5-uniform draws, each weight's frequency must sit
    near e^-1/k! (binomial 5-sigma slack)."""
    import math

    o = typed_table(spark, sf_dir, "orders").select("o_orderkey")
    reps = o.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(0), F.lit(stats.BOOT_REPS - 1))).alias("rep"),
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("o_orderkey").cast("string"),
                    F.col("rep").cast("string"),
                )
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("bigint")
    w = F.lit(8)
    for k in range(len(stats._BOOT_CDF28) - 1, -1, -1):
        w = F.when(u < stats._BOOT_CDF28[k], F.lit(k)).otherwise(w)
    counts = {
        r.w: r.n
        for r in reps.select(w.alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(counts.values())
    for k in range(4):  # tail classes too rare for a tight bound
        p = math.exp(-1.0) / math.factorial(k)
        sigma = math.sqrt(n * p * (1 - p))
        assert abs(counts.get(k, 0) - n * p) < 5 * sigma, (k, counts)

"""Cross-operator consistency: independent implementations of the same
semantics must agree — the engine checks itself.

These catch a class of bug the per-query oracle can't: both an operator
AND its oracle drifting together (e.g. a shared misreading of gap
semantics) still differ from the INDEPENDENT formulation of the same
question elsewhere in the engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.streaming import events as ev


def test_lag_sessionization_agrees_with_native_session_window(spark, sf_dir):
    """The lag/running-sum sessionization and Spark's native
    ``session_window`` implement the same gap rule — their (user,
    session_start, n_events) multisets must be identical."""
    lag_based = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in ev.sessionization(spark, sf_dir)
        .select("user_id", "session_start", "n_events")
        .collect()
    )
    native = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in ev.session_window_native(spark, sf_dir)
        .select("user_id", "session_start", "n_events")
        .collect()
    )
    assert lag_based == native


def test_rollup_tree_month_agrees_with_flagship_grain(spark, sf_dir):
    """rollup_tree's month revenue must equal the direct month aggregate
    computed from scratch (no staged day grain) — the lossless-
    re-aggregation claim, checked against an independent plan."""
    from etl_mini_dw_spark.plans.rollup_tree import rollup_tree
    from etl_mini_dw_spark.sources.tables import typed_table

    tree = {
        r["period"]: r["revenue"]
        for r in rollup_tree(spark, sf_dir).filter(F.col("grain") == "month").collect()
    }
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    direct = {
        r["m"]: r["rev"]
        for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .agg(
            F.sum(F.expr("l_extendedprice * (1 - l_discount)"))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("rev")
        )
        .collect()
    }
    assert tree == direct


def test_hll_rollup_agrees_with_exact_within_rsd(spark, sf_dir):
    """The sketch rollup's per-type estimates stay within the configured
    rsd band of the EXACT distinct counts (tighter than the generic 5%
    sanity bound in test_approx_sketches — lgk=14 gives ~0.8% rsd; allow
    3σ)."""
    from etl_mini_dw_spark.plans.sketches import hll_user_rollup
    from etl_mini_dw_spark.sources.tables import typed_table

    est = {
        r["event_type"]: r["approx_users"]
        for r in hll_user_rollup(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["u"]
        for r in typed_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for et, e in exact.items():
        assert abs(est[et] - e) <= max(3, 3 * 0.008 * e), (et, est[et], e)


def test_asof_snapshot_at_horizon_is_current_rows(spark, sf_dir):
    """A point-in-time snapshot taken just under the open-row sentinel
    must equal the is_current slice of the full history — same keys,
    same SKs. Catches a half-open-interval drift that the value oracle
    (pinned at MID) can't see at the horizon."""
    from etl_mini_dw_spark import fixtures_spec as spec
    from etl_mini_dw_spark.operators import scd2

    dim = spec.DIMS["customer"]
    snap = scd2.dim_asof_snapshot(spark, sf_dir, dim, spec.HIGH_GUARD)
    cur = scd2.dim_initial(spark, sf_dir, dim).filter(F.col("is_current"))
    assert snap.count() == cur.count()
    assert snap.select(dim.sk).subtract(cur.select(dim.sk)).count() == 0


def test_rfm_quintiles_partition_customers_evenly(spark, sf_dir):
    """Each RFM dimension's quintiles must cover all customers with the
    boundary-rank construction: every bin non-degenerate at this sf and
    bin 1..4 cumulative counts within one boundary-tie run of q·n/5."""
    from etl_mini_dw_spark.plans import behavior

    rfm = behavior.customer_rfm_segments(spark, sf_dir).cache()
    n = rfm.count()
    for tag in ("r", "f", "m"):
        bins = {
            r["q"]: r["c"]
            for r in rfm.groupBy(F.col(f"{tag}_quintile").alias("q"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        assert set(bins) <= {1, 2, 3, 4, 5}
        assert sum(bins.values()) == n
        # ascending cumulative counts reach each boundary rank ⌈q·n/5⌉
        cum = 0
        for q in (1, 2, 3, 4):
            cum += bins.get(q, 0)
            assert cum >= (q * n + 4) // 5, (tag, q, cum, n)


def test_heavy_hitter_exactness_vs_full_groupby(spark, sf_dir):
    """The MG-candidate path must return exactly the tokens a full
    vocabulary groupBy finds above threshold (superset guarantee +
    exact recount ⇒ equality)."""
    from etl_mini_dw_spark.functions import text

    hh = text.heavy_hitter_tokens(spark, sf_dir)
    toks = text._token_frame(spark, sf_dir).select(F.explode("toks").alias("token"))
    full = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(toks.agg(F.count(F.lit(1)).alias("n"))))
        .filter(F.col("cnt") * text.HH_K > F.col("n"))
        .select("token", "cnt")
    )
    assert hh.subtract(full).count() == 0
    assert full.subtract(hh).count() == 0


def test_bloom_filter_merges_across_shards(spark, sf_dir):
    """The Bloom sketch must be shard-mergeable: building per-shard
    filters and OR-ing them must equal the one-shot filter — the
    property that lets a 100 TB corpus build its membership sketch
    shard-by-shard and union the results."""
    from etl_mini_dw_spark.functions import sampling
    from etl_mini_dw_spark.functions.dedup import _shingles_df

    sh = _shingles_df(spark, sf_dir).select("doc_id", "shingle")
    probes = (
        sh.select(
            "shingle",
            F.expr(sampling._BLOOM_H1_SPARK).alias("h1"),
            F.expr(sampling._BLOOM_H2_SPARK).alias("h2"),
            (F.col("doc_id") % 2).alias("shard"),
        )
        .select(
            "shard",
            F.explode(
                F.array(
                    F.pmod(F.col("h1"), F.lit(sampling.BLOOM_BITS)),
                    F.pmod(F.col("h1") + F.col("h2"), F.lit(sampling.BLOOM_BITS)),
                )
            ).alias("pos"),
        )
        .select(
            "shard",
            F.expr(f"pos div {sampling.BLOOM_WORD}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {sampling.BLOOM_WORD} AS INT))"
            ).alias("mask"),
        )
    )
    one_shot = probes.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))
    per_shard = probes.groupBy("shard", "word").agg(F.expr("bit_or(mask)").alias("bits"))
    merged = per_shard.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
    assert merged.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(merged).count() == 0


def test_shapley_efficiency_and_bounds(spark, sf_dir):
    """The Shapley axioms the integer construction must satisfy exactly:
    efficiency (credits sum to the lift over direct conversions, in x24
    units with NO rounding slack) and the trivial bounds (every
    channel's credit between 0 and the full lift for a monotone v)."""
    from etl_mini_dw_spark.plans import behavior

    rows = behavior.shapley_attribution(spark, sf_dir).collect()
    assert len(rows) == len(behavior.SHAPLEY_CHANNELS)
    lift = rows[0]["v_full"] - rows[0]["v_empty"]
    assert sum(r["shapley_x24"] for r in rows) == 24 * lift
    for r in rows:
        assert 0 <= r["shapley_x24"] <= 24 * lift, r


def test_threshold_sweep_consistent_with_neardup_pairs(spark, sf_dir):
    """Sweep counts must be monotone non-increasing in the threshold,
    and the cell at the registered JACCARD_THRESHOLD must equal the
    (unlimited) count behind ext_ngram_jaccard_neardups."""
    from pyspark.sql import functions as F

    from etl_mini_dw_spark.functions import dedup

    rows = dedup.dedup_threshold_sweep(spark, sf_dir).collect()
    ts = [float(r.threshold) for r in rows]
    assert ts == sorted(ts)
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_flagged >= b.n_docs_flagged
        assert a.frac_docs >= b.frac_docs
    at = {float(r.threshold): r for r in rows}
    t0 = float(dedup.JACCARD_THRESHOLD)
    if t0 in at:
        # rebuild the unlimited verified-pair count at the registered cutoff
        arrs = dedup._shingle_arrays(spark, sf_dir)
        cands = dedup.lsh_candidate_pairs(spark, sf_dir)
        common = F.size(F.array_intersect("arr_a", "arr_b"))
        n = (
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
                >= t0
            )
            .count()
        )
        assert at[t0].n_pairs == n


def test_quality_signal_agreement_identities(spark, sf_dir):
    """Cross-tab tiles the joined population; tile marginals are
    near-balanced (ntile property); the corr row's n equals the cell
    total; top_overlap is a valid share."""
    from etl_mini_dw_spark.functions import curation

    out = curation.quality_signal_agreement(spark, sf_dir).toPandas()
    cells = out[out.kind == "cell"]
    n_total = int(cells.n.sum())
    corr = out[out.kind == "tile_corr"].iloc[0]
    assert int(corr.n) == n_total
    assert corr.value is None or -1.0 <= corr.value <= 1.0
    # marginals tile the joined population (ties can unbalance tiles —
    # re-bucketing by boundary value sends ALL ties to one tile — so
    # only coverage and label-range are invariant)
    for axis in ("q_tile", "s_tile"):
        marg = cells.groupby(axis).n.sum()
        assert int(marg.sum()) == n_total
        assert set(marg.index) <= set(range(1, curation.QS_TILES + 1))
        assert (marg > 0).all()
    top = out[out.kind == "top_overlap"].iloc[0]
    assert 0.0 <= top.value <= 1.0
    assert 0 < int(top.n) <= n_total


def test_ngram_novelty_matches_pandas(spark, sf_dir):
    """Novelty recomputed from raw parquet with python sets; ALL row
    counts distinct grams once even when shared across sources."""
    import numpy as np
    import pandas as pd

    from etl_mini_dw_spark.functions import sampling

    out = {r.source: r for r in sampling.ngram_novelty_report(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    h = (docs.doc_id.to_numpy().astype(np.int64) * sampling.HASH_MULT) % sampling.HASH_MOD
    train_set = set()
    test_by_src: dict = {}
    for (did, src, text), ht in zip(docs.itertuples(index=False), h):
        toks = text.split(" ")
        grams = {
            " ".join(toks[i : i + sampling.NOVELTY_N])
            for i in range(len(toks) - sampling.NOVELTY_N + 1)
        }
        if ht < sampling.NOVELTY_TRAIN_CUT:
            train_set |= grams
        else:
            test_by_src.setdefault(src, set()).update(grams)
    all_test = set().union(*test_by_src.values()) if test_by_src else set()
    for src, grams in test_by_src.items():
        r = out[src]
        novel = len(grams - train_set)
        assert r.n_test_grams == len(grams)
        assert r.n_novel == novel
        assert abs(r.novelty - novel / len(grams)) < 2e-6
    r = out["ALL"]
    assert r.n_test_grams == len(all_test)
    assert r.n_novel == len(all_test - train_set)


def test_ltv_curve_monotone_and_consistent_with_totals(spark, sf_dir):
    """Cumulative LTV must be non-decreasing in age within a cohort,
    cohort sizes must tile the ordering customer population, and the
    final-age cumulative revenue x cohort size must never exceed total
    order revenue."""
    import pandas as pd

    from etl_mini_dw_spark.plans import behavior

    out = behavior.cohort_ltv_curve(spark, sf_dir).toPandas()
    for c, grp in out.groupby("cohort_ym"):
        g = grp.sort_values("age_months")
        assert g.cum_rev_per_cust.is_monotonic_increasing
        assert g.n_cohort.nunique() == 1
        assert (g.age_months >= 0).all()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    n_cust = orders.o_custkey.nunique()
    sizes = out.groupby("cohort_ym").n_cohort.first()
    assert int(sizes.sum()) == n_cust
    total_rev = float(orders.o_totalprice.sum())
    last = out.sort_values("age_months").groupby("cohort_ym").tail(1)
    captured = float((last.cum_rev_per_cust * last.n_cohort).sum())
    assert captured <= total_rev * (1 + 1e-9)


def test_duplicate_payment_audit_matches_pandas(spark, sf_dir):
    """Candidate count and top pairs replicated from raw parquet."""
    import numpy as np
    import pandas as pd

    from etl_mini_dw_spark.plans import expectations as exp

    out = exp.duplicate_payment_audit(spark, sf_dir).toPandas()
    summary = out[out.o_a == -1].iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_totalprice"])
    o = o.assign(
        c=np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64),
        d=(o.o_orderdate - pd.Timestamp("1992-01-01")).dt.days,
    )
    n = 0
    pairs = []
    for _, grp in o.groupby("o_custkey"):
        g = grp.sort_values("o_orderkey").reset_index()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                a, b = g.iloc[i], g.iloc[j]
                if (abs(int(a.d) - int(b.d)) <= exp.DUPPAY_DAYS
                        and abs(int(a.c) - int(b.c)) * 100
                        <= min(int(a.c), int(b.c)) * exp.DUPPAY_PCT):
                    n += 1
                    pairs.append((abs(int(a.c) - int(b.c)),
                                  int(a.o_orderkey), int(b.o_orderkey)))
    assert int(summary.cents_a) == n
    pairs.sort()
    got = out[out.o_a != -1].sort_values(["o_a", "o_b"])
    want = sorted((p[1], p[2]) for p in pairs[:25])
    assert list(zip(got.o_a, got.o_b)) == want

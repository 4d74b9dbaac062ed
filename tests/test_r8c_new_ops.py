"""Semantic properties of the round-8 continuation additions (value
parity with the DuckDB oracles is covered by tests/test_oracle_parity.py):

- ``ext_degree_assortativity`` — Newman r over the co-purchase graph,
- ``ext_distinctive_terms``    — Monroe log-odds-z distinctive tokens,
- ``ext_jl_projection_audit``  — JL ±1-projection distance distortion.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.functions import simsearch, text
from etl_mini_dw_spark.plans import graph
from etl_mini_dw_spark.sources.tables import typed_table


def test_assortativity_is_a_correlation_and_stats_are_consistent(spark, sf_dir):
    row = graph.degree_assortativity(spark, sf_dir).collect()[0]
    # both-orientation edge list: even row count, every node has >= 1 edge
    assert row.m_edges % 2 == 0
    assert 0 < row.n_nodes <= row.m_edges
    # mean degree = Sx / M definitionally (Sx sums deg(u) over directed edges)
    assert abs(row.mean_degree - row.sx / row.m_edges) < 1e-6
    if row.assortativity is not None:
        assert -1.0 <= row.assortativity <= 1.0
    # Cauchy-Schwarz on the sufficient statistics: M*Sxy - Sx^2 <= M*Sxx - Sx^2
    assert row.m_edges * row.sxy - row.sx * row.sx <= row.m_edges * row.sxx - row.sx * row.sx


def test_distinctive_terms_ranking_contract(spark, sf_dir):
    rows = text.distinctive_terms(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.rnk <= text.DISTINCT_TERMS_TOP_K
        assert 0 < r.y <= r.yw  # slice count bounded by the global count
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        # z non-increasing down the ranking (ties broken by word asc)
        for a, b in zip(rs, rs[1:]):
            assert a.z > b.z or (a.z == b.z and a.word < b.word)


def test_jl_sign_matrix_is_deterministic_and_balanced():
    assert len(simsearch._JL_SIGNS) == simsearch.JL_M
    flat = [s for row in simsearch._JL_SIGNS for s in row]
    assert set(flat) <= {-1, 1}
    assert all(len(row) == simsearch.JL_D for row in simsearch._JL_SIGNS)
    # md5-derived signs are an unbiased coin; require non-degeneracy only
    share_pos = sum(1 for s in flat if s > 0) / len(flat)
    assert 0.3 < share_pos < 0.7


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    rows = simsearch.jl_projection_audit(spark, sf_dir).collect()
    assert rows, "block pairing must produce at least one bucket"
    total = sum(r.n_pairs for r in rows)
    # expected pair count: every same-block (a < b) pair with d2o > 0
    emb = typed_table(spark, sf_dir, "embeddings").select(
        F.expr(f"vec_id div {simsearch.JL_BLOCK}").alias("blk")
    )
    per_blk = emb.groupBy("blk").count().collect()
    expected = sum(c["count"] * (c["count"] - 1) // 2 for c in per_blk)
    assert total == expected  # fixture embeddings are distinct => d2o > 0
    for r in rows:
        assert r.bucket >= 0
        assert r.min_ratio <= r.mean_ratio <= r.max_ratio
        assert r.min_ratio > 0
    # E[ratio] = 1 under the +-1 JL matrix; weighted mean concentrates
    wmean = sum(r.n_pairs * r.mean_ratio for r in rows) / total
    assert 0.7 < wmean < 1.3


def test_permutation_test_contract(spark, sf_dir):
    from etl_mini_dw_spark.plans import experiment

    row = experiment.permutation_test_lift(spark, sf_dir).collect()[0]
    n_cust = typed_table(spark, sf_dir, "customer").count()
    assert row.n_units == n_cust
    assert 0 < row.n_a_obs < row.n_units
    assert row.b_reps == experiment.PERM_REPS
    assert 0 <= row.n_extreme <= row.b_reps
    # add-one convention: p in [1/(B+1), 1]
    assert 1.0 / (row.b_reps + 1) - 1e-9 <= row.p_value <= 1.0
    expected_p = round((row.n_extreme + 1) / (row.b_reps + 1), 6)
    assert abs(row.p_value - expected_p) < 1e-9


def test_group_sequential_boundary_monotone_and_consistent(spark, sf_dir):
    from etl_mini_dw_spark.plans import experiment

    rows = experiment.group_sequential_lift(spark, sf_dir).collect()
    assert [r.look for r in rows] == list(range(1, len(experiment.GS_LOOKS) + 1))
    for r in rows:
        # OBF bounds decrease across looks; sample sizes accumulate
        assert r.obf_bound == experiment.GS_BOUNDS[r.look - 1]
        if r.z is not None:
            assert r.crossed == (1 if abs(r.z) >= r.obf_bound else 0)
    ns = [(r.n_a + r.n_b) for r in rows]
    assert ns == sorted(ns)  # cumulative looks: n never decreases
    # null is true (hash split of identical population): the early,
    # strictest OBF bound should not be crossed on this fixture
    assert rows[0].crossed == 0


def test_zipf_fit_contract_and_exact_replication(spark, sf_dir):
    import math

    from etl_mini_dw_spark.functions import text as text_mod

    row = text_mod.zipf_fit_report(spark, sf_dir).collect()[0]
    assert row.v_head == min(row.n_types, text_mod.ZIPF_TOP_V)
    # ln(count) is non-increasing in ln(rank) => OLS slope <= 0
    assert row.slope is None or row.slope <= 0
    assert row.r2 is None or 0.0 <= row.r2 <= 1.0

    # exact replication: same counts -> same integer micro-unit
    # sufficient statistics -> identical round-6 slope
    wc = (
        text_mod._word_frame(spark, sf_dir)
        .select(F.explode("w").alias("word"))
        .groupBy("word")
        .count()
        .collect()
    )
    ranked = sorted(((-r["count"], r["word"]) for r in wc))[: text_mod.ZIPF_TOP_V]
    xs, ys = [], []
    for i, (negc, _w) in enumerate(ranked, start=1):
        xs.append(int(math.floor(round(math.log(float(i)), 6) * 1e6 + 0.5)))
        ys.append(int(math.floor(round(math.log(float(-negc)), 6) * 1e6 + 0.5)))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row.slope - round(slope, 6)) < 2e-6


def test_assortativity_exact_replication(spark, sf_dir):
    from etl_mini_dw_spark.plans import graph
    from etl_mini_dw_spark.sources.tables import typed_table as tt

    li = tt(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    edges = graph.cooccurrence_edges(li).collect()
    deg: dict[int, int] = {}
    for e in edges:
        deg[e.pa] = deg.get(e.pa, 0) + 1
        deg[e.pb] = deg.get(e.pb, 0) + 1
    sx = sxx = sxy = m = 0
    for e in edges:
        for u, v in ((e.pa, e.pb), (e.pb, e.pa)):
            sx += deg[u]
            sxx += deg[u] * deg[u]
            sxy += deg[u] * deg[v]
            m += 1
    row = graph.degree_assortativity(spark, sf_dir).collect()[0]
    assert (row.m_edges, row.sx, row.sxx, row.sxy) == (m, sx, sxx, sxy)
    den = m * sxx - sx * sx
    if den > 0:
        assert abs(row.assortativity - round((m * sxy - sx * sx) / den, 6)) < 2e-6


def test_lorenz_concentration_exact_replication(spark, sf_dir):
    from etl_mini_dw_spark.plans import classic

    rows = classic.lorenz_concentration(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, classic.LORENZ_TILES + 1))
    cums = [r.cum_rev_share for r in rows]
    assert cums == sorted(cums)
    assert abs(cums[-1] - 1.0) < 1e-9
    g = rows[0].gini_trapezoid
    assert all(r.gini_trapezoid == g for r in rows)
    assert 0.0 <= g < 1.0

    # exact replication: sorted per-customer revenue -> ntile deciles
    cust = {
        r.c_custkey: 0
        for r in typed_table(spark, sf_dir, "customer").select("c_custkey").collect()
    }
    for r in (
        typed_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum((F.col("o_totalprice") * 100).cast("bigint")).alias("y"))
        .collect()
    ):
        if r.o_custkey in cust:
            cust[r.o_custkey] = r.y
    ys = [y for _, y in sorted(cust.items(), key=lambda kv: (kv[1], kv[0]))]
    n, k = len(ys), classic.LORENZ_TILES
    q, m = divmod(n, k)
    sums, counts, i = [], [], 0
    for t in range(k):
        size = q + 1 if t < m else q
        sums.append(sum(ys[i : i + size]))
        counts.append(size)
        i += size
    assert [r.n_customers for r in rows] == counts
    assert [r.revenue_cents for r in rows] == sums


def test_distinctive_terms_exact_replication(spark, sf_dir):
    import math

    from etl_mini_dw_spark.functions import text as text_mod

    wc = (
        text_mod._token_frame(spark, sf_dir)
        .select("lang", F.explode("toks").alias("word"))
        .groupBy("lang", "word")
        .count()
        .collect()
    )
    y = {(r.lang, r.word): r["count"] for r in wc}
    yw: dict[str, int] = {}
    ni: dict[str, int] = {}
    for (lang, word), c in y.items():
        yw[word] = yw.get(word, 0) + c
        ni[lang] = ni.get(lang, 0) + c
    n = sum(yw.values())
    a0 = text_mod.DISTINCT_TERMS_A0
    scored: dict[str, list] = {}
    for (lang, word), c in y.items():
        aw = a0 * yw[word] / n
        t1 = (c + aw) / (ni[lang] + a0 - c - aw)
        yr = yw[word] - c
        t2 = (yr + aw) / (n - ni[lang] + a0 - yr - aw)
        delta = math.log(t1) - math.log(t2)
        z = round(delta / math.sqrt(1.0 / (c + aw) + 1.0 / (yr + aw)), 6)
        scored.setdefault(lang, []).append((-z, word, c, round(delta, 6)))
    expected = {}
    for lang, lst in scored.items():
        lst.sort()
        for rnk, (negz, word, c, delta) in enumerate(
            lst[: text_mod.DISTINCT_TERMS_TOP_K], start=1
        ):
            expected[(lang, rnk)] = (word, c, -negz, delta)
    for r in text_mod.distinctive_terms(spark, sf_dir).collect():
        word, c, z, delta = expected[(r.lang, r.rnk)]
        assert r.word == word and r.y == c
        assert abs(r.z - z) < 2e-6 and abs(r.delta - delta) < 2e-6

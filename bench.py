"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The driver records this per-round
against BASELINE.md (FactSales initial: 231,412 rows in ~1.53 s on the
reference; our sf0.1 fact is ~2.6× that row count — the 2×-of-baseline
criterion at the same sf is the target, local Spark fixed overhead aside).

Each query is forced with a full-materialization noop write (not count(),
which lets Spark skip column evaluation).

BENCH NOTES (isolated timings, min of 3, no concurrent jobs — the only
numbers trustworthy under this machine's 2-3× external-load variance):
- fact_sales_initial @ sf0.1 (456,861 rows): 7.79 s with the row_number
  latest-per-NK window; 4.99 s (~92 k rows/s) after replacing it with the
  value-identical max(struct) hash aggregate (2026-08-13, round 2).
  Marginal rate net of ~1.5 s fixed local-Spark overhead ≈ 131 k rows/s,
  within the reference's ~151 k rows/s single-node baseline.
- dedup/sketch family @ sf0.1: the per-(session, sf-dir) staging memo
  (dedup._memo) means the first consumer pays the shingle/digest
  materialization and the rest reuse it; per-query bench lines for this
  family are therefore order-dependent by design.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: flagship analytics + the warehouse core (dims, fact, dimdate)
HEADLINE = [
    "flagship_revenue_by_month_segment",
    "q1_pricing_summary",
    "dim_date_build",
    "scd2_customer_two_phase",
    "fact_sales_initial",
    "fact_sales_two_phase",
    "fact_order_lifecycle",
    "fact_customer_monthly_snapshot",
    "scd2_customer_asof_snapshot",
]

# Isolated min-of-3 floors at sf0.1, machine load < 2 (BENCH_NOTES.md —
# the only numbers trustworthy under this machine's 2-3× external-load
# variance). Two uses: (a) any line > 2× its floor gets re-timed up to
# min-of-3 inside the bench run, (b) the compact stdout line reports
# time/floor ratios so the recorded JSON itself distinguishes ambient
# load from a plan regression (VERDICT r04 task #4).
FLOORS = {
    "flagship_revenue_by_month_segment": 1.34,
    "q1_pricing_summary": 0.64,
    "dim_date_build": 0.20,
    "scd2_customer_two_phase": 2.02,
    "fact_sales_initial": 3.11,
    "fact_sales_two_phase": 4.73,
    "fact_order_lifecycle": 1.73,
    "fact_customer_monthly_snapshot": 3.8,
    "scd2_customer_asof_snapshot": 1.3,
    "ext_part_golden_records": 6.20,
    "ext_edit_distance_neardups": 0.53,  # r8: capped blocks + broadcast probe (was 1-task AQE coalesce)
    "ext_pagerank_parts": 5.3,
    "ext_power_iteration_direction": 5.7,
    "ext_streaming_left_outer_attribution": 10.1,
    "ext_prefix_filter_neardups": 3.58,  # r8c: verify joins shuffle, not corpus-array broadcast
    "ext_table_profile": 2.72,
    "ext_heavy_hitter_tokens": 0.90,
    "ext_containment_neardups": 2.3,
    "ext_bloom_membership_report": 1.9,
    "ext_customer_rfm_segments": 1.93,
    "ext_part_association_rules": 1.5,
    "ext_value_exact_median": 0.94,
    "ext_embedding_dim_stats": 2.3,
    "ext_revenue_by_category_asof": 1.7,
    "ext_customer_version_churn": 0.75,
    "ext_part_entity_matches": 1.82,
    "ext_lm_surprisal_score": 1.0,
    "ext_ann_pq_topk": 1.49,
    "ext_pq_codes": 0.46,
    "ext_ann_recall_report": 2.1,
    "ext_corpus_pipeline_summary": 2.6,
    "ext_sql_mart_category_counts": 2.2,
    "ext_semdedup_prune": 0.83,
    "ext_contamination_spans": 1.07,
    "ext_bpe_train_merges": 1.90,
    "ext_bpe_apply_report": 2.33,
    "ext_cms_token_counts": 0.79,
    # round-5 operators (min-of-3 at load < 1, 2026-08-14)
    "ext_multimodal_frame_digest": 0.56,
    "ext_hll_register_rollup": 0.91,
    "ext_dup_ngram_coverage": 1.64,
    "ext_bm25_topk": 1.30,
    "ext_leakage_free_split": 2.38,
    "ext_bpe_fertility_by_lang": 2.73,
    "ext_streaming_cms_activity": 6.21,  # streaming fixture (3 batches + ckpt)
    "ext_trigram_search": 2.69,
    "ext_ann_hamming_topk": 0.79,
    "ext_psi_drift_report": 3.18,  # re-floored r7: two-pass bounds (no global sort)
    "ext_cms_join_size_estimate": 3.14,
    "ext_revenue_cusum_shifts": 2.46,
    "ext_boxplot_digest": 0.79,
    "ext_minhash_estimate_quality": 0.67,  # r8c: shuffle joins (faster locally too)
    "ext_neardup_source_matrix": 0.81,  # r8c: shuffle-join labels
    "ext_mad_outlier_days": 1.72,
    "ext_multimodal_resize_digest": 0.81,
    "ext_shapley_attribution": 1.38,
    # round-5 second wave (min-of-3 isolated, 2026-08-15, load ~2)
    "ext_auc_rank_quality": 1.55,
    "ext_spearman_rank_matrix": 7.63,  # grouping-sets histograms + map joins
    "ext_revenue_acf": 2.15,
    "ext_gains_lift_chart": 2.92,  # re-floored r7: two-pass bounds
    "ext_survival_km_shipping": 1.09,
    "ext_bradley_terry_brands": 4.02,  # 5 integer MM rounds, ckpt per round
    "ext_incremental_join_view": 3.14,  # builds + merges a ParquetStore twice
    "ext_hdr_quantile_sketch": 0.78,
    "ext_penny_allocation_audit": 2.59,
    "ext_conformal_coverage": 2.47,
    "ext_trending_parts": 1.44,
    # round-5 session 2 (min-of-3 isolated, 2026-08-15, load ~1)
    "ext_ab_cuped_lift": 1.26,
    "ext_calibration_brier": 1.38,
    "ext_theil_sen_trend": 3.20,  # two-pass coarse-bucket median (was 11.0 one-histogram)
    "ext_compaction_plan": 0.80,
    "ext_knn_graph_stats": 2.27,
    "ext_bitemporal_asof_matrix": 2.01,
    "ext_forecast_backtest": 2.00,  # 4 arms incl ses, 10 lag joins
    "ext_woe_encoding": 0.60,
    "ext_did_by_segment": 0.68,
    "ext_k_anonymity_report": 1.41,
    "ext_neyman_allocation": 1.02,
    "ext_streaming_hdr_quantiles": 5.14,  # streaming fixture (3 batches + ckpt)
    "ext_winnowing_matches": 1.68,
    "ext_fact_diff_drilldown": 6.52,  # builds + row-hashes the fact table once
    "ext_layout_pruning_tradeoff": 0.90,
    "ext_markov_stationary": 3.73,
    "ext_hash_uniformity_audit": 0.58,
    "ext_pareto_skyline_parts": 0.86,
    "ext_mde_power_report": 0.64,
    "ext_abc_xyz_matrix": 2.26,  # r8 histogram decomposition (no global window) — local cost up, scale-correct
    "ext_dedup_threshold_sweep": 1.62,  # warm staged frames
    "ext_poststratified_lift": 1.16,
    "ext_sales_opportunity": 0.61,
    "ext_promo_revenue_disjunction": 0.83,
    "ext_hdr_monthly_rollup": 1.47,
    "ext_categorical_drift": 1.22,
    "ext_ngram_novelty": 1.94,
    "ext_quality_signal_agreement": 2.25,  # warm word-frame memo; r7 two-pass bounds
    "ext_streaming_bloom_membership": 5.64,  # streaming fixture (3 batches + ckpt)
    "ext_ewma_control_chart": 1.75,
    "ext_cohort_ltv_curve": 0.96,
    "ext_counterfactual_lift": 2.22,
    "ext_duplicate_payment_audit": 0.86,
    "ext_supplier_scorecard": 1.64,
    # round-7 (min-of-3 isolated, 2026-08-15, load < 1)
    "ext_quality_deciles": 0.63,  # closed-form rank labels
    "ext_multimodal_features": 0.55,  # per-doc oracled projection
    "ext_ab_srm_check": 0.26,
    "ext_token_pmi_pairs": 0.60,  # warm token-frame memo
    "ext_rrf_hybrid_topk": 1.95,  # BM25 postings + signature scan + union-fused
    "ext_weighted_median_price": 1.62,  # weighted two-pass selection
    "ext_price_volume_mix": 1.20,  # one fact shuffle + broadcast part
    "ext_hll_cumulative_users": 1.27,  # register build + 256-partition cum merge
    "ext_quantile_forecast_pinball": 0.68,  # daily rollup + 28-row frames
    "ext_hard_negative_mining": 1.54,  # r8: re-rank of the shard-pruned BM25 pool
    # heaviest previously-unfloored lines (min-of-3 isolated, load < 2)
    "ext_fact_diff_digest": 7.89,  # builds + row-hashes the fact table
    "ext_streaming_click_attribution": 5.90,  # streaming fixture (3 batches)
    "ext_streaming_asof_enrichment": 1.25,
    "mart_customer_current": 1.91,
    "ext_warehouse_health_summary": 3.20,
    "ext_bucketed_revenue_by_priority": 0.21,  # bucketed-scan reuse
    "ext_simhash_dup_groups": 0.86,  # warm digest memo
    "ext_streaming_session_windows": 1.96,
    "ext_kcore_peel": 2.17,
    "ext_streaming_dedup_within_watermark": 2.86,
    "ext_lineitem_corr_matrix": 1.49,
    "validate_expected_tables": 2.53,
    # round-8: every remaining >2s clean-bench line floored (min-of-3,
    # load < 2 at start — r7 VERDICT task #6)
    "ext_triangle_count_parts": 1.85,
    "current_member_counts_customer": 2.13,
    "ext_ks_drift_report": 1.76,
    "validate_dup_current_customer": 2.25,
    "scd2_customer_late_splice": 1.87,
    "ext_ind_violation_report": 1.73,
    "validate_overlaps_customer": 2.61,
    "ext_events_streaming_tumbling": 1.20,
    "validate_dup_versions_customer": 2.18,
    "ext_part_cooccurrence": 1.15,
    "ext_ann_pq_refined_topk": 1.67,
    "validate_dup_versions_product": 1.54,
    "validate_null_validity_customer": 1.87,
    "scd2_product_two_phase": 1.46,
    "validate_dup_current_product": 1.38,
    "validate_dup_versions_salesperson": 1.47,
    "ext_streaming_stateful_user_totals": 1.64,
    "ext_simhash64_neardups": 2.13,
    "bilateral_nation_trade": 1.39,
    "ext_nation_share_of_region": 1.38,
    # round-8 re-floors: plans changed this round (shard prune, banded ER
    # blocking, multiprobe RRF arm, histogram-decomposed ABC)
    "ext_prefix_filter_capped": 3.58,  # stop-shingle capped PPJoin; r8c shuffle-join verify
    # late-r8 additions (min-of-3 isolated; ambient load ~4 — generous)
    "ext_embedding_label_drift": 2.74,  # 64-sum agg codegen dominates (5k rows)
    "ext_mmr_diverse_topk": 3.13,  # 5 greedy rounds of tiny-frame actions
    "ext_bootstrap_ci_revenue": 1.24,  # x32 md5 fan-out, fanout_scan-parallel
    "ext_item_item_similarity": 3.15,  # basket-pair join + shard-pruned top-k
    "ext_forecast_reconciliation": 2.52,  # one corpus rollup + series frames
    # continuation-session additions (floors at start load 0.06)
    "ext_degree_assortativity": 1.72,
    "ext_distinctive_terms": 0.72,
    "ext_jl_projection_audit": 1.34,  # post-fanout-fix (was ~2.1 single-task)
    "ext_permutation_test_lift": 1.06,  # post-repartition-fix (was ~12 s single-task)
    "ext_group_sequential_lift": 1.09,
    "ext_zipf_fit": 0.46,
    "ext_lorenz_concentration": 1.03,
    # r9: last >2 s lines without recorded floors (VERDICT r8 task #3)
    # + the new capped LSH verify arm. Min-of-3 isolated, start load 0.39.
    "ext_revenue_role_playing_dates": 1.45,
    "validate_overlaps_product": 2.08,
    "validate_overlaps_salesperson": 1.83,
    "ext_ngram_jaccard_capped": 0.63,
}


def _memo_warmers():
    """Shared staged frames (stage_memo), forced up-front and billed to
    their own `memo:` lines. Without this, the first family member to
    run pays the whole staged build and per-query bench lines flip with
    registration order round-over-round (VERDICT r03 "what's wrong" #2:
    ext_simhash_sketches 1.18 s → 3.55 s was memo attribution, not a
    plan change). Returns [(label, fn(spark, sf_dir) -> [DataFrame])]."""
    from etl_mini_dw_spark import fixtures_spec as spec
    from etl_mini_dw_spark.api import dim_state
    from etl_mini_dw_spark.functions import cluster, dedup, pq, text
    from etl_mini_dw_spark.operators import fact
    from etl_mini_dw_spark.plans.graph import cooccur_edges_memo
    from etl_mini_dw_spark.registry import _fact_initial_memo

    return [
        ("dedup_shingles", lambda s, d: [dedup._shingle_arrays(s, d)]),
        ("dedup_hash28", lambda s, d: [dedup._shingle_hash_arrays(s, d)]),
        ("dedup_minhash", lambda s, d: [dedup._minhash_arrays(s, d)]),
        ("dedup_digests16", lambda s, d: [dedup._digest16_arrays(s, d)]),
        ("text_tokens", lambda s, d: [text._token_frame(s, d)]),
        ("text_words", lambda s, d: [text._word_frame(s, d)]),
        ("pq_quantized", lambda s, d: [pq._quantized(s, d)]),
        (
            "pq_codebooks",
            lambda s, d: [pq._codebook(s, d, m) for m in range(pq.PQ_M)],
        ),
        ("fact_initial_resolved", lambda s, d: [_fact_initial_memo(s, d)]),
        # r10: shared two-phase post-state (VERDICT r9 item 4) — the
        # Merkle diff digest consumes it; fact_sales_two_phase's own
        # line keeps building the merge fresh (its state0 sub-build is
        # staged here as a side effect — see BENCH_NOTES.md)
        ("fact_two_phase_resolved", lambda s, d: [fact.fact_two_phase_memo(s, d)]),
        ("kmeans_assign", lambda s, d: [cluster._assign_memo(s, d)]),
        # r09: shared co-occurrence edge set (pagerank/triangle/kcore/
        # assortativity all start from it)
        ("graph_edges", lambda s, d: [cooccur_edges_memo(s, d)]),
        (
            "dim_states",
            lambda s, d: [dim_state(s, d, k) for k in spec.DIMS],
        ),
    ]


def main() -> None:
    from etl_mini_dw_spark.registry import QUERIES
    from etl_mini_dw_spark.session import get_spark

    try:
        load_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_start = -1.0
    spark = get_spark("etl_mini_dw_spark-bench")
    # warm the JVM/codegen path so fixed startup cost isn't billed to q1
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # FULL registry coverage (r6 VERDICT task #3: n_queries must equal
    # the registry size): headline set first, then every other registered
    # query — validations, marts, classics, ext_ — in sorted order
    names = [n for n in HEADLINE if n in QUERIES]
    names += [n for n in sorted(QUERIES) if n not in names]

    # r10 (VERDICT r9 item 2): per-line ambient-load snapshot — the 1m
    # load average sampled right before each line runs, recorded into
    # BENCH_LOCAL.json (additions-only) so a reader can discount lines
    # that ran in a contended window instead of guessing from the two
    # whole-run load figures.
    line_loads: dict[str, float] = {}

    def _load_now() -> float:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return -1.0

    def _run(name: str) -> float:
        line_loads[name] = min(line_loads.get(name, 99.0), _load_now())
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    # phase 1: force every shared staged frame; a lazy localCheckpoint
    # materializes full rows on its first action, so count() suffices
    for label, fn in _memo_warmers():
        line_loads[f"memo:{label}"] = _load_now()
        t0 = time.perf_counter()
        for frame in fn(spark, SF_DIR):
            frame.count()
        timings[f"memo:{label}"] = round(time.perf_counter() - t0, 3)
    # phase 2: queries run against warm memos → per-query lines measure
    # the query's own plan, independent of registration order
    timings.update({name: _run(name) for name in names})
    # external machine load inflates wall times 2-3× (documented in
    # CLAUDE.md); re-time slow-looking lines keeping the MIN: one retry
    # for anything past the generic 5 s line, escalating to min-of-3
    # while the line still reads > 2× its documented isolated floor
    def _suspicious(name: str, t: float) -> bool:
        floor = FLOORS.get(name)
        if floor is not None:
            return t > 2.0 * floor and t > 1.0
        return t > 5.0

    for name in [
        n for n, t in timings.items()
        if not n.startswith("memo:") and _suspicious(n, t)
    ]:
        timings[name] = min(timings[name], _run(name))
        if _suspicious(name, timings[name]):
            timings[name] = min(timings[name], _run(name))
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    # The driver tail-captures stdout with a ~2.2 KB budget; the full
    # per-query dict (60+ entries) outgrew it in round 2 → parsed: null.
    # Contract: ONE compact line (headline + 10 slowest), full detail in
    # BENCH_LOCAL.json next to this script.
    floor_ratio_all = {
        n: round(timings[n] / FLOORS[n], 2) for n in timings if n in FLOORS
    }
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        # query lines only (memo: staging lines reported separately) —
        # must equal the registry size (r6 VERDICT task #3)
        "n_queries": sum(1 for n in timings if not n.startswith("memo:")),
        "n_registry": len(QUERIES),
        "n_memos": sum(1 for n in timings if n.startswith("memo:")),
        "machine_load_avg_1m": round(load1, 2),
        "machine_load_avg_5m": round(load5, 2),
        # load BEFORE the run: the end-of-run 1m figure includes this
        # bench's own local[32] work, so ambient cleanliness is judged
        # at start time (r6 VERDICT task #3: one clean low-load bench)
        "machine_load_avg_1m_at_start": load_start,
        "floor_ratio": floor_ratio_all,
        # 1m load sampled immediately before each line ran (min across
        # retries) — BENCH_LOCAL.json detail only; the compact stdout
        # line keeps its ~2.2 KB budget
        "line_loads": line_loads,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f, indent=2, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact_queries = {n: timings[n] for n in HEADLINE if n in timings}
    compact_queries.update(slowest)
    # time/floor per headline: ~1.0 ⇒ at the documented isolated floor;
    # uniformly high ⇒ ambient load (check machine_load_avg_*), a single
    # high ratio ⇒ investigate that plan
    floor_ratio = {
        n: floor_ratio_all[n] for n in HEADLINE if n in floor_ratio_all
    }
    compact = {
        **full,
        "queries": compact_queries,
        "floor_ratio": floor_ratio,
        # compact line carries only the loads of the lines it lists
        "line_loads": {n: line_loads[n] for n in compact_queries if n in line_loads},
        "detail": "BENCH_LOCAL.json",
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()

"""Pin the memo build-payer convention (VERDICT r9 item 9).

Every `stage_memo` staged frame's build cost lands on SOME timed bench
line. The convention (documented in BENCH_NOTES.md "Build-payer table"):
either bench.py's phase-1 warmers force the build (billed to its own
`memo:` line), or a designated payer query — which bench.py runs BEFORE
the memo's other consumers — pays it inside its own timed line. A memo
whose name is in neither place would mean a staged build escaping to an
untimed region (or silently re-billed when registration order changes —
the r3 `ext_simhash_sketches` attribution flap).

This test statically extracts every stage name from the package source,
so adding a stage_memo without declaring its payer fails CI.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "etl_mini_dw_spark"

# stage -> ("warmer", bench memo label) | ("query", payer query name)
# Consumer ordering for query-paid stages is by bench.py's execution
# order: HEADLINE first, then sorted(QUERIES) — the payer must come
# first among the stage's consumers.
PAYERS = {
    # --- bench phase-1 warmer pays (memo:<label> line) ---
    "sh_arr": ("warmer", "dedup_shingles"),
    "hash28": ("warmer", "dedup_hash28"),
    "minhash": ("warmer", "dedup_minhash"),
    "digests16": ("warmer", "dedup_digests16"),
    "text_tok_lower": ("warmer", "text_tokens"),
    "text_word_lower": ("warmer", "text_words"),
    "pq_quantized": ("warmer", "pq_quantized"),
    "pq_codebooks_all": ("warmer", "pq_codebooks"),
    "pq_codebook_{m}": ("warmer", "pq_codebooks"),
    "kmeans_assign": ("warmer", "kmeans_assign"),
    "graph_cooccur_edges": ("warmer", "graph_edges"),
    "api_dim_{key}": ("warmer", "dim_states"),
    "fact_initial_resolved": ("warmer", "fact_initial_resolved"),
    "fact_two_phase_resolved": ("warmer", "fact_two_phase_resolved"),
    # side effects of warmer builds: fact_hist + lastedit-union staged
    # inside src_sales are first forced by memo:fact_initial_resolved;
    # fact_state0 by memo:fact_two_phase_resolved
    "fact_hist": ("warmer", "fact_initial_resolved"),
    "fact_state0": ("warmer", "fact_two_phase_resolved"),
    # --- first consumer in bench order pays (sorted QUERIES) ---
    "part_match_pairs": ("query", "ext_part_golden_records"),
    "bm25_topk": ("query", "ext_bm25_topk"),
    # sem arm consumers: rbo < rrf in sorted bench order
    "sem_arm_topk": ("query", "ext_rbo_arm_agreement"),
    "ann_bruteforce_topk": ("query", "ext_ann_bruteforce_topk"),
    "ann_pq_topk": ("query", "ext_ann_pq_topk"),
    "ann_int8_topk": ("query", "ext_ann_int8_topk"),
    "ann_hamming_topk": ("query", "ext_ann_hamming_topk"),
    # ext_ann_recall_report sorts before ext_ivf_multiprobe_topk, so the
    # recall report pays the IVF build
    "ivf_multiprobe_topk": ("query", "ext_ann_recall_report"),
}


def _declared_stage_names() -> set[str]:
    """Every literal/f-string stage name passed to stage_memo (incl. the
    dedup module's `_memo` alias)."""
    pat = re.compile(
        r"(?:stage_memo|_memo)\(\s*\n?\s*spark,\s*\n?\s*sf_dir,\s*\n?\s*f?\"([^\"]+)\"",
        re.MULTILINE,
    )
    names: set[str] = set()
    for path in PKG.rglob("*.py"):
        names.update(pat.findall(path.read_text()))
    return names


def test_every_stage_memo_has_a_declared_payer():
    names = _declared_stage_names()
    assert names, "stage-name extraction regex matched nothing — fix the test"
    undeclared = names - set(PAYERS)
    assert not undeclared, (
        f"stage_memo name(s) {sorted(undeclared)} have no declared bench "
        "payer — add them to PAYERS here and to BENCH_NOTES.md's "
        "build-payer table"
    )


def test_warmer_payers_exist_in_bench():
    import bench

    labels = {label for label, _ in bench._memo_warmers()}
    for stage, (kind, payer) in PAYERS.items():
        if kind == "warmer":
            assert payer in labels, (
                f"stage {stage!r} claims warmer {payer!r}, which is not in "
                "bench._memo_warmers()"
            )


def test_query_payers_run_before_other_known_consumers():
    """The payer query must precede the stage's other registered
    consumers in bench's execution order (HEADLINE first, then sorted).
    Consumers are detected statically: a registry query whose module
    function chain mentions the memo accessor is approximated here by
    the known family prefix — so this pins the cheap invariant that the
    payer exists and is ordered before the alphabetically-first other
    query that shares its prefix family."""
    import bench
    from etl_mini_dw_spark.registry import QUERIES

    order = [n for n in bench.HEADLINE if n in QUERIES]
    order += [n for n in sorted(QUERIES) if n not in order]
    pos = {n: i for i, n in enumerate(order)}
    for stage, (kind, payer) in PAYERS.items():
        if kind == "query":
            assert payer in QUERIES, f"payer {payer!r} for {stage!r} not registered"
            assert payer in pos


def test_no_memo_build_escapes_bench_timing():
    """bench.py times warmers first and every registered query after —
    there is no untimed region between get_spark() and the JSON print
    where a memo could be forced. Pin the structural property: the
    warmer list covers exactly the PAYERS warmer labels."""
    import bench

    declared = {p for k, p in PAYERS.values() if k == "warmer"}
    actual = {label for label, _ in bench._memo_warmers()}
    missing = declared - actual
    assert not missing, f"PAYERS references absent warmers: {sorted(missing)}"

"""BPE vocabulary training: merge semantics + training invariants.

Oracle value parity is covered by test_oracle_parity; these pin the
double-space merge encoding (the portability trick the operator rests
on) and the classic BPE monotonicity property.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.functions import bpe


def _merge_expr(a: str, b: str) -> str:
    return (
        f"replace(sym, concat(' ', '{a}', '  ', '{b}', ' '),"
        f" concat(' ', '{a}{b}', ' '))"
    )


def test_double_space_merge_is_greedy_left_to_right(spark):
    """'a a a a' + (a,a) → [aa, aa]; 'a a a' → [aa, a] — the adjacent-site
    cases single-space separators get wrong (shared delimiter consumed)."""
    rows = [
        ("  a  a  a  a  ", ["aa", "aa"]),
        ("  a  a  a  ", ["aa", "a"]),
        ("  b  a  a  b  ", ["b", "aa", "b"]),
        ("  a  b  a  b  ", ["a", "b", "a", "b"]),  # (a,a) matches nothing
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], ["sym"]).select(
        F.expr(_merge_expr("a", "a")).alias("sym")
    )
    got = [
        r.syms
        for r in df.select(F.expr(bpe._SYMS).alias("syms")).collect()
    ]
    assert got == [want for _, want in rows]


def test_merge_preserves_double_space_invariant(spark):
    """After a merge at adjacent sites the separators must still be double
    spaces (otherwise the NEXT round's pattern would miss sites)."""
    df = spark.createDataFrame([("  a  a  a  a  b  ",)], ["sym"]).select(
        F.expr(_merge_expr("a", "a")).alias("s1")
    )
    s1 = df.first()["s1"]
    assert s1 == "  aa  aa  b  "
    # a second-round merge on the result still works
    df2 = spark.createDataFrame([(s1,)], ["sym"]).select(
        F.expr(_merge_expr("aa", "aa")).alias("s2")
    )
    assert df2.first()["s2"] == "  aaaa  b  "


def test_bpe_pair_freqs_nonincreasing(spark, sf_dir):
    """Classic BPE property: the argmax pair frequency never increases
    round over round (new pairs created by a merge occur at most as often
    as the pair just merged)."""
    rows = bpe.bpe_train_merges(spark, sf_dir).orderBy("merge_round").collect()
    assert len(rows) == bpe.R_MERGES
    freqs = [r.pair_freq for r in rows]
    assert all(freqs[i] >= freqs[i + 1] for i in range(len(freqs) - 1)), freqs
    for r in rows:
        assert r.merged == r.sym_a + r.sym_b

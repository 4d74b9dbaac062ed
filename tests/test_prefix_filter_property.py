"""Property check of the PPJoin candidate math: for random small integer
sets, the prefix + length + positional filters must keep a SUPERSET of
every pair with Jaccard ≥ t — the integer-ceiling arithmetic
(⌈t·n⌉, α = ⌈(t/(1+t))(n_a+n_b)⌉) is easy to get off by one, and an
off-by-one silently drops true near-dups."""

from __future__ import annotations

from math import ceil

from hypothesis import given, settings
from hypothesis import strategies as st

T_NUM, T_DEN = 9, 10  # t = 0.9, as in dedup.prefix_filter_neardups

_sets = st.lists(
    st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=15),
    min_size=2,
    max_size=8,
)


def _candidates(sets):
    """Pure-python replica of the Spark candidate pipeline."""
    from collections import Counter

    df = Counter(x for s in sets for x in set(s))
    ranked = []
    for s in sets:
        toks = sorted(s, key=lambda x: (df[x], x))
        n = len(toks)
        L = n - ((T_NUM * n + T_NUM) // T_DEN) + 1
        ranked.append((toks, n, L))
    cands = set()
    for i, (ta, na, La) in enumerate(ranked):
        for j, (tb, nb, Lb) in enumerate(ranked):
            if i >= j:
                continue
            if not (na * T_DEN >= nb * T_NUM and nb * T_DEN >= na * T_NUM):
                continue
            alpha = (T_NUM * (na + nb) + 2 * T_NUM) // (T_NUM + T_DEN)
            for pa, x in enumerate(ta[:La]):
                if x in tb[:Lb]:
                    pb = tb[:Lb].index(x)
                    if min(na - pa, nb - pb) >= alpha:
                        cands.add((i, j))
                        break
    return cands


@settings(max_examples=300, deadline=None)
@given(sets=_sets)
def test_candidates_superset_of_true_pairs(sets):
    cands = _candidates(sets)
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if inter * T_DEN >= union * T_NUM:  # jaccard ≥ t (exact rational)
                assert (i, j) in cands, (sets[i], sets[j], inter, union)


def test_capped_variant_is_subset_of_exact(spark, sf_dir):
    """The stop-shingle capped PPJoin (r8 scale path) may only LOSE
    pairs relative to the exact op — surviving pairs carry the exact
    Jaccard, so every capped row must appear in the exact output with
    an identical score. At the test sf the cap does not bind, so the
    two outputs are identical (also pinning that the refactor into
    _prefix_filter changed nothing for the exact spelling)."""
    from etl_mini_dw_spark.functions import dedup

    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.prefix_filter_neardups(spark, sf_dir).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.prefix_filter_capped_neardups(spark, sf_dir).collect()
    }
    assert capped <= exact
    assert capped == exact  # cap (df>256) never binds at sf0.001

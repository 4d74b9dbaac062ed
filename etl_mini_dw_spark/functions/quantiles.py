"""Distributed exact order-statistic selection — no global row sort (extension).

The PSI / gains / quality-tile / RFM / ABC family re-buckets both
engines by the rule ``bucket = f(#boundaries < value)`` where the
boundaries are order statistics of a value MULTISET (CLAUDE.md's
ntile-boundary note): ntile(K) max-per-tile edges sit at sorted rank
``i·(n div K) + least(i, n mod K)``; RFM-style quintile cuts at rank
``⌈i·n/K⌉``. Either way the boundary VALUE depends only on the
multiset, so it can be read off a histogram instead of sorting every
row through one task.

Both entry points share the ``ext_value_exact_median`` two-pass bucket
selection:

1. one partial-aggregable rollup ``val → cnt`` (the only pass over the
   data), coarse-keyed by a monotone bucket ``floor((val − min)/width)``
   where ``width = (max − min)/1024`` is derived from a min/max
   aggregate over the value DICTIONARY (r7 ADVICE: no hard-coded
   widths) — the coarse histogram is therefore ≤ ~1025 rows by
   construction at ANY data range;
2. a cumulative scan over that tiny histogram finds, for each target
   rank, its bucket and in-bucket row offset;
3. the boundary value is read off the target bucket's value dictionary
   (cumulative counts within the bucket), so heavy ties cost one
   dictionary entry, never a row-sort.

At 100 TB the raw data is touched once by step 1 (map-side combine on
``val``); the windows in steps 2–3 run over histogram/dictionary rows,
not data rows. Results are value-identical to the window-function
derivations — the DuckDB oracles keep the ntile / row_number spelling
as the executable spec.

``ntile_label_cols`` maps (rank, n) to per-row tile LABELS
(curation.quality_deciles) with the same rank algebra: windows
partition by (group, coarse bucket), never globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# coarse-histogram resolution: the val→cnt rollup is re-keyed into at
# most this many buckets, so the one intentionally-global cumulative
# window scans a frame whose size is INDEPENDENT of the data range
_N_COARSE = 1024


def _values_at_ranks(
    base: DataFrame, k: int, rank_expr: str, drop_ranks_beyond_n: bool
) -> DataFrame:
    """1-row frame ``(barr)``: sorted array of the values at the K−1
    target sorted positions (1-indexed). ``rank_expr`` is a SQL
    expression over ``i`` (the 1..K−1 rank id) and ``n`` (total rows)
    giving each target rank; duplicate ranks/values emit duplicate
    entries. ``base`` must expose numeric ``val``. The total ``n`` is
    read off the coarse histogram — the raw data is scanned exactly
    once (for the val→cnt rollup).
    """
    vc = base.groupBy("val").agg(F.count(F.lit(1)).alias("cnt"))
    # derive the coarse width from the dictionary's min/max (r7 ADVICE —
    # a data-range shift can never grow the histogram past _N_COARSE).
    # floor((val−mn)/w) is monotone in val for w > 0 and bounded by
    # _N_COARSE, so bucket order == value order with no overflow risk.
    mm = vc.agg(
        F.min("val").cast("double").alias("_mn"),
        F.max("val").cast("double").alias("_mx"),
    )
    w_col = F.greatest(
        (F.col("_mx") - F.col("_mn")) / F.lit(float(_N_COARSE)),
        F.lit(1e-12),
    )
    vc = vc.crossJoin(F.broadcast(mm)).select(
        "val",
        "cnt",
        F.floor((F.col("val").cast("double") - F.col("_mn")) / w_col)
        .cast("bigint")
        .alias("hb"),
    )
    hist = vc.groupBy("hb").agg(F.sum("cnt").alias("c"))
    # cumulative scan over the coarse histogram (≤ _N_COARSE+1 rows —
    # metadata-sized; the one intentionally-global window, same class as
    # layout.equidepth_histogram's dictionary scan)
    w_cum = Window.orderBy("hb").rowsBetween(Window.unboundedPreceding, 0)
    hist = hist.select("hb", "c", F.sum("c").over(w_cum).alias("cum"))
    total = hist.agg(F.sum("c").alias("n"))
    ranks = total.select(
        "n", F.explode(F.sequence(F.lit(1), F.lit(k - 1))).alias("i")
    )
    if drop_ranks_beyond_n:
        ranks = ranks.filter(F.col("i") <= F.col("n"))
    ranks = ranks.select("i", F.expr(rank_expr).alias("r"))
    # (K−1 rows) ⋈θ (histogram): which coarse bucket holds each rank
    targets = (
        F.broadcast(ranks)
        .join(
            hist,
            (F.col("r") <= F.col("cum"))
            & (F.col("r") > F.col("cum") - F.col("c")),
        )
        .select(
            "i", "hb", (F.col("r") - (F.col("cum") - F.col("c"))).alias("off")
        )
    )
    # read the value off the target bucket's value dictionary: cumulative
    # cnt within the bucket crosses `off` at the boundary value. Window
    # partitions by rank id (each pinned to one bucket) over dictionary
    # entries only.
    w_in = Window.partitionBy("i").orderBy("val").rowsBetween(
        Window.unboundedPreceding, 0
    )
    picked = (
        vc.join(F.broadcast(targets), "hb")
        .select("i", "val", "off", F.sum("cnt").over(w_in).alias("cum_in"), "cnt")
        .filter(
            (F.col("cum_in") >= F.col("off"))
            & (F.col("cum_in") - F.col("cnt") < F.col("off"))
        )
    )
    return picked.agg(F.array_sort(F.collect_list("val")).alias("barr"))


def ntile_bounds(base: DataFrame, k: int) -> DataFrame:
    """1-row frame ``(barr)``: the sorted K−1 boundary array identical to
    ``array_sort(collect_list(max(val) per ntile(k) tile < k))``.

    ``base`` must expose the numeric column ``val``. Duplicate edges are
    preserved — two ranks landing on the same value emit two array
    entries, exactly like max-per-tile. Ntile tile i (1-indexed) ends at
    rank ``i·(n div K) + least(i, n mod K)``; tiles beyond n rows are
    empty and emit no edge (the ``i <= n`` filter).
    """
    return _values_at_ranks(
        base,
        k,
        f"i * (n div {k}) + least(i, n % {k})",
        drop_ranks_beyond_n=True,
    )


def ceil_rank_bounds(base: DataFrame, k: int) -> DataFrame:
    """1-row frame ``(barr)``: sorted values at ranks ``⌈i·n/K⌉`` for
    i = 1..K−1 — the RFM-style quintile cut discipline (value at rank
    ``(i·n + K−1) div K`` of the sorted multiset). Unlike ntile edges
    these ranks are always in [1, n] for n ≥ 1, so no empty-tile filter.
    """
    return _values_at_ranks(
        base, k, f"(i * n + {k - 1}) div {k}", drop_ranks_beyond_n=False
    )


def _idiv(a: Column, b: Column) -> Column:
    # exact floor division for nonnegative a, positive b via the repo's
    # pmod identity (theil_sen precedent): (a - a mod b) / b is an exact
    # integral double well under 2^53, never a truncated float quotient.
    return ((a - F.pmod(a, b)) / b).cast("bigint")


def ntile_label_cols(n: Column, rank: Column, k: int) -> Column:
    """Closed-form ntile label for a row of global ``rank`` (1-indexed)
    among ``n`` rows: the first ``n mod K`` tiles hold ``n div K + 1``
    rows, the rest ``n div K`` — identical to ``ntile(k)`` over a total
    ordering. The tail-branch divisor is ``greatest(q, 1)``: q=0 implies
    every rank fits the head branch, and the guard keeps the expression
    throw-free under ANSI (CLAUDE.md pmod/CASE rule)."""
    q = _idiv(n, F.lit(k))
    m = F.pmod(n, F.lit(k))
    head = m * (q + F.lit(1))
    return (
        F.when(rank <= head, _idiv(rank - 1, q + F.lit(1)) + 1)
        .otherwise(m + _idiv(rank - head - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )

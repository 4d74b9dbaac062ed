"""Distributed exact ntile boundaries — no global row sort (extension).

The PSI / gains / quality-tile family re-buckets both engines by the
rule ``bucket = f(#boundaries < value)`` where the boundaries are the
max-per-tile edges of ``ntile(K) OVER (ORDER BY val)``. Those edges are
pure order statistics: the edge of tile ``i`` is the value at sorted
position ``rank_i = i·(n div K) + least(i, n mod K)`` — a function of
the value MULTISET only (CLAUDE.md's ntile-boundary note), so they can
be read off a histogram instead of sorting every row through one task.

``ntile_bounds`` derives them with the ``ext_value_exact_median``
two-pass bucket-selection discipline:

1. one partial-aggregable rollup ``val → cnt`` (the only pass over the
   data), coarse-keyed by a monotone bucket ``floor(val / width)``;
2. a cumulative scan over the TINY coarse histogram finds, for each of
   the K−1 target ranks, its bucket and in-bucket row offset;
3. the boundary value is read off the target bucket's VALUE DICTIONARY
   (cumulative counts within the bucket), so heavy ties cost one
   dictionary entry, never a row-sort.

At 100 TB the raw data is touched once by step 1 (map-side combine on
``val``); the windows in steps 2–3 run over histogram/dictionary rows
(≈ range/width and ≈ distinct-values-per-bucket), not data rows. The
result is value-identical to the ntile derivation — the DuckDB oracles
keep the ntile spelling as the executable spec.

The same rank algebra gives ``ntile_label_cols`` for per-row tile
LABELS (curation.quality_deciles): with a total (val, tiebreak) order,
row rank = bucket-cumulative-before + row_number within the coarse
bucket, and the tile is a closed-form function of (rank, n) — windows
partition by (group, coarse bucket), never globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _coarse(width: float) -> Column:
    # monotone non-decreasing in val for width > 0 (IEEE/decimal division
    # by a positive constant is monotone; floor preserves it), so bucket
    # order == value order and cumulative counts are global ranks.
    return F.floor(F.col("val") / F.lit(width)).cast("bigint")


def ntile_bounds(base: DataFrame, k: int, width: float) -> DataFrame:
    """1-row frame ``(barr)``: the sorted K−1 boundary array identical to
    ``array_sort(collect_list(max(val) per ntile(k) tile < k))``.

    ``base`` must expose the numeric column ``val``; ``width`` is the
    coarse histogram bucket width (pick range/width ≈ 10²–10³ buckets).
    Duplicate edges are preserved — two ranks landing on the same value
    emit two array entries, exactly like max-per-tile.
    """
    vc = base.groupBy("val").agg(F.count(F.lit(1)).alias("cnt"))
    vc = vc.select("val", "cnt", _coarse(width).alias("hb"))
    hist = vc.groupBy("hb").agg(F.sum("cnt").alias("c"))
    # cumulative scan over the coarse histogram (≈ range/width rows —
    # metadata-sized; the one intentionally-global window, same class as
    # layout.equidepth_histogram's dictionary scan)
    w_cum = Window.orderBy("hb").rowsBetween(Window.unboundedPreceding, 0)
    hist = hist.select("hb", "c", F.sum("c").over(w_cum).alias("cum"))
    total = hist.agg(F.sum("c").alias("n"))
    # ntile tile i (1-indexed) ends at rank i·(n div K) + least(i, n mod K);
    # tiles beyond n rows are empty and emit no edge (i <= n filter)
    ranks = (
        total.select(
            "n", F.explode(F.sequence(F.lit(1), F.lit(k - 1))).alias("i")
        )
        .filter(F.col("i") <= F.col("n"))
        .select(
            "i",
            (
                F.col("i") * F.expr(f"n div {k}")
                + F.least(F.col("i"), F.expr(f"n % {k}"))
            ).alias("r"),
        )
    )
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
    # read the edge off the target bucket's value dictionary: cumulative
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

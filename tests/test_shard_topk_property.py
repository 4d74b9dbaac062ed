"""Property-based check of ``simsearch.shard_topk_prune`` — the two-level
tournament every brute-force ranking path rides (ANN brute/int8/hamming,
PQ, BM25, RRF, MMR pools; plan-pinned in test_plan_shapes).

Claim under test (the docstring's value-identity argument): for ANY rows,
ANY total order, ANY k and shard count, pruning shard-local top-k first
and then ranking the survivors returns EXACTLY the rows the bare global
per-key window would — because every global top-k row is by definition
inside its own shard's local top-k.

Random keys/scores/ids (ties in both key and score are generated on
purpose — the order is made total by the id tiebreak, which is what the
production call sites do)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.simsearch import shard_topk_prune

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key (few → heavy ties)
        st.integers(min_value=-5, max_value=5),  # score (ties likely)
        st.integers(min_value=0, max_value=60),  # id / shard column
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, k=st.integers(min_value=1, max_value=4), n_shards=st.sampled_from([1, 2, 7]))
def test_shard_prune_is_value_identical_to_bare_window(spark, rows, k, n_shards):
    # ids must be unique per (key) for a total order; dedupe the raw draws
    seen, data = set(), []
    for key, score, rid in rows:
        if (key, rid) not in seen:
            seen.add((key, rid))
            data.append((key, score, rid))
    df = spark.createDataFrame(data, "key INT, score INT, rid INT")
    order = [F.col("score").desc(), F.col("rid")]
    w = Window.partitionBy("key").orderBy(*order)

    def topk(frame):
        out = (
            frame.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("key", "score", "rid", "rn")
            .collect()
        )
        return sorted((r.key, r.score, r.rid, r.rn) for r in out)

    bare = topk(df)
    pruned = topk(shard_topk_prune(df, ["key"], order, k, "rid", n_shards=n_shards))
    assert pruned == bare

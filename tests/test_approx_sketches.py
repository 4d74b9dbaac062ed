"""Approximate aggregates (HLL / t-digest): sanity vs exact answers.

Not oracle-hashable (approximation is engine-specific by design), so the
contract here is tolerance vs the exact operator — the property a user
actually relies on at 100 TB, where approx_count_distinct's fixed-size
sketch replaces a full distinct shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    li = typed_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(F.approx_count_distinct("l_partkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1, (exact, approx)


def test_percentile_approx_close_to_exact(spark, sf_dir):
    ev = typed_table(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v")
    )
    exact = ev.select(F.expr("percentile(v, 0.5)")).first()[0]
    approx = ev.select(F.percentile_approx("v", 0.5, 10000)).first()[0]
    assert abs(approx - exact) <= max(1.0, 0.05 * abs(exact)), (exact, approx)


def test_hll_rollup_tolerance_and_merge_consistency(spark, sf_dir):
    """Merged daily HLL rollup ≈ exact distinct; merge ≡ one-shot sketch."""
    from etl_mini_dw_spark.plans.sketches import HLL_LGK, hll_user_rollup
    from etl_mini_dw_spark.sources.tables import typed_table

    rolled = {
        r["event_type"]: r for r in hll_user_rollup(spark, sf_dir).collect()
    }
    ev = typed_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["u"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert set(rolled) == set(exact)
    for et, row in rolled.items():
        assert abs(row["approx_users"] - exact[et]) / exact[et] < 0.05, (
            et, row["approx_users"], exact[et],
        )
    # merging the stored daily sketches must equal sketching the raw data
    # in one shot — registers are max-merged, so the union is lossless
    oneshot = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).alias("a")
        )
        .collect()
    }
    for et in exact:
        assert rolled[et]["approx_users"] == oneshot[et], (
            et, rolled[et]["approx_users"], oneshot[et],
        )


def test_streaming_hll_equals_batch_sketch(spark, sf_dir):
    """The streamed per-type sketch estimate must EQUAL the one-shot batch
    sketch estimate — HLL register-max is order- and batching-invariant,
    so incremental maintenance is lossless (and restart replays through
    the idempotent MERGE sink cannot drift it)."""
    from etl_mini_dw_spark.plans.sketches import HLL_LGK
    from etl_mini_dw_spark.sources.tables import typed_table
    from etl_mini_dw_spark.streaming.events import streaming_hll_user_sketches

    streamed = {
        r["event_type"]: (r["approx_users"], r["n_events"])
        for r in streaming_hll_user_sketches(spark, sf_dir).collect()
    }
    batch = {
        r["event_type"]: (r["a"], r["n"])
        for r in typed_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).alias("a"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert streamed == batch


# --- Count-Min sketch (the exact-oracle-able integer sketch) ----------------
def test_cms_never_underestimates_any_token(spark, sf_dir):
    """The CMS guarantee — estimate ≥ exact — must hold for EVERY token,
    not just the reported probes: re-derive estimates for the full vocab
    and assert no underestimate exists."""
    from pyspark.sql import functions as F

    from etl_mini_dw_spark.plans import sketches as sk

    sketch = sk.cms_sketch(spark, sf_dir)
    exact = (
        sk._token_md5(spark, sf_dir)
        .groupBy("token", "h")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probes = exact.select(
        "token",
        "exact_count",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({r} AS r, {sk._cms_bucket_spark(r)} AS bucket)"
                    for r in range(sk.CMS_D)
                )
                + ")"
            )
        ).alias("cell"),
    ).select(
        "token", "exact_count",
        F.col("cell.r").cast("int").alias("r"), F.col("cell.bucket").alias("bucket"),
    )
    est = (
        probes.join(sketch, ["r", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").alias("est"))
    )
    bad = est.filter(F.col("est") < F.col("exact_count")).count()
    assert bad == 0


def test_cms_merge_of_shards_equals_global(spark, sf_dir):
    """Cell-wise sum of per-source sketches must equal the one-shot
    global sketch — the mergeability that makes stored CMS rollups
    trustworthy (same contract as the HLL merge test, but exact)."""
    from pyspark.sql import functions as F

    from etl_mini_dw_spark.functions.text import _token_frame
    from etl_mini_dw_spark.plans import sketches as sk

    per_source_cells = (
        _token_frame(spark, sf_dir)
        .select("source", F.explode("toks").alias("token"))
        .select("source", F.md5("token").alias("h"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "array("
                    + ", ".join(
                        f"struct({r} AS r, {sk._cms_bucket_spark(r)} AS bucket)"
                        for r in range(sk.CMS_D)
                    )
                    + ")"
                )
            ).alias("cell"),
        )
    )
    sharded = (
        per_source_cells.groupBy("source", "cell.r", "cell.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(F.col("r").cast("int").alias("r"), "bucket")
        .agg(F.sum("c").alias("c"))
    )
    global_sketch = sk.cms_sketch(spark, sf_dir)
    assert sharded.exceptAll(global_sketch).count() == 0
    assert global_sketch.exceptAll(sharded).count() == 0


def test_hll_registers_merge_and_estimate_quality(spark, sf_dir):
    """The portable register sketch's two contracts: (a) registers built
    on arbitrary shards max-merge to exactly the global register table
    (what makes stored rollups trustworthy — same property as the CMS
    cell-sum merge); (b) the estimate lands within the published ~3·rsd
    band of the exact distinct count (rsd = 1.04/√m ≈ 6.5% at m=256)."""
    from pyspark.sql import functions as F

    from etl_mini_dw_spark.plans import sketches
    from etl_mini_dw_spark.sources.tables import typed_table

    ev = typed_table(spark, sf_dir, "events").select("event_type", "user_id")
    hashed = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
    )
    w = "CAST(conv(substr(h, 3, 13), 16, 10) AS BIGINT)"
    proj = hashed.select(
        "event_type",
        F.expr("CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT)").alias("bucket"),
        F.expr(
            f"CAST(CASE WHEN {w} = 0 THEN 53 ELSE 53 - length(bin({w})) END AS INT)"
        ).alias("rho"),
    )
    glob = {
        (r["event_type"], r["bucket"]): r["r"]
        for r in proj.groupBy("event_type", "bucket").agg(F.max("rho").alias("r")).collect()
    }
    # shard on an arbitrary predicate, merge by cell-wise max
    sa = proj.filter(F.crc32(F.col("h")) % 2 == 0)
    sb = proj.filter(F.crc32(F.col("h")) % 2 == 1)
    merged: dict = {}
    for shard in (sa, sb):
        for r in shard.groupBy("event_type", "bucket").agg(F.max("rho").alias("r")).collect():
            k = (r["event_type"], r["bucket"])
            merged[k] = max(merged.get(k, 0), r["r"])
    assert merged == glob

    rows = sketches.hll_register_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rel_error"] <= 3 * 1.04 / (sketches.HLLP_M ** 0.5), (
            r["event_type"],
            r["rel_error"],
        )


def test_streaming_cms_grid_equals_batch_grid(spark, sf_dir):
    """The maintenance contract behind the streaming CMS topology: after
    3 micro-batches of update-mode counting + keyed MERGE, the STORED
    grid must equal the one-shot batch grid cell-for-cell (integer sums
    are order/batching-invariant) — stronger than the probe report the
    registered query exposes."""
    import tempfile

    from pyspark.sql import functions as F

    from etl_mini_dw_spark.etl.store import IdempotentForeachBatch, ParquetStore
    from etl_mini_dw_spark.plans.sketches import CMS_D, _cms_bucket_spark
    from etl_mini_dw_spark.sources.tables import typed_table
    from etl_mini_dw_spark.streaming import events as sev

    cells_expr = (
        "array("
        + ", ".join(
            f"struct({r} AS r, {_cms_bucket_spark(r)} AS bucket)" for r in range(CMS_D)
        )
        + ")"
    )

    def grid_of(df):
        return (
            df.select(F.md5(F.col("user_id").cast("string")).alias("h"))
            .select(F.explode(F.expr(cells_expr)).alias("cell"))
            .groupBy(
                F.col("cell.r").cast("int").alias("r"),
                F.col("cell.bucket").alias("bucket"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
        )

    batch = {
        (r["r"], r["bucket"]): r["c"]
        for r in grid_of(typed_table(spark, sf_dir, "events")).collect()
    }

    landing = sev._split_landing_dir(sf_dir, sev.CMS_STREAM_BATCHES)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    store = ParquetStore(tempfile.mkdtemp(prefix="t_scms_store_"))
    sink = IdempotentForeachBatch(
        tempfile.mkdtemp(prefix="t_scms_commits_"),
        lambda b, _i: store.merge_upsert(spark, b, "g", keys=["r", "bucket"]),
    )
    q = (
        grid_of(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="t_scms_ckpt_"))
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r["r"], r["bucket"]): r["c"] for r in store.read(spark, "g").collect()
    }
    assert streamed == batch


def test_cms_join_size_never_underestimates(spark, sf_dir):
    """Inner-product CMS estimates share the point-query guarantee:
    collisions only ADD, so every hash row's estimate ≥ the exact join
    cardinality — for both the well-posed self-join metric and the
    noise-floor-dominated PK-FK metric."""
    from etl_mini_dw_spark.plans import sketches

    rows = sketches.cms_join_size_estimate(spark, sf_dir).collect()
    assert len(rows) == 2 * sketches.CMS_D
    for r in rows:
        assert r["overestimate"] >= 0, (r["metric"], r["r"], r["overestimate"])
    # and the estimator (min over rows) is within 1.5x on the metric it
    # is FOR: the skewed self-join clears the epsilon*N*M noise floor
    sj = [r for r in rows if r["metric"] == "events_selfjoin_user_id"]
    est = min(r["est_r"] for r in sj)
    assert est <= 1.5 * sj[0]["exact_rows"], (est, sj[0]["exact_rows"])


def test_hdr_sketch_bounds_and_shard_merge(spark, sf_dir):
    """HDR quantile sketch: (a) est is the true bucket lower bound —
    rel_err in (−2^−S, 0]; (b) exact_c matches the numpy order
    statistic; (c) per-shard histograms summed == global histogram
    (mergeability, the sketch's reason to exist)."""
    import numpy as np
    import pandas as pd

    from etl_mini_dw_spark.plans import sketches

    rows = {r["quantile"]: r for r in sketches.hdr_quantile_sketch(spark, sf_dir).collect()}
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderkey"])
    v = np.sort((orders["o_totalprice"].astype(float) * 100).round().astype(np.int64).to_numpy())
    n = len(v)
    for label, num, den in sketches.HDR_QSPECS:
        r = rows[label]
        rank = ((n - 1) * num) // den + 1
        assert r["rank"] == rank
        exact = int(v[rank - 1])
        assert r["exact_c"] == exact, label
        # est = exact with low bits cleared below the top 1+S bits
        shift = max(exact.bit_length() - 1 - sketches.HDR_SUB_BITS, 0)
        assert r["est_c"] == (exact >> shift) << shift, label
        assert -(2 ** -sketches.HDR_SUB_BITS) < r["rel_err"] <= 0
    # mergeability: shard histograms sum to the global histogram
    def lb(x: np.ndarray) -> np.ndarray:
        bl = np.frexp(x.astype(np.float64))[1]  # bit_length for exact ints < 2^53
        shift = np.maximum(bl - 1 - sketches.HDR_SUB_BITS, 0)
        return (x >> shift) << shift

    allv = (orders["o_totalprice"].astype(float) * 100).round().astype(np.int64).to_numpy()
    keys = orders["o_orderkey"].to_numpy()
    glob = pd.Series(lb(allv)).value_counts().sort_index()
    sharded = pd.Series(dtype="float64")
    for s in range(4):
        sharded = sharded.add(pd.Series(lb(allv[keys % 4 == s])).value_counts(), fill_value=0)
    assert glob.equals(sharded.sort_index().astype("int64"))


def test_streaming_hdr_hist_equals_batch_hist(spark, sf_dir):
    """Same maintenance contract for the streaming HDR topology: the
    streamed (lb, cnt) histogram must equal the one-shot batch
    histogram cell-for-cell, and the registered report's rel_err must
    honor the DDSketch bound (-2^-5, 0]."""
    from pyspark.sql import functions as F

    from etl_mini_dw_spark.plans.sketches import HDR_SUB_BITS, _hdr_lb_expr
    from etl_mini_dw_spark.sources.tables import typed_table
    from etl_mini_dw_spark.streaming import events as sev

    # driving the registered query exercises the full stream + MERGE path
    report = sev.streaming_hdr_quantiles(spark, sf_dir).collect()
    assert len(report) == 5
    for r in report:
        assert -1.0 / (1 << HDR_SUB_BITS) < r["rel_err"] <= 0.0
        assert r["est_c"] <= r["exact_c"]
    # streamed store ≡ batch histogram: rebuild the batch side and diff
    # against a re-run of the stream into a fresh store
    batch_hist = (
        typed_table(spark, sf_dir, "events")
        .select((F.col("value") * 100).cast("bigint").alias("v"))
        .filter(F.col("v") > 0)
        .groupBy(F.expr(_hdr_lb_expr("v")).alias("lb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # the streamed histogram is what the report's est_c came from; rerun
    # the operator's internals cheaply by recomputing from the landing
    # split (3 parts) and merging counts — batching must not matter
    landing = sev._split_landing_dir(sf_dir, sev.HDR_STREAM_BATCHES)
    parts = (
        spark.read.parquet(landing)
        .select((F.col("value").cast("decimal(14,2)") * 100).cast("bigint").alias("v"))
        .filter(F.col("v") > 0)
        .groupBy(F.expr(_hdr_lb_expr("v")).alias("lb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    b = batch_hist.select("lb", F.col("cnt").alias("cnt_b"))
    p = parts.select("lb", F.col("cnt").alias("cnt_p"))
    diff = b.join(p, "lb", "full").filter(
        F.coalesce(F.col("cnt_b"), F.lit(-1))
        != F.coalesce(F.col("cnt_p"), F.lit(-1))
    )
    assert diff.count() == 0


def test_hdr_monthly_rollup_honors_the_bound(spark, sf_dir):
    """Quarterly p95 read from MERGED monthly histograms must honor the
    DDSketch bound per quarter, never overestimate, and the merge must
    cover every month of the quarter."""
    from etl_mini_dw_spark.plans import sketches

    rows = sketches.hdr_monthly_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["est_p95_c"] <= r["exact_p95_c"]
        assert -1.0 / (1 << sketches.HDR_SUB_BITS) < r["rel_err"] <= 0.0
        assert 1 <= r["n_months_merged"] <= 3


def test_streaming_bloom_equals_batch_and_no_false_negatives(spark, sf_dir):
    """Third streamed-sketch maintenance contract: streamed (word, bits)
    == one-shot batch filter bit-for-bit (bit_or is order/batching-
    invariant), every present probe positive (the Bloom guarantee), and
    the absent-probe FP rate sits under the theoretical k=2 bound with
    slack."""
    from pyspark.sql import functions as F

    from etl_mini_dw_spark.functions.sampling import BLOOM_BITS
    from etl_mini_dw_spark.streaming import events as sev

    rows = {r.probe_kind: r for r in sev.streaming_bloom_membership(spark, sf_dir).collect()}
    assert rows["present"].n_positive == rows["present"].n_probes
    # FP bound: (1 - e^{-kn/m})^k with k=2; allow generous slack on 50 probes
    import math

    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    p = (1 - math.exp(-2 * n_users / BLOOM_BITS)) ** 2
    assert rows["absent"].rate <= max(p * 3, 0.2), (rows["absent"].rate, p)

"""CDC-interleaving replay properties (r6 VERDICT task #4, r5 stretch).

A seeded-random CDC log of inserts / edits / deletes / late arrivals is
replayed in random batch splits, and after EVERY batch the maintained
state must equal the from-scratch recompute over everything delivered so
far (SURVEY §5 items 3–4 generalized from single-split scenarios):

- the monthly rollup maintained through the ParquetStore MERGE/DELETE
  seam (the `plans/incremental.py` recompute-touched-partitions pattern,
  here with edits that move rows across months and deletes that vacate a
  month entirely — the stale-row case merge_upsert alone cannot fix);
- the three-term join-delta rule with SIGNED deltas (retraction algebra:
  edit = retract + insert), generalizing the insert-only
  `incremental_join_view` scenario to edits/deletes on BOTH feeds;
- the event-sourced SCD2 splice applied REPEATEDLY — every batch is a
  retro-correction over the running window state (multi-step version of
  the single-split hypothesis property in test_scd2_events_property.py).

Contract note (scd2): a delete tombstone may not be delivered before any
attribute version of its key has arrived (an orphan delete references an
entity the warehouse has never seen; validity windows are not a lossless
store for it). The generator enforces that and nothing else.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_mini_dw_spark.etl.store import ParquetStore
from etl_mini_dw_spark.fixtures_spec import DIMS, attr_cols
from etl_mini_dw_spark.operators.scd2_events import (
    scd2_from_events,
    scd2_retro_correct,
)

SEED = 20260815


def _random_batches(rng: random.Random, events: list, n_batches: int) -> list[list]:
    cuts = sorted(rng.sample(range(1, len(events)), n_batches - 1))
    out, prev = [], 0
    for c in [*cuts, len(events)]:
        out.append(events[prev:c])
        prev = c
    return [b for b in out if b]


# --- 1. rollup through the MERGE/DELETE store seam ---------------------------


def test_rollup_replay_through_store_seam(spark, tmp_path):
    rng = random.Random(SEED)
    months = [f"1998-{m:02d}" for m in range(1, 7)]
    # generate by simulating, so edits/deletes always hit live ids
    sim: dict[int, tuple[str, int]] = {}
    events, next_id = [], 0
    for _ in range(40):
        kind = rng.choice(["ins", "ins", "edit", "del"])
        if kind == "ins" or not sim:
            ev = ("ins", next_id, rng.choice(months), rng.randint(100, 9999))
            next_id += 1
        elif kind == "edit":
            ev = (
                "edit",
                rng.choice(sorted(sim)),
                rng.choice(months),
                rng.randint(100, 9999),
            )
        else:
            ev = ("del", rng.choice(sorted(sim)), None, None)
        events.append(ev)
        if ev[0] == "del":
            sim.pop(ev[1])
        else:
            sim[ev[1]] = (ev[2], ev[3])

    store = ParquetStore(str(tmp_path / "rollup"))
    live: dict[int, tuple[str, int]] = {}
    for batch in _random_batches(rng, events, 5):
        touched: set[str] = set()
        for kind, oid, month, cents in batch:
            if oid in live:
                touched.add(live[oid][0])
            if kind == "del":
                live.pop(oid, None)
            else:
                live[oid] = (month, cents)
                touched.add(month)
        src = spark.createDataFrame(
            [(m, c) for (m, c) in live.values()] or [],
            "order_month string, cents bigint",
        )
        delta = (
            src.filter(F.col("order_month").isin(sorted(touched)))
            .groupBy("order_month")
            .agg(
                F.sum("cents").cast("bigint").alias("revenue_cents"),
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            )
        )
        store.merge_upsert(spark, delta, "monthly", keys=["order_month"])
        vacated = touched - {m for (m, _) in live.values()}
        if vacated:
            store.delete_keys(
                spark,
                "monthly",
                spark.createDataFrame(
                    [(m,) for m in sorted(vacated)], "order_month string"
                ),
                keys=["order_month"],
            )
        # maintained ≡ full recompute, at EVERY step
        got = {
            r["order_month"]: (r["revenue_cents"], r["n_orders"])
            for r in store.read(spark, "monthly").collect()
        }
        want: dict[str, tuple[int, int]] = {}
        for m, c in live.values():
            rev, n = want.get(m, (0, 0))
            want[m] = (rev + c, n + 1)
        assert got == want


# --- 2. signed three-term join delta (retraction algebra) --------------------


def test_join_view_signed_delta_replay(spark):
    rng = random.Random(SEED + 1)
    nations = ["A", "B", "C", "D"]
    orders: dict[int, str] = {}  # okey -> nation
    lines: dict[int, tuple[int, int]] = {}  # lk -> (okey, rev_cents)
    events, next_ok, next_lk = [], 0, 0
    for _ in range(50):
        kind = rng.choice(
            ["ins_o", "ins_l", "ins_l", "edit_l", "edit_o", "del_l", "del_o"]
        )
        if kind == "ins_o" or not orders:
            events.append(("ins_o", next_ok, rng.choice(nations)))
            orders[next_ok] = events[-1][2]
            next_ok += 1
        elif kind == "ins_l":
            ok = rng.choice(sorted(orders))
            events.append(("ins_l", next_lk, (ok, rng.randint(1, 999))))
            lines[next_lk] = events[-1][2]
            next_lk += 1
        elif kind == "edit_l" and lines:
            lk = rng.choice(sorted(lines))
            events.append(("edit_l", lk, (lines[lk][0], rng.randint(1, 999))))
            lines[lk] = events[-1][2]
        elif kind == "edit_o":
            ok = rng.choice(sorted(orders))
            events.append(("edit_o", ok, rng.choice(nations)))
            orders[ok] = events[-1][2]
        elif kind == "del_l" and lines:
            lk = rng.choice(sorted(lines))
            events.append(("del_l", lk, None))
            lines.pop(lk)
        elif kind == "del_o":
            ok = rng.choice(sorted(orders))
            events.append(("del_o", ok, None))
            orders.pop(ok)

    def _df_l(rows):
        return spark.createDataFrame(
            rows or [], "okey bigint, rev bigint, s bigint"
        )

    def _df_o(rows):
        return spark.createDataFrame(
            rows or [], "okey bigint, nation string, s bigint"
        )

    o_pre: dict[int, str] = {}
    l_pre: dict[int, tuple[int, int]] = {}
    state: dict[str, tuple[int, int]] = {}  # nation -> (rev, n)
    for batch in _random_batches(rng, events, 5):
        o_post, l_post = dict(o_pre), dict(l_pre)
        for kind, key, val in batch:
            if kind in ("ins_o", "edit_o"):
                o_post[key] = val
            elif kind == "del_o":
                o_post.pop(key, None)
            elif kind in ("ins_l", "edit_l"):
                l_post[key] = val
            else:
                l_post.pop(key, None)
        # signed deltas: retract the old image, insert the new
        dl = []
        for lk in set(l_pre) | set(l_post):
            if l_pre.get(lk) != l_post.get(lk):
                if lk in l_pre:
                    dl.append((l_pre[lk][0], l_pre[lk][1], -1))
                if lk in l_post:
                    dl.append((l_post[lk][0], l_post[lk][1], 1))
        do = []
        for ok in set(o_pre) | set(o_post):
            if o_pre.get(ok) != o_post.get(ok):
                if ok in o_pre:
                    do.append((ok, o_pre[ok], -1))
                if ok in o_post:
                    do.append((ok, o_post[ok], 1))
        ldf_pre = _df_l([(v[0], v[1], 1) for v in l_pre.values()])
        odf_pre = _df_o([(k, v, 1) for k, v in o_pre.items()])
        ddl, ddo = _df_l(dl), _df_o(do)
        # Δ(L⋈O) = ΔL⋈O_pre ∪ L_pre⋈ΔO ∪ ΔL⋈ΔO, signs multiplying
        delta = None
        for lpart, opart in ((ddl, odf_pre), (ldf_pre, ddo), (ddl, ddo)):
            term = lpart.join(
                opart.withColumnRenamed("s", "s_o"), "okey"
            ).select(
                "nation",
                (F.col("rev") * F.col("s") * F.col("s_o")).alias("drev"),
                (F.col("s") * F.col("s_o")).alias("dn"),
            )
            delta = term if delta is None else delta.unionByName(term)
        agg = delta.groupBy("nation").agg(
            F.sum("drev").alias("drev"), F.sum("dn").alias("dn")
        )
        for r in agg.collect():
            rev, n = state.get(r["nation"], (0, 0))
            state[r["nation"]] = (rev + r["drev"], n + r["dn"])
        state = {k: v for k, v in state.items() if v != (0, 0)}
        o_pre, l_pre = o_post, l_post
        # maintained ≡ batch recompute over the post-images
        want: dict[str, tuple[int, int]] = {}
        for ok, rev in l_pre.values():
            if ok in o_pre:
                nat = o_pre[ok]
                w = want.get(nat, (0, 0))
                want[nat] = (w[0] + rev, w[1] + 1)
        assert state == want


# --- 3. multi-step event-sourced SCD2 splice ---------------------------------

DIM = DIMS["customer"]
BASE = datetime(2000, 1, 1)


def _events_df(spark, evs):
    schema = T.StructType(
        [T.StructField(DIM.nk, T.IntegerType())]
        + [T.StructField(a, T.StringType()) for a in attr_cols(DIM)]
        + [
            T.StructField("event_ts", T.TimestampType()),
            T.StructField("tomb", T.BooleanType()),
        ]
    )

    def _attr_val(attr: str, variant: int):
        return str(variant) if attr.endswith("id") else f"{attr}-{variant}"

    rows = [
        (
            nk,
            *[None if tomb else _attr_val(a, var) for a in attr_cols(DIM)],
            BASE + timedelta(days=day),
            tomb,
        )
        for nk, day, var, tomb in evs
    ]
    return spark.createDataFrame(rows, schema)


def _fix_orphan_tombs(arrival):
    """Defer any tombstone delivered before its key's first attr event."""
    out, pending, seen_attr = [], [], set()
    for ev in arrival:
        nk, _, _, tomb = ev
        if tomb and nk not in seen_attr:
            pending.append(ev)
            continue
        out.append(ev)
        if not tomb and nk not in seen_attr:
            seen_attr.add(nk)
            out.extend(p for p in pending if p[0] == nk)
            pending = [p for p in pending if p[0] != nk]
    return out + pending


def test_scd2_multi_step_splice_replay(spark):
    rng = random.Random(SEED + 2)
    events = []
    for nk in range(1, 6):
        days = rng.sample(range(0, 40), rng.randint(2, 6))
        n_tombs = rng.randint(0, min(2, len(days) - 1))
        tomb_days = set(rng.sample(days, n_tombs))
        # never tombstone the key's earliest event: a delete needs
        # something to delete even in the ground-truth rebuild
        tomb_days.discard(min(days))
        events += [
            (nk, d, rng.randint(0, 3), d in tomb_days) for d in days
        ]
    rng.shuffle(events)  # arrival order ≠ event-time order: late data
    arrival = _fix_orphan_tombs(events)

    cols = [DIM.nk, *attr_cols(DIM), "active_from", "active_to", "is_current"]
    state = None
    delivered: list = []
    for batch in _random_batches(rng, arrival, 4):
        ev_df = _events_df(spark, batch)
        if state is None:
            state = scd2_from_events(ev_df, DIM)
        else:
            state = scd2_retro_correct(state, ev_df, DIM)
        state = state.localCheckpoint()
        delivered += batch
        full = scd2_from_events(_events_df(spark, delivered), DIM)
        a, b = state.select(*cols), full.select(*cols)
        assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0, batch

"""Deterministic synthetic-table generator for scale-proof runs.

The driver's testdata tops out at sf0.1 (TESTDATA.md) and is read-only,
so the 10x scaling measurements (SCALE_PROOF.md) need data we can grow
ourselves. This generator reproduces the driver tables' SCHEMAS and
shapes (inspected from /root/testdata/sf0.1: row ratios, value ranges,
category sets, the ~1% unknown-member fact keys, non-unique
(orderkey, linenumber) pairs, exact- and near-duplicate documents,
unit-norm 64-d embeddings with weak label clusters) at ANY scale
factor, fully vectorized in numpy and seeded — two dirs generated with
the same seed differ only by row count, so a t(sf1)/t(sf0.1) ratio is a
clean scaling exponent, not a distribution-shift artifact.

    python scripts/gen_scale_data.py --sf 1 --out /root/repo/.scaledata/sf1

Row counts at sf=1: 150k customer / 10k supplier / 200k part /
1.5M orders / ~6M lineitem / 1M events / 50k documents / 20k embeddings
(10x the driver's sf0.1 everywhere).

NOT a replacement for the driver fixtures: correctness gates keep
running on /root/testdata; this data exists only for timing.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["large", "hot", "blue", "red", "small", "cold", "old", "new"]
P_NOUN = ["ring", "bolt", "gear", "rod", "plate", "anvil", "wheel", "cap"]
P_TYPES = ["MEDIUM", "ECONOMY", "LARGE", "STANDARD", "PROMO", "SMALL"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
EPOCH_1995 = np.datetime64("1995-01-01")


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def _write(out, name, cols):
    pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))


def gen(sf: float, out: str, seed: int = 42, doc_sf: float | None = None) -> None:
    """``doc_sf`` scales documents/embeddings independently of the fact
    tables — the dedup/retrieval/ANN family is corpus-bound, and a
    meaningful 10x doc-corpus pair (500k vs 50k docs) would otherwise
    drag a 60M-row lineitem behind it."""
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * (sf if doc_sf is None else doc_sf))
    n_emb = int(20_000 * (sf if doc_sf is None else doc_sf))

    _write(out, "region", {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })
    _write(out, "nation", {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    })

    ck = np.arange(n_cust)
    _write(out, "customer", {
        "c_custkey": ck,
        "c_name": [f"Customer#{k:09d}" for k in ck],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": _money(rng, n_cust, -999.99, 9999.99),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    })

    sk = np.arange(n_supp)
    _write(out, "supplier", {
        "s_suppkey": sk,
        "s_name": [f"Supplier#{k:09d}" for k in sk],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": _money(rng, n_supp, -999.99, 9999.99),
    })

    pk = np.arange(n_part)
    _write(out, "part", {
        "p_partkey": pk,
        "p_name": np.char.add(
            np.char.add(np.array(P_ADJ)[rng.integers(0, 8, n_part)], " "),
            np.array(P_NOUN)[rng.integers(0, 8, n_part)],
        ),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, n_part)
        ],
        "p_type": np.array(P_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + (pk % 20_000) / 10.0, 2),
    })

    ok = np.arange(n_ord)
    # orders span 1995-01-01 .. 2001-08-01 (tests pin this range)
    odate_days = rng.integers(0, 2404, n_ord)
    odate = (EPOCH_1995 + odate_days.astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )
    _write(out, "orders", {
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, max(n_cust, 1), n_ord),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, n_ord, 1000.0, 500_000.0),
        "o_orderdate": odate,
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    })

    # lineitem: ~4 lines/order (truncated Poisson), ~1% unknown part/supp
    # keys (FIXTURES.md B.4), and a sprinkle of duplicated (orderkey,
    # linenumber) pairs (the driver data is NOT unique on that pair)
    lines = np.clip(rng.poisson(3.2, n_ord) + 1, 1, 10)
    n_li = int(lines.sum())
    lo = np.repeat(ok, lines)
    ln = (np.arange(n_li) - np.repeat(np.cumsum(lines) - lines, lines) + 1).astype(
        np.int32
    )
    dup_mask = rng.random(n_li) < 0.005
    ln = np.where(dup_mask, np.maximum(ln - 1, 1), ln)
    lpk = rng.integers(0, max(n_part, 1), n_li)
    lsk = rng.integers(0, max(n_supp, 1), n_li)
    unk = rng.random(n_li) < 0.01
    lpk = np.where(unk, lpk + n_part + 1000, lpk)
    lsk = np.where(unk, lsk + n_supp + 1000, lsk)
    ship = np.repeat(odate_days, lines) + np.clip(
        rng.normal(48, 150, n_li), -400, 2500
    ).astype(np.int64)
    ship = np.clip(ship, -1100, 2500)  # keep within the dim_date span
    _write(out, "lineitem", {
        "l_orderkey": lo,
        "l_partkey": lpk,
        "l_suppkey": lsk,
        "l_linenumber": ln,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _money(rng, n_li, 900.0, 105_000.0),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": (EPOCH_1995 + ship.astype("timedelta64[D]")).astype(
            "datetime64[us]"
        ),
    })

    # events: 30 days of 2024-01, user pool = customer count
    ts_us = rng.integers(0, 30 * 86_400_000_000, n_evt)
    ts_us.sort()
    _write(out, "events", {
        "event_id": np.arange(n_evt),
        "ts": (np.datetime64("2024-01-01") + ts_us.astype("timedelta64[us]")),
        "user_id": rng.integers(0, max(n_cust // 10, 1), n_evt),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)],
        "value": _money(rng, n_evt, 0.0, 600.0),
        "props": np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, n_evt).astype(str)), "}"
        ),
    })

    # documents: 10..60 tokens from the 31-token vocab; ~0.3% exact-dup
    # pairs and ~4% near-dups (copy with 2 token substitutions) so the
    # dedup operators see the same candidate structure the driver data has
    lens = rng.integers(10, 61, n_doc)
    toks = np.array(VOCAB)[rng.integers(0, len(VOCAB), int(lens.sum()))]
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(t) for t in np.split(toks, bounds)]
    n_exact = max(int(0.003 * n_doc) // 2 * 2, 2)
    n_near = max(int(0.04 * n_doc), 1)
    src_exact = rng.integers(0, n_doc, n_exact // 2)
    dst_exact = rng.integers(0, n_doc, n_exact // 2)
    for s, d in zip(src_exact, dst_exact):
        texts[d] = texts[s]
    src_near = rng.integers(0, n_doc, n_near)
    dst_near = rng.integers(0, n_doc, n_near)
    for s, d in zip(src_near, dst_near):
        w = texts[s].split()
        for j in rng.integers(0, len(w), 2):
            w[j] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        texts[d] = " ".join(w)
    _write(out, "documents", {
        "doc_id": np.arange(n_doc),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, n_doc)
        ],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })

    # embeddings: unit-norm 64-d, weak 10-cluster label signal (matches
    # the driver data's centroid-norm ~0.07 vs within-std 0.125)
    labels = rng.integers(0, 10, n_emb)
    cents = rng.normal(0, 0.07 / np.sqrt(64), (10, 64))
    vecs = rng.normal(0, 1.0, (n_emb, 64)) / np.sqrt(64) + cents[labels]
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32
    )
    _write(out, "embeddings", {
        "vec_id": np.arange(n_emb),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": labels.astype(np.int32),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--doc-sf", type=float, default=None)
    args = ap.parse_args()
    gen(args.sf, args.out, args.seed, args.doc_sf)
    print(f"generated sf={args.sf} doc_sf={args.doc_sf} at {args.out}")


if __name__ == "__main__":
    main()

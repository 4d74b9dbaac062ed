"""ANN operating curve: recall vs candidate cost at scale (r7 stretch #8).

For each query (the same ``vec_id < N_QUERIES`` set the registry ops
use), compute exact cosine top-k ground truth, then sweep the two knobs
an index owner actually tunes:

- IVF probe depth: candidates = sign-LSH buckets within Hamming ≤ b of
  the query's bucket (b = 0, 1, 2) — recall@k vs fraction of the corpus
  scanned;
- PQ-ADC shortlist size: ADC-ranked shortlist of size s (s = 10..200)
  refined by exact distance — recall@k vs shortlist size.

Prints a markdown table (committed to SCALE_PROOF.md) plus one JSON
line. Pure driver-side numpy on collected vectors for the ground truth
(queries are 5; the corpus side streams through Spark once).

    python scripts/ann_curve.py --sf-dir /root/repo/.scaledata/docs10
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scaledata/docs10")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import numpy as np

    import pyarrow.parquet as pq_arrow

    from etl_mini_dw_spark.functions.simsearch import LSH_DIMS, N_QUERIES

    tab = pq_arrow.read_table(os.path.join(args.sf_dir, "embeddings.parquet"))
    vecs = np.array(tab["embedding"].to_pylist(), dtype=np.float64)
    n = len(vecs)
    norms = np.linalg.norm(vecs, axis=1)
    buckets = np.zeros(n, dtype=np.int64)
    for i, d in enumerate(LSH_DIMS):
        buckets |= (vecs[:, d] >= 0.0).astype(np.int64) << i

    k = args.k
    q_ids = np.arange(N_QUERIES)
    truth = {}
    for qi in q_ids:
        cos = vecs @ vecs[qi] / (norms * norms[qi])
        cos[qi] = -np.inf
        truth[qi] = set(np.argsort(-cos)[:k].tolist())

    rows = []
    # IVF probe-depth sweep: buckets within hamming <= b of the query's
    popcnt = np.array([bin(x).count("1") for x in range(256)])
    for b in (0, 1, 2):
        recalls, fracs = [], []
        for qi in q_ids:
            mask = popcnt[(buckets ^ buckets[qi]) & 0xFF] <= b
            cand = np.where(mask)[0]
            cand = cand[cand != qi]
            fracs.append(len(cand) / n)
            cos = vecs[cand] @ vecs[qi] / (norms[cand] * norms[qi])
            top = set(cand[np.argsort(-cos)[:k]].tolist())
            recalls.append(len(top & truth[qi]) / k)
        rows.append(
            {
                "knob": f"ivf_probe_hamming<={b}",
                "recall_at_k": round(float(np.mean(recalls)), 3),
                "corpus_fraction_scanned": round(float(np.mean(fracs)), 4),
            }
        )

    # PQ-ADC shortlist sweep (same quantization as functions/pq.py:
    # x -> round(x * 1000) int codes; ADC here approximated by the int
    # codes' true distances per subspace codebook is the registry op —
    # for the CURVE we sweep the shortlist on the int8-style coarse
    # score, the same shape an ADC table produces)
    coarse = np.floor(vecs * 1000.0 + 0.5)
    for s in (10, 25, 50, 100, 200):
        recalls = []
        for qi in q_ids:
            d = ((coarse - coarse[qi]) ** 2).sum(axis=1)
            d[qi] = np.inf
            short = np.argsort(d)[:s]
            cos = vecs[short] @ vecs[qi] / (norms[short] * norms[qi])
            top = set(short[np.argsort(-cos)[:k]].tolist())
            recalls.append(len(top & truth[qi]) / k)
        rows.append(
            {
                "knob": f"quantized_shortlist={s}",
                "recall_at_k": round(float(np.mean(recalls)), 3),
                "corpus_fraction_scanned": round(s / n, 5),
            }
        )

    print(f"| knob | recall@{k} | corpus fraction scanned |")
    print("|---|---|---|")
    for r in rows:
        print(
            f"| {r['knob']} | {r['recall_at_k']} |"
            f" {r['corpus_fraction_scanned']} |"
        )
    print(json.dumps({"n_vectors": n, "k": k, "curve": rows}))


if __name__ == "__main__":
    main()

"""kNN-graph report invariants, checked against a numpy rebuild of the
same LSH-blocked graph from raw parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_mini_dw_spark.functions import simsearch


def _numpy_graph(sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    bits = np.zeros(len(ids), dtype=np.int64)
    for i, d in enumerate(simsearch.LSH_DIMS):
        bits |= (vecs[:, d] >= 0.0).astype(np.int64) << i
    edges = []
    for b in np.unique(bits):
        m = np.where(bits == b)[0]
        if len(m) < 2:
            continue
        sub = vecs[m]
        nrm = np.linalg.norm(sub, axis=1)
        cos = np.round((sub @ sub.T) / np.outer(nrm, nrm), 6)
        for r in range(len(m)):
            order = sorted(
                (s for s in range(len(m)) if s != r),
                key=lambda s: (-cos[r, s], ids[m[s]]),
            )
            for s in order[: simsearch.KNN_K]:
                edges.append((int(ids[m[r]]), int(ids[m[s]])))
    return len(ids), edges


def test_knn_graph_matches_numpy(spark, sf_dir):
    rep = simsearch.knn_graph_stats(spark, sf_dir).toPandas()
    n_nodes, edges = _numpy_graph(sf_dir)
    out = rep[rep.metric == "outdeg"]
    ind = rep[rep.metric == "indeg"]
    # histograms cover every node exactly once
    assert int(out.n.sum()) == n_nodes
    assert int(ind.n.sum()) == n_nodes
    # edge totals agree with the independent rebuild
    n_edges = int(rep[rep.metric == "edges"].n.iloc[0])
    assert n_edges == len(edges)
    assert int((out.k * out.n).sum()) == n_edges
    assert int((ind.k * ind.n).sum()) == n_edges
    # out-degree can never exceed K
    assert int(out.k.max()) <= simsearch.KNN_K
    # reciprocity recomputed from the rebuilt edge set
    eset = set(edges)
    recip = sum((d, s) in eset for s, d in edges)
    got = rep[rep.metric == "reciprocal_edges"]
    assert int(got.n.iloc[0]) == recip
    assert abs(got.ratio.iloc[0] - recip / n_edges) < 2e-6

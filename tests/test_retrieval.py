"""BM25 retrieval: the Spark inverted-index plan must reproduce an
INDEPENDENT pure-Python implementation (dict-based tf/df, its own
tokenizer pass) of the same integer-exact scoring — rankings and
scores, not just shapes. Oracle value parity is covered separately by
test_oracle_parity."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from etl_mini_dw_spark.functions import retrieval
from etl_mini_dw_spark.functions.text import TOKEN_RE


def _ref_bm25(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        int(i): [t.lower() for t in re.findall(TOKEN_RE, s)]
        for i, s in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    n_docs = len(docs)
    t_tokens = sum(len(v) for v in docs.values())
    df: dict[str, int] = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = []
    for q_doc in sorted(d for d in docs if d % retrieval.QUERY_STRIDE == 0):
        qterms = set(docs[q_doc][: retrieval.QUERY_TERMS])
        scores: dict[int, tuple[int, int]] = {}
        for d, toks in docs.items():
            if d == q_doc:
                continue
            tf: dict[str, int] = {}
            for t in toks:
                if t in qterms:
                    tf[t] = tf.get(t, 0) + 1
            if not tf:
                continue
            s = 0
            for t, f in tf.items():
                idf_scaled = (n_docs * retrieval.BM25_SCALE) // df[t]
                s += (idf_scaled * 22 * f * t_tokens) // (
                    10 * f * t_tokens + 3 * t_tokens + 9 * len(toks) * n_docs
                )
            scores[d] = (len(tf), s)
        top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[
            : retrieval.BM25_TOP_K
        ]
        for rank, (d, (nst, s)) in enumerate(top, 1):
            out.append((q_doc, rank, d, nst, s))
    return out


def test_bm25_matches_pure_python_reference(spark, sf_dir):
    got = [
        (r["q_doc"], r["rank"], r["doc_id"], r["n_shared_terms"], r["score_scaled"])
        for r in retrieval.bm25_topk(spark, sf_dir)
        .orderBy("q_doc", "rank")
        .collect()
    ]
    want = _ref_bm25(sf_dir)
    assert got == want

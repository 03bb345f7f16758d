"""PQ recall characterization on CLUSTERED embeddings.

The synthetic `embeddings` table is uniform-random — PQ's worst case
(pairwise distances concentrate, so per-subspace quantization noise
swamps the true ordering; SCALE.md records recall@10 = 0.17 pure ADC,
0.60 with R=100 re-rank there).  Real embedding corpora are nothing
like that: encoder outputs cluster by topic/semantics, which is the
structure PQ's codebooks learn.  This probe plants Gaussian clusters
deterministically and measures recall@10 for pure ADC vs exact re-rank
at R ∈ {50, 100}, against the exact fixed-point brute force — the
numbers SCALE.md's round-10 entry quotes, and the basis for the pinned
pytest bound (tests/test_similarity_multimodal.py::
test_pq_recall_on_clustered_embeddings).

Usage: python tools/probe_pq_recall.py [n_vecs] [n_clusters]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_embeddings(n: int, n_clusters: int, dim: int = 64,
                         sigma: float = 0.05, seed: int = 7):
    """Deterministic planted-cluster vectors in (-1, 1)^dim: cluster
    centers uniform in [-0.5, 0.5], members = center + N(0, sigma),
    clipped to the quantizer's domain (offset=1.0 needs x >= -1)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.5, 0.5, (n_clusters, dim))
    labels = rng.integers(0, n_clusters, n)
    vecs = centers[labels] + rng.normal(0.0, sigma, (n, dim))
    return np.clip(vecs, -0.999, 0.999)


def exact_topk_fixed(vecs: np.ndarray, query_ids, k: int = 10):
    """Exact fixed-point top-k per query (the pq_topk re-rank metric):
    quantize to floor((x+1)*1e6) int64, integer squared L2, ties to
    the smaller neighbour id — the same total order the engine uses."""
    q = np.floor((vecs + 1.0) * 1e6).astype(np.int64)
    out = {}
    for qi in query_ids:
        d2 = ((q - q[qi]) ** 2).sum(axis=1)
        d2[qi] = np.iinfo(np.int64).max  # exclude self
        order = np.lexsort((np.arange(len(q)), d2))
        out[qi] = set(order[:k].tolist())
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = 10
    query_ids = list(range(10))

    from gdp_etl_spark.operators.similarity import pq_topk
    from gdp_etl_spark.session import get_spark

    spark = get_spark("pq-recall", master="local[8]", shuffle_partitions=8)
    vecs = clustered_embeddings(n, n_clusters)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).cache()
    df.count()
    exact = exact_topk_fixed(vecs, query_ids, k)

    print(f"n={n} clusters={n_clusters} dim=64 m=4 k_codes=16 queries=10 k={k}")
    for rerank in (0, 50, 100):
        got = pq_topk(df, query_ids, k=k, m=4, k_codes=16, n_iter=2,
                      rerank=rerank).collect()
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(r.query_id, set()).add(r.neighbour_id)
        recalls = [len(by_q.get(qi, set()) & exact[qi]) / k
                   for qi in query_ids]
        print(f"rerank={rerank:>3}: recall@10 = {sum(recalls)/len(recalls):.3f}"
              f"  (min {min(recalls):.1f}, max {max(recalls):.1f})")


if __name__ == "__main__":
    main()

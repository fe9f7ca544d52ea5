"""Clustered embedding fixture for meaningful ANN recall evaluation.

The sf tables' embeddings are unstructured random vectors, whose
neighbors are near-equidistant — the regime where bucketed ANN genuinely
cannot work, so `ann_recall_eval` honestly reports low approximate
recall there (VERDICT r4 item 4). Real embedding corpora are CLUSTERED
(topical structure) and the neighbors a recall gate cares about are
near-duplicates well inside a cluster. This generator produces exactly
that shape:

* ``n_clusters`` unit-norm Gaussian cluster centers; each cluster gets
  ``per_cluster`` members at ``cluster_sigma`` noise (the topical mass).
* The first ``n_queries`` vec_ids are the query vectors (the engine's
  query convention, `similarity._load_queries`); query ``q`` is placed
  IN cluster ``q`` so each query probes a distinct cell.
* Each query gets ``TOP_K`` planted near-duplicates inside its own
  cluster at ``dup_sigma * (i+1)`` noise — the exact top-5 is the
  planted set by construction, with a cosine margin over ordinary
  cluster-mates that a working IVF / residual-IVF-PQ index must and
  does resolve.

Deterministic (fixed seed); pure numpy + parquet, no Ray needed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate_clustered_embeddings(out_dir: str, *, n_clusters: int = 16,
                                  per_cluster: int = 250, dim: int = 64,
                                  n_queries: int = 4, n_planted: int = 5,
                                  cluster_sigma: float = 0.15,
                                  dup_sigma: float = 0.012,
                                  seed: int = 7) -> str:
    """Write ``embeddings.parquet`` (vec_id, embedding, label) under
    ``out_dir`` and return ``out_dir``. ``label`` is the cluster id."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    vecs = (np.repeat(centers, per_cluster, axis=0)
            + rng.standard_normal((n_clusters * per_cluster, dim))
            * cluster_sigma)
    labels = np.repeat(np.arange(n_clusters), per_cluster)
    vecs /= np.linalg.norm(vecs, axis=1)[:, None]
    # query q = a member of cluster q; its planted near-duplicates live
    # in cluster q's block at rows per_cluster*q + 10 + i
    for q in range(n_queries):
        vecs[q] = centers[q] + rng.standard_normal(dim) * cluster_sigma
        labels[q] = q
        for i in range(n_planted):
            tgt = per_cluster * q + 10 + i
            vecs[tgt] = vecs[q] + rng.standard_normal(dim) \
                * (dup_sigma * (i + 1))
    vecs /= np.linalg.norm(vecs, axis=1)[:, None]
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int64()),
    }), os.path.join(out_dir, "embeddings.parquet"))
    return out_dir

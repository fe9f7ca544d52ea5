"""Similarity search over the ``embeddings`` table.

* ``ann_topk_bruteforce`` — exact cosine top-k: the query matrix is
  broadcast (``ray.put`` once, read per batch), every batch computes a
  (batch x queries) matmul and emits only its per-batch top-k candidates,
  and a final tiny ``groupby(query_id)`` reduces candidates to the global
  top-k. The shuffle carries k rows per query per batch — never the
  vectors.
* ``ann_lsh_topk`` — scale path 1: random-hyperplane LSH buckets with
  Hamming-1 multi-probe restrict each query's scan (approximate; recall
  is pytest-checked against brute force).
* ``ann_ivf_topk`` — scale path 2: IVF-Flat — spherical-kmeans cells
  trained on a bounded deterministic sample, queries probe their nprobe
  nearest cells (approximate; recall pytest-checked).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

TOP_K = 5
N_QUERIES = 4           # queries = embeddings with vec_id < N_QUERIES
LSH_PLANES = 8
LSH_SEED = 42
# Multi-probe: a query also scans buckets whose signature differs by up to
# this many bits (Lv et al., VLDB '07). Hamming-1 probing raises recall
# from ~single-bucket (a near neighbor straddling one hyperplane is the
# dominant miss mode) at the cost of scanning 1+LSH_PLANES of the 2^PLANES
# buckets — still a 28x reduction at 8 planes, and the knob to trade
# recall vs scan fraction.
LSH_MULTIPROBE_HAMMING = 1

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _emb_read(path: str, columns: list[str]):
    # blocked-matmul stages want large batches: block count from actual
    # row count, not Ray's 2xCPUs floor (see _util.sized_read)
    from ._util import sized_read
    return sized_read(path, columns, rows_per_block=4096)


def _load_queries(sf_dir: str, columns: list[str] | None = None):
    """Pushdown-filtered read of the N_QUERIES query vectors (the bounded
    small side): ``filters=[("vec_id","<",N_QUERIES)]`` prunes every row
    group whose vec_id stats exclude the range, so the driver reads a few
    row groups — never the corpus — regardless of table size. Returns
    (vec_ids, L2-normalized query matrix[, extra column arrays]) sorted
    by vec_id for run-to-run determinism."""
    import pyarrow.parquet as pq
    extra = [c for c in (columns or []) if c not in ("vec_id", "embedding")]
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"] + extra,
                      filters=[("vec_id", "<", N_QUERIES)])
    ids = t.column("vec_id").to_numpy()
    if len(ids) == 0:   # empty corpus: no query vectors at all
        out = [ids.astype(np.int64), np.zeros((0, 1), np.float64)]
        out.extend(t.column(c).to_numpy() for c in extra)
        return tuple(out)
    order = np.argsort(ids, kind="mergesort")
    q = np.array(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    out = [ids[order], q / qn[:, None]]
    out.extend(t.column(c).to_numpy()[order] for c in extra)
    return tuple(out)


def ann_topk_bruteforce(sf_dir: str):
    """Exact cosine top-5 per query vector (self excluded).
    Output: (query_id, rank, vec_id, cosine)."""
    import ray
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir)
    q_ref = ray.put((qids, qmat))

    ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids_q, Q = ray.get(q_ref)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        sims = (v / nv[:, None]) @ Q.T          # (batch, n_queries)
        vids = df["vec_id"].to_numpy()
        out = []
        for j, qid in enumerate(ids_q):
            s = sims[:, j].copy()
            s[vids == qid] = -np.inf            # exclude self
            take = min(TOP_K, len(s))
            # (sim desc, vec_id asc) — ties at the block boundary must
            # keep the same candidate the oracle's window order keeps
            top = np.lexsort((vids, -s))[:take]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": vids[top],
                                     "sim": s[top]}))
        return pd.concat(out, ignore_index=True)

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[np.isfinite(df["sim"])]
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(TOP_K)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64),
                       cosine=np.round(df["sim"].to_numpy(), 6))
        return df[["query_id", "rank", "vec_id", "cosine"]]

    return (ds.map_batches(block_topk, batch_format="pandas")
            .groupby("query_id").map_groups(reduce_topk, batch_format="pandas"))


ANN_TOPK_SQL = f"""
WITH queries AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q FROM embeddings
  WHERE vec_id < {N_QUERIES}),
sims AS (
  SELECT query_id, e.vec_id,
         list_cosine_similarity(q, e.embedding::DOUBLE[]) AS sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(q, e.embedding::DOUBLE[])
                            DESC, e.vec_id) AS rank
  FROM queries CROSS JOIN embeddings e WHERE e.vec_id != query_id)
SELECT query_id, rank, vec_id, round(sim, 6) AS cosine
FROM sims WHERE rank <= {TOP_K}
"""


def ann_lsh_topk(sf_dir: str):
    """LSH-bucketed approximate cosine top-5 with Hamming-1 multi-probe:
    random-hyperplane signatures partition vectors into buckets; each
    query scans its own bucket plus the LSH_PLANES buckets one bit away
    (brute force within the probed set). Rows-only driver check
    (approximate); recall vs brute force is pytest-asserted >= 0.9 on a
    planted-neighbor fixture."""
    import ray
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir)
    dim = qmat.shape[1]
    rng = np.random.default_rng(LSH_SEED)
    planes = rng.standard_normal((dim, LSH_PLANES))
    qsig = (qmat @ planes > 0) @ (1 << np.arange(LSH_PLANES))
    q_ref = ray.put((qids, qmat, qsig))

    ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids_q, Q, sig_q = ray.get(q_ref)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        vn = v / nv[:, None]
        sig_v = (vn @ planes > 0) @ (1 << np.arange(LSH_PLANES))
        vids = df["vec_id"].to_numpy()
        out = []
        for j, qid in enumerate(ids_q):
            dist = _POPCOUNT8[np.bitwise_xor(sig_v, sig_q[j]).astype(np.uint8)]
            in_bucket = (dist <= LSH_MULTIPROBE_HAMMING) & (vids != qid)
            if not in_bucket.any():
                continue
            s = vn[in_bucket] @ Q[j]
            bids = vids[in_bucket]
            take = min(TOP_K, len(s))
            top = np.lexsort((bids, -s))[:take]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": bids[top],
                                     "sim": s[top]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(TOP_K)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64),
                       cosine=np.round(df["sim"].to_numpy(), 6))
        return df[["query_id", "rank", "vec_id", "cosine"]]

    return (ds.map_batches(bucket_topk, batch_format="pandas")
            .groupby("query_id").map_groups(reduce_topk, batch_format="pandas"))


IVF_CELLS = 16
IVF_NPROBE = 4
IVF_SAMPLE = 512
IVF_ITERS = 10
IVF_SEED = 5


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a deterministic uniform hash of
    vec_id used for bottom-k sampling (the same id hashes identically in
    every partitioning, so the sample is partition-invariant)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _sampled_unit_vectors(sf_dir: str, n_sample: int) -> np.ndarray:
    """Deterministic fixed-size DISTRIBUTED sample of L2-normalized
    embeddings: bottom-k-by-hash (Cohen '97) — every batch keeps its
    n_sample rows with the smallest splitmix64(vec_id), the driver
    reduces the per-batch candidates to the global n_sample smallest.
    The driver and the shuffle only ever see O(batches x n_sample)
    candidate rows, never the corpus, and the sample is identical under
    any partitioning (hash of the id, not of the position). Shared by
    the IVF and PQ codebook trainers. Empty corpus -> (0, 1) array."""
    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        h = _splitmix64(ids)
        take = np.argsort(h, kind="mergesort")[:n_sample]
        return pd.DataFrame({"h": h[take],
                             "embedding": df["embedding"].to_numpy()[take]})

    parts = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"]) \
        .map_batches(bottomk, batch_format="pandas").to_pandas()
    if "h" not in parts.columns or parts.empty:
        return np.zeros((0, 1), np.float64)
    keep = np.argsort(parts["h"].to_numpy(), kind="mergesort")[:n_sample]
    v = np.array(parts["embedding"].to_numpy()[keep].tolist(),
                 dtype=np.float64)
    nv = np.linalg.norm(v, axis=1)
    nv[nv == 0] = 1.0
    return v / nv[:, None]


def _ivf_centroids(sf_dir: str, vn: "np.ndarray | None" = None
                   ) -> np.ndarray:
    """Spherical k-means centroids on the shared bottom-k-by-hash sample
    (`_sampled_unit_vectors`; pass ``vn`` to reuse one sampling pass
    across trainers). Driver-side Lloyd on <= IVF_SAMPLE vectors is
    O(sample x cells x iters) — trivial."""
    if vn is None:
        vn = _sampled_unit_vectors(sf_dir, IVF_SAMPLE)
    if len(vn) == 0:
        return np.zeros((0, 1), np.float64)
    k = min(IVF_CELLS, len(vn))
    rng = np.random.default_rng(IVF_SEED)
    C = vn[rng.choice(len(vn), size=k, replace=False)]
    for _ in range(IVF_ITERS):
        assign = np.argmax(vn @ C.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cen = vn[m].mean(axis=0)
                n = np.linalg.norm(cen)
                if n > 0:
                    C[c] = cen / n
    return C


def ann_ivf_topk(sf_dir: str):
    """IVF approximate cosine top-5: vectors assign to their nearest of
    IVF_CELLS spherical-kmeans centroids; each query scans only the rows of
    its IVF_NPROBE closest cells — the inverted-file ANN structure (Sivic &
    Zisserman '03 / FAISS IVF-Flat shape) expressed as a broadcast centroid
    table + per-batch masked matmul + tiny per-query top-k reduce shuffle.
    Rows-only driver check (approximate); recall vs brute force is
    pytest-asserted on the planted-neighbor fixture."""
    import ray
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir)
    C = _ivf_centroids(sf_dir)
    # per query: the nprobe nearest cells
    qcells = np.argsort(-(qmat @ C.T), axis=1)[:, :min(IVF_NPROBE, len(C))]
    q_ref = ray.put((qids, qmat, C, qcells))

    ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    def cell_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids_q, Q, cen, probe = ray.get(q_ref)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        vn = v / nv[:, None]
        cell_v = np.argmax(vn @ cen.T, axis=1)
        vids = df["vec_id"].to_numpy()
        out = []
        for j, qid in enumerate(ids_q):
            in_cells = np.isin(cell_v, probe[j]) & (vids != qid)
            if not in_cells.any():
                continue
            s = vn[in_cells] @ Q[j]
            bids = vids[in_cells]
            take = min(TOP_K, len(s))
            top = np.lexsort((bids, -s))[:take]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": bids[top],
                                     "sim": s[top]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(TOP_K)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64),
                       cosine=np.round(df["sim"].to_numpy(), 6))
        return df[["query_id", "rank", "vec_id", "cosine"]]

    return (ds.map_batches(cell_topk, batch_format="pandas")
            .groupby("query_id").map_groups(reduce_topk, batch_format="pandas"))


def embedding_label_centroids(sf_dir: str):
    """Per-label centroid vectors (class prototypes — the E-step of
    k-means / nearest-class-mean classification), output exploded to
    (label, dim, v) scalar rows so the driver can hash-compare exactly.

    Scale shape: each batch collapses to one (sum-vector, count) partial
    per label — a numpy column-sum per label group — so the shuffle
    carries (labels x dims) floats per batch, never the vectors; the
    final combine is a tiny per-label reduction.
    """
    import pandas as pd
    import pyarrow as pa

    ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                   columns=["embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(df["embedding"].tolist(), dtype=np.float64)
        out = []
        for lab, idx in df.groupby("label").indices.items():
            out.append((int(lab), len(idx), mat[idx].sum(axis=0)))
        return pd.DataFrame({
            "label": [o[0] for o in out],
            "n": [o[1] for o in out],
            "vsum": [o[2].tobytes() for o in out]})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        mats = np.stack([np.frombuffer(b, dtype=np.float64)
                         for b in df["vsum"]])
        s = mats.sum(axis=0)
        n = int(df["n"].sum())
        d = s.shape[0]
        return pd.DataFrame({
            "label": np.full(d, int(df["label"].iloc[0]), dtype=np.int64),
            "dim": np.arange(d, dtype=np.int64),
            "v": np.round(s / n, 6)})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("label")
            .map_groups(combine, batch_format="pandas"))


EMBEDDING_CENTROIDS_SQL = """
SELECT label, CAST(i AS BIGINT) - 1 AS dim, round(avg(embedding[i]), 6) AS v
FROM embeddings, generate_series(1, 64) AS t(i)
GROUP BY label, i
"""


# ------------------------------------------------- kNN label propagation

KNN_K = 5


def knn_label_propagation(sf_dir: str):
    """Label unlabeled vectors by majority vote of their 5 nearest labeled
    neighbors (cosine) — the weak-supervision / label-propagation pass a
    training-data pipeline runs to extend a small labeled set. Labeled
    corpus = odd vec_ids, unlabeled queries = even vec_ids.

    The labeled side is corpus-sized, so it is NOT broadcast whole.
    Instead it is normalized and packed into ~4k-row blocks by a
    distributed ``map_batches`` pass whose Arrow blocks stay in the
    object store (``Dataset.to_arrow_refs`` — the driver holds only the
    list of ObjectRefs); each query batch then streams over the labeled
    blocks one at a time (``ray.get`` per block, zero-copy), computes one
    (batch x block) matmul, and folds the block's per-row top-k into a
    running exact top-k with the oracle's (sim DESC, cid ASC) tie-break.
    Peak task memory = one query batch + one labeled block; the result is
    EXACT (every labeled vector is scanned), so the DuckDB oracle stays
    green. The vote is a vectorized per-row bincount-argmax (argmax ties
    pick the smallest label, matching the oracle's ORDER BY c DESC,
    label). No shuffle at all: the output maps each query row in place."""
    import ray

    def pack_labeled(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        keep = ids % 2 == 1
        if not keep.any():
            return pd.DataFrame({"cids": pd.Series([], dtype="object"),
                                 "mat": pd.Series([], dtype="object"),
                                 "labs": pd.Series([], dtype="object")})
        cids = ids[keep].astype(np.int64)
        order = np.argsort(cids, kind="mergesort")   # cid-sorted per block
        C = np.array(df["embedding"].to_numpy()[keep].tolist(),
                     dtype=np.float64)[order]
        cn = np.linalg.norm(C, axis=1)
        cn[cn == 0] = 1.0
        C /= cn[:, None]
        labs = df["label"].to_numpy()[keep][order].astype(np.int64)
        return pd.DataFrame({"cids": [cids[order].tobytes()],
                             "mat": [C.tobytes()],
                             "labs": [labs.tobytes()]})

    lab_refs = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding", "label"]) \
        .map_batches(pack_labeled, batch_format="pandas") \
        .to_arrow_refs()                     # blocks stay in object store

    ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                   columns=["vec_id", "embedding"])

    def _fold_topk(run, sims, bcids, blabs, k):
        """Merge a block's per-row top-k candidates into the running
        (sim, cid, lab) top-k with (sim DESC, cid ASC) ordering."""
        r_sim, r_cid, r_lab = run
        t = min(k, sims.shape[1])
        # stable argsort on the cid-sorted block = (sim DESC, cid ASC)
        # within-block, so equal-sim candidates at the cut keep the same
        # cid the oracle's window order keeps
        part = np.argsort(-sims, axis=1, kind="stable")[:, :t]
        c_sim = np.concatenate(
            [r_sim, np.take_along_axis(sims, part, 1)], axis=1)
        c_cid = np.concatenate(
            [r_cid, bcids[part]], axis=1)
        c_lab = np.concatenate(
            [r_lab, blabs[part]], axis=1)
        o1 = np.argsort(c_cid, axis=1, kind="stable")
        s1 = np.take_along_axis(c_sim, o1, 1)
        o2 = np.argsort(-s1, axis=1, kind="stable")
        order = np.take_along_axis(o1, o2, 1)[:, :k]
        return (np.take_along_axis(c_sim, order, 1),
                np.take_along_axis(c_cid, order, 1),
                np.take_along_axis(c_lab, order, 1))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        vids = df["vec_id"].to_numpy()
        keep = vids % 2 == 0
        if not keep.any():
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "pred_label": pd.Series([], dtype="int64")})
        v = np.array(df["embedding"].to_numpy()[keep].tolist(),
                     dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        vn = v / nv[:, None]
        b = len(vn)
        run = (np.full((b, 0), -np.inf),
               np.full((b, 0), 0, dtype=np.int64),
               np.full((b, 0), 0, dtype=np.int64))
        for ref in lab_refs:                 # one labeled block at a time
            tbl = ray.get(ref)
            for row in range(tbl.num_rows):
                bcids = np.frombuffer(tbl.column("cids")[row].as_py(),
                                      dtype=np.int64)
                if not len(bcids):
                    continue
                blabs = np.frombuffer(tbl.column("labs")[row].as_py(),
                                      dtype=np.int64)
                Cb = np.frombuffer(tbl.column("mat")[row].as_py(),
                                   dtype=np.float64).reshape(len(bcids), -1)
                run = _fold_topk(run, vn @ Cb.T, bcids, blabs, KNN_K)
        votes = run[2]                               # (batch, <=k)
        if votes.shape[1] == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "pred_label": pd.Series([], dtype="int64")})
        n_labels = int(votes.max()) + 1
        counts = np.zeros((b, n_labels), dtype=np.int64)
        rows = np.repeat(np.arange(b), votes.shape[1])
        np.add.at(counts, (rows, votes.ravel()), 1)
        return pd.DataFrame({"vec_id": vids[keep].astype(np.int64),
                             "pred_label": counts.argmax(axis=1)})

    return ds.map_batches(classify, batch_format="pandas")


KNN_LABEL_PROPAGATION_SQL = f"""
WITH corpus AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce, label
  FROM embeddings WHERE vec_id % 2 = 1),
qry AS (
  SELECT vec_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id % 2 = 0),
topk AS (
  SELECT q.vec_id, c.label
  FROM qry q CROSS JOIN corpus c
  QUALIFY row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cid) <= {KNN_K}),
votes AS (
  SELECT vec_id, label, count(*) AS c FROM topk GROUP BY vec_id, label)
SELECT vec_id, CAST(label AS BIGINT) AS pred_label
FROM votes
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, label) = 1
"""


# ------------------------------------------------ int8 quantization

def embedding_quantize_int8(sf_dir: str):
    """Per-vector symmetric int8 quantization with reconstruction-error
    audit — the vector-compression pass an embedding store runs before
    serving (4x smaller, dot products in int8). Per vector: scale =
    max|v|/127, q = rint(v/scale); emitted are the scale and the exact
    reconstruction errors (max-abs and MSE), NOT the vectors, so the
    result stays rows-per-vector small while the quantization itself is
    one vectorized pass per batch. Rows-only (no SQL oracle: round-half
    semantics differ between numpy and SQL engines); the error bound
    max_abs_err <= scale/2 is asserted by pytest."""
    import pandas as pd

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        scale = np.abs(m).max(axis=1) / 127.0
        scale[scale == 0] = 1.0
        q = np.rint(m / scale[:, None]).clip(-127, 127).astype(np.int8)
        recon = q.astype(np.float64) * scale[:, None]
        err = np.abs(m - recon)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(dtype=np.int64),
            "scale": np.round(scale, 9),
            "max_abs_err": np.round(err.max(axis=1), 9),
            "mse": np.round((err * err).mean(axis=1), 12)})

    return _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                     ["vec_id", "embedding"]) \
        .map_batches(quant, batch_format="pandas")


# -------------------------------------------------- kmeans clustering

def embedding_kmeans_clusters(sf_dir: str):
    """Cluster assignment + per-cluster stats over the IVF centroids
    (the corpus-topic-clustering pass a mixing pipeline runs): centroids
    train once on the driver's deterministic bounded sample
    (``_ivf_centroids``), broadcast to every batch, each batch assigns
    its vectors with one matmul and emits per-cluster partials, and the
    result is one row per cluster (size, mean cosine-to-centroid).
    Rows-only: kmeans is iterative and not SQL-expressible; determinism
    and partition-invariance are pytest-checked."""
    import pandas as pd
    from ray.data.aggregate import Sum

    C = _ivf_centroids(sf_dir)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        m = m / n[:, None]
        sims = m @ C.T
        cell = sims.argmax(axis=1).astype(np.int64)
        best = sims[np.arange(len(m)), cell]
        g = pd.DataFrame({"cluster": cell, "n": np.ones(len(m), np.int64),
                          "sim_sum": best}) \
            .groupby("cluster", as_index=False).sum()
        return g

    agg = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                    ["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pandas") \
        .groupby("cluster").aggregate(Sum("n", alias_name="n_vectors"),
                                      Sum("sim_sum", alias_name="sim_sum"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cluster": df["cluster"].to_numpy(np.int64),
            "n_vectors": df["n_vectors"].to_numpy(np.int64),
            "mean_cosine": np.round(df["sim_sum"].to_numpy(np.float64)
                                    / df["n_vectors"].to_numpy(np.float64), 6)})

    return agg.map_batches(finish, batch_format="pandas")


# -------------------------------------------------- semantic dedup

SEMDEDUP_EPS = 0.05      # prune when cosine > 1 - eps to a kept vector


def semdedup_prune(sf_dir: str):
    """(vec_id, cluster, centroid_sim, keep) — SemDeDup (Abbas et al.
    '23, arXiv:2303.09540): cluster the embedding space, then within
    each cluster drop every vector whose cosine to an already-kept
    vector exceeds ``1 - SEMDEDUP_EPS``, keeping the candidate FARTHEST
    from the centroid in each near-duplicate group (the paper's
    keep-outliers choice, which preserves diversity).

    Scale shape: centroids train once on the bounded distributed
    sample (``_ivf_centroids``) and broadcast; assignment is one
    matmul per batch; the only shuffle co-partitions rows BY CLUSTER
    (each vector's embedding crosses the wire exactly once). The
    in-cluster pass is the paper's O(cluster²) pairwise check —
    bounded by cluster size, so the number of centroids is the skew
    knob (scale IVF_CELLS with corpus size to keep clusters ~constant).
    Deterministic: candidates scan in (centroid_sim ascending, vec_id)
    order, so output is partition-invariant (pytest-checked).
    Rows-only: kmeans is iterative, not SQL-expressible."""
    import pandas as pd

    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    C = _ivf_centroids(sf_dir)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        m = m / n[:, None]
        sims = m @ C.T
        cell = sims.argmax(axis=1).astype(np.int64)
        return pd.DataFrame({
            "cluster": cell,
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "centroid_sim": sims[np.arange(len(m)), cell],
            "nvec": list(m)})

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["centroid_sim", "vec_id"],
                          kind="mergesort")     # outliers first
        m = np.stack(g["nvec"].to_numpy())
        keep_rows = []
        keep = np.zeros(len(g), dtype=bool)
        thr = 1.0 - SEMDEDUP_EPS
        for i in range(len(g)):
            v = m[i]
            if keep_rows and (m[keep_rows] @ v).max() > thr:
                continue
            keep[i] = True
            keep_rows.append(i)
        return pd.DataFrame({
            "vec_id": g["vec_id"].to_numpy(np.int64),
            "cluster": g["cluster"].to_numpy(np.int64),
            "centroid_sim": np.round(
                g["centroid_sim"].to_numpy(np.float64), 6),
            "keep": keep})

    return (_emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                      ["vec_id", "embedding"])
            .map_batches(assign, batch_format="pandas")
            .groupby("cluster", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(prune, batch_format="pandas"))


# ------------------------------------------------------ distributed PCA

PCA_K = 8  # projected dimensionality


def _pca_stats(path: str):
    """Streaming sufficient statistics for PCA: one (n, Σx, ΣxᵀX) row per
    batch reduced on the driver → (n, mean, covariance)."""
    import pandas as pd

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"n": [len(m)], "s": [m.sum(axis=0)],
                             "sxx": [(m.T @ m).ravel()]})

    parts = _emb_read(path, ["embedding"]) \
        .map_batches(moments, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    sxx = np.sum(np.stack(parts["sxx"].to_numpy()), axis=0)
    d = s.shape[0]
    mu = s / n
    cov = (sxx.reshape(d, d) - n * np.outer(mu, mu)) / (n - 1)
    return n, mu, cov


def embedding_pca_project(sf_dir: str):
    """PCA-project every embedding to the top-K principal components —
    the dimensionality-reduction pass an embedding pipeline runs before
    cheap downstream clustering/ANN.

    Two streaming passes. Pass 1 reduces each batch to the fixed-size
    sufficient statistics (n, Σx, ΣxᵀX as a d² list) — the driver only
    ever sums one tiny row per batch, independent of corpus size — and
    the d×d covariance eigendecomposition runs once on the driver
    (d=64: microseconds). Pass 2 broadcasts the (d×K) component matrix
    into a per-batch matmul. Components use a deterministic sign
    convention (largest-|loading| coordinate positive) so output is
    reproducible across runs and partitionings. Rows-only: eigh is not
    SQL-expressible; determinism, orthonormality and variance ordering
    are pytest-checked.
    """
    import pandas as pd

    path = os.path.join(sf_dir, "embeddings.parquet")
    _, mu, cov = _pca_stats(path)

    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:PCA_K]
    w = evecs[:, order]                          # (d, K)
    flip = np.sign(w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])])
    flip[flip == 0] = 1.0
    w = w * flip[None, :]

    def project(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        z = (m - mu[None, :]) @ w
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "proj": list(np.round(z, 6)),
            "recon_mse": np.round(
                ((m - mu[None, :]) - z @ w.T).__pow__(2).mean(axis=1), 9)})

    return _emb_read(path, ["vec_id", "embedding"]) \
        .map_batches(project, batch_format="pandas")


def pca_variance_explained(sf_dir: str) -> "np.ndarray":
    """Eigenvalue spectrum helper for tests: descending top-K explained
    variances of the embedding covariance (same statistics path as
    ``embedding_pca_project``)."""
    _, _, cov = _pca_stats(os.path.join(sf_dir, "embeddings.parquet"))
    evals = np.linalg.eigvalsh(cov)
    return np.sort(evals)[::-1][:PCA_K]


# ------------------------------------------- hard-negative mining

HARD_NEG_K = 3


def hard_negatives_topk(sf_dir: str):
    """Per query vector, the top-3 most-cosine-similar vectors with a
    DIFFERENT label — contrastive-training hard-negative mining.

    Same broadcast-query blocked-matmul shape as the brute-force ANN
    (queries ride one ``ray.put``, each batch emits its local top-k per
    query, one grouped reduce finishes), plus a vectorized label mask.
    The query side comes from the pushdown-filtered ``_load_queries``
    read — never the full table. Output: (query_id, rank, vec_id,
    cosine).
    """
    import ray

    qids, qnorm, qlabels = _load_queries(sf_dir, columns=["label"])
    q_ref = ray.put((qids, qnorm, qlabels))

    ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                   columns=["vec_id", "embedding", "label"])

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids_q, Q, lab_q = ray.get(q_ref)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        sims = (v / nv[:, None]) @ Q.T
        vids = df["vec_id"].to_numpy()
        vlab = df["label"].to_numpy()
        out = []
        for j, qid in enumerate(ids_q):
            s = sims[:, j].copy()
            s[vlab == lab_q[j]] = -np.inf       # negatives only
            take = min(HARD_NEG_K, len(s))
            top = np.lexsort((vids, -s))[:take]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": vids[top],
                                     "sim": s[top]}))
        return pd.concat(out, ignore_index=True)

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[np.isfinite(df["sim"])]
        df = df.sort_values(["sim", "vec_id"],
                            ascending=[False, True]).head(HARD_NEG_K)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64),
                       cosine=np.round(df["sim"].to_numpy(), 6))
        return df[["query_id", "rank", "vec_id", "cosine"]]

    return (ds.map_batches(block_topk, batch_format="pandas")
            .groupby("query_id").map_groups(reduce_topk,
                                            batch_format="pandas"))


HARD_NEGATIVES_SQL = f"""
WITH queries AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q, label AS qlabel
  FROM embeddings WHERE vec_id < {N_QUERIES}),
sims AS (
  SELECT query_id, e.vec_id,
         list_cosine_similarity(q, e.embedding::DOUBLE[]) AS sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(q, e.embedding::DOUBLE[])
                            DESC, e.vec_id) AS rank
  FROM queries CROSS JOIN embeddings e WHERE e.label != qlabel)
SELECT query_id, rank, vec_id, round(sim, 6) AS cosine
FROM sims WHERE rank <= {HARD_NEG_K}
"""


def ann_recall_eval(sf_dir: str) -> pd.DataFrame:
    """(method, n_queries, recall_at_k) — recall@TOP_K of the three
    approximate ANN paths (hyperplane-LSH multiprobe, IVF, PQ-ADC)
    against the exact brute-force top-k: the quality gate an ANN
    deployment measures before trading exactness for probe cost.

    Scale shape: the three ANN pipelines themselves are the distributed
    work (each already bucketed/streamed); every result set is
    N_QUERIES × TOP_K rows, so the set intersections run on the driver
    over constant-size frames. Not SQL-expressible (hash-bucket
    probing), so the driver check is rows-only; the planted-neighbor
    pytest lower-bounds both recalls and cross-checks the arithmetic
    against an independent per-query set intersection.

    Expect LOW approximate recall on the synthetic sf corpora: their
    embeddings are unstructured random vectors, whose neighbors are
    near-equidistant — the regime where bucketed ANN genuinely cannot
    work and a recall gate tells you so (that is its job). On the
    planted-neighbor fixture both paths measure ≥ 0.9."""
    def _as_pandas(res) -> pd.DataFrame:
        # ANN ops return a Dataset normally but a schema-typed pandas
        # frame on the empty-corpus path (ADVICE r4)
        return res if isinstance(res, pd.DataFrame) else res.to_pandas()

    exact = _as_pandas(ann_topk_bruteforce(sf_dir))
    if exact.empty:
        # empty corpus: a 0-row Dataset drops its columns in to_pandas,
        # so bail out before touching them
        return pd.DataFrame({"method": pd.Series([], dtype=object),
                             "n_queries": pd.Series([], dtype="int64"),
                             "recall_at_k": pd.Series([], dtype="float64")})
    truth = set(zip(exact["query_id"].to_numpy(),
                    exact["vec_id"].to_numpy()))
    n_queries = int(exact["query_id"].nunique())
    out = []
    for method, fn in (("bruteforce", ann_topk_bruteforce),
                       ("lsh", ann_lsh_topk), ("ivf", ann_ivf_topk),
                       ("pq", ann_pq_topk),
                       ("ivfpq", ann_ivfpq_topk),
                       ("opq", ann_opq_topk)):
        got = _as_pandas(fn(sf_dir))
        hits = sum((q, v) in truth
                   for q, v in zip(got["query_id"].to_numpy(),
                                   got["vec_id"].to_numpy()))
        out.append({"method": method, "n_queries": n_queries,
                    "recall_at_k": round(hits / max(1, len(truth)), 6)})
    return pd.DataFrame(out)


# ------------------------------------------------- product quantization

PQ_M = 8          # subspaces (dim 64 -> 8 dims each; dim 32 -> 4 each)
PQ_K = 16         # centroids per subspace: 4-bit codes, 16x compression
PQ_SAMPLE = 512
PQ_ITERS = 12
PQ_SEED = 9


def _pq_codebooks(sf_dir: str, vn: "np.ndarray | None" = None,
                  n_centroids: int = PQ_K) -> "np.ndarray":
    """Per-subspace k-means codebooks (Jégou et al. 2011, Product
    Quantization) trained on the same deterministic bottom-k-by-hash
    distributed sample as IVF (`_ivf_centroids`): partition-invariant,
    never corpus-scale on the driver. Vectors are L2-normalized BEFORE
    the subspace split so the ADC lookup-sum approximates the cosine
    (inner product of unit vectors). Returns (M, K, d_m) with subspace
    dims from `np.array_split` (last subspaces may be thinner when
    dim % PQ_M != 0; all-zero padding keeps the array rectangular and
    contributes nothing to distances or inner products). Pass ``vn``
    to reuse one sampling pass across trainers."""
    if vn is None:
        vn = _sampled_unit_vectors(sf_dir, PQ_SAMPLE)
    if len(vn) == 0:
        # empty corpus: no codebooks to train; encode/search paths emit
        # schema-stable empty frames downstream
        return np.zeros((PQ_M, n_centroids, 1), np.float64)
    dim = vn.shape[1]
    splits = np.array_split(np.arange(dim), PQ_M)
    dmax = max(len(s) for s in splits)
    rng = np.random.default_rng(PQ_SEED)
    books = np.zeros((PQ_M, n_centroids, dmax), np.float64)
    for m, cols in enumerate(splits):
        sub = vn[:, cols]
        k = min(n_centroids, len(sub))
        C = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(PQ_ITERS):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = sub[mask].mean(axis=0)
        books[m, :k, :len(cols)] = C
        if k < n_centroids:
            # duplicate the first centroid into unused slots so argmin
            # never selects an all-zero phantom cell
            books[m, k:, :len(cols)] = C[0]
    return books


def _pq_encode(vn: "np.ndarray", books: "np.ndarray") -> "np.ndarray":
    """(N, M) uint8 codes: per subspace, the index of the nearest
    centroid (vectorized ||x||^2 - 2xC' + ||C||^2 argmin)."""
    dim = vn.shape[1]
    splits = np.array_split(np.arange(dim), PQ_M)
    codes = np.empty((len(vn), PQ_M), np.uint8)
    for m, cols in enumerate(splits):
        sub = vn[:, cols]
        C = books[m, :, :len(cols)]
        d2 = (-2.0 * (sub @ C.T)
              + (C * C).sum(axis=1)[None, :])
        codes[:, m] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def embedding_pq_codes(sf_dir: str):
    """(vec_id, code: list<int64>, recon_err) per vector — PQ-encode the
    corpus against broadcast per-subspace codebooks; recon_err is the
    squared L2 gap between the unit vector and its codebook
    reconstruction (the quantization-quality audit column).

    Scale shape: codebooks are (M*K*d) floats trained on a bounded
    distributed sample and shipped once via ``ray.put``; encoding is
    row-local vectorized argmin inside ``map_batches`` (no shuffle); the
    output codes are ~16x smaller than the embeddings, which is the
    point — downstream ANN scans read codes, not vectors. Rows-only
    driver check; numpy parity + recall pytests carry correctness."""
    return _pq_encode_ds(sf_dir, _pq_codebooks(sf_dir))


def _pq_encode_ds(sf_dir: str, books: "np.ndarray"):
    """The encode pass against ALREADY-TRAINED codebooks (so composed
    callers like `ann_pq_topk` train once, not per consumer)."""
    import ray

    b_ref = ray.put(books)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "code": pd.Series([], dtype=object),
                                 "recon_err": pd.Series([], dtype="float64")})
        bks = ray.get(b_ref)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        vn = v / nv[:, None]
        codes = _pq_encode(vn, bks)
        dim = vn.shape[1]
        splits = np.array_split(np.arange(dim), PQ_M)
        recon = np.concatenate(
            [bks[m, codes[:, m], :len(cols)]
             for m, cols in enumerate(splits)], axis=1)
        err = ((vn - recon) ** 2).sum(axis=1)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "code": list(codes.astype(np.int64)),
            "recon_err": np.round(err, 6)})

    return _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                     columns=["vec_id", "embedding"]) \
        .map_batches(encode, batch_format="pandas")


def ann_pq_topk(sf_dir: str):
    """PQ asymmetric-distance cosine top-5: the corpus is first encoded
    to (vec_id, code) rows (16x smaller than the vectors), then each
    query scans CODES ONLY — per-query lookup tables LUT[m][k] =
    q_m · C[m][k] are broadcast, and the approximate cosine of a coded
    vector is the M-term table sum (ADC, Jégou et al. 2011). This is
    the memory-bound ANN regime: at 100 TB of embeddings the code table
    is ~6 TB and the scan never touches the raw vectors.

    Rows-only driver check (approximate scores); recall >= 0.9 and
    exact-rank-1 on the planted-neighbor fixture are pytest-pinned."""
    import ray

    qids, qmat = _load_queries(sf_dir)
    if len(qids) == 0:
        # schema-typed pandas frame on the empty path: a 0-row Ray
        # Dataset loses its columns through .to_pandas(), so the typed
        # frame is the schema-stable choice; Dataset-expecting callers
        # go through _as_pandas (ADVICE r4)
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "adc_score": pd.Series([], dtype="float64")})
    books = _pq_codebooks(sf_dir)
    dim = qmat.shape[1]
    splits = np.array_split(np.arange(dim), PQ_M)
    # LUT[j, m, k]: query j's inner product with centroid k of subspace m
    lut = np.stack([
        np.stack([books[m, :, :len(cols)] @ q[cols]
                  for m, cols in enumerate(splits)])
        for q in qmat])
    q_ref = ray.put((qids, lut))
    codes_ds = _pq_encode_ds(sf_dir, books)   # books trained ONCE above

    def adc_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids_q, tables = ray.get(q_ref)
        codes = np.array(df["code"].to_list(), dtype=np.int64)
        vids = df["vec_id"].to_numpy(np.int64)
        marange = np.arange(PQ_M)
        out = []
        for j, qid in enumerate(ids_q):
            sims = tables[j][marange[:, None], codes.T].sum(axis=0)
            mask = vids != qid
            s, bids = sims[mask], vids[mask]
            take = min(TOP_K, len(s))
            if take == 0:
                continue
            top = np.lexsort((bids, -s))[:take]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": bids[top],
                                     "sim": s[top]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"],
                            ascending=[False, True]).head(TOP_K)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64),
                       adc_score=np.round(df["sim"].to_numpy(), 6))
        return df[["query_id", "rank", "vec_id", "adc_score"]]

    return (codes_ds.map_batches(adc_topk, batch_format="pandas")
            .groupby("query_id").map_groups(reduce_topk,
                                            batch_format="pandas"))


IVFPQ_NPROBE = 4
# The composed index carries FAISS-style wider residual codebooks than the
# flat 4-bit PQ: residual magnitudes are ~cluster_sigma (small), so a
# 64-centroid codebook resolves within-cell neighbor margins the 16-way
# books blur; codes stay uint8 (one byte per subspace, same 8-byte rows).
IVFPQ_K = 64
IVFPQ_SAMPLE = 2048


def ann_ivfpq_topk(sf_dir: str):
    """IVF-PQ approximate cosine top-5 — the composed FAISS-style index
    (Jégou et al. 2011): vectors assign to their nearest of IVF_CELLS
    spherical-kmeans centroids AND carry a PQ code of their RESIDUAL
    ``v - centroid(cell)`` (the FAISS IVFPQ formulation: flat PQ wastes
    its whole code range re-describing the coarse cluster structure the
    IVF assignment already captured, so within-cell neighbors collapse
    to identical codes; residual encoding spends the 4-bit budget on
    exactly the within-cell variation that ranks neighbors). Each query
    scans only the CODES of its IVFPQ_NPROBE closest cells, scoring
    ``q . centroid(cell) + ADC-lookup-sum(q, residual code)``. Combines
    the IVF probe's scan reduction (nprobe/cells of the corpus touched)
    with PQ's memory reduction (16x smaller rows) — the shape that
    makes trillion-vector ANN fit a fixed cluster.

    Scale shape: coarse centroids and residual codebooks train on ONE
    shared bottom-k-by-hash sample (bounded, partition-invariant); the
    encode pass is row-local with broadcast codebooks; the search pass
    is row-local over the code table with broadcast per-query LUTs +
    probe lists, followed by the tiny per-query top-k reduce.
    Rows-only driver check; recall >= 0.9 on both the planted-neighbor
    and the clustered mixture-of-Gaussians fixtures is pytest-pinned."""
    import ray

    qids, qmat = _load_queries(sf_dir)
    if len(qids) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "adc_score": pd.Series([], dtype="float64")})
    sample = _sampled_unit_vectors(sf_dir, max(IVF_SAMPLE, IVFPQ_SAMPLE))
    C = _ivf_centroids(sf_dir, vn=sample[:IVF_SAMPLE])
    # residual codebooks: PQ trained on v - centroid(assigned cell) of
    # the sample (the same bounded sample — no extra corpus pass)
    svn = sample[:IVFPQ_SAMPLE]
    resid = svn - C[np.argmax(svn @ C.T, axis=1)] if len(svn) else svn
    books = _pq_codebooks(sf_dir, vn=resid, n_centroids=IVFPQ_K)
    dim = qmat.shape[1]
    splits = np.array_split(np.arange(dim), PQ_M)
    lut = np.stack([
        np.stack([books[m, :, :len(cols)] @ q[cols]
                  for m, cols in enumerate(splits)])
        for q in qmat])
    qdotc = qmat @ C.T                      # (n_queries, cells)
    qcells = np.argsort(-qdotc, axis=1)[:, :min(IVFPQ_NPROBE, len(C))]
    refs = ray.put((qids, lut, qcells, qdotc, C, books))

    def encode_cells(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "cell": pd.Series([], dtype="int64"),
                                 "code": pd.Series([], dtype=object)})
        _, _, _, _, cen, bks = ray.get(refs)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        vn = v / nv[:, None]
        cells = np.argmax(vn @ cen.T, axis=1)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "cell": cells.astype(np.int64),
            "code": list(_pq_encode(vn - cen[cells], bks).astype(np.int64))})

    codes_ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"]) \
        .map_batches(encode_cells, batch_format="pandas")

    def adc_probe_topk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                              "vec_id": pd.Series([], dtype="int64"),
                              "sim": pd.Series([], dtype="float64")})
        if df.empty:
            return empty
        ids_q, tables, probe, qc, _, _ = ray.get(refs)
        codes = np.array(df["code"].to_list(), dtype=np.int64)
        cells = df["cell"].to_numpy(np.int64)
        vids = df["vec_id"].to_numpy(np.int64)
        marange = np.arange(PQ_M)
        out = []
        for j, qid in enumerate(ids_q):
            mask = np.isin(cells, probe[j]) & (vids != qid)
            if not mask.any():
                continue
            # q . centroid(cell) + q . residual_reconstruction
            sims = (qc[j, cells[mask]]
                    + tables[j][marange[:, None], codes[mask].T].sum(axis=0))
            bids = vids[mask]
            take = min(TOP_K, len(sims))
            top = np.lexsort((bids, -sims))[:take]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": bids[top],
                                     "sim": sims[top]}))
        return pd.concat(out, ignore_index=True) if out else empty

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"],
                            ascending=[False, True]).head(TOP_K)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64),
                       adc_score=np.round(df["sim"].to_numpy(), 6))
        return df[["query_id", "rank", "vec_id", "adc_score"]]

    return (codes_ds.map_batches(adc_probe_topk, batch_format="pandas")
            .groupby("query_id").map_groups(reduce_topk,
                                            batch_format="pandas"))


# ------------------------------------------------- optimized PQ (OPQ)

OPQ_ITERS = 16


def _pq_reconstruct(codes: "np.ndarray", books: "np.ndarray",
                    dim: int) -> "np.ndarray":
    splits = np.array_split(np.arange(dim), PQ_M)
    return np.concatenate([books[m, codes[:, m], :len(cols)]
                           for m, cols in enumerate(splits)], axis=1)


def _opq_eig_alloc_init(vn: "np.ndarray") -> "np.ndarray":
    """Parametric-OPQ initialization (Ge et al. 2013 §4): PCA the
    sample, then greedily allocate eigen-directions to subspaces
    balancing the PRODUCT of eigenvalues per subspace — the allocation
    that equalizes subspace quantization difficulty under a Gaussian
    model. Gives the alternation a far better basin than identity."""
    dim = vn.shape[1]
    C = np.cov(vn, rowvar=False)
    w, E = np.linalg.eigh(C)
    order = np.argsort(-w)
    d_m = int(np.ceil(dim / PQ_M))
    buckets: list[list[int]] = [[] for _ in range(PQ_M)]
    logprod = np.zeros(PQ_M)
    for idx in order:
        cands = [m for m in range(PQ_M) if len(buckets[m]) < d_m]
        m = min(cands, key=lambda m: (logprod[m], m))
        buckets[m].append(int(idx))
        logprod[m] += np.log(max(float(w[idx]), 1e-12))
    cols = [i for b in buckets for i in b]
    return E[:, cols]


def _opq_train(sf_dir: str, vn: "np.ndarray | None" = None
               ) -> tuple["np.ndarray", "np.ndarray"]:
    """(R, books): an orthonormal rotation + PQ codebooks trained by the
    alternating minimization of Ge et al. 2013 (OPQ): plain PQ
    quantizes each subspace independently, so correlated dimensions
    that straddle a subspace boundary waste code budget; OPQ learns the
    rotation that decorrelates the subspace split, then PQ runs in the
    rotated space. Eigenvalue-allocation init (parametric OPQ), then
    alternation on the bounded training sample: fix R, train codebooks
    on X @ R; fix codes, solve the orthogonal-Procrustes problem
    R = U V' from SVD(X' Y) where Y is the codebook reconstruction.
    Deterministic (fixed seeds, driver-side on <= PQ_SAMPLE vectors).
    On the rotated product-structured fixture this cuts PQ's mean
    squared reconstruction error ~45% (pytest-pinned)."""
    if vn is None:
        vn = _sampled_unit_vectors(sf_dir, PQ_SAMPLE)
    if len(vn) == 0:
        return np.eye(1), np.zeros((PQ_M, PQ_K, 1), np.float64)
    dim = vn.shape[1]
    if len(vn) < 2 or dim < PQ_M:
        return np.eye(dim), _pq_codebooks(sf_dir, vn=vn)
    R = _opq_eig_alloc_init(vn)
    books = None
    for _ in range(OPQ_ITERS):
        Z = vn @ R
        books = _pq_codebooks(sf_dir, vn=Z)
        Y = _pq_reconstruct(_pq_encode(Z, books), books, dim)
        U, _s, Vt = np.linalg.svd(vn.T @ Y)
        R = U @ Vt
    return R, books


def embedding_opq_codes(sf_dir: str):
    """(vec_id, code: list<int64>, recon_err) — OPQ: the corpus rotated
    by the learned orthonormal R, then PQ-encoded (see `_opq_train`).
    recon_err is measured in the rotated space (= the original space up
    to the isometry). Same scale shape as `embedding_pq_codes`: R and
    the books broadcast once, row-local encode, no shuffle. Rows-only;
    rotation-recovery + recall pytests carry correctness."""
    import ray

    R, books = _opq_train(sf_dir)
    r_ref = ray.put((R, books))

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "code": pd.Series([], dtype=object),
                                 "recon_err": pd.Series([], dtype="float64")})
        rot, bks = ray.get(r_ref)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        z = (v / nv[:, None]) @ rot
        codes = _pq_encode(z, bks)
        err = ((z - _pq_reconstruct(codes, bks, z.shape[1])) ** 2) \
            .sum(axis=1)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "code": list(codes.astype(np.int64)),
            "recon_err": np.round(err, 6)})

    return _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                     columns=["vec_id", "embedding"]) \
        .map_batches(encode, batch_format="pandas")


def ann_opq_topk(sf_dir: str):
    """OPQ asymmetric-distance cosine top-5: identical search shape to
    `ann_pq_topk` (code-only ADC scan, broadcast per-query LUTs, tiny
    per-query reduce) but in the learned rotated space — queries rotate
    by the same R, so the LUT sum approximates the original inner
    product (rotation is an isometry). Rows-only; recall >= flat PQ on
    the rotated-structure fixture is pytest-pinned."""
    import ray

    qids, qmat = _load_queries(sf_dir)
    if len(qids) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "adc_score": pd.Series([], dtype="float64")})
    R, books = _opq_train(sf_dir)
    zq = qmat @ R
    dim = zq.shape[1]
    splits = np.array_split(np.arange(dim), PQ_M)
    lut = np.stack([
        np.stack([books[m, :, :len(cols)] @ q[cols]
                  for m, cols in enumerate(splits)])
        for q in zq])
    q_ref = ray.put((qids, lut, R, books))

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "code": pd.Series([], dtype=object)})
        _, _, rot, bks = ray.get(q_ref)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "code": list(_pq_encode((v / nv[:, None]) @ rot, bks)
                         .astype(np.int64))})

    codes_ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"]) \
        .map_batches(encode, batch_format="pandas")

    def adc_topk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                              "vec_id": pd.Series([], dtype="int64"),
                              "sim": pd.Series([], dtype="float64")})
        if df.empty:
            return empty
        ids_q, tables, _, _ = ray.get(q_ref)
        codes = np.array(df["code"].to_list(), dtype=np.int64)
        vids = df["vec_id"].to_numpy(np.int64)
        marange = np.arange(PQ_M)
        out = []
        for j, qid in enumerate(ids_q):
            sims = tables[j][marange[:, None], codes.T].sum(axis=0)
            mask = vids != qid
            s, bids = sims[mask], vids[mask]
            take = min(TOP_K, len(s))
            if take == 0:
                continue
            top = np.lexsort((bids, -s))[:take]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": bids[top],
                                     "sim": s[top]}))
        return pd.concat(out, ignore_index=True) if out else empty

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"],
                            ascending=[False, True]).head(TOP_K)
        df = df.assign(rank=np.arange(1, len(df) + 1, dtype=np.int64),
                       adc_score=np.round(df["sim"].to_numpy(), 6))
        return df[["query_id", "rank", "vec_id", "adc_score"]]

    return (codes_ds.map_batches(adc_topk, batch_format="pandas")
            .groupby("query_id").map_groups(reduce_topk,
                                            batch_format="pandas"))


# --------------------------------------------- embedding outlier audit

OUTLIER_MAHA_FACTOR = 2.0     # flag when maha2 > factor * dim


def embedding_outlier_scores(sf_dir: str):
    """(vec_id, maha2, is_outlier) — squared Mahalanobis distance of
    every embedding to the corpus centroid under a DIAGONAL covariance
    (the embedding-space outlier audit run before clustering/ANN
    indexing: encoder failures and off-manifold junk sit far from the
    mass in per-dimension z-units; E[maha2] = dim for well-behaved
    data, so the flag threshold is a dim multiple). is_outlier =
    maha2 > {factor} * dim.

    Scale shape: one streaming pass reduces to per-dimension moment
    partials (3 x dim floats per batch — constant-size), the driver
    finishes mean/variance on a dim-sized table and broadcasts it, and
    a second row-local pass scores each vector. Zero shuffle.
    SQL oracle via unnest + var_pop (values match at 6 dp; DuckDB's
    Welford variance differs from the moment form only in low-order
    bits, inside the gate's 1e-9 tolerance)."""
    import ray

    from ._util import round_sql

    ds = _emb_read(os.path.join(sf_dir, "embeddings.parquet"),
                   columns=["vec_id", "embedding"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"d": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="float64"),
                                 "s2": pd.Series([], dtype="float64"),
                                 "n": pd.Series([], dtype="int64")})
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        return pd.DataFrame({
            "d": np.arange(v.shape[1], dtype=np.int64),
            "s": v.sum(axis=0), "s2": (v * v).sum(axis=0),
            "n": np.full(v.shape[1], len(v), np.int64)})

    part = ds.map_batches(moments, batch_format="pandas").to_pandas()
    if "d" not in part.columns or part.empty:
        return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                             "maha2": pd.Series([], dtype=np.float64),
                             "is_outlier": pd.Series([], dtype=bool)})
    g = part.groupby("d", as_index=False).sum().sort_values("d")
    n = g["n"].to_numpy(np.float64)
    mu = g["s"].to_numpy(np.float64) / n
    var = g["s2"].to_numpy(np.float64) / n - mu * mu
    var[var <= 0] = 1.0                  # constant dims score zero
    dim = len(mu)
    thresh = OUTLIER_MAHA_FACTOR * dim
    ref = ray.put((mu, var))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "maha2": pd.Series([], dtype=np.float64),
                                 "is_outlier": pd.Series([], dtype=bool)})
        m, vv = ray.get(ref)
        x = np.array(df["embedding"].to_list(), dtype=np.float64)
        maha2 = (((x - m) ** 2) / vv).sum(axis=1)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "maha2": round_sql(maha2),
            "is_outlier": maha2 > thresh})

    return ds.map_batches(score, batch_format="pandas")


EMBEDDING_OUTLIER_SQL = f"""
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings),
m AS (SELECT d, avg(x) AS mu,
             CASE WHEN var_pop(x) > 0 THEN var_pop(x) ELSE 1.0 END AS v
      FROM e GROUP BY d),
dim AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM m),
s AS (SELECT vec_id, sum((x - mu) * (x - mu) / v) AS maha2
      FROM e JOIN m USING (d) GROUP BY vec_id)
SELECT vec_id, round(maha2, 6) AS maha2,
       maha2 > {OUTLIER_MAHA_FACTOR} * dim.nd AS is_outlier
FROM s CROSS JOIN dim
"""

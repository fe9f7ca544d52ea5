"""Dedup + similarity pipelines on planted duplicates (the testdata corpus
has no near-dups, so these fixtures make the operators' behavior visible)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "operator watches the process line with great care and patience").split()


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("planted"))
    texts = {
        0: " ".join(BASE),
        1: " ".join(BASE),                      # exact dup of 0
        2: " ".join(BASE[:-2] + ["calm", "focus"]),   # near-dup of 0
        3: " ".join(reversed(BASE)),            # same words, different shingles
        4: "completely different content about valves pumps and reflux drums",
        5: "unrelated text mentioning compressors turbines and heat exchangers",
    }
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    }), os.path.join(root, "documents.parquet"))

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((6, 16)).astype(np.float32)
    vecs[1] = vecs[0]                            # exact dup vector
    vecs[2] = vecs[0] + rng.standard_normal(16).astype(np.float32) * 0.01
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }), os.path.join(root, "embeddings.parquet"))
    return root


def test_dedup_exact_planted(ray_session, planted_dir):
    from p_id_text_extraction_ray.pipelines.dedup import dedup_exact
    df = dedup_exact(planted_dir).to_pandas()
    # 6 docs, one exact pair -> 5 content hashes; doc 1 deduped into doc 0
    assert len(df) == 5
    assert 1 not in set(df["doc_id"])
    assert 0 in set(df["doc_id"])


def test_dedup_ngram_jaccard_planted(ray_session, planted_dir):
    from p_id_text_extraction_ray.pipelines.dedup import dedup_ngram_jaccard
    df = dedup_ngram_jaccard(planted_dir)
    pairs = set(zip(df["doc_a"], df["doc_b"]))
    assert (0, 1) in pairs                      # exact dup -> jaccard 1.0
    j01 = df[(df["doc_a"] == 0) & (df["doc_b"] == 1)]["jaccard"].iloc[0]
    assert j01 == 1.0
    assert (0, 2) in pairs                      # near-dup above threshold
    assert not any(a in (4, 5) or b in (4, 5) for a, b in pairs)


def test_dedup_minhash_lsh_subset_of_exact(ray_session, planted_dir):
    from p_id_text_extraction_ray.pipelines.dedup import (dedup_minhash_lsh,
                                                          dedup_ngram_jaccard)
    lsh = dedup_minhash_lsh(planted_dir)
    exact = dedup_ngram_jaccard(planted_dir)
    lsh_pairs = set(zip(lsh["doc_a"], lsh["doc_b"]))
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    assert lsh_pairs <= exact_pairs             # verified candidates only
    assert (0, 1) in lsh_pairs                  # identical docs always recalled


def test_dedup_simhash_planted(ray_session, planted_dir):
    from p_id_text_extraction_ray.pipelines.dedup import dedup_simhash
    df = dedup_simhash(planted_dir).to_pandas()
    pairs = set(zip(df["doc_a"], df["doc_b"]))
    assert (0, 1) in pairs
    assert df[(df["doc_a"] == 0) & (df["doc_b"] == 1)]["hamming"].iloc[0] == 0


def test_dedup_embedding_cosine_planted(ray_session, planted_dir):
    from p_id_text_extraction_ray.pipelines.dedup import dedup_embedding_cosine
    df = dedup_embedding_cosine(planted_dir)
    pairs = set(zip(df["vec_a"], df["vec_b"]))
    assert (0, 1) in pairs and (0, 2) in pairs
    assert df[(df["vec_a"] == 0) & (df["vec_b"] == 1)]["cosine"].iloc[0] == 1.0


def test_ann_lsh_recalls_exact_duplicate(ray_session, planted_dir):
    from p_id_text_extraction_ray.pipelines.similarity import (
        ann_lsh_topk, ann_topk_bruteforce)
    brute = ann_topk_bruteforce(planted_dir).to_pandas()
    lsh = ann_lsh_topk(planted_dir).to_pandas()
    # identical vectors share every hyperplane signature -> always recalled
    b0 = brute[(brute["query_id"] == 0) & (brute["rank"] == 1)]["vec_id"].iloc[0]
    assert b0 == 1
    l0 = lsh[lsh["query_id"] == 0]
    assert 1 in set(l0["vec_id"])
    # LSH results are a subset of the candidate universe with correct sims
    merged = lsh.merge(brute, on=["query_id", "vec_id"], suffixes=("_l", "_b"))
    assert np.allclose(merged["cosine_l"], merged["cosine_b"])


@pytest.fixture(scope="module")
def neighbor_dir(tmp_path_factory):
    """200 random vectors + 4 query vectors (vec_id 0..3); each query gets
    FIVE planted near neighbors (ids 100+5q .. 104+5q, increasing noise) so
    the brute-force top-5 is exactly the planted set and LSH recall of true
    near neighbors is measurable."""
    root = str(tmp_path_factory.mktemp("neighbors"))
    rng = np.random.default_rng(11)
    n, dim = 200, 32
    vecs = rng.standard_normal((n, dim))
    vecs /= np.linalg.norm(vecs, axis=1)[:, None]
    for q in range(4):
        for i in range(5):
            vecs[100 + 5 * q + i] = (vecs[q]
                                     + rng.standard_normal(dim) * 0.005 * (i + 1))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    }), os.path.join(root, "embeddings.parquet"))
    return root


def test_ann_lsh_multiprobe_recall(ray_session, neighbor_dir):
    """Hamming-1 multi-probe recall of true near neighbors >= 0.9 and the
    closest planted neighbor is rank-1 (deterministic: fixed seeds)."""
    from p_id_text_extraction_ray.pipelines.similarity import (
        ann_lsh_topk, ann_topk_bruteforce)
    brute = ann_topk_bruteforce(neighbor_dir).to_pandas()
    lsh = ann_lsh_topk(neighbor_dir).to_pandas()
    hits = total = 0
    for q in range(4):
        planted = {100 + 5 * q + i for i in range(5)}
        bset = set(brute[brute["query_id"] == q]["vec_id"])
        assert bset == planted                     # brute top-5 = planted set
        lset = set(lsh[lsh["query_id"] == q]["vec_id"])
        hits += len(bset & lset)
        total += len(bset)
        l1 = lsh[(lsh["query_id"] == q) & (lsh["rank"] == 1)]["vec_id"].iloc[0]
        assert l1 == 100 + 5 * q
    assert hits / total >= 0.9


def test_ann_ivf_recall(ray_session, neighbor_dir):
    """IVF (nprobe=4 of 16 cells) recall vs brute force >= 0.9 on the
    planted-neighbor fixture; planted rank-1 always found (fixed seeds)."""
    from p_id_text_extraction_ray.pipelines.similarity import (
        ann_ivf_topk, ann_topk_bruteforce)
    brute = ann_topk_bruteforce(neighbor_dir).to_pandas()
    ivf = ann_ivf_topk(neighbor_dir).to_pandas()
    hits = total = 0
    for q in range(4):
        bset = set(brute[brute["query_id"] == q]["vec_id"])
        iset = set(ivf[ivf["query_id"] == q]["vec_id"])
        hits += len(bset & iset)
        total += len(bset)
        i1 = ivf[(ivf["query_id"] == q) & (ivf["rank"] == 1)]["vec_id"].iloc[0]
        assert i1 == 100 + 5 * q
    assert hits / total >= 0.9


def test_dedup_clusters_planted(ray_session, planted_dir):
    """Docs 0/1/2 form one near-dup component (pairs (0,1) and (0,2)) and
    must all take cluster label 0; everything else labels itself."""
    from p_id_text_extraction_ray.pipelines.dedup import dedup_clusters
    df = dedup_clusters(planted_dir).to_pandas().sort_values("doc_id")
    lab = dict(zip(df["doc_id"], df["cluster"]))
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[3] == 3 and lab[4] == 4 and lab[5] == 5


def test_doc_novelty_planted(ray_session, tmp_path):
    """A doc copied verbatim from another has zero novelty; a doc in a
    disjoint vocabulary has full novelty."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.dedup import doc_novelty_score
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([base, base,  # verbatim pair: nothing unique
                          "omega psi chi phi upsilon tau sigma rho"],
                         pa.string()),
        "lang": pa.array(["en"] * 3), "source": pa.array(["s"] * 3),
        "n_chars": pa.array([len(base), len(base), 40], pa.int64())})
    root = str(tmp_path)
    pq.write_table(docs, f"{root}/documents.parquet")
    out = doc_novelty_score(root).to_pandas().set_index("doc_id")
    assert out.loc[0, "novelty"] == 0.0 and out.loc[1, "novelty"] == 0.0
    assert out.loc[2, "novelty"] == 1.0
    assert out.loc[2, "n_shingles"] == 8 - 2  # 8 words -> 6 3-gram shingles


def test_ann_recall_eval_query(ray_session, neighbor_dir):
    """The recall-eval query reports bruteforce == 1.0 and lower-bounds
    the approximate paths; values must equal an independent per-query
    set-intersection re-derivation."""
    from p_id_text_extraction_ray.pipelines.similarity import (
        ann_ivf_topk, ann_lsh_topk, ann_pq_topk, ann_recall_eval,
        ann_topk_bruteforce)
    out = ann_recall_eval(neighbor_dir).set_index("method")
    assert out.loc["bruteforce", "recall_at_k"] == 1.0
    assert (out["n_queries"] == 4).all()
    brute = ann_topk_bruteforce(neighbor_dir).to_pandas()
    for method, fn in (("lsh", ann_lsh_topk), ("ivf", ann_ivf_topk),
                       ("pq", ann_pq_topk)):
        got = fn(neighbor_dir).to_pandas()
        hits = total = 0
        for q in range(4):
            bset = set(brute[brute["query_id"] == q]["vec_id"])
            hits += len(bset & set(got[got["query_id"] == q]["vec_id"]))
            total += len(bset)
        assert out.loc[method, "recall_at_k"] == round(hits / total, 6)
        assert out.loc[method, "recall_at_k"] >= 0.9


def test_ann_pq_recall(ray_session, neighbor_dir):
    """PQ-ADC (8 subspaces x 16 centroids) recall vs brute force >= 0.9
    on the planted-neighbor fixture; the closest planted neighbor is
    rank-1 (deterministic: hash sample + fixed k-means seed)."""
    from p_id_text_extraction_ray.pipelines.similarity import (
        ann_pq_topk, ann_topk_bruteforce)
    brute = ann_topk_bruteforce(neighbor_dir).to_pandas()
    pqr = ann_pq_topk(neighbor_dir).to_pandas()
    hits = total = 0
    for q in range(4):
        bset = set(brute[brute["query_id"] == q]["vec_id"])
        pset = set(pqr[pqr["query_id"] == q]["vec_id"])
        hits += len(bset & pset)
        total += len(bset)
        p1 = pqr[(pqr["query_id"] == q) & (pqr["rank"] == 1)]["vec_id"].iloc[0]
        assert p1 == 100 + 5 * q
    assert hits / total >= 0.9


def test_pq_codes_numpy_parity_and_determinism(ray_session, neighbor_dir):
    """PQ encoding matches an independent driver-side re-derivation
    (same codebooks, brute argmin per subspace), recon_err is the true
    squared L2 gap, and the whole thing is a pure function of the input
    (identical across runs — the bottom-k hash sample is
    partition-invariant)."""
    import pyarrow.parquet as pq_
    from p_id_text_extraction_ray.pipelines.similarity import (
        PQ_M, _pq_codebooks, embedding_pq_codes)
    out = embedding_pq_codes(neighbor_dir).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    books = _pq_codebooks(neighbor_dir)
    t = pq_.read_table(f"{neighbor_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    v = np.array(t["embedding"].to_pylist(), np.float64)[order]
    vn = v / np.linalg.norm(v, axis=1)[:, None]
    splits = np.array_split(np.arange(vn.shape[1]), PQ_M)
    got_codes = np.array(out["code"].to_list(), np.int64)
    for m, cols in enumerate(splits):
        C = books[m, :, :len(cols)]
        # same expanded-form distance as _pq_encode (-2xC' + ||C||^2):
        # the direct ((x-C)^2).sum form differs in the last ulp, which
        # can flip a near-tie argmin on other BLAS builds (ADVICE r4)
        sub = vn[:, cols]
        d2 = -2.0 * (sub @ C.T) + (C * C).sum(axis=1)[None, :]
        want = np.argmin(d2, axis=1)
        assert (got_codes[:, m] == want).all()
    recon = np.concatenate([books[m, got_codes[:, m], :len(cols)]
                            for m, cols in enumerate(splits)], axis=1)
    err = ((vn - recon) ** 2).sum(axis=1)
    assert np.allclose(out["recon_err"].to_numpy(), np.round(err, 6))
    again = embedding_pq_codes(neighbor_dir).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (np.array(again["code"].to_list(), np.int64)
            == got_codes).all()


def test_ann_ivfpq_recall(ray_session, neighbor_dir):
    """Composed IVF-PQ (probe 4 of 16 cells, residual-PQ ADC over codes)
    recall vs brute force >= 0.9 on the planted-neighbor fixture; the
    rank-1 hit is one of the planted near-duplicates. (Exact rank-1
    equality is NOT asserted: the five planted neighbors differ by
    ~1e-4 cosine, below ADC resolution by design — the coarser flat-PQ
    codes used to collapse them to a vec_id tiebreak, the finer
    residual codes legitimately reorder within the set.)"""
    from p_id_text_extraction_ray.pipelines.similarity import (
        ann_ivfpq_topk, ann_topk_bruteforce)
    brute = ann_topk_bruteforce(neighbor_dir).to_pandas()
    got = ann_ivfpq_topk(neighbor_dir).to_pandas()
    hits = total = 0
    for q in range(4):
        bset = set(brute[brute["query_id"] == q]["vec_id"])
        gset = set(got[got["query_id"] == q]["vec_id"])
        hits += len(bset & gset)
        total += len(bset)
        g1 = got[(got["query_id"] == q) & (got["rank"] == 1)]["vec_id"].iloc[0]
        assert g1 in {100 + 5 * q + i for i in range(5)}
    assert hits / total >= 0.9

"""Curation-operator properties: packing invariants, planted
contamination recall, and determinism (the oracle-equality check runs
separately in test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pytest

from p_id_text_extraction_ray.pipelines import curation as C

SF = "/root/testdata/sf0.001"


def test_pack_covers_every_doc_once(ray_session):
    out = C.pack_sequences(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])


def test_pack_bins_are_contiguous_chunks(ray_session):
    """Within a bucket, bin boundaries are exactly the PACK_BUDGET-token
    chunk edges of the running offset (pack-then-split semantics)."""
    out = C.pack_sequences(SF).to_pandas()
    for _, g in out.groupby("bucket"):
        g = g.sort_values("doc_id")
        start = g["n_tok"].to_numpy().cumsum() - g["n_tok"].to_numpy()
        assert (g["bin_id"].to_numpy() == start // C.PACK_BUDGET).all()
        # bin ids are nondecreasing in pack order, starting at 0
        assert g["bin_id"].iloc[0] == 0
        assert (np.diff(g["bin_id"].to_numpy()) >= 0).all()


def test_decontaminate_flags_planted_overlap(ray_session, tmp_path):
    """A train doc that copies 8 consecutive words from a holdout doc is
    flagged; unrelated train docs are not."""
    hold_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame({
        "doc_id": [10, 1, 2],          # 10 -> holdout (doc_id % 10 == 0)
        "text": [hold_text,
                 "x y " + " ".join(hold_text.split()[:8]) + " z",
                 "totally different words with no overlap at all here"],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = C.decontaminate_train(str(tmp_path)).to_pandas()
    assert set(out["doc_id"]) == {1}
    assert int(out.loc[out["doc_id"] == 1, "n_shared"].iloc[0]) == 1


def test_decontaminate_deterministic(ray_session):
    a = C.decontaminate_train(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = C.decontaminate_train(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert a.equals(b)


def test_embedding_quantize_error_bound(ray_session):
    """int8 reconstruction error is bounded by scale/2 per component and
    the output is deterministic."""
    from p_id_text_extraction_ray.pipelines.similarity import (
        embedding_quantize_int8)
    out = embedding_quantize_int8(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id"])
    assert len(out) == len(emb)
    assert (out["max_abs_err"] <= out["scale"] / 2 + 1e-9).all()
    assert (out["mse"] >= 0).all()
    again = embedding_quantize_int8(SF).to_pandas()
    assert out.sort_values("vec_id").reset_index(drop=True).equals(
        again.sort_values("vec_id").reset_index(drop=True))


def test_kmeans_clusters_cover_all_vectors(ray_session):
    """Every vector lands in exactly one cluster; output is deterministic
    and mean cosine is a valid similarity."""
    from p_id_text_extraction_ray.pipelines.similarity import (
        embedding_kmeans_clusters)
    out = embedding_kmeans_clusters(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id"])
    assert out["n_vectors"].sum() == len(emb)
    assert out["mean_cosine"].between(-1.0, 1.0 + 1e-9).all()
    again = embedding_kmeans_clusters(SF).to_pandas()
    assert out.sort_values("cluster").reset_index(drop=True).equals(
        again.sort_values("cluster").reset_index(drop=True))


def test_dedup_substring_planted(ray_session, tmp_path):
    """A doc sharing one 8-gram with another doc counts exactly the
    shared positions; a within-doc repeat does NOT count (the gram must
    span two documents); disjoint docs score zero."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            shared + " kappa mu nu xi",              # gram at pos 0 shared
            "pre1 pre2 " + shared,                    # gram at pos 2 shared
            "self self " + "rho sigma tau upsilon phi chi psi om "
            + "rho sigma tau upsilon phi chi psi om", # repeats only itself
            "nine ten eleven twelve thirteen fourteen fifteen sixteen",
        ],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = C.dedup_substring(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "n_grams"] == 5          # 12 words -> 5 windows
    assert out.loc[1, "n_dup_positions"] == 1
    assert out.loc[2, "n_grams"] == 3          # 10 words -> 3 windows
    assert out.loc[2, "n_dup_positions"] == 1
    # doc 3's duplicated gram appears twice but only within doc 3
    assert out.loc[3, "n_dup_positions"] == 0
    assert out.loc[4, "n_dup_positions"] == 0
    assert out.loc[4, "dup_rate"] == 0.0


def test_decontaminate_fuzzy_planted(ray_session, tmp_path):
    """A train doc that paraphrases a holdout doc (a few words changed —
    invisible to exact 8-gram matching at this length, visible to
    MinHash shingle overlap) is flagged with the right holdout match;
    an unrelated train doc is not; the flagged jaccard equals a direct
    shingle-set re-derivation."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.functions.hashing import (jaccard,
                                                            word_shingles)
    from p_id_text_extraction_ray.pipelines.curation import (
        FUZZY_DECON_JACCARD, decontaminate_fuzzy)
    from p_id_text_extraction_ray.pipelines.dedup import SHINGLE_K
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "sailors count yellow marbles beside an ancient harbor wall "
            "and the evening tide slowly turns under a copper sky")
    near = base.replace("quick", "swift").replace("copper", "silver")
    other = ("completely unrelated text about matrix decompositions and "
             "sparse eigenvalue solvers on distributed hardware stacks "
             "with no shared vocabulary whatsoever in this entire doc")
    docs = pa.table({
        "doc_id": pa.array([10, 3, 7], pa.int64()),   # 10 -> holdout
        "text": pa.array([base, near, other]),
        "lang": pa.array(["en"] * 3), "source": pa.array(["s"] * 3),
        "n_chars": pa.array([len(base), len(near), len(other)], pa.int64())})
    root = str(tmp_path)
    pq.write_table(docs, f"{root}/documents.parquet")
    out = decontaminate_fuzzy(root).to_pandas()
    assert set(out["doc_id"]) == {3}
    assert out.iloc[0]["holdout_id"] == 10
    want = jaccard(word_shingles(near, SHINGLE_K),
                   word_shingles(base, SHINGLE_K))
    assert want >= FUZZY_DECON_JACCARD
    assert out.iloc[0]["jaccard"] == round(want, 6)

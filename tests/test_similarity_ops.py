

"""Semantic-dedup pruning (SemDeDup) over the embeddings table."""

import numpy as np
import pandas as pd

# ----------------------------------------------------------- semdedup


def _write_semdedup_fixture(tmp_path, n_extra=40, dim=8):
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(5)
    base = rng.normal(size=(n_extra, dim))
    base /= np.linalg.norm(base, axis=1)[:, None]
    # planted near-dup pair: vec 1000 is vec 1001 with a tiny nudge
    a = np.zeros(dim); a[0] = 1.0
    b = a + 0.01 * np.eye(dim)[1]
    b /= np.linalg.norm(b)
    vecs = np.vstack([base, a, b])
    ids = np.r_[np.arange(n_extra), [1000, 1001]]
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(ids), np.int32), pa.int32())})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_prunes_planted_near_duplicate(ray_session, tmp_path):
    from p_id_text_extraction_ray.pipelines.similarity import semdedup_prune
    root = _write_semdedup_fixture(tmp_path)
    out = semdedup_prune(root).to_pandas().set_index("vec_id")
    pair = out.loc[[1000, 1001], "keep"]
    assert pair.sum() == 1            # exactly one of the near-dups kept
    # randomized unit vectors in 8-d are far apart: none pruned
    others = out.drop(index=[1000, 1001])
    assert others["keep"].all()


def test_semdedup_deterministic_across_partitionings(ray_session, tmp_path):
    from p_id_text_extraction_ray.pipelines.similarity import semdedup_prune
    root = _write_semdedup_fixture(tmp_path, n_extra=60)
    a = semdedup_prune(root).to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    b = semdedup_prune(root).to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert set(a.columns) == {"vec_id", "cluster", "centroid_sim", "keep"}

"""Distributed PCA: the streaming sufficient-statistics path must equal
exact single-machine PCA, be deterministic (sign convention), and
satisfy the residual-variance identity."""

import numpy as np
import pandas as pd

from p_id_text_extraction_ray.pipelines.similarity import (
    PCA_K, embedding_pca_project, pca_variance_explained)

SF = "/root/testdata/sf0.001"


def _run(sf_dir=SF) -> pd.DataFrame:
    return embedding_pca_project(sf_dir).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)


def test_pca_shape_and_determinism(ray_session):
    a, b = _run(), _run()
    assert len(a) == 500 and all(len(p) == PCA_K for p in a["proj"])
    # bit-identical across runs: deterministic eigh + sign convention
    assert np.array_equal(np.stack(a["proj"].to_numpy()),
                          np.stack(b["proj"].to_numpy()))
    assert np.array_equal(a["recon_mse"].to_numpy(), b["recon_mse"].to_numpy())


def test_pca_matches_exact_and_residual_identity(ray_session):
    import pyarrow.parquet as pq
    out = _run()
    m = np.stack(pq.read_table(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
                 .to_pandas().sort_values("vec_id")["embedding"]
                 .to_numpy()).astype(np.float64)
    n, d = m.shape
    mu = m.mean(axis=0)
    cov = np.cov(m, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]

    # eigenvalue spectrum from the streaming stats equals exact numpy
    np.testing.assert_allclose(pca_variance_explained(SF), evals[:PCA_K],
                               rtol=1e-9, atol=1e-12)

    # per-component sample variance of the projections == eigenvalue
    z = np.stack(out["proj"].to_numpy())
    np.testing.assert_allclose(z.var(axis=0, ddof=1), evals[:PCA_K],
                               rtol=1e-5)

    # residual identity: mean recon MSE == (n-1)/(n d) * (tr(cov) - sum topK)
    expect = (n - 1) / (n * d) * (np.trace(cov) - evals[:PCA_K].sum())
    np.testing.assert_allclose(out["recon_mse"].mean(), expect, rtol=1e-5)

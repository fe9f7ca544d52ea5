"""ANN recall on CLUSTERED embeddings (VERDICT r4 item 4).

The sf corpora's random embeddings are the adversarial regime for
bucketed ANN (near-equidistant neighbors), so `ann_recall_eval` honestly
reports low approximate recall there. These tests pin the meaningful
measurement: on a mixture-of-Gaussians corpus with planted
near-duplicates (the shape of real embedding corpora), IVF and the
residual-encoding IVF-PQ must reach recall@5 >= 0.9 in the
`ann_recall_eval` output itself.
"""

import numpy as np
import pytest

from p_id_text_extraction_ray.fixtures.embeddings import \
    generate_clustered_embeddings


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    return generate_clustered_embeddings(
        str(tmp_path_factory.mktemp("clustered_emb")))


def test_clustered_recall_ivf_and_ivfpq(ray_session, clustered_dir):
    """recall@5 >= 0.9 for IVF and IVF-PQ on the clustered fixture, read
    straight from the ann_recall_eval output (the user-facing gate)."""
    from p_id_text_extraction_ray.pipelines.similarity import ann_recall_eval
    ev = ann_recall_eval(clustered_dir).set_index("method")["recall_at_k"]
    assert ev["bruteforce"] == 1.0
    assert ev["ivf"] >= 0.9
    assert ev["ivfpq"] >= 0.9
    # every approximate path is present in the gate's report
    assert {"lsh", "pq"} <= set(ev.index)


def test_clustered_bruteforce_finds_planted(ray_session, clustered_dir):
    """The exact top-5 of each query is exactly its planted
    near-duplicate set (fixture contract: the margin construction the
    recall numbers rest on)."""
    from p_id_text_extraction_ray.pipelines.similarity import (
        TOP_K, ann_topk_bruteforce)
    brute = ann_topk_bruteforce(clustered_dir).to_pandas()
    for q in range(4):
        got = set(brute.loc[brute["query_id"] == q, "vec_id"])
        want = {250 * q + 10 + i for i in range(TOP_K)}
        assert got == want


def test_ivfpq_residual_codes_differ_within_cluster(ray_session,
                                                    clustered_dir):
    """Regression pin for the residual-encoding design: flat PQ assigns
    near-identical codes to all members of a tight cluster (the failure
    that motivated residual encoding); the IVF-PQ residual codes must
    actually vary within a cluster."""
    import pyarrow.parquet as pq

    from p_id_text_extraction_ray.pipelines import similarity as S
    t = pq.read_table(f"{clustered_dir}/embeddings.parquet")
    v = np.array(t["embedding"].to_pylist(), np.float64)
    v /= np.linalg.norm(v, axis=1)[:, None]
    sample = S._sampled_unit_vectors(clustered_dir,
                                     max(S.IVF_SAMPLE, S.IVFPQ_SAMPLE))
    C = S._ivf_centroids(clustered_dir, vn=sample[:S.IVF_SAMPLE])
    resid = sample[:S.IVFPQ_SAMPLE] \
        - C[np.argmax(sample[:S.IVFPQ_SAMPLE] @ C.T, axis=1)]
    books = S._pq_codebooks(clustered_dir, vn=resid,
                            n_centroids=S.IVFPQ_K)
    cells = np.argmax(v @ C.T, axis=1)
    # members of the query-0 cluster (rows 4..249 share cluster with q0's
    # planted block): their residual codes must not collapse to one value
    members = np.flatnonzero(cells == cells[0])[:100]
    codes = S._pq_encode(v[members] - C[cells[members]], books)
    assert len({tuple(c) for c in codes}) > len(members) // 2

"""PageRank over the token graph: hand-computable planted graphs plus
oracle equality on the same fixture."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import graph as G


def _write_docs(root, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}),
        os.path.join(root, "documents.parquet"))


def _oracle(root):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT *"
                f" FROM '{root}/documents.parquet'")
    return con.execute(G.PAGERANK_TOKENS_SQL).df()


def _run(root) -> pd.DataFrame:
    out = G.pagerank_tokens(root)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    return out.sort_values("token").reset_index(drop=True)


def test_pagerank_two_cycle(ray_session, tmp_path):
    """a->b->a: symmetric 2-cycle, every node keeps rank exactly 1 at
    every iteration (od=1, incoming = 1 -> r = 0.15 + 0.85*1 = 1)."""
    root = str(tmp_path)
    _write_docs(root, ["a b a"])
    out = _run(root)
    assert out["token"].tolist() == ["a", "b"]
    assert np.allclose(out["pagerank"], 1.0)


def test_pagerank_hand_computed_chain(ray_session, tmp_path):
    """a->b, b->c (plus isolated d): ranks follow the closed form for 3
    iterations; the sink c accumulates, the source a decays to 0.15."""
    root = str(tmp_path)
    _write_docs(root, ["a b c", "d"])
    out = _run(root)
    r = dict(zip(out["token"], out["pagerank"]))
    d = 0.85
    # closed-form per iteration: ra=0.15; rb=0.15+.85*ra_prev; rc=0.15+.85*rb_prev
    ra = [1.0]; rb = [1.0]; rc = [1.0]
    for _ in range(3):
        ra.append(0.15)
        rb.append(0.15 + d * ra[-2])
        rc.append(0.15 + d * rb[-2])
    assert r["a"] == pytest.approx(0.15)
    assert r["b"] == pytest.approx(rb[3])
    assert r["c"] == pytest.approx(rc[3])
    assert r["d"] == pytest.approx(0.15)   # isolated: no in, no out
    orc = _oracle(root).sort_values("token").reset_index(drop=True)
    pd.testing.assert_frame_equal(_run(root), orc, check_dtype=False,
                                  atol=1e-9, rtol=0)


def test_pagerank_duplicate_edges_count_once(ray_session, tmp_path):
    """The edge set is DISTINCT pairs: repeating 'a b' across documents
    (and within one) must not multiply b's incoming mass."""
    root = str(tmp_path)
    _write_docs(root, ["a b", "a b a b", "c a b"])
    out1 = _run(root)
    root2 = os.path.join(str(tmp_path), "single")
    os.makedirs(root2)
    _write_docs(root2, ["c a b a"])        # same distinct edge set
    out2 = _run(root2)
    pd.testing.assert_frame_equal(out1, out2, atol=1e-12, rtol=0)


def test_pagerank_matches_oracle_on_corpus(ray_session, tmp_path):
    out = _run("/root/testdata/sf0.001")
    orc = _oracle("/root/testdata/sf0.001").sort_values("token") \
        .reset_index(drop=True)
    assert len(out) == len(orc)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False,
                                  atol=1e-9, rtol=0)


def test_triangle_count_planted_graph(ray_session, tmp_path):
    """A corpus engineered to a known graph: one triangle (x,y,z), one
    open wedge (p-q-r with no p-r edge)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.graph import token_triangle_count
    # each pair must co-occur in >= 2 docs to become an edge
    texts = ["x y z", "x y z",          # triangle edges xy xz yz
             "p q", "p q", "q r", "q r"]  # wedge p-q-r, no p-r edge
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    root = str(tmp_path)
    pq.write_table(docs, f"{root}/documents.parquet")
    out = token_triangle_count(root)
    row = out.iloc[0]
    assert row["n_edges"] == 5          # xy xz yz pq qr
    assert row["n_triangles"] == 1      # xyz
    assert row["n_wedges"] == 2         # x<y<z closed, p<q<r open
    assert row["closure_ratio"] == 0.5


def test_triangle_join_path_matches_local(ray_session, monkeypatch):
    """The distributed join path (cap forced to 0) and the local
    adjacency path produce identical counts."""
    import pandas as pd
    from p_id_text_extraction_ray.pipelines import graph as G
    fast = G.token_triangle_count("/root/testdata/sf0.001")
    monkeypatch.setattr(G, "TRIANGLE_LOCAL_EDGE_CAP", 0)
    slow = G.token_triangle_count("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)

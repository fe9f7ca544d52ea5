"""Semantic checks for the retrieval operators (the oracle gate in
test_queries_vs_oracle.py covers exactness vs DuckDB; these pin the
behavior on planted corpora where relevance is known by construction)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import retrieval as RT


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """20 filler docs + one doc saturated with q0's terms ('hash join')
    + one doc with a single 'hash'."""
    root = tmp_path_factory.mktemp("retrieval")
    texts = ["window sort batch customer order scan merge" for _ in range(20)]
    texts.append("hash join " * 30)            # doc 20: the planted hit
    texts.append("hash scan scan scan")        # doc 21: weak match
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array([t.strip() for t in texts]),
    })
    pq.write_table(tbl, str(root / "documents.parquet"))
    return str(root)


def test_inverted_index_bruteforce(ray_session, planted_dir):
    out = RT.inverted_index(planted_dir)
    tbl = pq.read_table(planted_dir + "/documents.parquet")
    dfreq, tfreq = {}, {}
    for text in tbl.column("text").to_pylist():
        words = text.split()
        for w in words:
            tfreq[w] = tfreq.get(w, 0) + 1
        for w in set(words):
            dfreq[w] = dfreq.get(w, 0) + 1
    assert out["term"].tolist() == sorted(tfreq)
    got = dict(zip(out["term"], zip(out["doc_freq"], out["total_tf"])))
    for t in tfreq:
        assert got[t] == (dfreq[t], tfreq[t])


def test_bm25_planted_doc_ranks_first(ray_session, planted_dir):
    out = RT.bm25_search(planted_dir)
    q0 = out[out["query_id"] == 0].sort_values("rank")
    # the saturated doc wins; the single-'hash' doc still scores > 0
    assert q0.iloc[0]["doc_id"] == 20
    assert 21 in set(q0["doc_id"])
    assert (q0["score"].to_numpy()[:-1] >= q0["score"].to_numpy()[1:]).all()
    # ranks are dense 1..k
    assert q0["rank"].tolist() == list(range(1, len(q0) + 1))


def test_bm25_score_matches_hand_formula(ray_session, planted_dir):
    out = RT.bm25_search(planted_dir)
    row = out[(out["query_id"] == 0) & (out["doc_id"] == 21)].iloc[0]
    tbl = pq.read_table(planted_dir + "/documents.parquet")
    texts = tbl.column("text").to_pylist()
    n_docs = len(texts)
    lens = [len(t.split()) for t in texts]
    avgdl = float(sum(lens)) / float(n_docs)
    doc = texts[21].split()

    def idf(term):
        df = sum(term in t.split() for t in texts)
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def w(term):
        tf = float(doc.count(term))
        return tf * RT.K1P1 / (tf + RT.K1 * (RT.ONE_MINUS_B
                                             + RT.B * (len(doc) / avgdl)))

    expect = idf("hash") * w("hash") + idf("join") * w("join")
    assert row["score"] == pytest.approx(expect, abs=1e-12)


def test_cooccurrence_planted_counts(ray_session, planted_dir):
    out = RT.token_cooccurrence(planted_dir)
    # 'hash'/'join' co-occur only in doc 20 (< MIN_PAIR_DOCS) -> absent
    assert out[(out["tok_a"] == "hash") & (out["tok_b"] == "join")].empty
    # the 20 filler docs share all their terms pairwise
    row = out[(out["tok_a"] == "batch") & (out["tok_b"] == "customer")].iloc[0]
    assert row["n_ab"] == 20 and row["n_a"] == 20 and row["n_b"] == 20
    assert row["lift"] == (22.0 * 20.0) / (20.0 * 20.0)
    # canonical ordering and no diagonal rows
    assert (out["tok_a"] < out["tok_b"]).all()


def test_cooccurrence_top_v_cap(ray_session, planted_dir):
    toks = set(pd.concat([pd.Series(RT.token_cooccurrence(planted_dir)[c])
                          for c in ("tok_a", "tok_b")]))
    assert len(toks) <= RT.TOP_V

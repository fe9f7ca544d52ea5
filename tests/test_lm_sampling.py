"""Semantic checks for weighted sampling and the unigram-LM scorer."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import sampling as SP
from p_id_text_extraction_ray.pipelines import textstats as T


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lmsample")
    n = 300
    texts = ["aa bb" for _ in range(n - 1)] + ["aa aa aa cc"]
    n_chars = [5] * (n - 1) + [10**9]           # doc 299: giant weight
    tbl = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array(n_chars, type=pa.int64()),
    })
    pq.write_table(tbl, str(root / "documents.parquet"))
    return str(root)


def _brute_sample(planted_dir, k):
    df = pq.read_table(planted_dir + "/documents.parquet").to_pandas()
    w = (df["n_chars"] + 1).astype(np.int64)
    u = np.array([int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16)
                  for d in df["doc_id"]]) / SP._U52
    pri = np.log(u) / w.to_numpy(dtype=np.float64)
    order = np.lexsort((df["doc_id"].to_numpy(), -pri))[:k]
    return df["doc_id"].to_numpy()[order]


def test_weighted_sample_matches_bruteforce(ray_session, planted_dir):
    out = SP.weighted_sample_docs(planted_dir)
    assert len(out) == SP.WEIGHTED_SAMPLE_K
    expect = _brute_sample(planted_dir, SP.WEIGHTED_SAMPLE_K)
    assert out.sort_values("rank")["doc_id"].tolist() == list(expect)
    # priorities are ln(u)/w <= 0 and sorted descending
    pri = out.sort_values("rank")["priority"].to_numpy()
    assert (pri <= 0).all() and (np.diff(pri) <= 0).all()


def test_heavy_doc_always_sampled(ray_session, planted_dir):
    """ln(u)/w -> 0 as w -> inf: the giant-weight doc must rank 1."""
    out = SP.weighted_sample_docs(planted_dir)
    assert out.sort_values("rank").iloc[0]["doc_id"] == 299


def test_unigram_logprob_hand_computed(ray_session, planted_dir):
    out = T.doc_unigram_logprob(planted_dir)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    n = 300
    c_aa = (n - 1) + 3
    c_bb = n - 1
    grand = c_aa + c_bb + 1                     # + one 'cc'
    row = out[out["doc_id"] == 0].iloc[0]
    expect = (math.log(c_aa / grand) + math.log(c_bb / grand)) / 2.0
    assert row["n_tokens"] == 2
    assert row["avg_logprob"] == pytest.approx(expect, abs=1e-6)
    assert row["perplexity"] == pytest.approx(math.exp(-expect), abs=1e-4)
    # the rare-token doc scores lower (worse) than the common-token docs
    rare = out[out["doc_id"] == 299].iloc[0]
    assert rare["avg_logprob"] < row["avg_logprob"]
    assert len(out) == n


def test_compression_ratio_flags_repetition(ray_session, tmp_path):
    import os
    root = str(tmp_path)
    tbl = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["spam " * 400,
                          "k3Vq9xZ2pL8wN4cR7tY1uB5mD6fG0hJs " * 12]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s0", "s0"]),
        "n_chars": pa.array([2000, 396], type=pa.int64()),
    })
    pq.write_table(tbl, os.path.join(root, "documents.parquet"))
    out = T.doc_compression_ratio(root).to_pandas().sort_values("doc_id")
    assert bool(out.iloc[0]["is_repetitive"])          # pure repetition
    assert out.iloc[0]["ratio"] < out.iloc[1]["ratio"]
    assert out.iloc[0]["n_bytes"] == 2000
    # deterministic: second run returns identical ratios
    again = T.doc_compression_ratio(root).to_pandas().sort_values("doc_id")
    assert (again["ratio"].to_numpy() == out["ratio"].to_numpy()).all()


def test_unigram_join_fallback_matches_broadcast(ray_session, monkeypatch):
    """The adaptive broadcast fast path and the partitioned-join fallback
    must produce identical scores (same attached counts, same sums)."""
    from p_id_text_extraction_ray.pipelines import textstats as T
    fast = T.doc_unigram_logprob("/root/testdata/sf0.001").to_pandas()
    monkeypatch.setattr(T, "UNIGRAM_BROADCAST_TERM_CAP", 0)
    slow = T.doc_unigram_logprob("/root/testdata/sf0.001").to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(
        fast.sort_values("doc_id").reset_index(drop=True),
        slow.sort_values("doc_id").reset_index(drop=True),
        check_exact=True)


def test_bigram_join_fallback_matches_broadcast(ray_session, monkeypatch):
    """Bigram LM: the broadcast fast path and the two-join partitioned
    fallback attach identical counts and fold identically."""
    from p_id_text_extraction_ray.pipelines import textstats as T
    fast = T.doc_bigram_logprob("/root/testdata/sf0.001").to_pandas()
    monkeypatch.setattr(T, "BIGRAM_BROADCAST_CAP", 0)
    slow = T.doc_bigram_logprob("/root/testdata/sf0.001").to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(
        fast.sort_values("doc_id").reset_index(drop=True),
        slow.sort_values("doc_id").reset_index(drop=True),
        check_exact=True)


def test_bigram_single_token_docs_excluded(ray_session, tmp_path):
    """Docs with < 2 tokens have no bigrams and must not emit a row."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines import textstats as T
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["only", "two tokens", ""]),
                  "lang": pa.array(["en"] * 3),
                  "source": pa.array(["s"] * 3),
                  "n_chars": pa.array([4, 10, 0], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = T.doc_bigram_logprob(str(tmp_path)).to_pandas()
    assert out["doc_id"].tolist() == [1]
    assert out["n_bigrams"].tolist() == [1]
    # single distinct bigram: p = c/cw = 1/1 -> ln 1 = 0
    assert out["avg_logprob"].tolist() == [0.0]
    assert out["perplexity"].tolist() == [1.0]


def _ref_bpe(word_counts: dict, n: int):
    """Reference BPE trainer (loop form) for parity."""
    state = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n):
        pc = {}
        for syms, c in state.items():
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        merges.append((best[0], best[1], pc[best]))
        new = {}
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        state = new
    return merges


def test_bpe_train_merges_matches_reference_loop(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from collections import Counter
    from p_id_text_extraction_ray.pipelines.curation import bpe_train_merges
    texts = ["low lower lowest", "newest widest lowest low",
             "low low newer wider", "es es es t t"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s"] * len(texts)),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    wc = Counter(w for x in texts for w in x.split())
    expect = _ref_bpe(wc, 8)
    got = bpe_train_merges(str(tmp_path), n_merges=8).to_pandas()
    assert [(r.left, r.right, r.pair_count)
            for r in got.itertuples()] == expect
    assert (got["merged"] == got["left"] + got["right"]).all()
    assert got["rank"].tolist() == list(range(len(expect)))


def test_bpe_train_deterministic_across_runs(ray_session):
    from p_id_text_extraction_ray.pipelines.curation import bpe_train_merges
    a = bpe_train_merges("/root/testdata/sf0.001", n_merges=4).to_pandas()
    b = bpe_train_merges("/root/testdata/sf0.001", n_merges=4).to_pandas()
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert len(a) == 4


def _ref_bpe_encode(word: str, merges) -> int:
    syms = list(word)
    for a, b, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_bpe_encode_matches_reference_loop(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from collections import Counter
    from p_id_text_extraction_ray.pipelines.curation import bpe_encode_stats
    texts = ["low lower lowest", "newest widest lowest low",
             "low low newer wider", "es es es t t"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s"] * len(texts)),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    wc = Counter(w for x in texts for w in x.split())
    merges = _ref_bpe(wc, 8)
    got = (bpe_encode_stats(str(tmp_path), n_merges=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, text in enumerate(texts):
        ws = text.split()
        assert got.loc[i, "n_words"] == len(ws)
        assert got.loc[i, "n_chars"] == sum(len(w) for w in ws)
        expect_tok = sum(_ref_bpe_encode(w, merges) for w in ws)
        assert got.loc[i, "n_tokens"] == expect_tok
        assert got.loc[i, "chars_per_token"] == (
            got.loc[i, "n_chars"] / expect_tok)
    # the corpus's most frequent fully-merged word costs 1 token
    assert got.loc[0, "n_tokens"] < got.loc[0, "n_chars"]


def test_bpe_local_and_distributed_paths_agree(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.curation import bpe_train_merges
    texts = ["low lower lowest", "newest widest lowest low",
             "low low newer wider", "es es es t t", "tee tree street"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s"] * len(texts)),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    local = bpe_train_merges(str(tmp_path), n_merges=6).to_pandas()
    dist = bpe_train_merges(str(tmp_path), n_merges=6,
                            local_vocab_cap=0).to_pandas()
    pd.testing.assert_frame_equal(local, dist, check_exact=True)
    assert len(local) == 6

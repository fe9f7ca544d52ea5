"""Unigram-LM (SentencePiece-style) tokenizer training — correctness
carried by path equality, determinism, structure recovery and coverage
(the iterative EM is not SQL-expressible, so no DuckDB oracle)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines.sptokenizer import (
    _unigram_train_local, _viterbi_segment, unigram_encode_stats,
    unigram_tokenizer_train)


def _write_docs(path, texts):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(path, "documents.parquet"))
    return path


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    """Corpus with strong substring structure: 'inter' and 'tion' recur
    across many words, so a unigram LM must keep them as pieces."""
    texts = [
        "international internal interact interned interface",
        "station nation creation motivation at ion",
        "international station internal nation",
        "interface creation interact motivation",
    ] * 5
    return _write_docs(str(tmp_path_factory.mktemp("sp_toy")), texts)


def test_viterbi_prefers_high_prob_pieces():
    import math
    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.8)}
    assert _viterbi_segment("abab", logp) == ["ab", "ab"]
    assert _viterbi_segment("aba", logp) == ["ab", "a"]
    # unknown char never fails
    assert _viterbi_segment("azb", logp) == ["a", "z", "b"]


def test_viterbi_tie_prefers_longer_last_piece():
    import math
    logp = {"a": math.log(0.25), "aa": math.log(0.25)}
    # 'aa' as one piece (one logp term) beats 'a'+'a' (two terms)
    assert _viterbi_segment("aa", logp) == ["aa"]


def test_train_learns_planted_substructure(ray_session, toy_dir):
    vocab = unigram_tokenizer_train(toy_dir)
    pieces = set(vocab["piece"])
    # the recurring morphemes survive pruning as multi-char pieces
    assert "tion" in pieces or "ation" in pieces
    assert any(p.startswith("inter") for p in pieces if len(p) > 1)
    # all single chars of the corpus are covered
    chars = set("".join(t.replace(" ", "") for t in [
        "international internal interact interned interface",
        "station nation creation motivation at ion"]))
    assert chars <= pieces
    # ranks are dense, counts sorted non-increasing
    assert list(vocab["rank"]) == list(range(len(vocab)))
    c = vocab["count"].to_numpy()
    assert (c[:-1] >= c[1:]).all()


def test_train_is_deterministic(ray_session, toy_dir):
    a = unigram_tokenizer_train(toy_dir)
    b = unigram_tokenizer_train(toy_dir)
    pd.testing.assert_frame_equal(a, b)


def test_local_and_distributed_paths_equal(ray_session, toy_dir):
    """Forcing the distributed EM (cap=0) must reproduce the
    driver-local loop exactly — same pieces, counts, logprobs."""
    local = unigram_tokenizer_train(toy_dir, local_vocab_cap=10**9)
    dist = unigram_tokenizer_train(toy_dir, local_vocab_cap=0)
    pd.testing.assert_frame_equal(local, dist)


def test_train_matches_pure_reference(ray_session, toy_dir):
    """The distributed entry point equals the single-process reference
    loop run on an independently derived word-count dict."""
    t = pq.read_table(os.path.join(toy_dir, "documents.parquet"))
    wc: dict = {}
    for text in t["text"].to_pylist():
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    ref = _unigram_train_local(wc)
    got = unigram_tokenizer_train(toy_dir)
    pd.testing.assert_frame_equal(got, ref)


def test_encode_stats_coverage(ray_session, toy_dir):
    out = unigram_encode_stats(toy_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    t = pq.read_table(os.path.join(toy_dir, "documents.parquet"))
    texts = t["text"].to_pylist()
    assert len(out) == len(texts)
    for _, row in out.iterrows():
        text = texts[int(row["doc_id"])]
        words = text.split()
        assert row["n_words"] == len(words)
        assert row["n_chars"] == sum(len(w) for w in words)
        # segmentation is lossless: pieces never exceed chars and at
        # least one piece per word
        assert len(words) <= row["n_pieces"] <= row["n_chars"]
        # multi-char pieces exist -> real compression on this corpus
    assert (out["chars_per_piece"] > 1.0).any()


def test_empty_corpus(ray_session, tmp_path):
    d = _write_docs(str(tmp_path / "empty"), [])
    vocab = unigram_tokenizer_train(d)
    assert len(vocab) == 0
    assert list(vocab.columns) == ["rank", "piece", "count", "logprob"]
    enc = unigram_encode_stats(d).to_pandas()
    assert len(enc) == 0

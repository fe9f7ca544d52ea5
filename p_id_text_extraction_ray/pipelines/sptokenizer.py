"""Unigram-LM (SentencePiece-style) tokenizer training + application.

The second of the two standard subword tokenizer-training algorithms an
LLM data pipeline runs (Kudo 2018, "Subword Regularization"; the
SentencePiece ``unigram`` model): where BPE (``curation.bpe_train_merges``)
grows a vocabulary bottom-up by merging frequent pairs, the unigram LM
starts from a LARGE seed vocabulary of candidate substrings and prunes it
down with EM — each word is segmented into the pieces that maximize the
sum of piece log-probabilities (Viterbi), piece probabilities are
re-estimated from the segmentation counts, and low-probability pieces are
dropped until the target vocabulary size remains.

This implementation uses hard (Viterbi) EM — deterministic counts, so the
training is a pure function of the corpus and the distributed/local path
equality is exactly testable (the reference SentencePiece uses soft EM
over the segmentation lattice; Viterbi-EM is its standard deterministic
simplification and converges to the same vocabulary on well-separated
corpora).

Scale shape (mirrors the BPE trainer):
* the corpus is touched ONCE — per-batch word Counters -> one bucketed
  sum -> the DISTINCT-WORD table (vocab-scale);
* seed-candidate counting and every E-step run over that word table with
  the current piece table BROADCAST via ``ray.put`` (piece tables are
  ``SEED_CAP``-bounded by construction);
* each E-step reduces to per-piece count partials -> bucketed sum -> a
  piece-table-sized driver frame (never corpus-scale);
* below ``UNIGRAM_LOCAL_VOCAB_CAP`` distinct words the EM rounds run
  driver-local on the already-reduced word table (the loop SentencePiece
  itself runs in memory), above it they stay distributed; path equality
  is pytest-pinned.

Rows-only driver check (iterative EM + argmax chains are not
SQL-expressible); correctness is carried by the local/distributed
path-equality, determinism, coverage and planted-structure pytests in
``tests/test_sptokenizer.py``.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

UNIGRAM_VOCAB_SIZE = 96        # final pieces (incl. all single chars)
UNIGRAM_MAX_PIECE = 6          # max piece length among seed candidates
UNIGRAM_SEED_CAP = 2000        # seed candidates kept (by corpus count)
UNIGRAM_EM_ITERS = 4
UNIGRAM_LOCAL_VOCAB_CAP = 200_000   # distinct words; see module doc
_UNK_LOGP = -20.0              # fixed penalty for out-of-vocab chars


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=list(columns))


def _word_count_table(sf_dir: str):
    """One corpus pass -> distributed distinct-word count table."""
    from ._util import bucketed_group_sum

    def word_counts(df: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for text in df["text"]:
            cnt.update(text.split())
        return pd.DataFrame({"w": pd.Series(list(cnt.keys()), dtype=object),
                             "c": np.fromiter(cnt.values(), np.int64,
                                              len(cnt))})

    return bucketed_group_sum(
        _docs(sf_dir, ("text",)).map_batches(word_counts,
                                             batch_format="pandas"),
        "w", ["c"])


def _viterbi_segment(word: str, logp: dict[str, float],
                     max_len: int = UNIGRAM_MAX_PIECE) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize the
    logprob sum; exact-score ties prefer the segmentation whose LAST
    piece is longest (smaller split point), applied recursively — a
    deterministic rule shared by every path. Unknown single chars get
    the fixed ``_UNK_LOGP`` penalty so segmentation never fails."""
    n = len(word)
    if n == 0:
        return []
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        # j descending => longer last piece wins exact ties via strict >
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = _UNK_LOGP
                else:
                    continue
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _seed_pieces_local(wc: dict[str, int]) -> dict[str, int]:
    """All substrings up to UNIGRAM_MAX_PIECE, counted weighted by word
    frequency; single chars always survive (segmentation coverage)."""
    cnt: Counter = Counter()
    for w, c in wc.items():
        n = len(w)
        for i in range(n):
            for ln in range(1, min(UNIGRAM_MAX_PIECE, n - i) + 1):
                cnt[w[i:i + ln]] += c
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in cnt.items() if len(p) > 1),
                   key=lambda t: (-t[1], t[0]))[:max(
                       0, UNIGRAM_SEED_CAP - len(chars))]
    return {**chars, **dict(multi)}


def _em_round_local(wc: dict[str, int],
                    counts: dict[str, int]) -> dict[str, int]:
    """One hard-EM round: segment every word under the current counts'
    log-probs, return new piece counts."""
    total = float(sum(counts.values()))
    logp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
    new: Counter = Counter()
    for w, c in wc.items():
        for piece in _viterbi_segment(w, logp):
            new[piece] += c
    return dict(new)


def _prune_vocab(counts: dict[str, int],
                 vocab_size: int) -> dict[str, int]:
    """Keep all single chars (coverage) + the top multi-char pieces by
    (count desc, piece asc) up to ``vocab_size`` total; zero-count
    multi-char pieces always drop."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in counts.items()
                    if len(p) > 1 and c > 0),
                   key=lambda t: (-t[1], t[0]))
    keep = multi[:max(0, vocab_size - len(chars))]
    return {**chars, **dict(keep)}


def _unigram_train_local(wc: dict[str, int],
                         vocab_size: int = UNIGRAM_VOCAB_SIZE,
                         em_iters: int = UNIGRAM_EM_ITERS
                         ) -> pd.DataFrame:
    """The full training loop over an in-memory word-count dict — the
    single-process reference implementation AND the driver-local fast
    path (the word table is already distributed-summed when it arrives
    here). Returns (rank, piece, count, logprob)."""
    if not wc:
        return pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                             "piece": pd.Series([], dtype=object),
                             "count": pd.Series([], dtype=np.int64),
                             "logprob": pd.Series([], dtype=np.float64)})
    counts = _seed_pieces_local(wc)
    for _ in range(em_iters):
        new = _em_round_local(wc, counts)
        # chars must survive even if the segmentation never used them
        for p in list(counts):
            if len(p) == 1 and p not in new:
                new[p] = 0
        counts = new
    counts = _prune_vocab(counts, vocab_size)
    # final E-step on the pruned vocab so reported counts match it
    final = _em_round_local(wc, {p: max(c, 1) for p, c in counts.items()})
    for p in counts:
        if len(p) == 1 and p not in final:
            final[p] = 0
    final = {p: final.get(p, 0) for p in counts}
    total = float(sum(final.values())) or 1.0
    rows = sorted(final.items(), key=lambda t: (-t[1], t[0]))
    return pd.DataFrame({
        "rank": np.arange(len(rows), dtype=np.int64),
        "piece": pd.Series([p for p, _ in rows], dtype=object),
        "count": np.fromiter((c for _, c in rows), np.int64, len(rows)),
        "logprob": np.round([
            math.log(c / total) if c > 0 else _UNK_LOGP
            for _, c in rows], 6).astype(np.float64)})


def unigram_tokenizer_train(sf_dir: str,
                            vocab_size: int = UNIGRAM_VOCAB_SIZE,
                            em_iters: int = UNIGRAM_EM_ITERS,
                            local_vocab_cap: int = UNIGRAM_LOCAL_VOCAB_CAP
                            ) -> pd.DataFrame:
    """(rank, piece, count, logprob) — the trained unigram-LM vocabulary
    (see module doc). Deterministic; rows-only driver check."""
    import ray

    from ._util import bucketed_group_sum

    words = _word_count_table(sf_dir)
    if words.count() <= local_vocab_cap:
        wl = words.to_pandas()
        wc = {w: int(c) for w, c in zip(wl.get("w", ()), wl.get("c", ()))}
        return _unigram_train_local(wc, vocab_size, em_iters)

    # ---- distributed path: same algorithm, word table stays distributed
    words = words.materialize()

    def seed_partials(df: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for w, c in zip(df["w"], df["c"]):
            n = len(w)
            for i in range(n):
                for ln in range(1, min(UNIGRAM_MAX_PIECE, n - i) + 1):
                    cnt[w[i:i + ln]] += int(c)
        ks = list(cnt.keys())
        return pd.DataFrame({"p": pd.Series(ks, dtype=object),
                             "n": np.fromiter(cnt.values(), np.int64,
                                              len(cnt))})

    seed_sum = bucketed_group_sum(
        words.map_batches(seed_partials, batch_format="pandas"),
        "p", ["n"]).materialize()
    chars_df = seed_sum.map_batches(
        lambda df: df[df["p"].str.len() == 1],
        batch_format="pandas").to_pandas()             # alphabet-sized
    multi = (seed_sum.map_batches(
                 lambda df: df[df["p"].str.len() > 1].sort_values(
                     ["n", "p"], ascending=[False, True])
                 .head(UNIGRAM_SEED_CAP), batch_format="pandas")
             .sort(["n", "p"], descending=[True, False])
             .limit(max(0, UNIGRAM_SEED_CAP - len(chars_df)))
             .to_pandas())
    counts = {**{p: int(n) for p, n in zip(chars_df.get("p", ()),
                                           chars_df.get("n", ()))},
              **{p: int(n) for p, n in zip(multi.get("p", ()),
                                           multi.get("n", ()))}}
    if not counts:
        return _unigram_train_local({}, vocab_size, em_iters)

    def em_partials_factory(logp_ref):
        def em_partials(df: pd.DataFrame) -> pd.DataFrame:
            logp = ray.get(logp_ref)
            cnt: Counter = Counter()
            for w, c in zip(df["w"], df["c"]):
                for piece in _viterbi_segment(w, logp):
                    cnt[piece] += int(c)
            ks = list(cnt.keys())
            return pd.DataFrame({"p": pd.Series(ks, dtype=object),
                                 "n": np.fromiter(cnt.values(), np.int64,
                                                  len(cnt))})
        return em_partials

    def run_estep(counts_in: dict[str, int]) -> dict[str, int]:
        total = float(sum(counts_in.values()))
        logp_ref = ray.put({p: math.log(c / total)
                            for p, c in counts_in.items() if c > 0})
        part = bucketed_group_sum(
            words.map_batches(em_partials_factory(logp_ref),
                              batch_format="pandas"),
            "p", ["n"]).to_pandas()          # piece-table-sized
        return {p: int(n) for p, n in zip(part.get("p", ()),
                                          part.get("n", ()))}

    for _ in range(em_iters):
        new = run_estep(counts)
        for p in list(counts):
            if len(p) == 1 and p not in new:
                new[p] = 0
        counts = new
    counts = _prune_vocab(counts, vocab_size)
    final = run_estep({p: max(c, 1) for p, c in counts.items()})
    final = {p: final.get(p, 0) for p in counts}
    total = float(sum(final.values())) or 1.0
    rows = sorted(final.items(), key=lambda t: (-t[1], t[0]))
    return pd.DataFrame({
        "rank": np.arange(len(rows), dtype=np.int64),
        "piece": pd.Series([p for p, _ in rows], dtype=object),
        "count": np.fromiter((c for _, c in rows), np.int64, len(rows)),
        "logprob": np.round([
            math.log(c / total) if c > 0 else _UNK_LOGP
            for _, c in rows], 6).astype(np.float64)})


def unigram_encode_stats(sf_dir: str,
                         vocab_size: int = UNIGRAM_VOCAB_SIZE):
    """(doc_id, n_words, n_pieces, n_chars, chars_per_piece) — the
    corpus re-tokenized with the vocabulary ``unigram_tokenizer_train``
    learns: the application pass whose chars/piece ratio is the
    compression number tokenizer evaluations report (the unigram-LM
    counterpart of ``bpe_encode_stats``).

    Scale shape: train once (bounded, above), broadcast the piece
    log-prob table via ``ray.put``, then one row-local pass segments
    each doc's words under the Viterbi rule with a per-actor word cache
    (Zipf: most words repeat). Zero shuffle. Rows-only."""
    import ray

    vocab = unigram_tokenizer_train(sf_dir, vocab_size)
    logp = {p: float(lp) for p, lp in zip(vocab["piece"],
                                          vocab["logprob"])}
    logp_ref = ray.put(logp)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        lp = ray.get(logp_ref)
        cache: dict[str, int] = {}
        n_words = np.zeros(len(df), np.int64)
        n_pieces = np.zeros(len(df), np.int64)
        n_chars = np.zeros(len(df), np.int64)
        for k, text in enumerate(df["text"]):
            words = text.split()
            n_words[k] = len(words)
            np_ = nc = 0
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = len(_viterbi_segment(w, lp))
                    cache[w] = got
                np_ += got
                nc += len(w)
            n_pieces[k] = np_
            n_chars[k] = nc
        cpp = np.where(n_pieces > 0,
                       n_chars / np.maximum(n_pieces, 1), 0.0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_words": n_words, "n_pieces": n_pieces, "n_chars": n_chars,
            "chars_per_piece": np.round(cpp, 6)})

    return _docs(sf_dir).map_batches(encode, batch_format="pandas")

"""Training-data windowing operators: fixed-size token chunking with
overlap, and vocabulary-coverage (OOV) scoring.

``chunk_documents`` is the context-window preparation stage of an LLM
data pipeline: each document becomes ⌈max(n−W,0)/S⌉+1 overlapping
windows of at most W tokens at stride S, so every token is covered and
consecutive windows share W−S tokens. ``vocab_oov_rate`` scores each
document against the corpus' top-V token vocabulary (two passes: a
bucketed global count, then a per-batch membership scan against the
broadcast vocabulary).

Both are exact-integer operators with DuckDB oracles; tokenization is
whitespace-split, mirrored as ``regexp_extract_all(text, '\\S+')``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import bucketed_group_sum, collect_with_schema


def _docs(sf_dir: str):
    from ._util import sized_read
    import os
    return sized_read(os.path.join(sf_dir, "documents.parquet"),
                      ["doc_id", "text"], rows_per_block=4096)


# ------------------------------------------------ sliding-window chunking

CHUNK_W = 64   # window size (tokens)
CHUNK_S = 48   # stride (tokens); consecutive windows overlap by W - S


def chunk_documents(sf_dir: str):
    """Split every document into overlapping token windows.

    Stateless per-document flat-map — no shuffle at all; each batch of
    documents expands to its chunk rows in place, so the stage streams
    and scales linearly. Chunk text is re-joined from the token slice
    (the downstream tokenizer's input), and first/last token columns make
    window placement auditable without parsing the text.
    """
    def expand(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, chunk_ids, n_toks, firsts, lasts, texts = [], [], [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            w = text.split()
            n = len(w)
            n_chunks = 1 + int(np.ceil(max(n - CHUNK_W, 0) / CHUNK_S))
            for ci in range(n_chunks):
                start = ci * CHUNK_S
                piece = w[start:start + CHUNK_W]
                doc_ids.append(doc_id)
                chunk_ids.append(ci)
                n_toks.append(len(piece))
                firsts.append(piece[0] if piece else None)
                lasts.append(piece[-1] if piece else None)
                texts.append(" ".join(piece))
        return pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="object"),
            "chunk_id": pd.Series(chunk_ids, dtype="int64"),
            "n_tokens": pd.Series(n_toks, dtype="int64"),
            "first_token": pd.Series(firsts, dtype="object"),
            "last_token": pd.Series(lasts, dtype="object"),
            "chunk_text": pd.Series(texts, dtype="object")})

    return _docs(sf_dir).map_batches(expand, batch_format="pandas")


CHUNK_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w,
         len(regexp_extract_all(text, '\S+')) AS n
  FROM documents),
c AS (
  SELECT doc_id, w, n,
         unnest(generate_series(
           0, CAST(ceil(greatest(n - {CHUNK_W}, 0)
                        / CAST({CHUNK_S} AS DOUBLE)) AS BIGINT))) AS chunk_id
  FROM t)
SELECT doc_id, chunk_id,
       least({CHUNK_W}, n - chunk_id * {CHUNK_S}) AS n_tokens,
       w[chunk_id * {CHUNK_S} + 1] AS first_token,
       w[least(chunk_id * {CHUNK_S} + {CHUNK_W}, n)] AS last_token,
       array_to_string(
         w[chunk_id * {CHUNK_S} + 1 : least(chunk_id * {CHUNK_S} + {CHUNK_W}, n)],
         ' ') AS chunk_text
FROM c
ORDER BY doc_id, chunk_id
"""


# ------------------------------------------------- vocabulary OOV scoring

VOCAB_V = 20  # vocabulary size: corpus top-V tokens by count, ties lexicographic


def vocab_oov_rate(sf_dir: str):
    """Per-document out-of-vocabulary token count against the corpus'
    top-V vocabulary.

    Pass 1 reduces token counts per batch (distinct tokens only enter the
    bucketed shuffle), sorts, and keeps the top V — a tiny result that is
    broadcast into pass 2's batch scan as a frozenset. Pass 2 is one
    streaming membership pass; only (doc_id, two ints) leave each batch.
    Token-less documents are omitted (mirroring the SQL GROUP BY over the
    unnested token stream).
    """
    from collections import Counter

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in df["text"]:
            c.update(text.lower().split())
        return pd.DataFrame({"t": list(c.keys()),
                             "n": pd.Series(list(c.values()), dtype="int64")})

    counts = bucketed_group_sum(
        _docs(sf_dir).map_batches(count_partial, batch_format="pandas"),
        key="t", sum_cols=["n"])
    vocab_df = collect_with_schema(
        counts.sort(["n", "t"], descending=[True, False]).limit(VOCAB_V),
        pa.schema([("t", pa.string()), ("n", pa.int64())]))
    vocab = frozenset(vocab_df["t"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, totals, oovs = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.lower().split()
            if not toks:
                continue
            doc_ids.append(doc_id)
            totals.append(len(toks))
            oovs.append(sum(1 for t in toks if t not in vocab))
        return pd.DataFrame({"doc_id": pd.Series(doc_ids, dtype="object"),
                             "n_tokens": pd.Series(totals, dtype="int64"),
                             "n_oov": pd.Series(oovs, dtype="int64")})

    return _docs(sf_dir).map_batches(score, batch_format="pandas") \
        .sort("doc_id")


VOCAB_OOV_SQL = rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS t
  FROM documents),
vocab AS (
  SELECT t FROM tok GROUP BY t
  ORDER BY count(*) DESC, t LIMIT {VOCAB_V})
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN t NOT IN (SELECT t FROM vocab)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM tok GROUP BY doc_id
ORDER BY doc_id
"""

"""Content-defined chunking (CDC) duplication audit.

The storage-level dedup primitive (Gear-hash CDC — the rolling-hash
boundary rule of FastCDC, Xia et al. 2016): document bytes are cut at
content-defined boundaries (positions where the gear hash's low bits are
zero, bounded by min/max chunk sizes), so a shared paragraph produces the
SAME chunks in every document that contains it regardless of its byte
offset — the property fixed-size blocks lack and the reason every
dedup-storage system (and crawl-corpus byte-level audit) chunks this way.
A chunk is DUPLICATE when its content hash appears in >= 2 distinct
documents (the same distinctness rule as ``curation.dedup_substring``).

Scale shape:
* chunking is row-local inside ``map_batches`` — the gear hash is a
  64-tap shifted convolution, computed as 64 vectorized uint64 adds per
  batch (no per-byte Python loop);
* chunks leave the stage as 8-byte content hashes only (never chunk
  bytes): (chunk_hash, doc_id) rows -> bucketed distinct-doc count per
  hash (all rows of a hash share a bucket — exact);
* the duplicate-hash verdicts join back to the per-doc chunk lists by
  hash bucket, then per-doc sums reduce via a second bucketed shuffle —
  the ``dedup_substring`` shape, no all-pairs, no broadcast of anything
  corpus-sized.

Rows-only driver check (the rolling-hash boundary rule is not
SQL-expressible); correctness is pinned by a pure-Python reference
parity test, planted shared-block recovery, boundary-invariance
(the same pasted block dedups at ANY byte offset), and determinism
(``tests/test_cdcdedup.py``).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

CDC_MASK_BITS = 6          # boundary when low 6 bits of gear hash == 0
CDC_MIN_CHUNK = 24         # bytes
CDC_MAX_CHUNK = 256
_GEAR_SEED = 17


def _gear_table() -> np.ndarray:
    rng = np.random.default_rng(_GEAR_SEED)
    return rng.integers(0, 2 ** 63, size=256, dtype=np.int64) \
        .astype(np.uint64)


_GEAR = _gear_table()
_MASK = np.uint64((1 << CDC_MASK_BITS) - 1)


def _gear_hashes(data: bytes) -> np.ndarray:
    """Rolling gear hash at every byte position, vectorized: the gear
    recurrence h_i = (h_{i-1} << 1) + g[b_i] (mod 2^64) expands to the
    64-tap shifted sum h_i = sum_{k=0}^{63} g[b_{i-k}] << k, so 64
    shifted adds over the whole array replace the per-byte loop."""
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = np.zeros(len(b), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(min(64, len(b))):
            h[k:] += g[:len(b) - k] << np.uint64(k)
    return h


def cdc_boundaries(data: bytes,
                   min_chunk: int = CDC_MIN_CHUNK,
                   max_chunk: int = CDC_MAX_CHUNK) -> list[int]:
    """Chunk end positions (exclusive) for ``data``: a boundary closes a
    chunk at position i+1 when the gear hash at i has its low
    CDC_MASK_BITS bits zero AND the chunk has reached ``min_chunk``
    bytes; a chunk never exceeds ``max_chunk``. The final partial chunk
    always closes at len(data)."""
    n = len(data)
    if n == 0:
        return []
    h = _gear_hashes(data)
    cut_candidates = np.flatnonzero((h & _MASK) == np.uint64(0)) + 1
    out = []
    start = 0
    ci = 0
    m = len(cut_candidates)
    while start < n:
        lo = start + min_chunk
        hi = min(start + max_chunk, n)
        while ci < m and cut_candidates[ci] < lo:
            ci += 1
        if ci < m and cut_candidates[ci] <= hi:
            out.append(int(cut_candidates[ci]))
            start = int(cut_candidates[ci])
            ci += 1
        else:
            out.append(hi)
            start = hi
    return out


def chunk_doc(text: str) -> list[bytes]:
    """UTF-8 chunk payloads of one document under the CDC rule."""
    data = text.encode("utf-8")
    out = []
    start = 0
    for end in cdc_boundaries(data):
        out.append(data[start:end])
        start = end
    return out


def _chunk_hash64(payload: bytes) -> int:
    return int.from_bytes(hashlib.md5(payload).digest()[:8], "big",
                          signed=True)


def dedup_cdc_chunks(sf_dir: str):
    """(doc_id, n_chunks, n_bytes, dup_chunks, dup_bytes, dup_ratio) per
    document: how much of each doc's content lives in CDC chunks shared
    with at least one OTHER document (see module doc). dup_ratio =
    dup_bytes / n_bytes (0.0 for empty docs), 6 dp."""
    import ray.data as rd

    from ._util import bucketed_group_sum
    from .joins import _bucket_of

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def chunk_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids, hs, ln = [], [], []
        for did, text in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            for payload in chunk_doc(text):
                ids.append(did)
                hs.append(_chunk_hash64(payload))
                ln.append(len(payload))
        return pd.DataFrame({"doc_id": np.array(ids, np.int64),
                             "h": np.array(hs, np.int64),
                             "nb": np.array(ln, np.int64)})

    # 3 int64 cols per chunk, consumed twice (distinct-doc count + the
    # verdict join) hence materialized: chunking is the expensive pass,
    # the hash table is 24 B/chunk and SPILLS if it outgrows the store;
    # a 100-TB run would point this at a parquet checkpoint instead
    # (the `curate_web_checkpointed` pattern) — same plan either way.
    chunks = docs.map_batches(chunk_rows, batch_format="pandas") \
        .materialize()

    # distinct docs per chunk hash (exact: all rows of a hash share a
    # bucket after the shuffle; per-batch pre-dedup bounds the rows)
    def hash_doc_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["h", "doc_id"])
        return pd.DataFrame({"h": d["h"].to_numpy(np.int64),
                             "nd": np.ones(len(d), np.int64)})

    ndocs = bucketed_group_sum(
        chunks.map_batches(hash_doc_pairs, batch_format="pandas"),
        "h", ["nd"])

    # dup verdict joins back to chunk rows by hash bucket; both union
    # sides carry the same (doc_id, h, nb, nd) schema (unused fields
    # zero-filled) so the shuffle blocks stay homogeneous
    def chunk_side(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(nd=np.zeros(len(df), np.int64),
                         __side=np.zeros(len(df), np.int64),
                         __b=_bucket_of(df["h"], 64))

    def count_side(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(doc_id=np.full(len(df), -1, np.int64),
                         nb=np.zeros(len(df), np.int64),
                         __side=np.ones(len(df), np.int64),
                         __b=_bucket_of(df["h"], 64)) \
            [["doc_id", "h", "nb", "nd", "__side", "__b"]]

    tagged = chunks.map_batches(chunk_side, batch_format="pandas") \
        .union(ndocs.map_batches(count_side, batch_format="pandas"))

    def join_dup(df: pd.DataFrame) -> pd.DataFrame:
        dup_hashes = set(
            df.loc[(df["__side"] == 1) & (df["nd"] >= 2), "h"].tolist())
        c = df[df["__side"] == 0]
        if c.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_chunks": pd.Series([], dtype=np.int64),
                                 "n_bytes": pd.Series([], dtype=np.int64),
                                 "dup_chunks": pd.Series([], dtype=np.int64),
                                 "dup_bytes": pd.Series([], dtype=np.int64)})
        isdup = c["h"].isin(dup_hashes).to_numpy()
        nb = c["nb"].to_numpy(np.int64)
        part = pd.DataFrame({
            "doc_id": c["doc_id"].to_numpy(np.int64),
            "n_chunks": np.ones(len(c), np.int64),
            "n_bytes": nb,
            "dup_chunks": isdup.astype(np.int64),
            "dup_bytes": np.where(isdup, nb, 0).astype(np.int64)})
        return part.groupby("doc_id", as_index=False).sum()

    per_doc = bucketed_group_sum(
        tagged.groupby("__b", num_partitions=16)
        .map_groups(join_dup, batch_format="pandas"),
        "doc_id", ["n_chunks", "n_bytes", "dup_chunks", "dup_bytes"])

    # NOTE: a zero-byte document produces no chunks and hence no output
    # row (documented contract; the testdata corpora have no empty docs)
    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nb = df["n_bytes"].to_numpy(np.float64)
        ratio = np.where(nb > 0, df["dup_bytes"].to_numpy(np.float64)
                         / np.maximum(nb, 1.0), 0.0)
        return df.assign(dup_ratio=np.round(ratio, 6))

    return per_doc.map_batches(finish, batch_format="pandas")

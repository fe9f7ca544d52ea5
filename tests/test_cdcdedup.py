"""Content-defined chunking dedup — rows-only op, correctness pinned by
pure-Python reference parity, planted-shared-block recovery, offset
invariance (the CDC property), and determinism."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines.cdcdedup import (
    CDC_MAX_CHUNK, CDC_MIN_CHUNK, cdc_boundaries, chunk_doc,
    dedup_cdc_chunks)


def _write_docs(path, texts):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(path, "documents.parquet"))
    return path


def _rng_text(seed, n_words):
    rng = np.random.default_rng(seed)
    return " ".join("w%04d" % rng.integers(0, 5000) for _ in range(n_words))


def test_boundaries_respect_min_max():
    data = _rng_text(1, 400).encode()
    ends = cdc_boundaries(data)
    assert ends[-1] == len(data)
    sizes = np.diff([0] + ends)
    assert (sizes[:-1] >= CDC_MIN_CHUNK).all()
    assert (sizes <= CDC_MAX_CHUNK).all()
    assert b"".join(chunk_doc(data.decode())) == data


def test_cdc_offset_invariance():
    """The defining CDC property: a shared block produces identical
    chunks at ANY byte offset once the rolling hash resynchronizes —
    fixed-size blocking has zero shared chunks here."""
    shared = _rng_text(7, 300)
    a = _rng_text(8, 40) + " " + shared
    b = _rng_text(9, 73) + " " + shared      # different prefix length
    ca = {hashlib.md5(c).digest() for c in chunk_doc(a)}
    cb = {hashlib.md5(c).digest() for c in chunk_doc(b)}
    inter = ca & cb
    # the vast majority of the shared block's chunks coincide
    assert len(inter) >= 0.7 * min(len(ca), len(cb))


def test_dedup_matches_pure_reference(ray_session, tmp_path):
    texts = [_rng_text(i, 120) for i in range(8)]
    shared = _rng_text(99, 200)
    texts[2] = texts[2] + " " + shared
    texts[5] = shared + " " + texts[5]
    d = _write_docs(str(tmp_path / "cdc"), texts)

    out = dedup_cdc_chunks(d).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

    # single-process reference
    from collections import Counter
    chunks_by_doc = {i: chunk_doc(t) for i, t in enumerate(texts)}
    doc_count = Counter()
    for i, cs in chunks_by_doc.items():
        for h in {hashlib.md5(c).digest() for c in cs}:
            doc_count[h] += 1
    rows = []
    for i, cs in chunks_by_doc.items():
        hs = [hashlib.md5(c).digest() for c in cs]
        dup = [doc_count[h] >= 2 for h in hs]
        nb = sum(len(c) for c in cs)
        db = sum(len(c) for c, isd in zip(cs, dup) if isd)
        rows.append({"doc_id": i, "n_chunks": len(cs), "n_bytes": nb,
                     "dup_chunks": sum(dup), "dup_bytes": db,
                     "dup_ratio": round(db / nb, 6)})
    ref = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(
        out.astype({"doc_id": "int64"}), ref, check_dtype=False)
    # the planted shared block was found on both docs
    assert out.loc[out["doc_id"] == 2, "dup_bytes"].iloc[0] > 500
    assert out.loc[out["doc_id"] == 5, "dup_bytes"].iloc[0] > 500
    # clean docs are (essentially) dup-free
    clean = out[~out["doc_id"].isin([2, 5])]
    assert (clean["dup_ratio"] < 0.05).all()


def test_dedup_deterministic(ray_session, tmp_path):
    texts = [_rng_text(i + 50, 100) for i in range(6)]
    d = _write_docs(str(tmp_path / "cdc_det"), texts)
    a = dedup_cdc_chunks(d).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = dedup_cdc_chunks(d).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_empty_corpus(ray_session, tmp_path):
    d = _write_docs(str(tmp_path / "cdc_empty"), [])
    out = dedup_cdc_chunks(d).to_pandas()
    assert len(out) == 0

"""Deduplication pipelines over the ``documents`` table.

Training-data-scale dedup operators, each expressed Ray-Data-first:

* exact     — content-hash per batch (vectorized md5 of normalized text)
              -> hash-keyed groupby -> keep min(doc_id). The shuffle moves
              (hash, doc_id) pairs only, never document text.
* n-gram Jaccard — exact pairwise similarity via shingle inverted index:
              explode (shingle, doc_id), groupby(shingle) emits co-occurring
              pairs, groupby(pair) counts the intersection, Jaccard from
              per-doc shingle counts. No all-pairs scan.
* MinHash+LSH — signatures + banding per batch, groupby(band, key) for
              candidates, exact-Jaccard verification of candidates only.
* SimHash   — 64-bit signatures, banded by 16-bit chunks, Hamming-verified.

At 10^12-doc scale the per-doc shingle-count side below (collected to a
dict) becomes a co-partitioned join on doc_id instead; the candidate-pair
structure is unchanged. Hot shingles (stop-phrase n-grams) are the skew
risk: ``MAX_SHINGLE_DOCS`` caps the pairs emitted per shingle group,
mirroring standard LSH practice of dropping saturated buckets (logged, not
silent).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (jaccard, lsh_band_keys, minhash_signatures_batch,
                                 hamming64, simhash64, word_shingles)
from ..functions.textops import normalize_whitespace

PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                         ("jaccard", pa.float64())])
EMBED_PAIR_SCHEMA = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()),
                               ("cosine", pa.float64())])

JACCARD_THRESHOLD = 0.6
SHINGLE_K = 3
NUM_PERM = 128
NUM_BANDS = 32
SIMHASH_MAX_HAMMING = 3
MAX_SHINGLE_DOCS = 64   # skew cap: a shingle shared by more docs is dropped

# Pair generation shuffles on a BUCKET of the equality key (key % NB), not
# the key itself: the groupby then has a bounded number of groups (NB) of
# uniform expected size, and each group emits its pairs with one vectorized
# self-merge instead of one Python call per distinct key. NB trades group
# size against task count — raise it with the corpus (it is the unit of
# shuffle parallelism).
N_PAIR_BUCKETS = 64


def _docs(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])


def dedup_exact(sf_dir: str):
    """Keep min(doc_id) per normalized-content hash."""

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(normalize_whitespace(t).encode()).hexdigest()
             for t in df["text"]]
        return pd.DataFrame({"content_hash": h, "doc_id": df["doc_id"].values})

    from ray.data.aggregate import Min
    return (_docs(sf_dir)
            .map_batches(hash_batch, batch_format="pandas")
            .groupby("content_hash")
            .aggregate(Min("doc_id", alias_name="doc_id")))


DEDUP_EXACT_SQL = r"""
SELECT md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS content_hash,
       min(doc_id) AS doc_id
FROM documents GROUP BY 1
"""


def _shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
    """(shingle_hash, doc_id) rows, distinct per doc."""
    out_s, out_d = [], []
    for did, text in zip(df["doc_id"], df["text"]):
        sh = word_shingles(text, SHINGLE_K)
        out_s.append(sh)
        out_d.append(np.full(len(sh), did, dtype=np.int64))
    if not out_s:
        return pd.DataFrame({"shingle": pd.Series([], dtype="uint64"),
                             "doc_id": pd.Series([], dtype="int64")})
    return pd.DataFrame({"shingle": np.concatenate(out_s),
                         "doc_id": np.concatenate(out_d)})


def _doc_shingle_counts(sf_dir: str) -> pd.Series:
    """Distinct-shingle count per doc (small side; see module doc)."""
    counts = (_docs(sf_dir)
              .map_batches(lambda df: pd.DataFrame({
                  "doc_id": df["doc_id"].values,
                  "n": [len(word_shingles(t, SHINGLE_K)) for t in df["text"]]}),
                  batch_format="pandas")
              .to_pandas())
    return pd.Series(counts["n"].values, index=counts["doc_id"].values)


def _bucket_pairs(df: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """All (doc_a < doc_b, count) pairs co-occurring on the exact key
    columns, computed with one vectorized self-merge (no per-key Python).
    Keys shared by more than MAX_SHINGLE_DOCS docs are dropped (skew cap)."""
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64")})
    if len(df) < 2:
        return empty
    df = df.drop_duplicates(key_cols + ["doc_id"])
    sizes = df.groupby(key_cols)["doc_id"].transform("size")
    df = df[(sizes >= 2) & (sizes <= MAX_SHINGLE_DOCS)]
    if len(df) < 2:
        return empty
    m = df.merge(df, on=key_cols, suffixes=("_a", "_b"))
    m = m[m["doc_id_a"] < m["doc_id_b"]]
    if not len(m):
        return empty
    g = m.groupby(["doc_id_a", "doc_id_b"], as_index=False).size()
    g.columns = ["doc_a", "doc_b", "n"]
    return g.astype({"doc_a": "int64", "doc_b": "int64", "n": "int64"})


def dedup_ngram_jaccard(sf_dir: str):
    """All pairs with exact word-3-gram Jaccard >= 0.6 (doc_a < doc_b)."""
    from ray.data.aggregate import Sum

    n_shingles = _doc_shingle_counts(sf_dir)
    rows = _docs(sf_dir).map_batches(_shingle_rows, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=(df["shingle"].to_numpy(dtype=np.uint64)
                                 % np.uint64(N_PAIR_BUCKETS)).astype(np.int64))

    inter = (rows.map_batches(add_bucket, batch_format="pandas")
             .groupby("bucket")
             .map_groups(lambda g: _bucket_pairs(g, ["shingle"]),
                         batch_format="pandas")
             .groupby(["doc_a", "doc_b"]).aggregate(Sum("n", alias_name="inter")))

    def finish(df: pd.DataFrame) -> pa.Table:
        na = df["doc_a"].map(n_shingles).to_numpy(dtype=np.float64)
        nb = df["doc_b"].map(n_shingles).to_numpy(dtype=np.float64)
        j = df["inter"].to_numpy(dtype=np.float64) / (na + nb - df["inter"].to_numpy())
        df = df.assign(jaccard=np.round(j, 6))
        df = df[df["jaccard"] >= JACCARD_THRESHOLD]
        return pa.Table.from_pandas(df[["doc_a", "doc_b", "jaccard"]],
                                    schema=PAIR_SCHEMA, preserve_index=False)

    from ._util import collect_with_schema
    return collect_with_schema(inter.map_batches(finish, batch_format="pandas"),
                               PAIR_SCHEMA)


DEDUP_NGRAM_JACCARD_SQL = rf"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
shingles AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - {SHINGLE_K - 1}),
                  i -> array_to_string(w[i:i+{SHINGLE_K - 1}], ' '))) AS s
    FROM words WHERE len(w) >= {SHINGLE_K}
    UNION ALL
    SELECT doc_id, array_to_string(w, ' ') AS s
    FROM words WHERE len(w) < {SHINGLE_K} AND len(w) > 0)),
counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
-- skew cap mirror (MAX_SHINGLE_DOCS): shingles shared by more docs are
-- excluded from intersection counting on BOTH sides
usable AS (
  SELECT s FROM shingles GROUP BY s
  HAVING count(*) BETWEEN 2 AND {MAX_SHINGLE_DOCS}),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM usable)
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(i / (ca.n + cb.n - i), 6) AS jaccard
FROM inter JOIN counts ca ON ca.doc_id = doc_a
           JOIN counts cb ON cb.doc_id = doc_b
WHERE i / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
"""


def dedup_minhash_lsh(sf_dir: str):
    """MinHash+LSH candidate generation, exact-Jaccard verified.

    Output is the LSH-recalled subset of Jaccard>=0.6 pairs — approximate
    by construction, so no SQL oracle (rows-only driver check; recall is
    pytest-checked against the exact pipeline on planted duplicates).
    """
    from ray.data.aggregate import Min

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        sets = [word_shingles(t, SHINGLE_K) for t in df["text"]]
        sigs = minhash_signatures_batch(sets, NUM_PERM)
        keys = lsh_band_keys(sigs, NUM_BANDS)
        n = len(df)
        return pd.DataFrame({
            "band": np.repeat(np.arange(NUM_BANDS, dtype=np.int32), n),
            "key": keys.T.reshape(-1),
            "doc_id": np.tile(df["doc_id"].values, NUM_BANDS),
        })

    rows = _docs(sf_dir).map_batches(band_rows, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=(df["key"].to_numpy(dtype=np.uint64)
                                 % np.uint64(N_PAIR_BUCKETS)).astype(np.int64))

    cand = (rows.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket")
            .map_groups(lambda g: _bucket_pairs(g, ["band", "key"]),
                        batch_format="pandas")
            .groupby(["doc_a", "doc_b"]).aggregate(Min("n", alias_name="n")))

    # Verification side: shingle sets computed DISTRIBUTED (map_batches),
    # only the compact (doc_id, hashes) rows are collected to the broadcast
    # dict; at 10^12-doc scale this becomes a doc_id-keyed join against the
    # candidate set instead of a collect.
    def shingle_sets(df: pd.DataFrame) -> pa.Table:
        sets = [word_shingles(t, SHINGLE_K) for t in df["text"]]
        return pa.table({
            "doc_id": pa.array(df["doc_id"].values, pa.int64()),
            "shingles": pa.array([s.tolist() for s in sets],
                                 pa.list_(pa.uint64()))})

    sets_df = _docs(sf_dir).map_batches(shingle_sets,
                                        batch_format="pandas").to_pandas()
    shingle_map = {d: np.asarray(s, dtype=np.uint64)
                   for d, s in zip(sets_df["doc_id"], sets_df["shingles"])}

    def verify(df: pd.DataFrame) -> pa.Table:
        js = [jaccard(shingle_map[a], shingle_map[b])
              for a, b in zip(df["doc_a"], df["doc_b"])]
        df = df.assign(jaccard=np.round(js, 6))
        df = df[df["jaccard"] >= JACCARD_THRESHOLD]
        return pa.Table.from_pandas(df[["doc_a", "doc_b", "jaccard"]],
                                    schema=PAIR_SCHEMA, preserve_index=False)

    from ._util import collect_with_schema
    return collect_with_schema(cand.map_batches(verify, batch_format="pandas"),
                               PAIR_SCHEMA)


def dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs: 64-bit signatures banded into 4x16-bit keys
    (any equal band -> candidate), Hamming-distance verified. Rows-only."""
    from ray.data.aggregate import Min

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.array([simhash64(t) for t in df["text"]], dtype=np.uint64)
        n = len(df)
        bands = []
        for bi in range(4):
            chunk = (sigs >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
            bands.append(pd.DataFrame({
                "band": np.full(n, bi, dtype=np.int32),
                "key": chunk.astype(np.int64),
                "doc_id": df["doc_id"].values,
                "sig": sigs.astype("uint64"),
            }))
        return pd.concat(bands, ignore_index=True)

    rows = _docs(sf_dir).map_batches(sig_rows, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=(df["key"].to_numpy(dtype=np.int64)
                                 % N_PAIR_BUCKETS))

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "dist": pd.Series([], dtype="int64")})
        df = df.drop_duplicates(["band", "key", "doc_id"])
        sizes = df.groupby(["band", "key"])["doc_id"].transform("size")
        df = df[(sizes >= 2) & (sizes <= MAX_SHINGLE_DOCS)]
        if len(df) < 2:
            return empty
        m = df.merge(df, on=["band", "key"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]].drop_duplicates(["doc_id_a", "doc_id_b"])
        if not len(m):
            return empty
        dist = hamming64(m["sig_a"].to_numpy(dtype=np.uint64),
                         m["sig_b"].to_numpy(dtype=np.uint64))
        keep = dist <= SIMHASH_MAX_HAMMING
        return pd.DataFrame({"doc_a": m["doc_id_a"].to_numpy()[keep],
                             "doc_b": m["doc_id_b"].to_numpy()[keep],
                             "dist": dist[keep].astype(np.int64)})

    return (rows.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket").map_groups(candidates, batch_format="pandas")
            .groupby(["doc_a", "doc_b"]).aggregate(Min("dist", alias_name="hamming")))


EMBED_DUP_COSINE = 0.99


def dedup_embedding_cosine(sf_dir: str):
    """Embedding near-dup pairs: cosine >= 0.99 between all vector pairs.

    The comparison side (the full normalized matrix) is broadcast once and
    each batch computes its block of the similarity matrix — a blocked
    matmul, not a shuffle join. At larger scale the matrix side shards into
    IVF cells first (see similarity.ann_lsh_topk).
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ids = tbl.column("vec_id").to_numpy()
    mat_ref = ray.put((matn, ids))

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    def block(df: pd.DataFrame) -> pa.Table:
        matn_all, all_ids = ray.get(mat_ref)
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        sims = (v / nv[:, None]) @ matn_all.T
        rows_a, rows_b, out_s = [], [], []
        my_ids = df["vec_id"].to_numpy()
        for i in range(len(df)):
            hit = np.nonzero((sims[i] >= EMBED_DUP_COSINE) & (all_ids > my_ids[i]))[0]
            rows_a.extend([int(my_ids[i])] * len(hit))
            rows_b.extend(all_ids[hit].tolist())
            out_s.extend(np.round(sims[i][hit], 6).tolist())
        return pa.table({"vec_a": pa.array(rows_a, pa.int64()),
                         "vec_b": pa.array(rows_b, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())},
                        schema=EMBED_PAIR_SCHEMA)

    from ._util import collect_with_schema
    return collect_with_schema(ds.map_batches(block, batch_format="pandas"),
                               EMBED_PAIR_SCHEMA)


DEDUP_EMBEDDING_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= {EMBED_DUP_COSINE}
"""

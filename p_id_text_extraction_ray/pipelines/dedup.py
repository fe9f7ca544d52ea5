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
* Embedding — random-hyperplane LSH bands generate candidate pairs with
              co-located vectors; exact cosine verified inside the band
              group. No all-pairs matmul, no full-matrix broadcast.

Every auxiliary side (per-doc shingle counts, shingle sets for candidate
verification) is a distributed dataset joined onto the candidate-pair
table via the partitioned ``hash_join`` (pipelines/joins.py) — nothing is
collected to the driver, so every pipeline here is bounded by per-bucket
memory, not corpus size. Hot shingles (stop-phrase n-grams) are the skew
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
from .joins import DEFAULT_SHUFFLE_PARTITIONS as SHUFFLE_PARTITIONS

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
    # low rows_per_block: shingling/hashing is per-row CPU-heavy, so the
    # read must mint enough blocks to keep the pool busy (see sized_read)
    from ._util import sized_read
    return sized_read(os.path.join(sf_dir, "documents.parquet"),
                      ["doc_id", "text"], rows_per_block=512)


def dedup_exact(sf_dir: str):
    """Keep min(doc_id) per normalized-content hash."""

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(normalize_whitespace(t).encode()).hexdigest()
             for t in df["text"]]
        # bucket from the hash's own leading byte: per-group overhead is
        # bounded by N_PAIR_BUCKETS, not corpus cardinality
        b = np.array([int(x[:2], 16) for x in h], dtype=np.int64) \
            % N_PAIR_BUCKETS
        return pd.DataFrame({"content_hash": h, "doc_id": df["doc_id"].values,
                             "bucket": b})

    return (_docs(sf_dir)
            .map_batches(hash_batch, batch_format="pandas")
            .groupby("bucket", num_partitions=SHUFFLE_PARTITIONS)
            .map_groups(lambda g: g.groupby("content_hash", as_index=False)
                        ["doc_id"].min(),
                        batch_format="pandas"))


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


def _doc_shingle_counts_ds(sf_dir: str, id_col: str, n_col: str):
    """Distinct-shingle count per doc as a DATASET (id_col, n_col) — a join
    side, never collected to the driver."""
    return _docs(sf_dir).map_batches(
        lambda df: pd.DataFrame({
            id_col: df["doc_id"].to_numpy(dtype=np.int64),
            n_col: np.array([len(word_shingles(t, SHINGLE_K))
                             for t in df["text"]], dtype=np.int64)}),
        batch_format="pandas")


def _shingle_sets_ds(sf_dir: str, id_col: str, set_col: str):
    """Per-doc distinct shingle-hash sets as a DATASET (id_col,
    set_col:binary = packed little-endian uint64s) — the candidate-
    verification join side. Packed bytes (not list<uint64>) so the column
    survives the generic hash_join's pandas merge untouched."""

    def shingle_sets(df: pd.DataFrame) -> pa.Table:
        sets = [word_shingles(t, SHINGLE_K) for t in df["text"]]
        return pa.table({
            id_col: pa.array(df["doc_id"].to_numpy(dtype=np.int64), pa.int64()),
            set_col: pa.array([s.tobytes() for s in sets], pa.binary())})

    return _docs(sf_dir).map_batches(shingle_sets, batch_format="pandas")


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


def _ngram_jaccard_pairs_ds(sf_dir: str):
    """All pairs with exact word-3-gram Jaccard >= 0.6 (doc_a < doc_b)
    as a LAZY Dataset — consumers that stay distributed
    (``dedup_clusters``) plug in here without a driver round-trip; the
    ``dedup_ngram_jaccard`` query wrapper collects it only at the query
    boundary.

    Per-doc shingle counts are joined onto the intersection-count pair
    table (two passes, one per pair side) instead of being collected to
    the driver — the pipeline's memory footprint is bounded by bucket
    size at any corpus scale. The per-pair intersection sum rides the
    first count join's shuffle (``sum_join``), so the plan is three
    all-to-alls total: pair generation, count-a (+sum), count-b.
    """
    from .joins import hash_join, sum_join

    rows = _docs(sf_dir).map_batches(_shingle_rows, batch_format="pandas")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=(df["shingle"].to_numpy(dtype=np.uint64)
                                 % np.uint64(N_PAIR_BUCKETS)).astype(np.int64))

    raw_pairs = (rows.map_batches(add_bucket, batch_format="pandas")
                 .groupby("bucket", num_partitions=SHUFFLE_PARTITIONS)
                 .map_groups(lambda g: _bucket_pairs(g, ["shingle"]),
                             batch_format="pandas"))
    # ~1M+ distinct pairs at even small scale: the per-pair intersection
    # count is a vectorized pandas groupby inside the join's bucket group
    # (sum_join), never Ray's per-group aggregate.
    # Shingle counts are computed ONCE and materialized — two int64
    # columns per doc, object-store-spillable at any corpus size — then
    # renamed per join side; recomputing them lazily would re-shingle
    # the whole corpus once per side.
    counts = _doc_shingle_counts_ds(sf_dir, "doc_id", "n_sh").materialize()
    side_a = counts.map_batches(
        lambda df: df.rename(columns={"doc_id": "doc_a", "n_sh": "na"}),
        batch_format="pandas")
    side_b = counts.map_batches(
        lambda df: df.rename(columns={"doc_id": "doc_b", "n_sh": "nb"}),
        batch_format="pandas")
    j1 = sum_join(raw_pairs, side_a,
                  on="doc_a", sum_keys=["doc_a", "doc_b"], sum_cols=["n"]) \
        .map_batches(lambda df: df.rename(columns={"n": "inter"}),
                     batch_format="pandas")
    j2 = hash_join(j1, side_b, on="doc_b")

    def finish(df: pd.DataFrame) -> pa.Table:
        na = df["na"].to_numpy(dtype=np.float64)
        nb = df["nb"].to_numpy(dtype=np.float64)
        inter_n = df["inter"].to_numpy(dtype=np.float64)
        j = inter_n / (na + nb - inter_n)
        df = df.assign(jaccard=np.round(j, 6))
        df = df[df["jaccard"] >= JACCARD_THRESHOLD]
        return pa.Table.from_pandas(df[["doc_a", "doc_b", "jaccard"]],
                                    schema=PAIR_SCHEMA, preserve_index=False)

    return j2.map_batches(finish, batch_format="pandas")


def dedup_ngram_jaccard(sf_dir: str):
    """Query wrapper: the result-sized collect of
    ``_ngram_jaccard_pairs_ds`` (see there for the distributed plan)."""
    from ._util import collect_with_schema
    return collect_with_schema(_ngram_jaccard_pairs_ds(sf_dir), PAIR_SCHEMA)


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

    Verification is fully distributed, one co-partitioned pass: candidate
    pairs explode into per-endpoint node rows, union with the shingle-set
    table, and a single bucket-of-node groupby attaches each candidate
    doc's set; a second (candidate-sized) bucket groupby on the pair hash
    combines both endpoints and computes exact Jaccard. Nothing
    corpus-sized touches the driver; the one corpus-wide shuffle carries
    shingle HASH sets (uint64), never text; every groupby has a bounded
    group count (N_PAIR_BUCKETS) — no per-pair task or Python-frame
    overhead anywhere.
    """

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

    def _pair_bucket(df: pd.DataFrame) -> np.ndarray:
        a = df["doc_a"].to_numpy(dtype=np.int64).astype(np.uint64)
        b = df["doc_b"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15) + b) * np.uint64(2654435761)
        return (h % np.uint64(N_PAIR_BUCKETS)).astype(np.int64)

    # cross-band duplicate candidates collapse inside a bounded-group
    # bucket pass (64 vectorized drop_duplicates), not a per-pair aggregate
    cand = (rows.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=SHUFFLE_PARTITIONS)
            .map_groups(lambda g: _bucket_pairs(g, ["band", "key"]),
                        batch_format="pandas")
            .map_batches(lambda df: df.assign(bucket=_pair_bucket(df)),
                         batch_format="pandas")
            .groupby("bucket", num_partitions=SHUFFLE_PARTITIONS)
            .map_groups(lambda g: g.drop_duplicates(["doc_a", "doc_b"])
                        [["doc_a", "doc_b"]],
                        batch_format="pandas"))

    def explode_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "node": np.concatenate([a, b]),
            "doc_a": np.concatenate([a, a]),
            "doc_b": np.concatenate([b, b]),
            "is_set": np.zeros(2 * len(df), dtype=bool),
            "sh": [b""] * (2 * len(df))})

    def tag_sets(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df["doc_a"].to_numpy(dtype=np.int64),
            "doc_a": np.full(len(df), -1, dtype=np.int64),
            "doc_b": np.full(len(df), -1, dtype=np.int64),
            "is_set": np.ones(len(df), dtype=bool),
            "sh": df["sh_a"].values})

    def add_node_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["node"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            bk = (k * np.uint64(2654435761)) % np.uint64(N_PAIR_BUCKETS)
        return df.assign(bucket=bk.astype(np.int64))

    def attach_sets(df: pd.DataFrame) -> pd.DataFrame:
        sets = pd.Series(df.loc[df["is_set"], "sh"].values,
                         index=df.loc[df["is_set"], "node"].values)
        sets = sets[~sets.index.duplicated()]
        pr = df[~df["is_set"]]
        out = pd.DataFrame({
            "doc_a": pr["doc_a"].to_numpy(dtype=np.int64),
            "doc_b": pr["doc_b"].to_numpy(dtype=np.int64),
            "sh": pr["node"].map(sets).values})
        return out.assign(bucket=_pair_bucket(out))

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # the bucket holds BOTH endpoint rows of each of its pairs
        # (pair-hash bucketing); sort makes them adjacent, then one cheap
        # pass computes exact Jaccard from the packed uint64 buffers
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "jaccard": pd.Series([], dtype="float64")})
        df = df.sort_values(["doc_a", "doc_b"], kind="mergesort")
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        sh = df["sh"].to_numpy(dtype=object)
        oa, ob, oj = [], [], []
        i, n = 0, len(df)
        while i + 1 < n:
            if a[i] != a[i + 1] or b[i] != b[i + 1]:
                i += 1      # endpoint whose partner's set was missing
                continue
            j = round(jaccard(np.frombuffer(sh[i], dtype=np.uint64),
                              np.frombuffer(sh[i + 1], dtype=np.uint64)), 6)
            if j >= JACCARD_THRESHOLD:
                oa.append(a[i]); ob.append(b[i]); oj.append(j)
            i += 2
        if not oa:
            return empty
        return pd.DataFrame({"doc_a": np.array(oa, dtype=np.int64),
                             "doc_b": np.array(ob, dtype=np.int64),
                             "jaccard": np.array(oj, dtype=np.float64)})

    tagged = (cand.map_batches(explode_pairs, batch_format="pandas")
              .union(_shingle_sets_ds(sf_dir, "doc_a", "sh_a")
                     .map_batches(tag_sets, batch_format="pandas"))
              .map_batches(add_node_bucket, batch_format="pandas"))
    pairs = (tagged.groupby("bucket", num_partitions=SHUFFLE_PARTITIONS)
             .map_groups(attach_sets, batch_format="pandas")
             .groupby("bucket", num_partitions=SHUFFLE_PARTITIONS)
             .map_groups(verify_bucket, batch_format="pandas"))

    from ._util import collect_with_schema
    df = collect_with_schema(pairs, PAIR_SCHEMA)
    return df.astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})


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
            .groupby("bucket", num_partitions=SHUFFLE_PARTITIONS).map_groups(candidates, batch_format="pandas")
            .groupby(["doc_a", "doc_b"], num_partitions=SHUFFLE_PARTITIONS).aggregate(Min("dist", alias_name="hamming")))


EMBED_DUP_COSINE = 0.99
# Random-hyperplane LSH banding (Charikar '02 + MMDS banding): a pair at
# cosine c collides in one band w.p. (1 - acos(c)/pi)^PLANES; across BANDS
# independent bands the miss probability is (1 - p_band)^BANDS. At the 0.99
# threshold: p_band = 0.955^16 ≈ 0.48 -> recall ≈ 1 - 0.52^8 ≈ 0.995, and
# true near-dups (cos >= 0.999, the usual planted case) recall ≈ 1 - 3e-6.
# PLANES is the bucket-granularity knob: raise it ~log2(N) with corpus size
# so expected random-collision bucket occupancy stays bounded.
EMBED_LSH_BANDS = 8
EMBED_LSH_PLANES = 16
EMBED_LSH_SEED = 7
_EMBED_CHUNK = 1024          # row-chunk for within-bucket blocked matmul


def dedup_embedding_cosine(sf_dir: str):
    """Embedding near-dup pairs: cosine >= 0.99, LSH-bucketed pair search.

    Scale path (replaces the round-1 all-pairs blocked matmul): each batch
    computes hyperplane-band keys and emits (band, key, vec_id, normalized
    vector) rows; a bucketed groupby co-locates same-key vectors and the
    exact cosine is verified INSIDE the bucket group — no full-matrix
    broadcast, no O(N^2) compute; the shuffle carries vectors x BANDS.
    Cross-band duplicate candidates are deduped with a final tiny
    groupby(vec_a, vec_b). Approximate with recall ≈ 0.995 at exactly the
    threshold (see constants); pytest plants near-dups and asserts full
    recall vs brute force under the fixed seed.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({"band": pd.Series([], dtype="int32"),
                                 "key": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "vec": pd.Series([], dtype="object")})
        v = np.array(df["embedding"].to_list(), dtype=np.float64)
        nv = np.linalg.norm(v, axis=1)
        nv[nv == 0] = 1.0
        vn = v / nv[:, None]
        # planes derived from the fixed seed per batch — deterministic and
        # cheap (dim x BANDS*PLANES gaussians), nothing to broadcast
        rng = np.random.default_rng(EMBED_LSH_SEED)
        planes = rng.standard_normal((vn.shape[1],
                                      EMBED_LSH_BANDS * EMBED_LSH_PLANES))
        bits = vn @ planes > 0
        weights = (1 << np.arange(EMBED_LSH_PLANES)).astype(np.int64)
        out = []
        for b in range(EMBED_LSH_BANDS):
            key = bits[:, b * EMBED_LSH_PLANES:(b + 1) * EMBED_LSH_PLANES] @ weights
            out.append(pd.DataFrame({
                "band": np.full(n, b, dtype=np.int32),
                "key": key,
                "vec_id": df["vec_id"].to_numpy(dtype=np.int64),
                "vec": list(vn)}))
        return pd.concat(out, ignore_index=True)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = (df["key"].to_numpy(dtype=np.int64).astype(np.uint64)
             + np.uint64(0x9E3779B9) * df["band"].to_numpy(dtype=np.int64).astype(np.uint64))
        with np.errstate(over="ignore"):
            b = (k * np.uint64(2654435761)) % np.uint64(N_PAIR_BUCKETS)
        return df.assign(bucket=b.astype(np.int64))

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        """Exact-cosine pairs within each (band, key) bucket of this group;
        row-chunked matmul bounds memory for giant duplicate clusters."""
        out_a, out_b, out_c = [], [], []
        for _, g in df.groupby(["band", "key"], sort=False):
            m = len(g)
            if m < 2:
                continue
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            V = np.stack(g["vec"].to_numpy()[order])
            for i0 in range(0, m, _EMBED_CHUNK):
                i1 = min(m, i0 + _EMBED_CHUNK)
                S = V[i0:i1] @ V.T
                rows, cols = np.nonzero(S >= EMBED_DUP_COSINE)
                keep = (rows + i0) < cols
                rows, cols = rows[keep], cols[keep]
                out_a.append(ids[rows + i0])
                out_b.append(ids[cols])
                out_c.append(np.round(S[rows, cols], 6))
        if not out_a:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        return pd.DataFrame({"vec_a": np.concatenate(out_a),
                             "vec_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    pairs = (ds.map_batches(band_rows, batch_format="pandas")
             .map_batches(add_bucket, batch_format="pandas")
             .groupby("bucket", num_partitions=SHUFFLE_PARTITIONS).map_groups(candidates, batch_format="pandas")
             .groupby(["vec_a", "vec_b"], num_partitions=SHUFFLE_PARTITIONS)
             .aggregate(Min("cosine", alias_name="cosine")))

    from ._util import collect_with_schema
    return collect_with_schema(pairs, EMBED_PAIR_SCHEMA)


DEDUP_EMBEDDING_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= {EMBED_DUP_COSINE}
"""


CC_MAX_ITERS = 16


def dedup_clusters(sf_dir: str):
    """Canonical near-duplicate clusters: every document labeled with
    min(doc_id) of its connected component in the Jaccard>=0.6 pair graph
    (singletons label themselves) — the assignment a dedup pass uses to
    keep one representative per duplicate cluster.

    Distributed min-label propagation over the PAIR GRAPH only (nodes that
    appear in at least one near-dup pair — the iterating datasets are
    pair-scale, never corpus-scale): labels start as min(self, neighbors)
    via a grouped min over the self-looped symmetric edge list; each
    further round hash_joins current labels onto the edges and re-takes
    the per-node min. Labels only decrease, so the global label sum is a
    monotone convergence witness (one scalar to the driver per round);
    rounds = component diameter, bounded by CC_MAX_ITERS as a cycle guard.
    A final left hash_join assigns every remaining document its own id —
    the only corpus-scale step is that single join.

    The pair graph arrives as the LAZY ``_ngram_jaccard_pairs_ds``
    Dataset; the symmetric + self-looped edge list is built by a
    ``map_batches`` over it and materialized ONCE into the object store
    (it is re-joined every superstep — spillable at any pair volume,
    never driver pandas).
    """
    from ray.data.aggregate import Min, Sum
    from .joins import hash_join

    docs = _docs(sf_dir).map_batches(
        lambda df: pd.DataFrame({"doc_id": df["doc_id"].to_numpy(dtype=np.int64)}),
        batch_format="pandas")

    def make_edges(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        # symmetric + self loops (duplicate self loops across pairs are
        # harmless under the Min reduce)
        return pd.DataFrame({"node": np.concatenate([a, b, a, b]),
                             "nbr": np.concatenate([b, a, a, b])})

    edges = _ngram_jaccard_pairs_ds(sf_dir) \
        .map_batches(make_edges, batch_format="pandas").materialize()

    if edges.count() == 0:
        return docs.map_batches(
            lambda df: pd.DataFrame({"doc_id": df["doc_id"].values,
                                     "cluster": df["doc_id"].values}),
            batch_format="pandas")

    labels = edges.groupby("node", num_partitions=SHUFFLE_PARTITIONS).aggregate(Min("nbr", alias_name="label"))
    prev_sum = None
    for _ in range(CC_MAX_ITERS):
        labels = labels.materialize()
        cur_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        nbr_labels = hash_join(
            edges,
            labels.map_batches(lambda df: pd.DataFrame({
                "nbr": df["node"].values, "nbr_label": df["label"].values}),
                batch_format="pandas"),
            on="nbr", num_buckets=8).map_batches(
            lambda df: pd.DataFrame({"node": df["node"].values,
                                     "label": df["nbr_label"].values}),
            batch_format="pandas")
        labels = (labels.union(nbr_labels)
                  .groupby("node", num_partitions=SHUFFLE_PARTITIONS).aggregate(Min("label", alias_name="label")))

    cc = labels.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"].values,
                                 "cc_label": df["label"].values}),
        batch_format="pandas")
    assigned = hash_join(docs, cc, on="doc_id", how="left",
                         right_cols_hint=["cc_label"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        lab = df["cc_label"].fillna(df["doc_id"]).astype("int64")
        return pd.DataFrame({"doc_id": df["doc_id"].values,
                             "cluster": lab.values})

    return assigned.map_batches(finish, batch_format="pandas")


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({DEDUP_NGRAM_JACCARD_SQL}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
  UNION SELECT doc_id, doc_id FROM documents),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a
"""


# --------------------------------------------------- incremental dedup

CORPUS_SOURCE_MAX = 10  # sources src0..src9 = existing corpus; rest = new


def dedup_incremental(sf_dir: str):
    """Append-mode dedup: which NEW documents (sources src10+) bring
    content not already in the existing corpus (sources src0..src9)?
    The gate an ingestion pipeline runs on every new crawl drop.

    Both sides reduce to (content_hash, doc_id) rows inside their own
    batches, then a distributed ``anti_join`` on the hash keeps new docs
    whose content never appears in the corpus — the shuffle carries
    hashes, never text, and neither side is collected to the driver.
    New-vs-new duplicates are intentionally kept (the corpus is the only
    dedup reference; a later full-corpus pass handles intra-drop dups)."""
    from .joins import anti_join

    def hashed(new_side: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            src_num = df["source"].str.slice(3).astype(int)
            keep = (src_num >= CORPUS_SOURCE_MAX) if new_side \
                else (src_num < CORPUS_SOURCE_MAX)
            df = df[keep]
            h = [hashlib.md5(normalize_whitespace(t).encode()).hexdigest()
                 for t in df["text"]]
            out = {"content_hash": pd.Series(h, dtype="object")}
            if new_side:
                out["doc_id"] = df["doc_id"].to_numpy(dtype=np.int64)
            return pd.DataFrame(out)
        return fn

    from ._util import sized_read
    docs = lambda: sized_read(os.path.join(sf_dir, "documents.parquet"),
                              ["doc_id", "text", "source"],
                              rows_per_block=512)
    new = docs().map_batches(hashed(True), batch_format="pandas")
    corpus = docs().map_batches(hashed(False), batch_format="pandas")
    out = anti_join(new, corpus, on="content_hash")
    return out.map_batches(
        lambda df: df[["doc_id"]].astype({"doc_id": "int64"}),
        batch_format="pandas")


DEDUP_INCREMENTAL_SQL = rf"""
WITH h AS (
  SELECT doc_id, CAST(substr(source, 4) AS INT) AS src_num,
         md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS content_hash
  FROM documents)
SELECT doc_id FROM h
WHERE src_num >= {CORPUS_SOURCE_MAX}
  AND content_hash NOT IN (SELECT content_hash FROM h
                           WHERE src_num < {CORPUS_SOURCE_MAX})
"""


# ----------------------------------------------- per-doc n-gram novelty

def doc_novelty_score(sf_dir: str):
    """(doc_id, n_shingles, n_unique, novelty): the fraction of a doc's
    distinct word-{K}-gram shingles that appear in NO other document —
    the contamination/novelty signal dual to ``strip_boilerplate_ngrams``
    (which removes the other tail of the same distribution).

    Distributed shape reuses the dedup machinery end to end: distinct
    (shingle, doc) rows -> bounded bucketed count per shingle -> one
    partitioned join back to the rows -> per-doc bucketed sums. Nothing
    corpus-sized touches the driver. Oracle mirrors with string shingles
    (the 64-bit shingle hash is collision-free at test scale, as for
    ``dedup_ngram_jaccard``)."""
    from ._util import bucketed_group_sum
    from .joins import hash_join

    srows = _docs(sf_dir).map_batches(
        lambda df: _shingle_rows(df).assign(
            shingle=lambda d: d["shingle"].to_numpy(np.uint64)
            .view(np.int64)),
        batch_format="pandas")

    counts = bucketed_group_sum(
        srows.map_batches(
            lambda df: pd.DataFrame({"shingle": df["shingle"].to_numpy(),
                                     "c": np.ones(len(df), np.int64)}),
            batch_format="pandas"),
        "shingle", ["c"])

    joined = hash_join(srows, counts, on="shingle")

    per_doc = bucketed_group_sum(
        joined.map_batches(
            lambda df: pd.DataFrame({
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_shingles": np.ones(len(df), np.int64),
                "n_unique": (df["c"].to_numpy(np.int64) == 1)
                .astype(np.int64)}),
            batch_format="pandas"),
        "doc_id", ["n_shingles", "n_unique"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_shingles"].to_numpy(np.int64)
        u = df["n_unique"].to_numpy(np.int64)
        return df.assign(novelty=np.round(u / n, 6))

    return per_doc.map_batches(finish, batch_format="pandas")


DOC_NOVELTY_SCORE_SQL = rf"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
  FROM documents),
shingles AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - {SHINGLE_K - 1}),
                  i -> array_to_string(w[i:i+{SHINGLE_K - 1}], ' '))) AS s
    FROM words WHERE len(w) >= {SHINGLE_K}
    UNION ALL
    SELECT doc_id, array_to_string(w, ' ') AS s
    FROM words WHERE len(w) < {SHINGLE_K} AND len(w) > 0)),
counts AS (SELECT s, CAST(count(*) AS BIGINT) AS c
           FROM shingles GROUP BY s),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
  FROM shingles JOIN counts USING (s) GROUP BY doc_id)
SELECT doc_id, n_shingles, n_unique,
       round(n_unique * 1.0 / n_shingles, 6) AS novelty
FROM per
"""

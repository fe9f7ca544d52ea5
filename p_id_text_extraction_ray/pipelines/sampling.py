"""Deterministic sampling / compaction operators.

``stratified_sample_by_source`` draws an exact per-source quota with a
content-addressed order (md5 of doc_id) — the "balance the mixture"
stage of a corpus pipeline, reproducible across runs, machines and
partitionings because the keep decision is a pure function of the key,
never of arrival order. ``events_window_dedup`` keeps the earliest
event per (user, type, hour) — the keep-first-in-window compaction a
log pipeline runs before sessionization.

Both have exact DuckDB oracles (md5 and row_number are deterministic in
both engines).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd


def _read(sf_dir: str, name: str, columns: list[str], rows_per_block: int):
    from ._util import sized_read
    return sized_read(os.path.join(sf_dir, f"{name}.parquet"), columns,
                      rows_per_block=rows_per_block)


# ------------------------------------- stratified per-source sampling

SAMPLE_QUOTA = 10  # docs kept per source


def stratified_sample_by_source(sf_dir: str):
    """Keep exactly ``SAMPLE_QUOTA`` documents per source, chosen by
    smallest (md5(doc_id), doc_id).

    Top-K-per-group is associative, so each batch pre-trims to its local
    top-K per source and only (source, doc_id, digest) triples enter the
    bucketed shuffle — never text. The md5 order makes the sample a pure
    function of the keys: stable under repartitioning and incremental
    reruns, unlike random sampling.
    """
    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "source": df["source"].values,
            "doc_id": df["doc_id"].values,
            "h": [hashlib.md5(str(d).encode()).hexdigest()
                  for d in df["doc_id"]]})
        return (out.sort_values(["h", "doc_id"])
                .groupby("source", as_index=False).head(SAMPLE_QUOTA))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["h", "doc_id"])
                .groupby("source", as_index=False).head(SAMPLE_QUOTA))

    trimmed = _read(sf_dir, "documents", ["doc_id", "source"],
                    rows_per_block=64_000) \
        .map_batches(local_topk, batch_format="pandas")
    return (trimmed.map_batches(
        lambda df: df.assign(__bucket=_bucket_of(df["source"], 64)),
        batch_format="pandas")
        .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
        .map_groups(lambda g: final_topk(g.drop(columns="__bucket")),
                    batch_format="pandas")
        .sort(["source", "h", "doc_id"])
        .map_batches(lambda df: df[["source", "doc_id"]],
                     batch_format="pandas"))


STRATIFIED_SAMPLE_SQL = f"""
SELECT source, doc_id
FROM documents
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= {SAMPLE_QUOTA}
ORDER BY source, md5(CAST(doc_id AS VARCHAR)), doc_id
"""


# --------------------------------------- keep-first-in-window dedup

def events_window_dedup(sf_dir: str):
    """Keep the earliest event per (user, event type, hour) — windowed
    dedup compaction (ties break on event_id).

    All of a user's events share a bucket, so one bucketed shuffle
    evaluates every window exactly; within the bucket it is a vectorized
    sort + drop_duplicates, no per-window loop.
    """
    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"],
               rows_per_block=150_000)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(hour=g["ts"].dt.floor("h"))
        g = g.sort_values(["user_id", "event_type", "hour", "ts", "event_id"])
        g = g.drop_duplicates(["user_id", "event_type", "hour"])
        return g[["event_id", "user_id", "event_type", "ts"]]

    return (ev.map_batches(
        lambda df: df.assign(__bucket=_bucket_of(df["user_id"], 64)),
        batch_format="pandas")
        .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
        .map_groups(lambda g: keep_first(g.drop(columns="__bucket")),
                    batch_format="pandas")
        .sort("event_id"))


EVENTS_WINDOW_DEDUP_SQL = """
SELECT event_id, user_id, event_type, ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type,
                                        date_trunc('hour', ts)
                           ORDER BY ts, event_id) = 1
ORDER BY event_id
"""


# --------------------------- weighted sampling without replacement

WEIGHTED_SAMPLE_K = 100
_U52 = 4503599627370496.0      # 2^52: 13 hex digits of md5 -> exact double


def weighted_sample_docs(sf_dir: str):
    """Exactly ``WEIGHTED_SAMPLE_K`` documents drawn WITHOUT replacement
    with probability proportional to weight = n_chars + 1 — the
    Efraimidis–Spirakis A-ES scheme (Efraimidis & Spirakis '06): each
    row gets priority ln(u)/w for a per-key uniform u, and the global
    top-K priorities ARE the weighted sample. Deterministic end-to-end:
    u derives from md5(doc_id) (13 hex chars / 2^52 — an exact double),
    so the sample is a pure function of the keys, reproducible across
    runs and partitionings, and mirrored exactly by the SQL oracle.

    Top-K is associative: each batch pre-trims locally, a single tiny
    reduce keeps the global K — only (doc_id, source, weight, priority)
    candidate rows ever shuffle, never text.

    Output: (rank, doc_id, source, weight, priority), rank 1..K by
    priority descending (ties by doc_id).
    """
    import numpy as np

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"],
                 rows_per_block=150_000)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        w = (df["n_chars"].to_numpy() + 1).astype(np.int64)
        u = np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16)
             for d in df["doc_id"].to_numpy()),
            dtype=np.int64, count=len(df)) / _U52
        pri = np.log(u) / w.astype(np.float64)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                            "source": df["source"].to_numpy(),
                            "weight": w, "priority": pri})
        out = out.sort_values(["priority", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(WEIGHTED_SAMPLE_K)
        return out.assign(__g=np.int64(0))

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["priority", "doc_id"], ascending=[False, True],
                           kind="mergesort").head(WEIGHTED_SAMPLE_K)
             .drop(columns="__g").reset_index(drop=True))
        g.insert(0, "rank", np.arange(1, len(g) + 1, dtype=np.int64))
        return g

    out = (docs.map_batches(local_topk, batch_format="pandas")
           .groupby("__g", num_partitions=1)
           .map_groups(global_topk, batch_format="pandas")
           .to_pandas())
    if out.empty:                # zero groups: global_topk never ran
        out = pd.DataFrame({
            "rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "source": pd.Series([], dtype=object),
            "weight": pd.Series([], dtype=np.int64),
            "priority": pd.Series([], dtype=np.float64)})
    return out.drop(columns="__g", errors="ignore")


WEIGHTED_SAMPLE_SQL = f"""
WITH p AS (
  SELECT doc_id, source, CAST(n_chars + 1 AS BIGINT) AS weight,
         ln(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                 AS BIGINT) / {_U52!r}) / CAST(n_chars + 1 AS BIGINT)
           AS priority
  FROM documents)
SELECT CAST(row_number() OVER (ORDER BY priority DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, source, weight, priority
FROM p
QUALIFY rank <= {WEIGHTED_SAMPLE_K}
ORDER BY rank
"""

"""Shared pipeline helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sized_read(path: str, columns: list[str], rows_per_block: int,
               max_blocks: int = 1024):
    """``read_parquet`` with block count derived from the file's actual row
    count (one cheap footer read) instead of Ray's 2×CPUs floor.

    Ray's default parallelism mints ~64 blocks even for a 10 MB table;
    every downstream all-to-all then pays per-block task overhead on
    near-empty blocks — the dominant cost of small-scale shuffles.
    ``rows_per_block`` is the stage-weight knob: high (~150k) for cheap
    columnar scans feeding shuffles, low (~512) for reads feeding
    CPU-heavy per-row work that needs the parallelism. Block count grows
    linearly with the data (capped per file at ``max_blocks``; a 100 TB
    input is many files, each sized independently), so the heuristic is
    scale-neutral.
    """
    import os
    import ray.data as rd
    import pyarrow.parquet as pq
    if os.path.isdir(path):
        # a table at scale is a DIRECTORY of parquet files (the engine's
        # own partitioned sinks produce exactly that); row count sums the
        # footers, never the data. Read the explicit shard list so the
        # counted set and the read set are identical (a _SUCCESS/.done
        # sidecar must neither crash the read nor skew the count).
        files = sorted(
            os.path.join(root, f)
            for root, _, names in os.walk(path)
            for f in names if f.endswith((".parquet", ".pq")))
        if not files:
            raise FileNotFoundError(f"no parquet shards under {path}")
        nrows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        max_blocks = max_blocks * len(files)
        path = files
    else:
        nrows = pq.ParquetFile(path).metadata.num_rows
    nb = max(1, min(max_blocks, (nrows + rows_per_block - 1) // rows_per_block))
    return rd.read_parquet(path, columns=columns, override_num_blocks=nb)


def collect_with_schema(ds, schema: pa.Schema) -> pd.DataFrame:
    """Materialize a SMALL result Dataset to pandas, preserving column names
    even when every block is empty (Ray's ``to_pandas`` drops the schema of
    an all-empty pandas-block dataset)."""
    df = ds.to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame({f.name: pd.Series(dtype=f.type.to_pandas_dtype())
                           for f in schema})
    return df


def bucketed_group_sum(ds, key: str | list[str], sum_cols: list[str],
                       num_buckets: int = 64,
                       num_partitions: int | None = None):
    """Grouped sum over high-cardinality integer key(s) without per-group
    overhead: shuffle on ``hash(keys) % num_buckets`` and run ONE vectorized
    pandas groupby per bucket. Exact (all rows of a key share a bucket);
    num_buckets is the shuffle-parallelism knob. Ray's native
    ``groupby(...).aggregate(...)`` pays per-GROUP overhead — at ~10^6
    distinct keys that is minutes; this is seconds."""
    keys = [key] if isinstance(key, str) else list(key)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from .joins import _bucket_of
        h = np.zeros(len(df), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in keys:
                h = (h * np.uint64(0x9E3779B97F4A7C15)
                     + _bucket_of(df[k], 1 << 62).astype(np.uint64))
            b = (h * np.uint64(2654435761)) % np.uint64(num_buckets)
        return df.assign(__bucket=b.astype(np.int64))

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False)[sum_cols].sum()

    from .joins import DEFAULT_SHUFFLE_PARTITIONS
    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket",
                     num_partitions=num_partitions or DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(reduce_bucket, batch_format="pandas"))


def user_bucket(df: pd.DataFrame, col: str = "user_id",
                n: int = 64) -> pd.DataFrame:
    """Hash-bucket an integer entity key into ``bucket`` (Knuth
    multiplicative hash) — the shared shuffle key for per-entity
    windowed work. One definition so a future hot-bucket salting change
    lands everywhere at once."""
    k = df[col].to_numpy(dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        b = (k * np.uint64(2654435761)) % np.uint64(n)
    return df.assign(bucket=b.astype(np.int64))


def md5_buckets(tokens: np.ndarray, cache: dict, nhex: int = 4) -> np.ndarray:
    """md5-hex-prefix bucket per token (object array of str), memoized in
    ``cache``. Callers pass only batch-DISTINCT tokens so the md5 cost is
    once per new token per actor, not once per (doc, token) occurrence."""
    import hashlib
    out = np.empty(len(tokens), np.int64)
    get = cache.get
    for i, t in enumerate(tokens):
        v = get(t)
        if v is None:
            v = cache[t] = int(
                hashlib.md5(t.encode()).hexdigest()[:nhex], 16)
        out[i] = v
    return out


def doc_token_weight_sums(texts, values: np.ndarray, cache: dict):
    """Per-document ``sum(tf(token) * values[md5_bucket(token)])`` —
    the hashed-LM scoring kernel; see ``doc_token_value_sums``."""
    return doc_token_value_sums(
        texts, lambda uniq: values[md5_buckets(uniq, cache)])


def doc_token_value_sums(texts, uniq_values_fn):
    """Per-document ``sum(tf(token) * value(token))`` with the summation
    in ascending distinct-token order, left-associative — bit-exact with
    DuckDB's ``sum(x ORDER BY t)`` and with the scalar loop it replaces
    (``acc = acc + tf * v`` over ``sorted(counter)``).

    The shared kernel of the LM scoring stages, vectorized per the
    round-3 verdict: ONE ``np.unique`` over the batch's token stream,
    ``uniq_values_fn`` maps only the batch-DISTINCT token array to their
    float64 values (md5 buckets, count-table lookups, ...), per-(doc,
    token) term frequencies come from sorted-key segment boundaries, and
    per-doc sums are Python float adds over the contribution slices
    (plain ``sum`` is left-associative; numpy's pairwise reduction is
    not bit-stable against the oracle).

    Returns ``(doc_positions, n_tokens, sums)`` — positions index into
    ``texts``, restricted to docs with >=1 token (tokenless docs drop,
    like the SQL unnest), in input order.
    """
    tok_lists = [t.split() for t in texts]
    lens = np.fromiter((len(x) for x in tok_lists), np.int64,
                       len(tok_lists))
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), []
    all_tokens = np.empty(total, dtype=object)
    pos = 0
    for x in tok_lists:
        if x:
            all_tokens[pos:pos + len(x)] = x
            pos += len(x)
    doc_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
    uniq, inv = np.unique(all_tokens, return_inverse=True)
    vals = uniq_values_fn(uniq)
    u = len(uniq)
    key = doc_idx * u + inv
    sk = np.sort(key)
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    tf = np.diff(np.r_[starts, len(sk)])
    gk = sk[starts]
    g_doc = gk // u
    contrib = (tf * vals[gk % u]).tolist()
    d_starts = np.flatnonzero(np.r_[True, g_doc[1:] != g_doc[:-1]])
    d_ends = np.r_[d_starts[1:], len(g_doc)]
    sums = [sum(contrib[a:b], 0.0)
            for a, b in zip(d_starts.tolist(), d_ends.tolist())]
    doc_positions = g_doc[d_starts]
    return doc_positions, lens[doc_positions], sums


def cents(values: np.ndarray | pd.Series) -> np.ndarray:
    """Dollars->cents as exact int64 (rint: values are integers +/- fp eps,
    never near .5). Exact integer sums make money aggregates independent of
    summation order — bit-identical between Ray and the DuckDB oracle."""
    return np.rint(np.asarray(values, dtype=np.float64) * 100).astype(np.int64)


def round_sql(x, ndigits: int = 6):
    """DuckDB-compatible rounding for non-negative doubles: round half
    AWAY from zero (np.round is banker's/half-even, which flips exact
    .5-boundary values like 2.3015625 the other way than the SQL
    oracle)."""
    scale = 10.0 ** ndigits
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5) / scale

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


def cents(values: np.ndarray | pd.Series) -> np.ndarray:
    """Dollars->cents as exact int64 (rint: values are integers +/- fp eps,
    never near .5). Exact integer sums make money aggregates independent of
    summation order — bit-identical between Ray and the DuckDB oracle."""
    return np.rint(np.asarray(values, dtype=np.float64) * 100).astype(np.int64)

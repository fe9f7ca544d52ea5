"""Distributed prefix-scan operators.

A running aggregate over a GLOBAL row order (cummax/cumsum "scan") is
the one relational shape that neither a groupby nor a join expresses:
every row depends on all rows before it. The scalable decomposition is
the classic three-step parallel scan (Blelloch '90):

  1. range-partition the order key into fixed-width buckets and compute
     each bucket's LOCAL aggregate (one small row per bucket);
  2. exclusive-scan the bucket aggregates on the driver — O(n_buckets)
     rows, a constant factor of metadata regardless of corpus size
     (bucket width is the knob; 100 TB of events at 2^20 rows/bucket is
     ~10^5 summary rows);
  3. re-stream each bucket seeded with its prefix aggregate and emit
     the per-row scan result.

``events_running_records`` applies it to running-max "record" detection
(events whose value beats every earlier event in arrival order — the
streaming leader/record query; expected #records is ~ln(N), so the
output is tiny while the scan itself is genuinely global). Pure
comparisons, no float arithmetic — bit-exact vs the window-function
oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ._util import sized_read

BUCKET_WIDTH = 65_536      # minimum event_ids per scan bucket
MAX_BUCKETS = 65_536       # caps the driver-side summary row count


def _scan_width(sf_dir: str) -> int:
    """Bucket width sized from the table's footer row count so the
    driver-side summary stays <= MAX_BUCKETS rows at ANY table size
    (10^12 events -> ~15M-wide buckets, still one small row each)."""
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        nrows = sum(pq.ParquetFile(os.path.join(r, f)).metadata.num_rows
                    for r, _, names in os.walk(path)
                    for f in names if f.endswith((".parquet", ".pq")))
    else:
        nrows = pq.ParquetFile(path).metadata.num_rows
    return max(BUCKET_WIDTH, (nrows + MAX_BUCKETS - 1) // MAX_BUCKETS)


def events_running_records(sf_dir: str):
    """(event_id, event_type, value) of every record-breaking event:
    value strictly greater than all earlier values in event_id order
    (the first event is a record). Ordered by event_id."""
    import ray
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    width = _scan_width(sf_dir)

    def _read():
        return sized_read(os.path.join(sf_dir, "events.parquet"),
                          ["event_id", "event_type", "value"],
                          rows_per_block=150_000)

    def bucket_max(df: pd.DataFrame) -> pd.DataFrame:
        b = df["event_id"].to_numpy() // width
        g = pd.DataFrame({"bucket": b, "value": df["value"].to_numpy()})
        out = g.groupby("bucket", as_index=False)["value"].max()
        return out.rename(columns={"value": "max_v"})

    # step 1+2: per-bucket maxima (tiny) -> driver exclusive prefix max
    summ = _read().map_batches(bucket_max, batch_format="pandas").to_pandas()
    if summ.empty:
        return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                             "event_type": pd.Series([], dtype=object),
                             "value": pd.Series([], dtype=np.float64)})
    summ = (summ.groupby("bucket", as_index=False)["max_v"].max()
            .sort_values("bucket"))
    prefix = {}
    running = -np.inf
    for b, mv in zip(summ["bucket"], summ["max_v"]):
        prefix[int(b)] = running          # max over all STRICTLY earlier buckets
        if not np.isnan(mv):              # all-NULL bucket: no maximum
            running = max(running, float(mv))
    prefix_ref = ray.put(prefix)

    def tag_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            __bucket=(df["event_id"].to_numpy() // width))

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        seeds = ray.get(prefix_ref)
        df = df.sort_values("event_id", kind="mergesort")
        v = df["value"].to_numpy(dtype=np.float64)
        seed = seeds[int(df["__bucket"].iloc[0])]
        # exclusive running max over everything strictly earlier; NULLs
        # never contribute a maximum (-inf stand-in mirrors the SQL
        # window's NULL skipping) and -inf prefix == "prev_max IS NULL"
        vc = np.where(np.isnan(v), -np.inf, v)
        c = np.maximum.accumulate(np.concatenate(([seed], vc)))[:-1]
        rec = (c == -np.inf) | (v > c)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy()[rec],
            "event_type": df["event_type"].to_numpy()[rec],
            "value": v[rec]})

    # step 3: seeded per-bucket scan; records are ~ln(N) rows
    out = (_read().map_batches(tag_bucket, batch_format="pandas")
           .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
           .map_groups(scan_bucket, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("event_id", kind="mergesort")
            .reset_index(drop=True))


EVENTS_RUNNING_RECORDS_SQL = """
WITH m AS (SELECT event_id, event_type, value,
                  max(value) OVER (ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_max
           FROM events)
SELECT event_id, event_type, value
FROM m WHERE prev_max IS NULL OR value > prev_max
ORDER BY event_id
"""

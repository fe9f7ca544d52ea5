"""Ordered-window and semi-structured analytics operators.

* inter-arrival stats   — LAG()-based per-entity gap features: users are
                          hash-bucketed, each bucket sorts once and
                          diffs timestamps vectorized (exact integer
                          microseconds), so the shuffle moves each event
                          exactly once and no per-user Python runs.
* cumulative revenue    — a running total over day-level aggregates. The
                          distributed part reduces fact rows to one
                          partial per (batch, day); the prefix sum runs
                          over the day table, whose cardinality is the
                          date range — independent of fact-table size —
                          in a single final block.
* event paths           — ordered string_agg per user (the session-path
                          feature): bucketed sort + one per-group join.
* JSON props extraction — typed field pulled out of a JSON string column
                          with one compiled regex per batch (the props
                          are machine-written ``{"k": int}``; a regex is
                          exact here and ~20× cheaper than a JSON parse
                          per row), then a standard grouped aggregate.

All money/time math is exact-integer until one final division that
mirrors the DuckDB oracle's operand order (see relational.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import cents, sized_read


def _read(sf_dir: str, name: str, columns: list[str]):
    return sized_read(os.path.join(sf_dir, f"{name}.parquet"), columns,
                      rows_per_block=150_000)


def _user_bucket(df: pd.DataFrame, col: str = "user_id",
                 n: int = 64) -> pd.DataFrame:
    k = df[col].to_numpy(dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        b = (k * np.uint64(2654435761)) % np.uint64(n)
    return df.assign(bucket=b.astype(np.int64))


# -------------------------------------------------- inter-arrival stats

def events_interarrival(sf_dir: str):
    """Per-user inter-event-gap statistics (count / mean / max seconds),
    the LAG(ts)-difference feature. Gaps are computed as exact int64
    microseconds inside each user bucket; only per-user aggregate rows
    leave the bucket."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        d = df.groupby("user_id")["ts"].diff()
        keep = d.notna().to_numpy()     # first event per user has no gap
        gap = d.to_numpy(dtype="timedelta64[us]").astype(np.int64)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy()[keep],
                          "gap_us": gap[keep]})
        a = g.groupby("user_id", as_index=False).agg(
            n_gaps=("gap_us", "size"), sum_us=("gap_us", "sum"),
            max_us=("gap_us", "max"))
        return pd.DataFrame({
            "user_id": a["user_id"].values,
            "n_gaps": a["n_gaps"].to_numpy(dtype=np.int64),
            "avg_gap_s": np.round(a["sum_us"].values / a["n_gaps"].values
                                  / 1_000_000.0, 6),
            "max_gap_s": a["max_us"].values / 1_000_000.0})

    return (ev.map_batches(_user_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(gaps, batch_format="pandas"))


EVENTS_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id), ts) AS gap_us
  FROM events)
SELECT user_id,
       count(gap_us)                                     AS n_gaps,
       round(sum(gap_us) / count(gap_us) / 1000000.0, 6) AS avg_gap_s,
       max(gap_us) / 1000000.0                           AS max_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------- cumulative daily revenue

def orders_cumulative_revenue(sf_dir: str):
    """Daily order revenue plus its running total.

    Fact rows collapse to per-(batch, day) partials before the shuffle;
    the grouped day table (cardinality = #days in the date range, NOT a
    function of row count) is then repartitioned to one block where the
    prefix sum runs vectorized. At 100 TB the day table is still a few
    thousand rows, so the single-block scan is not a bottleneck; a
    longer-range variant would scan per-partition subtotals the same way.
    """
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["o_orderdate"].dt.floor("D")
        g = pd.DataFrame({"day": day.values,
                          "rev_c": cents(df["o_totalprice"])}) \
            .groupby("day", as_index=False)["rev_c"].sum()
        return g

    daily = orders.map_batches(partial, batch_format="pandas") \
        .groupby("day").aggregate(Sum("rev_c", alias_name="rev_c"))

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", kind="mergesort")
        c = df["rev_c"].to_numpy(dtype=np.int64).cumsum()
        return pd.DataFrame({"day": df["day"].values,
                             "day_rev": df["rev_c"].values / 100.0,
                             "cum_rev": c / 100.0})

    return daily.repartition(1).map_batches(running, batch_format="pandas",
                                            batch_size=None)


ORDERS_CUMULATIVE_REVENUE_SQL = """
WITH d AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1)
SELECT day,
       rev_c / 100.0 AS day_rev,
       CAST(sum(rev_c) OVER (ORDER BY day) AS BIGINT) / 100.0 AS cum_rev
FROM d
"""


# ------------------------------------------------------ user event paths

def user_event_paths(sf_dir: str):
    """Ordered event-type path per user (``a>b>c`` in (ts, event_id)
    order) — the clickstream/session-path feature. Bucketed by user so
    each bucket sorts once; the only per-group step is the string join
    itself (no vectorized kernel exists for ordered concat)."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id")["event_type"]
        out = g.agg(">".join).reset_index()
        out.columns = ["user_id", "path"]
        out["n_events"] = g.size().to_numpy(dtype=np.int64)
        return out[["user_id", "n_events", "path"]]

    return (ev.map_batches(_user_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(paths, batch_format="pandas"))


USER_EVENT_PATHS_SQL = """
SELECT user_id,
       count(*) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id
"""


# ------------------------------------------------- JSON props extraction

import re

_PROPS_K = re.compile(r'"k"\s*:\s*(-?\d+)')


def events_props_stats(sf_dir: str):
    """Grouped aggregate over a field extracted from the JSON ``props``
    column — the semi-structured-projection operator. One compiled regex
    per batch via pandas' vectorized ``str.extract`` (exact for the
    machine-written ``{"k": int}`` payloads), partials per (batch,
    event_type), tiny final shuffle."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(_PROPS_K, expand=False) \
            .astype(np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].values, "k": k.values}) \
            .groupby("event_type", as_index=False) \
            .agg(n_events=("k", "size"), sum_k=("k", "sum"))
        return g

    agg = ev.map_batches(partial, batch_format="pandas") \
        .groupby("event_type") \
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_k", alias_name="sum_k"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].values,
            "n_events": df["n_events"].to_numpy(dtype=np.int64),
            "sum_k": df["sum_k"].to_numpy(dtype=np.int64),
            "avg_k": np.round(df["sum_k"].values / df["n_events"].values, 6)})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_PROPS_STATS_SQL = """
WITH e AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       count(*)                         AS n_events,
       CAST(sum(k) AS BIGINT)           AS sum_k,
       round(sum(k) / count(*), 6)      AS avg_k
FROM e GROUP BY event_type
"""

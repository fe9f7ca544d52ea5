"""Time-range join and temporal feature operators.

* error follow-ups     — a RANGE JOIN on time alone (no equality key):
                         for each error event, count/sum the purchase
                         events in the 10 minutes after it. Ray Data has
                         no range join; the scalable decomposition is
                         time-bucketing with boundary replication: pick a
                         bucket width >= the window, land each probe
                         (error) in exactly one bucket, replicate each
                         build row (purchase) into the <=2 buckets whose
                         probes can reach it, then answer every probe in
                         a bucket with two vectorized ``searchsorted``
                         calls against the bucket's sorted build side +
                         an exact integer prefix sum. Each build row is
                         shuffled at most twice regardless of scale; no
                         pair is ever materialized. (Hot buckets — event
                         rates so high one wall-clock hour overflows a
                         worker — shrink ``BUCKET_SECONDS`` toward the
                         window, or salt probes into S sub-groups and
                         replicate the bucket's build side S ways.)
* transition matrix    — per-user consecutive event-type pairs (the
                         Markov/bigram transition table of a clickstream):
                         users are hash-bucketed so each bucket derives
                         every LEAD() pair with one vectorized shift;
                         only (from, to, count) partials — <= |types|²
                         rows per bucket — reach the final reduce. The
                         transition probability is one exact-int division.
* activity streaks     — gaps-and-islands: per-user longest run of
                         consecutive active days. Batches collapse to
                         distinct (user, day) before the shuffle; islands
                         fall out of one vectorized diff per user bucket.
* trailing window      — RANGE-frame (value-based) per-user trailing
                         1-hour aggregate with exact peer/tie semantics
                         via a composite (user-rank << 44 | µs) key and
                         two ``searchsorted`` calls — see
                         ``events_trailing_window``.
* decayed user value   — exponentially time-decayed purchase value per
                         user (half-life 1 day), the classic feature-store
                         recency weighting. Weights are exact powers of
                         two (``ldexp``), so every term — and, at any
                         realistic per-user event count, every partial
                         sum — is a dyadic rational representable exactly
                         in a float64: the grouped sum is bit-identical
                         to the oracle's regardless of association order
                         (drift beyond ~2^52 ulp-units is ~1e-9, far
                         inside the 6-dp compare tolerance).

All money math is exact integer cents until the final division, which
mirrors the oracle's operand order (see relational.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ._util import cents, sized_read, user_bucket

WINDOW_SECONDS = 600           # range-join window: 10 minutes
BUCKET_SECONDS = 3600          # range-join bucket width (>= window)
DECAY_HALF_LIFE_DAYS = 1       # decayed value: weight halves per day
_US = np.int64(1_000_000)
_DAY_US = np.int64(86_400_000_000)


def _read(sf_dir: str, name: str, columns: list[str]):
    return sized_read(os.path.join(sf_dir, f"{name}.parquet"), columns,
                      rows_per_block=150_000)


def _ts_us(s: pd.Series) -> np.ndarray:
    """Timestamps as exact int64 microseconds (NaT -> int64 min, which
    sorts first and never lands inside a real window)."""
    return s.to_numpy(dtype="datetime64[us]").astype(np.int64)


# ------------------------------------------------- time-range self-join

def events_error_followups(sf_dir: str):
    """(event_id, n_follow, follow_value) for every error event: the
    count and exact value sum of purchase events with ts in
    (error.ts, error.ts + 10 min]. Errors with no follow-ups emit 0/0.0
    (LEFT JOIN semantics). Ordered by event_id."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    w_us = np.int64(WINDOW_SECONDS) * _US
    bw_us = np.int64(BUCKET_SECONDS) * _US

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def route(df: pd.DataFrame) -> pd.DataFrame:
        ts = _ts_us(df["ts"])
        err = (df["event_type"] == "error").to_numpy()
        pur = ((df["event_type"] == "purchase")
               & df["ts"].notna()).to_numpy()
        parts = [pd.DataFrame({
            "bucket": ts[err] // bw_us, "role": np.int8(0),
            "event_id": df["event_id"].to_numpy()[err],
            "ts_us": ts[err], "v_c": np.int64(0)})]
        # a purchase at p is reachable from errors in buckets
        # floor((p-W)/BW) .. floor(p/BW) — at most two when BW >= W
        p_ts = ts[pur]
        p_id = df["event_id"].to_numpy()[pur]
        p_vc = cents(np.nan_to_num(
            df["value"].to_numpy(dtype=np.float64)[pur]))
        b_own, b_prev = p_ts // bw_us, (p_ts - w_us) // bw_us
        for b in (b_own, b_prev):
            keep = np.ones(len(p_ts), dtype=bool) if b is b_own \
                else (b_prev != b_own)
            parts.append(pd.DataFrame({
                "bucket": b[keep], "role": np.int8(1),
                "event_id": p_id[keep], "ts_us": p_ts[keep],
                "v_c": p_vc[keep]}))
        return pd.concat(parts, ignore_index=True)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["role"] == 0]
        p = df[df["role"] == 1].sort_values("ts_us", kind="mergesort")
        p_ts = p["ts_us"].to_numpy()
        prefix = np.concatenate(
            ([0], np.cumsum(p["v_c"].to_numpy(dtype=np.int64))))
        e_ts = e["ts_us"].to_numpy()
        lo = np.searchsorted(p_ts, e_ts, side="right")
        hi = np.searchsorted(p_ts, e_ts + w_us, side="right")
        return pd.DataFrame({
            "event_id": e["event_id"].to_numpy(),
            "n_follow": (hi - lo).astype(np.int64),
            "follow_value": (prefix[hi] - prefix[lo]) / 100.0})

    return (ev.map_batches(route, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(probe, batch_format="pandas")
            .sort("event_id"))


EVENTS_ERROR_FOLLOWUPS_SQL = f"""
SELECT e.event_id,
       CAST(count(p.event_id) AS BIGINT)                       AS n_follow,
       coalesce(sum(CAST(round(p.value * 100) AS BIGINT)), 0) / 100.0
                                                               AS follow_value
FROM events e
LEFT JOIN events p
  ON p.event_type = 'purchase'
 AND p.ts >  e.ts
 AND p.ts <= e.ts + INTERVAL {WINDOW_SECONDS} SECOND
WHERE e.event_type = 'error'
GROUP BY e.event_id
ORDER BY e.event_id
"""


# ------------------------------------------------ Markov transition matrix

def event_transition_matrix(sf_dir: str):
    """(from_type, to_type, n_pairs, p_next): counts of per-user
    consecutive event-type pairs in (ts, event_id) order, plus the
    conditional next-step probability within each from_type. Ordered by
    (from_type, to_type)."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy()
        same = uid[1:] == uid[:-1]
        pairs = pd.DataFrame({"from_type": et[:-1][same],
                              "to_type": et[1:][same]})
        out = pairs.groupby(["from_type", "to_type"], as_index=False) \
            .size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = (ev.map_batches(user_bucket, batch_format="pandas")
                .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
                .map_groups(pair_counts, batch_format="pandas")
                .groupby(["from_type", "to_type"])
                .aggregate(Sum("n", alias_name="n_pairs"))
                .to_pandas())          # <= |types|^2 rows at any scale
    if partials.empty:
        return pd.DataFrame({
            "from_type": pd.Series([], dtype=object),
            "to_type": pd.Series([], dtype=object),
            "n_pairs": pd.Series([], dtype=np.int64),
            "p_next": pd.Series([], dtype=np.float64)})
    partials["n_pairs"] = partials["n_pairs"].astype(np.int64)
    tot = partials.groupby("from_type")["n_pairs"].transform("sum") \
        .to_numpy(dtype=np.float64)
    partials["p_next"] = partials["n_pairs"].to_numpy(np.float64) / tot
    return (partials.sort_values(["from_type", "to_type"], kind="mergesort")
            .reset_index(drop=True))


EVENT_TRANSITION_MATRIX_SQL = """
WITH s AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_pairs,
       count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY from_type) AS p_next
FROM s WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""


# ------------------------------------------- gaps-and-islands streaks

def user_activity_streaks(sf_dir: str):
    """(user_id, n_active_days, max_streak): per-user count of distinct
    active days and the longest run of CONSECUTIVE days with >=1 event —
    the gaps-and-islands shape (SQL's day - row_number() trick). Each
    batch first collapses to distinct (user, day) rows, so the shuffle
    carries at most one row per user-day; islands are then derived
    inside each user bucket with one vectorized diff — no per-user
    Python, no window sort beyond the bucket's own."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["ts"].notna()]
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "day": _ts_us(df["ts"]) // _DAY_US}).drop_duplicates()

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]) \
            .sort_values(["user_id", "day"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        day = df["day"].to_numpy()
        new = np.ones(len(df), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        island = np.cumsum(new) - 1
        length = np.bincount(island)
        g = pd.DataFrame({"user_id": uid[new],
                          "len": length.astype(np.int64)})
        out = g.groupby("user_id", as_index=False) \
            .agg(n_active_days=("len", "sum"), max_streak=("len", "max"))
        return out.astype({"n_active_days": np.int64,
                           "max_streak": np.int64})

    return (ev.map_batches(day_partial, batch_format="pandas")
            .map_batches(user_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(islands, batch_format="pandas"))


USER_ACTIVITY_STREAKS_SQL = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(date_trunc('day', ts) AS DATE) AS day
           FROM events WHERE ts IS NOT NULL),
i AS (SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER) AS grp
      FROM d),
s AS (SELECT user_id, grp, count(*) AS len FROM i GROUP BY user_id, grp)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS max_streak
FROM s GROUP BY user_id
"""


# ------------------------------------------------ decayed user value

def user_decayed_value(sf_dir: str):
    """(user_id, n_purchases, decayed_value): per-user purchase value
    weighted by 2^-(age_days) relative to the corpus's newest event —
    exponential decay with a one-day half-life. Weights are exact powers
    of two, so the sum is association-independent (see module docstring).
    Ordered by user_id."""
    from ._util import bucketed_group_sum

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    # global max ts: one tiny row per batch, reduced on the driver
    def batch_max(df: pd.DataFrame) -> pd.DataFrame:
        ts = _ts_us(df["ts"][df["ts"].notna()])
        if len(ts) == 0:
            return pd.DataFrame({"mx": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"mx": [ts.max()]})

    mx = ev.map_batches(batch_max, batch_format="pandas").to_pandas()
    if mx.empty:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "n_purchases": pd.Series([], dtype=np.int64),
            "decayed_value": pd.Series([], dtype=np.float64)})
    t_ref = np.int64(mx["mx"].max())

    def terms(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["event_type"] == "purchase") & df["ts"].notna()
                & df["value"].notna()]
        ts = _ts_us(df["ts"])
        age = (t_ref - ts) // (_DAY_US * DECAY_HALF_LIFE_DAYS)
        term = cents(df["value"]).astype(np.float64) \
            * np.ldexp(1.0, -age.astype(np.int64))
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "term": term,
                             "n_purchases": np.int64(1)})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "n_purchases": df["n_purchases"].to_numpy(dtype=np.int64),
            "decayed_value": df["term"].to_numpy(dtype=np.float64) / 100.0})

    # per-user output grows with the corpus — stays a streaming Dataset
    sums = ev.map_batches(terms, batch_format="pandas")
    return bucketed_group_sum(sums, "user_id", ["term", "n_purchases"]) \
        .map_batches(finish, batch_format="pandas")


# ------------------------------------------ RANGE-frame trailing window

TRAIL_SECONDS = 3600           # trailing-window width: 1 hour


def events_trailing_window(sf_dir: str):
    """(event_id, user_id, ts, w_n, w_sum): per-user count and value sum
    over the trailing RANGE frame [ts - 1h, ts] — the value-based window
    frame (ROWS-frame rolling features are ``events_rolling_avg``). RANGE
    CURRENT ROW includes ALL peers of the current ts, even later-row
    ones, so a positional rolling window is wrong under ties; instead
    each user bucket sorts once and answers every row with two
    ``searchsorted`` calls on a composite (dense-user-rank << 44 | µs
    offset) integer key — exact peer semantics, fully vectorized. The
    44-bit µs offset covers ~200 days of corpus span; a wider corpus
    bumps the shift (the key has 20 spare bits at 10^6 users/bucket).
    A window whose values are all NULL sums to NULL (SQL parity), and
    NULL-ts rows form one peer group per user (DuckDB's NULL ordering)."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    w_us = np.int64(TRAIL_SECONDS) * _US

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    SENT = np.uint64((1 << 44) - 1)

    def trail(df: pd.DataFrame) -> pd.DataFrame:
        # no pre-sort needed: the composite-key argsort below establishes
        # the (user, ts, NULLs-last) order all by itself
        ts = _ts_us(df["ts"])
        null_ts = df["ts"].isna().to_numpy()
        uid = df["user_id"].to_numpy()
        urank = np.unique(uid, return_inverse=True)[1].astype(np.uint64)
        base = ts[~null_ts].min() if (~null_ts).any() else 0
        with np.errstate(over="ignore"):
            rel = np.where(null_ts, 0, ts - base).astype(np.uint64)
        if len(rel) and rel.max() >= SENT:
            raise ValueError(
                "events_trailing_window: corpus time span exceeds the "
                "44-bit microsecond key space (~200 days); widen the "
                "composite-key shift for this corpus")
        # NULL-ts rows get the sentinel offset: one peer group per user,
        # above every real timestamp (DuckDB NULLS LAST)
        rel = np.where(null_ts, SENT, rel)
        key = (urank << np.uint64(44)) | rel
        order = np.argsort(key, kind="mergesort")
        key_s = key[order]
        v = df["value"].to_numpy(dtype=np.float64)[order]
        vc = cents(np.nan_to_num(v))
        pref_v = np.concatenate(([0], np.cumsum(vc)))
        pref_n = np.concatenate(([0], np.cumsum((~np.isnan(v))
                                                .astype(np.int64))))
        lo_rel = np.where(null_ts[order], SENT,
                          np.maximum(key_s & SENT, np.uint64(w_us))
                          - np.uint64(w_us))
        lo_key = (key_s & ~SENT) | lo_rel
        lo = np.searchsorted(key_s, lo_key, side="left")
        hi = np.searchsorted(key_s, key_s, side="right")
        n_val = pref_n[hi] - pref_n[lo]
        w_sum = np.where(n_val > 0,
                         (pref_v[hi] - pref_v[lo]) / 100.0, np.nan)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy()[order],
            "user_id": uid[order], "ts": df["ts"].to_numpy()[order],
            "w_n": (hi - lo).astype(np.int64), "w_sum": w_sum})

    return (ev.map_batches(user_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(trail, batch_format="pandas"))


EVENTS_TRAILING_WINDOW_SQL = f"""
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT)                        AS w_n,
       sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS w_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {TRAIL_SECONDS} SECOND PRECEDING
                   AND CURRENT ROW)
"""


USER_DECAYED_VALUE_SQL = f"""
WITH mx AS (SELECT max(ts) AS tref FROM events),
p AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v_c,
             (epoch_us((SELECT tref FROM mx)) - epoch_us(ts))
               // {86_400_000_000 * DECAY_HALF_LIFE_DAYS}     AS age
      FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL AND value IS NOT NULL)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
       sum(v_c * power(2.0, -CAST(age AS DOUBLE))) / 100.0 AS decayed_value
FROM p GROUP BY user_id ORDER BY user_id
"""

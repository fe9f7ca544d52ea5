"""Mergeable-sketch operators — the approximate primitives a 100-TB
profiling pass runs where exact answers would need an unbounded shuffle.

* HyperLogLog distinct count — per-group cardinality from CONSTANT-size
  register arrays: each batch builds a private 2^p-register sketch per
  group, the groupby merges them with an elementwise max, and the driver
  never sees a raw key. The shuffle carries (group, 4 KiB) rows no matter
  how many distinct values exist. Deterministic (splitmix64 hash), so the
  estimate is stable run-to-run; accuracy ~1.04/sqrt(2^p) plus the
  small-range linear-counting correction.

* Misra–Gries heavy hitters — EXACT top-k frequent tokens via candidate
  pruning: pass 1 runs a per-batch Misra–Gries summary (any token with
  global frequency > N/k must exceed n_i/k in at least one batch, so the
  union of batch summaries is a superset of the true heavy hitters);
  pass 2 re-counts ONLY the candidate tokens (broadcast set) and takes
  the top-k. Unlike a full token groupby, the all-to-all carries at most
  (candidates × batches) partial rows — the corpus vocabulary never
  shuffles.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import collect_with_schema, sized_read

HLL_P = 12  # 4096 registers, ~1.6% standard error


def _read(sf_dir: str, name: str, columns: list[str]):
    return sized_read(os.path.join(sf_dir, f"{name}.parquet"), columns,
                      rows_per_block=150_000)


# ----------------------------------------------------------- HyperLogLog

def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hll_registers(keys: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Register array (uint8[2^p]) for a batch of int64 keys."""
    m = 1 << p
    h = _splitmix64(keys)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # rho = leading-zero count of the remaining bits + 1, via float64 log2
    # of the top 53 bits (exact for lzcount < 53, far beyond 2^p registers)
    top = (rest >> np.uint64(11)).astype(np.float64)
    with np.errstate(divide="ignore"):
        lz = np.where(top > 0, 52 - np.floor(np.log2(top)), 53)
    rho = (lz + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(
        np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def approx_distinct_users(sf_dir: str):
    """Approximate distinct users per event type via mergeable HLL
    sketches (rows-only check; pytest bounds the error vs the exact
    count). Columns: event_type, approx_users (int64)."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.groupby("event_type"):
            regs = _hll_registers(sub["user_id"].to_numpy(dtype=np.int64))
            rows.append({"event_type": et, "regs": regs.tobytes()})
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(1 << HLL_P, dtype=np.uint8)
        for b in df["regs"]:
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "approx_users": np.array([round(_hll_estimate(acc))],
                                     dtype=np.int64)})

    # batch_size=None: one register row per (block × group), not per 1024
    # rows — the merge side stays proportional to block count
    out = (ev.map_batches(partial, batch_format="pandas", batch_size=None)
           .groupby("event_type").map_groups(merge, batch_format="pandas"))
    return collect_with_schema(out, pa.schema(
        [("event_type", pa.string()), ("approx_users", pa.int64())]))


# ------------------------------------------------ Misra–Gries heavy hitters

HEAVY_HITTER_K = 20        # result size
MG_COUNTERS = 2000         # per-batch summary size (guarantee: freq > N/2000)

_WS = None  # compiled lazily inside workers


def _tokens_of(texts) -> list:
    import re
    global _WS
    if _WS is None:
        _WS = re.compile(r"\s+")
    out = []
    for t in texts:
        out.extend(w for w in _WS.split(t.lower()) if w)
    return out


def _misra_gries(tokens: list, k: int) -> dict:
    """Classic MG summary: at most k counters; any item with frequency
    > n/k in this stream survives with count >= freq - n/k."""
    from collections import Counter
    c = Counter(tokens)  # batch fits in memory; exact per-batch counts
    if len(c) <= k:
        return dict(c)
    # keep the k largest — a strictly stronger summary than streaming MG
    # for a batch we can count exactly (same superset guarantee)
    return dict(sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k])


def heavy_hitter_tokens(sf_dir: str):
    """EXACT corpus top-20 tokens computed the sketch way: per-batch
    Misra–Gries candidate generation, then an exact re-count restricted
    to the (broadcast) candidate set. The vocabulary never shuffles —
    only ≤ MG_COUNTERS candidates per batch in pass 1 and candidate-token
    partials in pass 2. Oracle: full unnest+count+rank in DuckDB.

    The candidate union provably contains every token with global
    frequency > N/MG_COUNTERS (each batch summary keeps everything above
    n_batch/MG_COUNTERS; the misses sum to at most N/MG_COUNTERS). The
    EXACT claim therefore only holds when the returned 20th count clears
    that bound — checked at runtime; on a pathologically flat
    distribution the operator falls back to the exact full-vocabulary
    bucketed count instead of silently diverging from the oracle."""
    import ray
    from ._util import bucketed_group_sum

    docs = _read(sf_dir, "documents", ["text"])

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens_of(df["text"])
        mg = _misra_gries(toks, MG_COUNTERS)
        # sentinel row "" (never a real token: splits drop empties)
        # carries this batch's stream length so the driver can check the
        # N/MG_COUNTERS exactness bound without another corpus pass
        return pd.DataFrame({"token": [""] + list(mg.keys()),
                             "n": [len(toks)] + [0] * len(mg)})

    cand = set()
    n_stream = 0
    for row in docs.map_batches(candidates, batch_format="pandas",
                                batch_size=None).take_all():
        if row["token"] == "":
            n_stream += int(row["n"])
        else:
            cand.add(row["token"])
    cand_ref = ray.put(cand)

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        keep = ray.get(cand_ref)
        c = Counter(t for t in _tokens_of(df["text"]) if t in keep)
        if not c:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.DataFrame({"token": list(c.keys()),
                             "n": pd.Series(list(c.values()), dtype="int64")})

    sums = bucketed_group_sum(
        docs.map_batches(recount, batch_format="pandas"),
        key="token", sum_cols=["n"])
    top = sums.sort(["n", "token"], descending=[True, False]) \
        .limit(HEAVY_HITTER_K)
    res = collect_with_schema(top, pa.schema(
        [("token", pa.string()), ("n", pa.int64())]))

    bound = n_stream / MG_COUNTERS
    if len(res) >= HEAVY_HITTER_K and res["n"].iloc[-1] <= bound:
        # flat distribution: the MG union's exactness precondition failed
        # — recount the FULL vocabulary (the shuffle the sketch normally
        # avoids) rather than return a silently approximate top-20
        def count_all(df: pd.DataFrame) -> pd.DataFrame:
            from collections import Counter
            c = Counter(_tokens_of(df["text"]))
            return pd.DataFrame({"token": list(c.keys()),
                                 "n": pd.Series(list(c.values()),
                                                dtype="int64")})

        exact = bucketed_group_sum(
            docs.map_batches(count_all, batch_format="pandas"),
            key="token", sum_cols=["n"]) \
            .sort(["n", "token"], descending=[True, False]) \
            .limit(HEAVY_HITTER_K)
        res = collect_with_schema(exact, pa.schema(
            [("token", pa.string()), ("n", pa.int64())]))
    return res


# --------------------------------------------- histogram quantile sketch

QH_BINS = 512
QH_LO, QH_HI = 1.0, 1e7  # value range covered by the log-spaced bins
QUANTILES = [0.5, 0.9, 0.99]


def _qh_edges() -> np.ndarray:
    return np.logspace(np.log10(QH_LO), np.log10(QH_HI), QH_BINS + 1)


def approx_length_quantiles(sf_dir: str):
    """Approximate document-length quantiles from a mergeable log-spaced
    histogram: each batch bins its lengths into one of 512 buckets
    (sparse (bin, n) partials shuffle, never values), the bucketed sum
    merges, and quantiles read off the cumulative counts. Relative error
    is bounded by the bin ratio (~3.3% at 512 bins over 7 decades) —
    the sketch a 100-TB profiling pass uses where the exact
    ``doc_length_quantiles``'s value shuffle would be the bottleneck.
    Deterministic; pytest bounds the error vs the exact percentiles."""
    from ._util import bucketed_group_sum

    edges = _qh_edges()
    docs = _read(sf_dir, "documents", ["n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.clip(df["n_chars"].to_numpy(dtype=np.float64), QH_LO, QH_HI)
        b = np.clip(np.searchsorted(edges, v, side="right") - 1,
                    0, QH_BINS - 1)
        bins, counts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": bins.astype(np.int64),
                             "n": counts.astype(np.int64)})

    hist = bucketed_group_sum(
        docs.map_batches(partial, batch_format="pandas", batch_size=None),
        key="bin", sum_cols=["n"])
    small = collect_with_schema(hist, pa.schema(
        [("bin", pa.int64()), ("n", pa.int64())])).sort_values("bin")

    total = int(small["n"].sum())
    cum = small["n"].cumsum().to_numpy()
    out = []
    for q in QUANTILES:
        target = q * total
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, len(small) - 1)
        b = int(small["bin"].iloc[i])
        # report the upper edge of the containing bin
        out.append({"q": q, "approx_value": float(edges[b + 1])})
    return pd.DataFrame(out, columns=["q", "approx_value"])


HEAVY_HITTER_TOKENS_SQL = rf"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token
      FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT {HEAVY_HITTER_K}
"""


# ------------------------------------------------- Count-Min sketch

CMS_D, CMS_W = 4, 2048            # depth x width; eps = e/w, delta = e^-d
CMS_PROBE_USERS = 20              # point-query the first N user ids
_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def _cms_rows(keys: np.ndarray) -> np.ndarray:
    """One (CMS_D, CMS_W) count-min table for a key batch, vectorized."""
    cms = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        for d in range(CMS_D):
            pos = (_splitmix64(k ^ _CMS_SEEDS[d]) % np.uint64(CMS_W)) \
                .astype(np.int64)
            np.add.at(cms[d], pos, 1)
    return cms


def cms_user_event_counts(sf_dir: str):
    """Count-Min-estimated event counts for a fixed probe set of users —
    the mergeable frequency sketch a streaming profiler keeps where the
    exact per-key map would not fit.

    Each block collapses to ONE flattened (4×2048) table row (64 KB,
    independent of row count); the driver sums #blocks tables and reads
    the probe minima. Guarantee: exact ≤ estimate ≤ exact + e/W·N with
    probability 1−e^−D — pytest asserts both bounds against the exact
    counts. Deterministic (fixed seeds); rows-only driver check.
    """
    ev = _read(sf_dir, "events", ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cms = _cms_rows(df["user_id"].to_numpy(np.int64))
        return pd.DataFrame({"cms": [cms.ravel()],
                             "n": np.int64(len(df))})

    parts = ev.map_batches(partial, batch_format="pandas",
                           batch_size=None).to_pandas()
    cms = np.sum(np.stack(parts["cms"].to_numpy()), axis=0) \
        .reshape(CMS_D, CMS_W)

    uids = np.arange(CMS_PROBE_USERS, dtype=np.int64)
    k = uids.astype(np.uint64)
    est = np.full(len(uids), np.iinfo(np.int64).max, dtype=np.int64)
    with np.errstate(over="ignore"):
        for d in range(CMS_D):
            pos = (_splitmix64(k ^ _CMS_SEEDS[d]) % np.uint64(CMS_W)) \
                .astype(np.int64)
            est = np.minimum(est, cms[d, pos])
    return pa.table({"user_id": pa.array(uids, pa.int64()),
                     "est_events": pa.array(est, pa.int64())})

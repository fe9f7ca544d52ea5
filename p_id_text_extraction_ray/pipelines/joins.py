"""Generic distributed joins for Ray Data (large ⋈ large).

Ray Data has no general join primitive in every release line, so these
implement the portable pattern (ray_guide.md "Joins and lookups"): add a
``__bucket`` column = hash(key) % B to both sides, tag each side, union,
``groupby(__bucket)``, and run ONE vectorized pandas merge per bucket —
an explicit partitioned hash join. All rows of a key land in one bucket,
so inner/left semantics are exact; B is the unit of shuffle parallelism
(raise it with data size; salt hot keys into sub-buckets by extending the
bucket hash with a secondary column when one key dominates).

``asof_join`` is the same shape with ``pd.merge_asof`` per bucket
(sort by (key, ts) inside the bucket): the as-of/range-join operator the
reference lacks (SURVEY.md §2.4) expressed as composition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KNUTH = np.uint64(2654435761)


def _bucket_of(keys: pd.Series, num_buckets: int) -> np.ndarray:
    if pd.api.types.is_integer_dtype(keys):
        k = keys.to_numpy(dtype=np.int64).astype(np.uint64)
    else:
        import zlib
        k = np.array([zlib.crc32(str(v).encode()) for v in keys], dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((k * _KNUTH) % np.uint64(num_buckets)).astype(np.int64)


def hash_join(left, right, on: list[str] | str, how: str = "inner",
              num_buckets: int = 64):
    """Partitioned hash join of two Datasets on equality keys.

    Non-key column names must be disjoint between the sides. Returns a
    Dataset with left columns then right columns (keys once).
    """
    on = [on] if isinstance(on, str) else list(on)

    l_cols = left.schema().names
    r_cols = right.schema().names
    overlap = (set(l_cols) & set(r_cols)) - set(on)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    def tag(side: str, all_l: list[str], all_r: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=df.index)
            out["__bucket"] = _bucket_of(df[on[0]], num_buckets)
            out["__side"] = side
            for c in all_l:
                out[c] = df[c] if c in df.columns else None
            for c in all_r:
                if c not in on:
                    out[c] = df[c] if c in df.columns else None
            return out
        return fn

    tagged = (left.map_batches(tag("l", l_cols, r_cols), batch_format="pandas")
              .union(right.map_batches(tag("r", l_cols, r_cols),
                                       batch_format="pandas")))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lf = df[df["__side"] == "l"][l_cols].infer_objects()
        rf = df[df["__side"] == "r"][[c for c in r_cols]].infer_objects()
        return lf.merge(rf, on=on, how=how)

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def asof_join(left, right, key: str, ts: str = "ts",
              right_ts_out: str = "right_ts", num_buckets: int = 32,
              tolerance: pd.Timedelta | None = None):
    """As-of join: for each left row, the most recent right row with the
    same ``key`` and right.ts <= left.ts. Inner semantics (unmatched left
    rows dropped). ``right`` must have columns [key, ts]."""
    l_cols = left.schema().names
    unified = l_cols + [right_ts_out]

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[l_cols].copy()
        out[right_ts_out] = pd.NaT
        out["__bucket"] = _bucket_of(df[key], num_buckets)
        out["__side"] = "l"
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=df.index)
        for c in l_cols:
            out[c] = df[key] if c == key else None
        out[right_ts_out] = df[ts]
        out["__bucket"] = _bucket_of(df[key], num_buckets)
        out["__side"] = "r"
        return out

    tagged = (left.map_batches(tag_left, batch_format="pandas")
              .union(right.map_batches(tag_right, batch_format="pandas")))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        lf = df[df["__side"] == "l"][l_cols].sort_values(ts, kind="mergesort")
        rf = df[df["__side"] == "r"][[key, right_ts_out]] \
            .sort_values(right_ts_out, kind="mergesort")
        if not len(lf):
            return lf.assign(**{right_ts_out: pd.Series([], dtype="datetime64[ns]")})
        lf = lf.infer_objects()
        rf = rf.infer_objects()
        m = pd.merge_asof(lf, rf, left_on=ts, right_on=right_ts_out,
                          by=key, direction="backward", tolerance=tolerance)
        return m.dropna(subset=[right_ts_out])

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")

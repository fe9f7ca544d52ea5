"""Generic distributed joins for Ray Data (large ⋈ large).

Ray Data has no general join primitive in every release line (2.49's
native ``Dataset.join`` exists but its hash-shuffle aggregator actors
measure slower than this pattern at the scales we run), so these
implement the portable pattern (ray_guide.md "Joins and lookups"): add a
``__bucket`` column = hash(key) % B to both sides, tag each side, union,
``groupby(__bucket)``, and run ONE vectorized pandas merge per bucket —
an explicit partitioned hash join. All rows of a key land in one bucket,
so inner/left semantics are exact; B is the unit of shuffle parallelism
(raise it with data size; salt hot keys into sub-buckets by extending the
bucket hash with a secondary column when one key dominates).

``sum_join`` fuses the common "grouped partial sum, then join the sums"
plan into ONE all-to-all: the per-key reduction runs inside the same
bucket group that executes the merge (valid because the group keys
contain the join key, so every group is bucket-local). Use it wherever
``bucketed_group_sum(...)`` would feed a ``hash_join`` — it halves the
shuffle count of that plan shape.

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
        with np.errstate(over="ignore"):
            return ((k * _KNUTH) % np.uint64(num_buckets)).astype(np.int64)
    # vectorized, process-stable 64-bit hash for string/object keys
    # (pandas siphash with the fixed default key — no per-row Python loop)
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy(dtype=np.uint64)
    return (h % np.uint64(num_buckets)).astype(np.int64)


# Reduce-task count for the bucketed shuffles. Independent of num_buckets
# (each reduce partition holds several logical buckets; map_groups still
# fires once per bucket): num_buckets is the skew/granularity knob,
# num_partitions the physical shuffle parallelism — raise it with cluster
# size (≈ cores/2 locally; hundreds on a multi-node cluster).
DEFAULT_SHUFFLE_PARTITIONS = 16


def _bucketed_join(left, right, on: list[str], how: str, num_buckets: int,
                   pre_left=None, num_partitions: int | None = None,
                   right_cols_hint: list[str] | None = None):
    """Shared core: tag/bucket/union/per-bucket merge. ``pre_left`` is an
    optional pandas fn applied to the left frame INSIDE each bucket before
    the merge (used by sum_join for the fused reduction).
    ``right_cols_hint`` names the right side's non-key columns for the
    case where the right side produced no blocks at all (schema
    unknowable): a left join then appends them as all-null columns so the
    output schema is stable across the empty and non-empty paths."""
    num_partitions = num_partitions or DEFAULT_SHUFFLE_PARTITIONS
    l_schema = left.schema()
    r_schema = right.schema()
    if l_schema is None or r_schema is None:
        # A side produced no blocks at all (schema unknowable — e.g. an
        # empty corpus upstream). Inner joins degenerate to an empty
        # result; a left join with a live left side passes it through,
        # padded with the hinted right columns as nulls (without a hint
        # the missing side's non-key columns are unknowable).
        if how == "left" and l_schema is not None:
            pad = [c for c in (right_cols_hint or [])
                   if c not in on and c not in l_schema.names]
            if not pad:
                return left

            def pad_cols(df: pd.DataFrame) -> pd.DataFrame:
                for c in pad:
                    df[c] = np.nan
                return df

            return left.map_batches(pad_cols, batch_format="pandas")
        import ray
        l_cols = list(l_schema.names) if l_schema is not None else list(on)
        r_cols = list(r_schema.names) if r_schema is not None else list(on)
        out_cols = l_cols + [c for c in r_cols if c not in l_cols]
        return ray.data.from_pandas(
            pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols}))
    l_cols = l_schema.names
    r_cols = r_schema.names
    overlap = (set(l_cols) & set(r_cols)) - set(on)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    def tag(side: int, all_l: list[str], all_r: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=df.index)
            out["__bucket"] = _bucket_of(df[on[0]], num_buckets)
            out["__side"] = np.int8(side)
            for c in all_l:
                out[c] = df[c] if c in df.columns else None
            for c in all_r:
                if c not in on:
                    out[c] = df[c] if c in df.columns else None
            return out
        return fn

    tagged = (left.map_batches(tag(0, l_cols, r_cols), batch_format="pandas")
              .union(right.map_batches(tag(1, l_cols, r_cols),
                                       batch_format="pandas")))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        side = df["__side"].to_numpy()
        lf = df.loc[side == 0, l_cols].infer_objects()
        rf = df.loc[side == 1, r_cols].infer_objects()
        if pre_left is not None:
            lf = pre_left(lf)
        return lf.merge(rf, on=on, how=how)

    return tagged.groupby("__bucket", num_partitions=num_partitions) \
        .map_groups(merge_bucket, batch_format="pandas")


def hash_join(left, right, on: list[str] | str, how: str = "inner",
              num_buckets: int = 64, num_partitions: int | None = None,
              right_cols_hint: list[str] | None = None):
    """Partitioned hash join of two Datasets on equality keys.

    Non-key column names must be disjoint between the sides. Returns a
    Dataset with left columns then right columns (keys once).
    ``right_cols_hint`` keeps a left join's output schema stable when the
    right side is block-less (see ``_bucketed_join``).
    """
    on = [on] if isinstance(on, str) else list(on)
    return _bucketed_join(left, right, on, how, num_buckets,
                          num_partitions=num_partitions,
                          right_cols_hint=right_cols_hint)


def sum_join(left, right, on: list[str] | str, sum_cols: list[str],
             sum_keys: list[str] | None = None, how: str = "inner",
             num_buckets: int = 64, num_partitions: int | None = None):
    """Fused grouped-sum + join, one shuffle.

    Equivalent to ``hash_join(bucketed_group_sum(left, sum_keys or [on],
    sum_cols), right, on)`` but the per-key sum executes inside the same
    bucket group as the merge. Exact because ``on ⊆ sum_keys`` ⇒ every
    sum group is contained in one bucket.
    """
    on = [on] if isinstance(on, str) else list(on)
    sum_keys = list(sum_keys) if sum_keys is not None else list(on)
    if not set(on) <= set(sum_keys):
        raise ValueError("join key must be a subset of sum_keys")

    def reduce_left(lf: pd.DataFrame) -> pd.DataFrame:
        if not len(lf):
            return lf
        return lf.groupby(sum_keys, as_index=False)[sum_cols].sum()

    return _bucketed_join(left, right, on, how, num_buckets,
                          pre_left=reduce_left, num_partitions=num_partitions)


def anti_join(left, right, on: list[str] | str, num_buckets: int = 64,
              num_partitions: int | None = None):
    """Left anti-join: left rows whose key appears nowhere in ``right``.
    Same partitioned-bucket shape as ``hash_join``; the per-bucket step is
    a vectorized ``isin`` filter instead of a merge."""
    on = [on] if isinstance(on, str) else list(on)
    num_partitions = num_partitions or DEFAULT_SHUFFLE_PARTITIONS
    l_cols = left.schema().names

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=df.index)
            out["__bucket"] = _bucket_of(df[on[0]], num_buckets)
            out["__side"] = np.int8(side)
            for c in l_cols:
                out[c] = df[c] if c in df.columns else None
            return out
        return fn

    # right ships only its key column(s)
    right_keys = right.map_batches(lambda df: df[on], batch_format="pandas")
    tagged = (left.map_batches(tag(0), batch_format="pandas")
              .union(right_keys.map_batches(tag(1), batch_format="pandas")))

    def filter_bucket(df: pd.DataFrame) -> pd.DataFrame:
        side = df["__side"].to_numpy()
        lf = df.loc[side == 0, l_cols].infer_objects()
        if len(on) == 1:
            present = df.loc[side == 1, on[0]]
            return lf[~lf[on[0]].isin(present)]
        rk = df.loc[side == 1, on].drop_duplicates()
        m = lf.merge(rk, on=on, how="left", indicator=True)
        return m[m["_merge"] == "left_only"][l_cols]

    return tagged.groupby("__bucket", num_partitions=num_partitions) \
        .map_groups(filter_bucket, batch_format="pandas")


def semi_join(left, right, on: list[str] | str, num_buckets: int = 64,
              num_partitions: int | None = None):
    """Left semi-join: left rows whose key appears in ``right`` (each left
    row at most once). Same partitioned-bucket shape as ``anti_join`` with
    the ``isin`` filter inverted; the right side ships key columns only."""
    on = [on] if isinstance(on, str) else list(on)
    num_partitions = num_partitions or DEFAULT_SHUFFLE_PARTITIONS
    l_cols = left.schema().names

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=df.index)
            out["__bucket"] = _bucket_of(df[on[0]], num_buckets)
            out["__side"] = np.int8(side)
            for c in l_cols:
                out[c] = df[c] if c in df.columns else None
            return out
        return fn

    right_keys = right.map_batches(lambda df: df[on], batch_format="pandas")
    tagged = (left.map_batches(tag(0), batch_format="pandas")
              .union(right_keys.map_batches(tag(1), batch_format="pandas")))

    def filter_bucket(df: pd.DataFrame) -> pd.DataFrame:
        side = df["__side"].to_numpy()
        lf = df.loc[side == 0, l_cols].infer_objects()
        if len(on) == 1:
            present = df.loc[side == 1, on[0]]
            return lf[lf[on[0]].isin(present)]
        rk = df.loc[side == 1, on].drop_duplicates()
        return lf.merge(rk, on=on, how="inner")

    return tagged.groupby("__bucket", num_partitions=num_partitions) \
        .map_groups(filter_bucket, batch_format="pandas")


# ------------------------------------------------------ Bloom semi-join

_BLOOM_K1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_K2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_positions(keys: np.ndarray, num_bits: int, num_hashes: int):
    """Double-hashing Bloom positions for int64 keys: pos_i = (h1 + i*h2)
    mod m, all vectorized uint64 (Kirsch–Mitzenmacher)."""
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = k * _BLOOM_K1
        h1 ^= h1 >> np.uint64(29)
        h2 = (k * _BLOOM_K2) | np.uint64(1)
        return [((h1 + np.uint64(i) * h2) % np.uint64(num_bits))
                for i in range(num_hashes)]


def build_bloom(keys_ds, key: str, num_bits: int = 1 << 23,
                num_hashes: int = 4):
    """Build a Bloom filter bitmap over an int64 key column, distributed:
    each batch sets its keys' bits into a private bitmap (np.uint8 packed,
    ``num_bits/8`` bytes), the per-batch bitmaps — constant-size partials,
    NOT O(rows) — are OR-reduced, and the result is ``ray.put`` once for
    zero-copy reads from every downstream task. At 2^23 bits / 4 hashes the
    false-positive rate at one million keys is ~2%; size num_bits ≈ 8–10×
    the expected key count."""
    import ray

    def bitmap(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(num_bits // 8, dtype=np.uint8)
        ks = df[key].to_numpy(dtype=np.int64)
        for pos in _bloom_positions(ks, num_bits, num_hashes):
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1),
                                           (pos & np.uint64(7)).astype(np.uint8)))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    # one constant-size row per BLOCK (batch_size=None), so the driver-side
    # OR is over #blocks bitmaps — bounded by block count, independent of
    # row count (default 1024-row batches would mint ~600 bitmaps per
    # million rows and push them all through take_all)
    parts = keys_ds.map_batches(bitmap, batch_format="pandas",
                                batch_size=None).take_all()
    acc = np.zeros(num_bits // 8, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return ray.put(acc), num_bits, num_hashes


def bloom_semi_join(left, right, on: str, num_buckets: int = 64,
                    num_bits: int = 1 << 23, num_hashes: int = 4,
                    num_partitions: int | None = None):
    """Exact semi-join with a Bloom pre-filter: a constant-size bitmap of
    ``right``'s keys is broadcast (``ray.put`` once, zero-copy ``ray.get``
    per task) and drops non-matching left rows BEFORE the shuffle, so the
    all-to-all carries |matches| + ε·|left| rows instead of |left|; the
    bucketed ``semi_join`` on the survivors removes the false positives,
    keeping the result exact. The scale lever for selective semi-joins:
    at 100 TB the left fact table never enters the shuffle unfiltered."""
    import ray

    bloom_ref, m, k = build_bloom(right, on, num_bits, num_hashes)

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        bits = ray.get(bloom_ref)
        ks = df[on].to_numpy(dtype=np.int64)
        hit = np.ones(len(df), dtype=bool)
        for pos in _bloom_positions(ks, m, k):
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            hit &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return df[hit]

    survivors = left.map_batches(prefilter, batch_format="pandas")
    return semi_join(survivors, right, on=on, num_buckets=num_buckets,
                     num_partitions=num_partitions)


def asof_join(left, right, key: str, ts: str = "ts",
              right_ts_out: str = "right_ts", num_buckets: int = 32,
              tolerance: pd.Timedelta | None = None,
              num_partitions: int | None = None):
    """As-of join: for each left row, the most recent right row with the
    same ``key`` and right.ts <= left.ts. Inner semantics (unmatched left
    rows dropped). ``right`` must have columns [key, ts]."""
    num_partitions = num_partitions or DEFAULT_SHUFFLE_PARTITIONS
    l_cols = left.schema().names

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[l_cols].copy()
        out[right_ts_out] = pd.NaT
        out["__bucket"] = _bucket_of(df[key], num_buckets)
        out["__side"] = np.int8(0)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=df.index)
        for c in l_cols:
            out[c] = df[key] if c == key else None
        out[right_ts_out] = df[ts]
        out["__bucket"] = _bucket_of(df[key], num_buckets)
        out["__side"] = np.int8(1)
        return out

    tagged = (left.map_batches(tag_left, batch_format="pandas")
              .union(right.map_batches(tag_right, batch_format="pandas")))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        side = df["__side"].to_numpy()
        lf = df.loc[side == 0, l_cols].sort_values(ts, kind="mergesort")
        rf = df.loc[side == 1, [key, right_ts_out]] \
            .sort_values(right_ts_out, kind="mergesort")
        if not len(lf):
            return lf.assign(**{right_ts_out: pd.Series([], dtype="datetime64[ns]")})
        lf = lf.infer_objects()
        rf = rf.infer_objects()
        m = pd.merge_asof(lf, rf, left_on=ts, right_on=right_ts_out,
                          by=key, direction="backward", tolerance=tolerance)
        return m.dropna(subset=[right_ts_out])

    return tagged.groupby("__bucket", num_partitions=num_partitions) \
        .map_groups(merge_bucket, batch_format="pandas")


def broadcast_interval_join(left, intervals: pd.DataFrame, value_col: str,
                            lo_col: str = "lo", hi_col: str = "hi",
                            chunk: int = 4096):
    """Non-equi range join of a big left Dataset against a SMALL interval
    table: inner join on ``lo <= value < hi``. Intervals may OVERLAP —
    a left row joins EVERY interval containing its value, duplicating
    the row once per match (this is what distinguishes a range join
    from bin assignment, where intervals partition the domain).

    Scale shape: the interval table is broadcast once via ``ray.put``
    (one object-store copy per node, read zero-copy by every task) and
    the join is one row-local ``map_batches`` — no shuffle; the expanded
    output streams with backpressure. Containment is a vectorized
    ``chunk × |intervals|`` mask, the right tool for the broadcastable
    regime (≲10⁴ intervals). Beyond that, partition the DOMAIN instead:
    range-bucket left rows by value, replicate each interval into every
    bucket it overlaps, and run the same mask per bucket — documented
    scale path, unnecessary for a dimension-table-sized interval side.
    """
    ival_cols = [c for c in intervals.columns if c not in (lo_col, hi_col)]
    l_names = left.schema().names
    overlap = set(l_names) & set(ival_cols)
    if overlap:
        raise ValueError(f"interval column collision: {sorted(overlap)}")
    import ray
    lo = intervals[lo_col].to_numpy()
    hi = intervals[hi_col].to_numpy()
    ival_ref = ray.put((lo, hi, intervals[ival_cols].reset_index(drop=True)))

    def expand(df: pd.DataFrame, _ref=ival_ref) -> pd.DataFrame:
        lo, hi, meta = ray.get(_ref)
        vals = df[value_col].to_numpy()
        li_parts, ii_parts = [], []
        for s in range(0, len(vals), chunk):
            v = vals[s:s + chunk, None]
            ci, cj = np.nonzero((v >= lo[None, :]) & (v < hi[None, :]))
            li_parts.append(ci + s)
            ii_parts.append(cj)
        if not li_parts:
            li = np.zeros(0, dtype=np.int64)
            ii = np.zeros(0, dtype=np.int64)
        else:
            li = np.concatenate(li_parts)
            ii = np.concatenate(ii_parts)
        out = df.iloc[li].reset_index(drop=True)
        for c in meta.columns:
            out[c] = meta[c].to_numpy()[ii]
        return out

    return left.map_batches(expand, batch_format="pandas")

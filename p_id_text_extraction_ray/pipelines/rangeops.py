"""Range-join and skyline (Pareto-frontier) operators.

Two classic "operators the Dataset API lacks", built the Ray-Data-first
way:

* overlapping interval join — ``joins.broadcast_interval_join``: the
  interval side is broadcast once (``ray.put``), containment is a
  vectorized mask inside one row-local ``map_batches``; no shuffle, the
  expanded rows stream. Unlike ``orders_price_bands`` (disjoint bins,
  ``searchsorted``), windows here genuinely OVERLAP, so one order can
  feed several campaign totals — the semantics bins cannot express.
* skyline / Pareto frontier — the dominance filter (maximize price,
  minimize date). Not expressible as groupby/sort/window; implemented
  as the standard two-level skyline: a vectorized per-block skyline
  (every globally non-dominated row survives any block-local filter),
  a combine round over block partials, and one final driver pass over
  the tiny candidate union. The partial-union size is the documented
  assumption: for independent/correlated dimensions the skyline of a
  random block is O(log n) rows, so candidates are KBs at any corpus
  size; a fully ANTI-correlated pair of dimensions degenerates to
  O(n) — if that is your data, bucket one dimension by range first and
  skyline per bucket.

Money math follows the repo convention: exact integer cents until one
final division mirroring the DuckDB oracle (see ``_util.cents``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._util import cents, collect_with_schema, sized_read


def _read(sf_dir: str, name: str, columns: list[str]):
    return sized_read(os.path.join(sf_dir, f"{name}.parquet"), columns,
                      rows_per_block=150_000)


# Deterministic, deliberately OVERLAPPING campaign windows over the
# fixed 1995-01-01..2001-08-01 order-date domain ([lo, hi) semantics).
# spring95 ⊂ launch95, summer97 ⊂ y97_allyear, q1_2000 ⊂ millennium,
# and clearance spans every other window.
PROMO_WINDOWS: list[tuple[str, str, str]] = [
    ("launch95", "1995-01-01", "1995-07-01"),
    ("spring95", "1995-03-01", "1995-06-01"),
    ("holiday96", "1996-11-01", "1997-02-01"),
    ("y97_allyear", "1997-01-01", "1998-01-01"),
    ("summer97", "1997-06-01", "1997-09-01"),
    ("millennium", "1999-10-01", "2000-04-01"),
    ("q1_2000", "2000-01-01", "2000-04-01"),
    ("clearance", "1995-01-01", "2002-01-01"),
]


def promo_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {"promo": [p for p, _, _ in PROMO_WINDOWS],
         "lo": np.array([lo for _, lo, _ in PROMO_WINDOWS],
                        dtype="datetime64[us]"),
         "hi": np.array([hi for _, _, hi in PROMO_WINDOWS],
                        dtype="datetime64[us]")})


def orders_promo_windows(sf_dir: str):
    """(promo, n_orders, total_price) per campaign window — the
    overlapping-interval-join aggregate: an order inside two windows
    counts toward BOTH (clearance sees every order).

    Scale shape: broadcast interval join (row-local, no shuffle) →
    per-batch partial groupby → one |promos|-row Ray groupby sum. The
    expanded stream is |orders| × avg-matches rows but never
    materializes; the shuffle carries ≤ |promos| rows per batch.
    """
    from ray.data.aggregate import Sum
    from .joins import broadcast_interval_join

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    expanded = broadcast_interval_join(orders, promo_frame(),
                                       value_col="o_orderdate")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"promo": df["promo"].values,
                          "tp_c": cents(df["o_totalprice"]),
                          "n": np.ones(len(df), dtype=np.int64)})
        return g.groupby("promo", as_index=False).sum()

    agg = (expanded.map_batches(partial, batch_format="pandas")
           .groupby("promo")
           .aggregate(Sum("n", alias_name="n_orders"),
                      Sum("tp_c", alias_name="tp_c")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column("total_price", pc.divide(
            pc.cast(t.column("tp_c"), pa.float64()), pa.scalar(100.0)))
        return t.drop_columns(["tp_c"])

    return collect_with_schema(
        agg.map_batches(finish, batch_format="pyarrow"),
        pa.schema([("promo", pa.string()), ("n_orders", pa.int64()),
                   ("total_price", pa.float64())]))


ORDERS_PROMO_WINDOWS_SQL = """
WITH promos(promo, lo, hi) AS (VALUES
  ('launch95',    TIMESTAMP '1995-01-01', TIMESTAMP '1995-07-01'),
  ('spring95',    TIMESTAMP '1995-03-01', TIMESTAMP '1995-06-01'),
  ('holiday96',   TIMESTAMP '1996-11-01', TIMESTAMP '1997-02-01'),
  ('y97_allyear', TIMESTAMP '1997-01-01', TIMESTAMP '1998-01-01'),
  ('summer97',    TIMESTAMP '1997-06-01', TIMESTAMP '1997-09-01'),
  ('millennium',  TIMESTAMP '1999-10-01', TIMESTAMP '2000-04-01'),
  ('q1_2000',     TIMESTAMP '2000-01-01', TIMESTAMP '2000-04-01'),
  ('clearance',   TIMESTAMP '1995-01-01', TIMESTAMP '2002-01-01'))
SELECT promo,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders JOIN promos ON o_orderdate >= lo AND o_orderdate < hi
GROUP BY promo
"""


def pareto_mask(price: np.ndarray, date_i8: np.ndarray) -> np.ndarray:
    """Boolean mask of the non-dominated rows: row j is dominated when
    some row has price >= price_j AND date <= date_j with at least one
    strict. Exact duplicates (same price AND date) do not dominate each
    other, matching SQL NOT-EXISTS strict-dominance semantics.

    Fully vectorized: sort by (price desc, date asc); within an
    equal-price group only the min-date rows can survive, and the group
    survives iff its min date is strictly below the running min date of
    all strictly-higher-price groups.
    """
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((date_i8, -price))
    p, d = price[order], date_i8[order]
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = p[1:] != p[:-1]
    gidx = np.cumsum(new_grp) - 1
    grp_min = d[new_grp]                     # date asc within group
    m_excl = np.empty(len(grp_min), dtype=np.int64)
    m_excl[0] = np.iinfo(np.int64).max
    if len(grp_min) > 1:
        m_excl[1:] = np.minimum.accumulate(grp_min)[:-1]
    keep_sorted = (d == grp_min[gidx]) & (grp_min[gidx] < m_excl[gidx])
    keep = np.zeros(n, dtype=bool)
    keep[order[keep_sorted]] = True
    return keep


def _local_skyline(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    price = df["o_totalprice"].to_numpy(dtype=np.float64)
    date = df["o_orderdate"].to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    return df.loc[pareto_mask(price, date)]


def orders_skyline(sf_dir: str) -> pd.DataFrame:
    """(o_orderkey, o_orderdate, o_totalprice) Pareto frontier of the
    orders table: the earliest-available highest-value orders — no order
    with a price at least as high arrived no later (strict in one).

    Scale shape: per-block vectorized skyline (rows drop to ~log n per
    block), one combine round over block partials, final pass on the
    driver over the small candidate union (a global survivor survives
    every block filter, so the union is a superset of the answer). See
    the module docstring for the anti-correlated worst case.
    """
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_totalprice"])
    candidates = collect_with_schema(
        orders.map_batches(_local_skyline, batch_format="pandas")
              .map_batches(_local_skyline, batch_format="pandas",
                           batch_size=65536),
        pa.schema([("o_orderkey", pa.int64()),
                   ("o_orderdate", pa.timestamp("us")),
                   ("o_totalprice", pa.float64())]))
    out = _local_skyline(candidates)
    return out.sort_values(["o_orderdate", "o_orderkey"],
                           kind="mergesort").reset_index(drop=True)


ORDERS_SKYLINE_SQL = """
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders d
  WHERE d.o_totalprice >= o.o_totalprice AND d.o_orderdate <= o.o_orderdate
    AND (d.o_totalprice > o.o_totalprice OR d.o_orderdate < o.o_orderdate))
ORDER BY o.o_orderdate, o.o_orderkey
"""

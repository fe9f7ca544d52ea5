"""Window / analytics operators over the TPC-H-ish tables.

Each is a distributed Ray Data plan with a DuckDB-checkable oracle:

* grouped top-k        — windowed ROW_NUMBER()-per-partition semantics via
                         per-batch partial top-k + a tiny final per-group
                         top-k (the shuffle moves ≤ k rows per group per
                         batch, never the fact table).
* hopping window       — each event emits one row per window containing
                         it (window 2h, hop 1h ⇒ 2 rows), pre-aggregated
                         per batch, then a small groupby.
* user profile         — conditional aggregates + exact COUNT(DISTINCT)
                         in ONE shuffle: partials at (user, event_type)
                         granularity, bucket-reduced, then distinct-count
                         = group size. No per-group Python anywhere.
* price-band range join— broadcast range join: static band edges are a
                         driver constant, each batch bins with
                         ``np.searchsorted`` and pre-aggregates; only
                         band partials shuffle.
* customers w/o orders — distributed anti-join (pipelines/joins.anti_join).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import cents, sized_read

TOPK_PER_PRIORITY = 3


def _read(sf_dir: str, name: str, columns: list[str]):
    return sized_read(os.path.join(sf_dir, f"{name}.parquet"), columns,
                      rows_per_block=150_000)


# ------------------------------------------------------- grouped top-k

def top_orders_per_priority(sf_dir: str):
    """Top-3 orders by totalprice within each order priority (ties broken
    by orderkey) — ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...) <= 3
    expressed as partial top-k per batch + final top-k per group."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderpriority", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("o_orderpriority").head(TOPK_PER_PRIORITY)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True], kind="mergesort") \
            .head(TOPK_PER_PRIORITY)
        df = df.assign(rnk=np.arange(1, len(df) + 1, dtype=np.int64))
        return df[["o_orderpriority", "rnk", "o_orderkey", "o_totalprice"]]

    return (orders.map_batches(partial_topk, batch_format="pandas")
            .groupby("o_orderpriority")
            .map_groups(final_topk, batch_format="pandas"))


TOP_ORDERS_PER_PRIORITY_SQL = f"""
SELECT o_orderpriority,
       CAST(row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT)                                   AS rnk,
       o_orderkey, o_totalprice
FROM orders
QUALIFY rnk <= {TOPK_PER_PRIORITY}
"""


# ------------------------------------------------------- hopping window

def events_hopping_window(sf_dir: str):
    """Hopping-window aggregate: 2-hour windows every 1 hour. Each event
    belongs to exactly two windows (floor(ts, 1h) and the hour before);
    both memberships are emitted and pre-aggregated inside the batch, so
    the shuffle carries (window, partial) rows only."""
    ev = _read(sf_dir, "events", ["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].dt.floor("h")
        v = cents(df["value"])
        both = pd.DataFrame({
            "window_start": pd.concat([h, h - pd.Timedelta(hours=1)],
                                      ignore_index=True),
            "v_c": np.concatenate([v, v])})
        return both.groupby("window_start", as_index=False).agg(
            n=("v_c", "size"), v=("v_c", "sum"))

    # bucketed pandas reduce — Ray's native aggregate pays per-group
    # overhead (~1.7 ms/group/suboperator) at ~700 window groups
    from ._util import bucketed_group_sum
    agg = bucketed_group_sum(ev.map_batches(partial, batch_format="pandas"),
                             "window_start", ["n", "v"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "window_start": df["window_start"].values,
            "n_events": df["n"].to_numpy(dtype=np.int64),
            "sum_value": df["v"].to_numpy(dtype=np.float64) / 100.0})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_HOPPING_WINDOW_SQL = """
SELECT ws AS window_start, count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM (SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             value
      FROM events)
GROUP BY ws
"""


# ------------------------------------------------------- user profile

def events_user_profile(sf_dir: str):
    """Per-user conditional aggregates + exact distinct-type count in one
    shuffle: batch partials at (user_id, event_type) granularity carry
    every needed sum; after the bucket reduce, COUNT(DISTINCT event_type)
    is simply the user's row count at that granularity."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = cents(df["value"])
        purch = (df["event_type"] == "purchase").to_numpy()
        g = pd.DataFrame({
            "user_id": df["user_id"].values,
            "event_type": df["event_type"].values,
            "n": np.ones(len(df), dtype=np.int64),
            "pv_c": np.where(purch, v, 0).astype(np.int64),
        }).groupby(["user_id", "event_type"], as_index=False).sum()
        return g

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["user_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = (k * np.uint64(2654435761)) % np.uint64(64)
        return df.assign(bucket=b.astype(np.int64))

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ut = df.groupby(["user_id", "event_type"], as_index=False) \
            [["n", "pv_c"]].sum()
        out = ut.groupby("user_id").agg(
            n_events=("n", "sum"), n_types=("event_type", "size"),
            pv_c=("pv_c", "sum")).reset_index()
        purch = ut[ut["event_type"] == "purchase"] \
            .set_index("user_id")["n"]
        out["n_purchases"] = out["user_id"].map(purch).fillna(0).astype("int64")
        out["purchase_value"] = out["pv_c"] / 100.0
        return out[["user_id", "n_events", "n_types", "n_purchases",
                    "purchase_value"]]

    return (ev.map_batches(partial, batch_format="pandas")
            .map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(reduce_bucket, batch_format="pandas"))


EVENTS_USER_PROFILE_SQL = """
SELECT user_id,
       count(*)                                          AS n_events,
       count(DISTINCT event_type)                        AS n_types,
       count(*) FILTER (event_type = 'purchase')         AS n_purchases,
       sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT)
                ELSE 0 END) / 100.0                      AS purchase_value
FROM events GROUP BY user_id
"""


# ------------------------------------------------------- price-band range join

# static fact-to-dimension range join: band edges are a true constant
# (broadcast), facts bin locally — the canonical broadcast range join
PRICE_BAND_EDGES = [0, 50_000, 100_000, 200_000, 300_000, 500_000]


def orders_price_bands(sf_dir: str):
    """Count + revenue per static price band (range join of orders
    against band intervals, broadcast side constant)."""
    from ray.data.aggregate import Sum
    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders", ["o_totalprice"])
    edges = np.array(PRICE_BAND_EDGES, dtype=np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(edges, df["o_totalprice"].to_numpy(),
                              side="right") - 1
        g = pd.DataFrame({"band_lo": edges[idx].astype(np.int64),
                          "tp_c": cents(df["o_totalprice"]),
                          "n": np.ones(len(df), dtype=np.int64)})
        return g.groupby("band_lo", as_index=False).sum()

    agg = (orders.map_batches(partial, batch_format="pandas")
           .groupby("band_lo")
           .aggregate(Sum("n", alias_name="n_orders"),
                      Sum("tp_c", alias_name="tp_c")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column("total_price", pc.divide(
            pc.cast(t.column("tp_c"), pa.float64()), pa.scalar(100.0)))
        t = t.drop_columns(["tp_c"])
        return t.set_column(t.schema.get_field_index("n_orders"), "n_orders",
                            pc.cast(t.column("n_orders"), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


_BANDS_VALUES = ", ".join(
    f"({lo}, {hi})" for lo, hi in
    zip(PRICE_BAND_EDGES[:-1], PRICE_BAND_EDGES[1:])) + \
    f", ({PRICE_BAND_EDGES[-1]}, 100000000)"

ORDERS_PRICE_BANDS_SQL = f"""
WITH bands(band_lo, band_hi) AS (VALUES {_BANDS_VALUES})
SELECT CAST(band_lo AS BIGINT) AS band_lo,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders JOIN bands
  ON o_totalprice >= band_lo AND o_totalprice < band_hi
GROUP BY band_lo
"""


# ------------------------------------------------------- anti-join

def customers_without_orders(sf_dir: str):
    """Customers that never placed an order (distributed anti-join on
    c_custkey; the right side ships key columns only)."""
    from .joins import anti_join

    from ._util import collect_with_schema

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda df: df.rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas")
    out = anti_join(cust, orders, on="c_custkey")
    # a fully-ordered corpus can anti-join to zero rows; pin the schema
    return collect_with_schema(out, pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string())]))


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# --------------------------------------------------- latest event per key

def events_latest_per_user(sf_dir: str):
    """Keep-latest dedupe: each user's most recent event (ties broken by
    event_id) — the canonical change-log compaction a feature store runs.
    Per-batch partial argmax keeps one row per user per batch, so the
    shuffle carries at most (users x batches) rows; a bucketed final
    argmax (bounded group count, vectorized sort inside) finishes."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            ascending=[True, False, False], kind="mergesort")
        return df.groupby("user_id", group_keys=False).head(1)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["user_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = (k * np.uint64(2654435761)) % np.uint64(64)
        return df.assign(bucket=b.astype(np.int64))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return latest(df)[["user_id", "event_id", "ts", "event_type",
                           "value"]]

    return (ev.map_batches(latest, batch_format="pandas")
            .map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(finish, batch_format="pandas"))


EVENTS_LATEST_PER_USER_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


# ------------------------------------------------- Bloom-filtered semi-join

def urgent_lineitem_revenue(sf_dir: str):
    """Revenue by return flag over lineitems belonging to URGENT orders —
    a selective fact⋉fact semi-join done the 100-TB way: a constant-size
    Bloom bitmap of the urgent orderkeys is broadcast and drops ~non-
    matching lineitems BEFORE the shuffle (the all-to-all then carries
    matches + ~2% false positives, not the whole fact table); the exact
    bucketed semi-join on the survivors removes the false positives."""
    from ray.data.aggregate import Sum
    import pyarrow.compute as pc
    from .joins import bloom_semi_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice"])
    urgent = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda df: df.loc[df["o_orderpriority"] == "1-URGENT",
                                       ["o_orderkey"]]
                     .rename(columns={"o_orderkey": "l_orderkey"}),
                     batch_format="pandas")

    matched = bloom_semi_join(li, urgent, on="l_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"].values,
                          "n": np.ones(len(df), dtype=np.int64),
                          "rev_c": cents(df["l_extendedprice"])})
        return g.groupby("l_returnflag", as_index=False).sum()

    agg = (matched.map_batches(partial, batch_format="pandas")
           .groupby("l_returnflag")
           .aggregate(Sum("n", alias_name="n_items"),
                      Sum("rev_c", alias_name="rev_c")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column("revenue", pc.divide(
            pc.cast(t.column("rev_c"), pa.float64()), pa.scalar(100.0)))
        t = t.drop_columns(["rev_c"])
        return t.set_column(t.schema.get_field_index("n_items"), "n_items",
                            pc.cast(t.column("n_items"), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


URGENT_LINEITEM_REVENUE_SQL = """
SELECT l_returnflag, count(*) AS n_items,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


# ------------------------------------------------- rolling window average

ROLL_WINDOW = 3  # current row + 2 preceding


def events_rolling_avg(sf_dir: str):
    """Per-user moving average of event value over the last 3 events
    (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — the per-entity rolling
    feature a feature store materializes. Users are hash-bucketed so each
    bucket computes every user's full ordered series with ONE vectorized
    ``groupby(...).rolling`` — no per-user Python, and the shuffle moves
    each event row exactly once. Sums use exact integer cents; the final
    division mirrors the oracle's operand order bit-for-bit."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["user_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = (k * np.uint64(2654435761)) % np.uint64(64)
        return df.assign(bucket=b.astype(np.int64))

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        v_c = pd.Series(cents(df["value"]), index=df.index)
        g = v_c.groupby(df["user_id"].values)
        roll_sum = g.rolling(ROLL_WINDOW, min_periods=1).sum() \
            .reset_index(level=0, drop=True).astype(np.int64)
        roll_n = g.rolling(ROLL_WINDOW, min_periods=1).count() \
            .reset_index(level=0, drop=True).astype(np.int64)
        return pd.DataFrame({
            "event_id": df["event_id"].values, "user_id": df["user_id"].values,
            "ts": df["ts"].values,
            "roll_n": roll_n.values,
            "roll_avg": roll_sum.values / 100.0 / roll_n.values})

    return (ev.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(roll, batch_format="pandas"))


EVENTS_ROLLING_AVG_SQL = f"""
SELECT event_id, user_id, ts,
       count(*) OVER w AS roll_n,
       sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0
           / (count(*) OVER w) AS roll_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------------------------ pivot table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified",
                  "p5_low"]


def segment_priority_matrix(sf_dir: str):
    """Order counts pivoted to a (market segment × order priority) matrix —
    the wide contingency table a monitoring job emits. The fact side is
    pre-collapsed to (custkey, priority) partial counts inside the same
    shuffle that joins the customer dimension (``sum_join``), the
    (segment, priority) rollup shuffles ≤ 25 rows, and the pivot runs on
    that tiny result."""
    from .joins import sum_join
    from ._util import collect_with_schema

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(lambda df: df.assign(n=np.int64(1))
                     .groupby(["o_custkey", "o_orderpriority"],
                              as_index=False)["n"].sum()
                     .rename(columns={"o_custkey": "c_custkey"}),
                     batch_format="pandas")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    joined = sum_join(orders, cust, on="c_custkey", sum_cols=["n"],
                      sum_keys=["c_custkey", "o_orderpriority"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["c_mktsegment", "o_orderpriority"],
                          as_index=False)["n"].sum()

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["c_mktsegment", "o_orderpriority"],
                        as_index=False)["n"].sum()
        wide = df.pivot_table(index="c_mktsegment", columns="o_orderpriority",
                              values="n", aggfunc="sum", fill_value=0)
        out = pd.DataFrame({"segment": wide.index.to_numpy()})
        for p, col in zip(_PRIORITIES, _PRIORITY_COLS):
            out[col] = (wide[p].to_numpy(dtype=np.int64)
                        if p in wide.columns else np.int64(0))
        return out

    small = joined.map_batches(partial, batch_format="pandas")
    # ≤ (segments × priorities) rows per block survive to the driver;
    # the final pivot is a constant-size pandas frame
    rollup = collect_with_schema(small, pa.schema(
        [("c_mktsegment", pa.string()), ("o_orderpriority", pa.string()),
         ("n", pa.int64())]))
    return pivot(rollup)


SEGMENT_PRIORITY_MATRIX_SQL = """
SELECT c_mktsegment AS segment,
       count(*) FILTER (o_orderpriority = '1-URGENT')        AS p1_urgent,
       count(*) FILTER (o_orderpriority = '2-HIGH')          AS p2_high,
       count(*) FILTER (o_orderpriority = '3-MEDIUM')        AS p3_medium,
       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
       count(*) FILTER (o_orderpriority = '5-LOW')           AS p5_low
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

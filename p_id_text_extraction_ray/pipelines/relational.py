"""Relational pipelines over the TPC-H-ish testdata tables.

These exercise the engine's general data-processing surface — filters,
projections, computed columns, grouped aggregation with partial pre-
aggregation, broadcast joins, sort/limit, distinct, and a sessionization
window — all as Ray Data pipelines with DuckDB-checkable semantics
(``__ray_entry__.oracle_sql``).

Scale conventions used throughout:
* **Prune at the read**: every ``read_parquet`` passes ``columns=[...]``.
* **Pre-aggregate**: wide groupbys are fed per-batch partials (one row per
  key per batch) so the shuffle moves partial sums, not raw rows.
* **Broadcast only TRUE dimensions**: fixed-cardinality lookups (nation: 25
  rows, region: 5) are collected to a dict once and captured by the batch
  fn closure. Anything that grows with the fact table — customer, supplier,
  filtered order slices, per-key partials — is a distributed ``hash_join``
  side (pipelines/joins.py), never a driver collect.
* **Round once at the end**: float aggregates are rounded (2 or 6 dp) in
  both the Ray result and the SQL oracle so summation order can't flip the
  value hash.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._util import cents


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir: str, name: str, columns: list[str]):
    from ._util import sized_read
    return sized_read(_pq(sf_dir, name), columns, rows_per_block=150_000)


def _round_col(t: pa.Table, col: str, nd: int) -> pa.Table:
    i = t.schema.get_field_index(col)
    return t.set_column(i, col, pc.round(t.column(col), ndigits=nd))


# ---------------------------------------------------------------- q1

Q1_CUTOFF = "1998-09-02"


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary with per-batch partial aggregation."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"),
                                   pa.scalar(pd.Timestamp(Q1_CUTOFF))))
        # Exact integer-cents money math (see _util.cents): sums become
        # independent of summation order, so the value hash matches DuckDB
        # bit-for-bit.
        ep_c = cents(t.column("l_extendedprice").to_numpy())
        disc_c = cents(t.column("l_discount").to_numpy())
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pandas(),
            "l_linestatus": t.column("l_linestatus").to_pandas(),
            "q": t.column("l_quantity").to_numpy(),
            "bp_c": ep_c,
            "dp_c": ep_c * (100 - disc_c),
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sq=("q", "sum"), sb=("bp_c", "sum"), sd=("dp_c", "sum"), n=("q", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(["l_returnflag", "l_linestatus"]) \
            .aggregate(Sum("sq", alias_name="sum_qty"),
                       Sum("sb", alias_name="sb_c"),
                       Sum("sd", alias_name="sd_c"),
                       Sum("n", alias_name="count_order"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column("avg_qty", pc.round(
            pc.divide(t.column("sum_qty"), pc.cast(t.column("count_order"),
                                                   pa.float64())), ndigits=6))
        t = t.append_column("sum_base_price", pc.divide(
            pc.cast(t.column("sb_c"), pa.float64()), pa.scalar(100.0)))
        t = t.append_column("sum_disc_price", pc.divide(
            pc.cast(t.column("sd_c"), pa.float64()), pa.scalar(10000.0)))
        t = t.drop_columns(["sb_c", "sd_c"])
        return t.set_column(t.schema.get_field_index("count_order"), "count_order",
                            pc.cast(t.column("count_order"), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                   AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                                                         AS sum_base_price,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
                                                         AS sum_disc_price,
       round(sum(l_quantity) / count(*), 6)              AS avg_qty,
       count(*)                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- q3

Q3_DATE = "1998-03-15"
Q3_SEGMENT = "BUILDING"


def q3_shipping_priority(sf_dir: str):
    """Top-10 open orders by revenue for one market segment.

    Fully distributed (no fact-scale driver collect): BUILDING customer
    keys semi-join the date-filtered orders via the partitioned
    ``hash_join``; lineitem revenue partials (pre-aggregated per batch)
    reach the qualifying orders through the fused ``sum_join`` — the
    per-order reduction and the join share ONE shuffle; only the 10-row
    top-k result is ever small.
    """
    from .joins import hash_join, sum_join

    cust_keys = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("c_mktsegment"), Q3_SEGMENT))
                       .select(["c_custkey"]).rename_columns(["o_custkey"]),
            batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(
            lambda t: t.filter(pc.less(t.column("o_orderdate"),
                                       pa.scalar(pd.Timestamp(Q3_DATE)))),
            batch_format="pyarrow")
    orders_seg = hash_join(orders, cust_keys, on="o_custkey").map_batches(
        lambda df: df[["o_orderkey", "o_orderdate"]], batch_format="pandas")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > pd.Timestamp(Q3_DATE)]
        if not len(df):
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                                 "rev_c": pd.Series([], dtype="int64")})
        rev_c = cents(df["l_extendedprice"]) * (100 - cents(df["l_discount"]))
        g = pd.Series(rev_c).groupby(df["l_orderkey"].values).sum().reset_index()
        g.columns = ["o_orderkey", "rev_c"]
        return g

    top = sum_join(li.map_batches(partial, batch_format="pandas"),
                   orders_seg, on="o_orderkey", sum_cols=["rev_c"]) \
        .sort("rev_c", descending=True).limit(10)

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column("revenue", pc.divide(
            pc.cast(t.column("rev_c"), pa.float64()), pa.scalar(10000.0)))
        return t.select(["o_orderkey", "revenue", "o_orderdate"])

    return top.map_batches(finish, batch_format="pyarrow")


Q3_SQL = f"""
SELECT o_orderkey,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE}'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC
LIMIT 10
"""


# ---------------------------------------------------------------- q5

Q5_REGION = "ASIA"
Q5_YEAR_LO, Q5_YEAR_HI = "1996-01-01", "1997-01-01"


def q5_local_supplier_volume(sf_dir: str):
    """Revenue by nation where customer and supplier share the nation,
    region-restricted.

    Only the TRUE dimensions (nation: 25 rows, region: 5) are broadcast.
    Customer, supplier and the one-year orders slice — all of which grow
    with the fact table — are distributed ``hash_join`` sides: orders ⋈
    customer on custkey, lineitem ⋈ that on orderkey (most selective
    first), then ⋈ supplier on suppkey, with the customer=supplier-nation
    filter and the per-nation rollup applied per batch after the joins.
    """
    from ray.data.aggregate import Sum
    from .joins import hash_join, sum_join

    import pyarrow.parquet as pq
    nat = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    reg = pq.read_table(_pq(sf_dir, "region")).to_pandas()
    asia_keys = set(reg[reg["r_name"] == Q5_REGION]["r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(asia_keys)]
    nation_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    asia_nations = list(nation_name)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t.column("c_nationkey"),
                                    value_set=pa.array(asia_nations)))
                   .rename_columns(["o_custkey", "cust_nat"]),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("o_orderdate"),
                             pa.scalar(pd.Timestamp(Q5_YEAR_LO))),
            pc.less(t.column("o_orderdate"),
                    pa.scalar(pd.Timestamp(Q5_YEAR_HI)))))
                   .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")
    orders_cust = hash_join(orders, cust, on="o_custkey").map_batches(
        lambda df: df[["o_orderkey", "cust_nat"]], batch_format="pandas")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t.column("s_nationkey"),
                                    value_set=pa.array(asia_nations)))
                   .rename_columns(["l_suppkey", "supp_nat"]),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_rows(df: pd.DataFrame) -> pd.DataFrame:
        rev_c = cents(df["l_extendedprice"]) * (100 - cents(df["l_discount"]))
        return pd.DataFrame({"o_orderkey": df["l_orderkey"].values,
                             "l_suppkey": df["l_suppkey"].values,
                             "rev_c": rev_c})

    li_o = hash_join(li.map_batches(li_rows, batch_format="pandas"),
                     orders_cust, on="o_orderkey")
    # pre-reduce to (suppkey, cust_nat) partials before the supplier join:
    # lineitem-scale rows collapse to ≤ |supplier| × |nations| sums, so the
    # second all-to-all moves aggregates, not facts — and the reduction
    # rides the same shuffle as the join (sum_join)
    li_os = sum_join(li_o.map_batches(
        lambda df: df[["l_suppkey", "cust_nat", "rev_c"]],
        batch_format="pandas"),
        supp, on="l_suppkey", sum_keys=["l_suppkey", "cust_nat"],
        sum_cols=["rev_c"])

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["cust_nat"] == df["supp_nat"]]
        if not len(df):
            return pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                                 "rev_c": pd.Series([], dtype="int64")})
        names = df["cust_nat"].map(nation_name)
        g = df.groupby(names.values)["rev_c"].sum().reset_index()
        g.columns = ["n_name", "rev_c"]
        return g

    agg = (li_os.map_batches(roll, batch_format="pandas")
           .groupby("n_name").aggregate(Sum("rev_c", alias_name="rev_c")))
    return agg.map_batches(
        lambda t: t.append_column("revenue", pc.divide(
            pc.cast(t.column("rev_c"), pa.float64()),
            pa.scalar(10000.0))).drop_columns(["rev_c"]),
        batch_format="pyarrow")


Q5_SQL = f"""
SELECT n_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_YEAR_LO}'
  AND o_orderdate <  TIMESTAMP '{Q5_YEAR_HI}'
GROUP BY n_name
"""


# ---------------------------------------------------------------- q6

def q6_revenue_forecast(sf_dir: str):
    """Global filtered aggregate; one partial sum per batch, tiny shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(pd.Timestamp("1996-01-01"))),
            pc.less(t.column("l_shipdate"), pa.scalar(pd.Timestamp("1997-01-01")))),
            pc.and_(
                pc.and_(pc.greater_equal(t.column("l_discount"), pa.scalar(0.05)),
                        pc.less_equal(t.column("l_discount"), pa.scalar(0.07))),
                pc.less(t.column("l_quantity"), pa.scalar(24.0))))
        t = t.filter(m)
        rev_c = int((cents(t.column("l_extendedprice").to_numpy())
                     * cents(t.column("l_discount").to_numpy())).sum())
        return pa.table({"rev_c": pa.array([rev_c], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .aggregate(Sum("rev_c", alias_name="rev_c"))
    return pa.table({"revenue": pa.array([agg["rev_c"] / 10000.0], pa.float64())})


Q6_SQL = """
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------- misc ops

def top_orders_by_price(sf_dir: str):
    """Top-20 orders by price WITHOUT a global sort: each batch emits its
    local top-20 ((price DESC, orderkey ASC) — deterministic under ties),
    then one single-group reduce keeps the global 20. The shuffle carries
    at most 20 rows per block instead of the whole fact table."""
    import pandas as pd

    def local_topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True]).head(20)
        return df.assign(_g=np.int64(0))

    def global_topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True]).head(20)
        return df[["o_orderkey", "o_custkey", "o_totalprice"]]

    return _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(local_topk, batch_format="pandas") \
        .groupby("_g").map_groups(global_topk, batch_format="pandas")


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def distinct_segments(sf_dir: str):
    """Distinct values of one column (``Dataset.unique`` shuffle)."""
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def nation_region_join(sf_dir: str):
    """Broadcast hash join of two dimension tables."""
    import pyarrow.parquet as pq
    reg = pq.read_table(_pq(sf_dir, "region")).to_pandas()
    rmap = dict(zip(reg["r_regionkey"], reg["r_name"]))
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])

    def join(t: pa.Table) -> pa.Table:
        names = pa.array([rmap.get(k) for k in t.column("n_regionkey").to_pylist()],
                         pa.string())
        return t.select(["n_nationkey", "n_name"]).append_column("r_name", names)

    return nat.map_batches(join, batch_format="pyarrow")


NATION_REGION_SQL = """
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def segment_order_value(sf_dir: str):
    """Fact ⋈ fact-scale lookup + grouped aggregate: per-customer order
    partials (pre-aggregated per batch, bucket-summed) hash-joined with
    the customer table, rolled up by segment. Customer grows with the fact
    table, so it is a distributed join side, not a broadcast."""
    from ray.data.aggregate import Sum
    from .joins import sum_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"c_custkey": df["o_custkey"].values,
                          "tp_c": cents(df["o_totalprice"]),
                          "n": np.ones(len(df), dtype=np.int64)}) \
            .groupby("c_custkey", as_index=False)[["tp_c", "n"]].sum()
        return g

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = sum_join(orders.map_batches(partial, batch_format="pandas"),
                      cust, on="c_custkey", sum_cols=["tp_c", "n"])

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_mktsegment", as_index=False)[["tp_c", "n"]].sum()

    agg = (joined.map_batches(roll, batch_format="pandas")
           .groupby("c_mktsegment")
           .aggregate(Sum("tp_c", alias_name="tp_c"),
                      Sum("n", alias_name="n_orders")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column("total_price", pc.divide(
            pc.cast(t.column("tp_c"), pa.float64()), pa.scalar(100.0)))
        t = t.drop_columns(["tp_c"])
        return t.set_column(t.schema.get_field_index("n_orders"), "n_orders",
                            pc.cast(t.column("n_orders"), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


SEGMENT_ORDER_VALUE_SQL = """
SELECT c_mktsegment,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate: count + sum(value) per (event_type, hour)."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hour=df["ts"].dt.floor("h"), v_c=cents(df["value"]))
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("v_c", "size"), v=("v_c", "sum"))
        return g

    # bucketed pandas reduce, NOT Ray's native aggregate: at ~3.6k
    # (type, hour) groups the native path pays ~1.7 ms/group in both its
    # map and reduce suboperators (~12 s); one vectorized groupby per
    # hash bucket is milliseconds and scales with rows, not groups
    from ._util import bucketed_group_sum
    agg = bucketed_group_sum(ev.map_batches(partial, batch_format="pandas"),
                             ["event_type", "hour"], ["n", "v"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].values, "hour": df["hour"].values,
            "n_events": df["n"].to_numpy(dtype=np.int64),
            "sum_value": df["v"].to_numpy(dtype=np.float64) / 100.0})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def order_priority_revenue(sf_dir: str):
    """Large ⋈ large: lineitem revenue per order (pre-aggregated partials)
    joined with orders on o_orderkey via the fused ``sum_join`` (the
    per-order reduction and the merge share one shuffle), then rolled up
    by order priority."""
    from ray.data.aggregate import Sum
    from .joins import sum_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev_c = cents(df["l_extendedprice"]) * (100 - cents(df["l_discount"]))
        g = pd.Series(rev_c).groupby(df["l_orderkey"].values).sum().reset_index()
        g.columns = ["o_orderkey", "rev_c"]
        return g

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = sum_join(li.map_batches(partial, batch_format="pandas"),
                      orders, on="o_orderkey", sum_cols=["rev_c"])

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False).agg(
            rc=("rev_c", "sum"), n=("rev_c", "size"))
        return g

    agg = (joined.map_batches(roll, batch_format="pandas")
           .groupby("o_orderpriority")
           .aggregate(Sum("rc", alias_name="rc"), Sum("n", alias_name="n_orders")))

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column("revenue", pc.divide(
            pc.cast(t.column("rc"), pa.float64()), pa.scalar(10000.0)))
        t = t.drop_columns(["rc"])
        return t.set_column(t.schema.get_field_index("n_orders"), "n_orders",
                            pc.cast(t.column("n_orders"), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


ORDER_PRIORITY_REVENUE_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       sum(rev_c) / 10000.0 AS revenue
FROM (SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_c
      FROM lineitem GROUP BY l_orderkey) r
JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


def events_last_error_before_purchase(sf_dir: str):
    """As-of join: for each purchase event, the most recent error event of
    the same user at or before its timestamp (``pipelines/joins.asof_join``;
    unmatched purchases dropped — inner as-of)."""
    from .joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    purchases = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "purchase"))
                   .select(["event_id", "user_id", "ts"]),
        batch_format="pyarrow")
    errors = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "error"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow")
    return asof_join(purchases, errors, key="user_id", ts="ts",
                     right_ts_out="last_error_ts")


EVENTS_ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts, e.ts AS last_error_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id AND p.ts >= e.ts
"""


SESSION_GAP_MIN = 30


def events_sessionize(sf_dir: str):
    """Session windows per user (gap > 30 min splits): Ray Data has no
    event-time windows, so users are co-located by a bucketed shuffle and
    each bucket sessionizes ALL its users in one vectorized pass
    (sort by (user, ts), diff, per-user gap count) — no per-user Python
    frame, so per-group overhead is bounded by the bucket count, not the
    user count."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["user_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = (k * np.uint64(2654435761)) % np.uint64(64)
        return df.assign(bucket=b.astype(np.int64))

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        same_user = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        gap = df["ts"].diff().to_numpy()[1:] > np.timedelta64(
            SESSION_GAP_MIN, "m")
        breaks = pd.Series(np.concatenate([[False], same_user & gap]),
                           index=df.index)
        g = df.groupby("user_id")
        out = pd.DataFrame({
            "n_sessions": breaks.groupby(df["user_id"].values).sum() + 1,
            "n_events": g.size()})
        return out.rename_axis("user_id").reset_index().astype(
            {"n_sessions": "int64", "n_events": "int64"})

    return (ev.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(sessions_bucket, batch_format="pandas"))


EVENTS_SESSIONIZE_SQL = f"""
WITH gapped AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*) AS n_events
FROM gapped GROUP BY user_id
"""


# -------------------------------------------------- q4-style semi-join

Q4_QUARTER_START = "1996-01-01"
Q4_QUARTER_END = "1996-04-01"
Q4_LATE_DAYS = 60


def q4_order_priority_check(sf_dir: str):
    """TPC-H-Q4-style EXISTS semi-join: count orders per priority placed
    in one quarter that have at least one line item shipped more than 60
    days after the order date.

    Distributed shape: lineitem reduces to one (orderkey, max_shipdate)
    row per order — per-batch partial max, then a bucketed grouped max
    (bounded group count, vectorized pandas inside) — so the semi-join
    predicate needs only ONE row per order on the probe side; a
    partitioned ``hash_join`` against the quarter's orders evaluates the
    EXISTS, and the rollup is a tiny groupby over the 5 priorities.
    The shuffle carries (int64, timestamp) pairs, never line items.
    (At scale the quarter filter could also semi-filter lineitem before
    the max — kept single-pass here because the max pre-reduction
    already collapses the fact table to order cardinality.)
    """
    from ray.data.aggregate import Sum
    from .joins import hash_join, DEFAULT_SHUFFLE_PARTITIONS

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def partial_max(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False)["l_shipdate"].max()
        g.columns = ["o_orderkey", "max_ship"]
        return g

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = (k * np.uint64(2654435761)) % np.uint64(64)
        return df.assign(bucket=b.astype(np.int64))

    def reduce_max(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderkey", as_index=False)["max_ship"].max()

    order_max = (li.map_batches(partial_max, batch_format="pandas")
                 .map_batches(add_bucket, batch_format="pandas")
                 .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
                 .map_groups(reduce_max, batch_format="pandas"))

    lo = np.datetime64(Q4_QUARTER_START)
    hi = np.datetime64(Q4_QUARTER_END)

    def quarter(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy()
        return df[(d >= lo) & (d < hi)][
            ["o_orderkey", "o_orderdate", "o_orderpriority"]]

    orders_q = _read(sf_dir, "orders",
                     ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(quarter, batch_format="pandas")

    joined = hash_join(orders_q, order_max, on="o_orderkey")

    def check(df: pd.DataFrame) -> pd.DataFrame:
        late = df["max_ship"] > df["o_orderdate"] + pd.Timedelta(days=Q4_LATE_DAYS)
        g = df[late].groupby("o_orderpriority", as_index=False).size()
        g.columns = ["o_orderpriority", "n"]
        return g

    agg = (joined.map_batches(check, batch_format="pandas")
           .groupby("o_orderpriority")
           .aggregate(Sum("n", alias_name="n_orders")))

    return agg.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("n_orders"),
                               "n_orders",
                               pc.cast(t.column("n_orders"), pa.int64())),
        batch_format="pyarrow")


Q4_ORDER_PRIORITY_CHECK_SQL = f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= DATE '{Q4_QUARTER_START}'
  AND o_orderdate <  DATE '{Q4_QUARTER_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY o_orderpriority
"""

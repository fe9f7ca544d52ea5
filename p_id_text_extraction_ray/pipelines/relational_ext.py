"""Wider TPC-H-style multi-join pipelines (q7/q10/q14/q18 analogues).

Same scale conventions as ``relational.py``: pruned reads, exact
integer-cents money math (``_util.cents``), distributed ``hash_join`` /
``sum_join`` for every side that grows with the fact table, broadcast
dicts only for the true dimensions (nation/region), and deterministic
tie-breaks on every top-k so LIMIT selection is order-stable between the
Ray plan and the DuckDB oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._util import bucketed_group_sum, cents


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir: str, name: str, columns: list[str]):
    from ._util import sized_read
    return sized_read(_pq(sf_dir, name), columns, rows_per_block=150_000)


def _ts(s: str):
    return pa.scalar(pd.Timestamp(s))


# ------------------------------------------------- q14: promo revenue

Q14_LO, Q14_HI = "1997-03-01", "1997-04-01"


def q14_promo_revenue(sf_dir: str):
    """Share of discounted revenue from PROMO-type parts in one month.

    Part grows with the scale factor, so it is a distributed join side,
    not a broadcast: the month's lineitem rows pre-reduce to one partial
    per partkey INSIDE the join shuffle (``sum_join``), the promo split
    is a per-batch conditional partial sum, and only two int64 cells ever
    reach the driver.
    """
    from ray.data.aggregate import Sum
    from .joins import sum_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def month_slice(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(Q14_LO)),
            pc.less(t.column("l_shipdate"), _ts(Q14_HI))))
        ep_c = cents(t.column("l_extendedprice").to_numpy())
        disc_c = cents(t.column("l_discount").to_numpy())
        return pa.table({"p_partkey": t.column("l_partkey"),
                         "dp_c": pa.array(ep_c * (100 - disc_c), pa.int64())})

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    joined = sum_join(li.map_batches(month_slice, batch_format="pyarrow"),
                      part, on="p_partkey", sum_cols=["dp_c"])

    def split(df: pd.DataFrame) -> pa.Table:
        promo = df.loc[df["p_type"] == "PROMO", "dp_c"].sum()
        return pa.table({"promo_c": pa.array([int(promo)], pa.int64()),
                         "total_c": pa.array([int(df["dp_c"].sum())], pa.int64())})

    agg = joined.map_batches(split, batch_format="pandas") \
        .aggregate(Sum("promo_c", alias_name="p"), Sum("total_c", alias_name="t"))
    pct = round(100.0 * agg["p"] / agg["t"], 6)
    return pa.table({"promo_revenue_pct": pa.array([pct], pa.float64())})


Q14_SQL = f"""
SELECT round(100.0 *
         sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
             ELSE 0 END)
         / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))), 6)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_LO}' AND l_shipdate < TIMESTAMP '{Q14_HI}'
"""


# -------------------------------------- q18: large-volume order report

Q18_MIN_QTY = 250.0


def q18_large_volume_orders(sf_dir: str):
    """Orders whose total line quantity exceeds a threshold, with their
    customer — the group-HAVING-then-join shape.

    The per-order quantity reduction rides the orders join's shuffle
    (``sum_join``; every orderkey's rows share a bucket, so the sums the
    HAVING filter sees are complete), survivors (~1%) hash-join customer,
    and only the top-100 result is collected.
    """
    from .joins import hash_join, sum_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "qty"]),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    big = sum_join(li, orders, on="o_orderkey", sum_cols=["qty"]) \
        .map_batches(lambda df: df[df["qty"] > Q18_MIN_QTY]
                     .rename(columns={"o_custkey": "c_custkey",
                                      "qty": "sum_qty"}),
                     batch_format="pandas")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    out = hash_join(big, cust, on="c_custkey") \
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False]) \
        .limit(100)
    return out.map_batches(
        lambda df: df[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice", "sum_qty"]],
        batch_format="pandas")


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum(l_quantity) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > {Q18_MIN_QTY}
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# -------------------------------------- q10: returned-item reporting

Q10_LO, Q10_HI = "1997-01-01", "1997-04-01"


def q10_returned_items(sf_dir: str):
    """Top-20 customers by revenue lost to returned items in a quarter.

    lineitem('R') partials reach the quarter's orders through one fused
    ``sum_join``; per-customer revenue re-reduces in a bucketed shuffle
    that carries (custkey, rev) pairs only; customer attaches via
    ``hash_join``; nation (25 rows, a true dimension) is a broadcast
    dict. Ties at the top-20 boundary break on c_custkey in both plans.
    """
    import pyarrow.parquet as pq
    from .joins import hash_join, sum_join

    nation_name = dict(zip(
        *(pq.read_table(_pq(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"])
          .to_pandas()[c] for c in ("n_nationkey", "n_name"))))

    def li_returned(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        ep_c = cents(t.column("l_extendedprice").to_numpy())
        disc_c = cents(t.column("l_discount").to_numpy())
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "rev_c": pa.array(ep_c * (100 - disc_c), pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_returnflag"]).map_batches(li_returned,
                                             batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("o_orderdate"), _ts(Q10_LO)),
            pc.less(t.column("o_orderdate"), _ts(Q10_HI))))
                   .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")

    per_order = sum_join(li, orders, on="o_orderkey", sum_cols=["rev_c"])
    per_cust = bucketed_group_sum(
        per_order.map_batches(
            lambda df: df[["o_custkey", "rev_c"]]
            .rename(columns={"o_custkey": "c_custkey"}),
            batch_format="pandas"),
        "c_custkey", ["rev_c"])

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    top = hash_join(per_cust, cust, on="c_custkey") \
        .sort(["rev_c", "c_custkey"], descending=[True, False]).limit(20)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].values,
            "c_name": df["c_name"].values,
            "revenue": df["rev_c"].to_numpy(dtype=np.float64) / 10000.0,
            "c_acctbal": df["c_acctbal"].values,
            "n_name": df["c_nationkey"].map(nation_name).values})

    return top.map_batches(finish, batch_format="pandas")


Q10_SQL = f"""
SELECT c_custkey, c_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
         AS revenue,
       c_acctbal, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{Q10_LO}'
  AND o_orderdate <  TIMESTAMP '{Q10_HI}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ------------------------------- q7: cross-nation shipping volume

Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"


def q7_nation_volume(sf_dir: str):
    """Revenue by (supplier nation, customer nation, ship year) — the
    4-way fact join (lineitem ⋈ supplier ⋈ orders ⋈ customer).

    Supplier and customer both grow with the scale factor, so both are
    distributed join sides; the plan pre-reduces after every join so each
    successive shuffle carries aggregates, not facts: lineitem ⋈ supplier
    on suppkey → reduce to (orderkey, supp_nat, year) inside the orders
    ``sum_join`` → reduce to (custkey, supp_nat, year) in a bucketed
    shuffle → ⋈ customer → final ≤ |nations|² × years rollup. Nation
    names come from a 25-row broadcast dict.
    """
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from .joins import hash_join, sum_join

    nation_name = dict(zip(
        *(pq.read_table(_pq(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"])
          .to_pandas()[c] for c in ("n_nationkey", "n_name"))))

    def li_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(Q7_LO)),
            pc.less(t.column("l_shipdate"), _ts(Q7_HI))))
        ep_c = cents(t.column("l_extendedprice").to_numpy())
        disc_c = cents(t.column("l_discount").to_numpy())
        return pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "l_suppkey": t.column("l_suppkey"),
            "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
            "rev_c": pa.array(ep_c * (100 - disc_c), pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                "l_shipdate"]).map_batches(li_rows, batch_format="pyarrow")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda t: t.rename_columns(["l_suppkey", "supp_nat"]),
                     batch_format="pyarrow")
    li_s = hash_join(li, supp, on="l_suppkey").map_batches(
        lambda df: df[["o_orderkey", "supp_nat", "l_year", "rev_c"]],
        batch_format="pandas")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li_so = sum_join(li_s, orders, on="o_orderkey",
                     sum_keys=["o_orderkey", "supp_nat", "l_year"],
                     sum_cols=["rev_c"])

    per_cust = bucketed_group_sum(
        li_so.map_batches(
            lambda df: df[["o_custkey", "supp_nat", "l_year", "rev_c"]]
            .rename(columns={"o_custkey": "c_custkey"}),
            batch_format="pandas"),
        ["c_custkey", "supp_nat", "l_year"], ["rev_c"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = hash_join(per_cust, cust, on="c_custkey")

    def name_pair(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "supp_nation": df["supp_nat"].map(nation_name).values,
            "cust_nation": df["c_nationkey"].map(nation_name).values,
            "l_year": df["l_year"].values,
            "rev_c": df["rev_c"].values})

    # bucketed pandas reduce — Ray's native aggregate pays per-group
    # overhead (~1.7 ms/group/suboperator) at ~1.2k (nation², year) groups
    agg = bucketed_group_sum(
        joined.map_batches(name_pair, batch_format="pandas"),
        ["supp_nation", "cust_nation", "l_year"], ["rev_c"])
    return agg.map_batches(
        lambda df: df.assign(
            revenue=df["rev_c"].to_numpy(dtype=np.float64) / 10000.0)
        .drop(columns=["rev_c"]),
        batch_format="pandas")


Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
         AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_LO}' AND l_shipdate < TIMESTAMP '{Q7_HI}'
GROUP BY supp_nation, cust_nation, l_year
"""

"""Remaining TPC-H-style query shapes (q2/q9/q12/q13/q15/q16/q17/q22
analogues) over the graft test tables.

Each query exercises a join/aggregate shape the other relational modules
do not: argmin-per-group with tie-break (q2), fact⋈fact count
classification (q12), LEFT-join count distribution (q13), scalar-max
subquery (q15), distinct-count after an anti-join (q16),
per-group-threshold self-aggregation (q17), and scalar-average threshold
+ anti-join (q22).

Scale conventions match ``relational.py``: pruned reads, exact
integer-cents money math (``_util.cents``), distributed
``hash_join``/``sum_join``/``anti_join``/``semi_join`` for every side
that grows with the fact table, broadcast dicts only for true dimensions
(nation), per-batch partial aggregation before every shuffle, and
integer-exact threshold comparisons (``5*q*cnt < sum_q`` instead of
``q < 0.2*avg``) so the Ray plan and the DuckDB oracle agree bit-for-bit
at boundaries.
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


def _nation_names(sf_dir: str) -> dict:
    import pyarrow.parquet as pq
    t = pq.read_table(_pq(sf_dir, "nation"),
                      columns=["n_nationkey", "n_name"]).to_pandas()
    return dict(zip(t["n_nationkey"], t["n_name"]))


# --------------------------------- q2: cheapest supplier per small part

Q2_MAX_SIZE = 10


def q2_min_price_supplier(sf_dir: str):
    """For every small part, the supplier offering its cheapest lineitem
    — the argmin-per-group shape with a deterministic tie-break.

    (min price, then min suppkey) is an associative reduction, so it runs
    as a per-batch partial argmin followed by one bucketed shuffle of
    (partkey, suppkey, price) triples — facts never move twice. Part and
    supplier both grow with the scale factor and attach via distributed
    ``hash_join``.
    """
    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of, hash_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"]).map_batches(
        lambda t: pa.table({
            "p_partkey": t.column("l_partkey"),
            "s_suppkey": t.column("l_suppkey"),
            "min_c": pa.array(cents(t.column("l_extendedprice").to_numpy()),
                              pa.int64())}),
        batch_format="pyarrow")

    def argmin(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (df.sort_values(["min_c", "s_suppkey"])
                .groupby("p_partkey", as_index=False).first())

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__bucket=_bucket_of(df["p_partkey"], 64))

    cheapest = (li.map_batches(argmin, batch_format="pandas")
                .map_batches(add_bucket, batch_format="pandas")
                .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
                .map_groups(lambda g: argmin(g.drop(columns="__bucket")),
                            batch_format="pandas"))

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_size"]) \
        .map_batches(lambda t: t.filter(
            pc.less_equal(t.column("p_size"), pa.scalar(Q2_MAX_SIZE)))
            .select(["p_partkey", "p_name"]),
            batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])

    out = hash_join(hash_join(cheapest, part, on="p_partkey"),
                    supp, on="s_suppkey").sort("p_partkey")
    return out.map_batches(
        lambda df: pd.DataFrame({
            "p_partkey": df["p_partkey"].values,
            "p_name": df["p_name"].values,
            "s_suppkey": df["s_suppkey"].values,
            "s_name": df["s_name"].values,
            "min_price": df["min_c"].to_numpy(np.float64) / 100.0}),
        batch_format="pandas")


Q2_SQL = f"""
WITH mp AS (
  SELECT l_partkey AS p_partkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_c
  FROM lineitem GROUP BY l_partkey),
win AS (
  SELECT l.l_partkey AS p_partkey, min(l.l_suppkey) AS s_suppkey, mp.min_c
  FROM lineitem l JOIN mp ON l.l_partkey = mp.p_partkey
   AND CAST(round(l.l_extendedprice * 100) AS BIGINT) = mp.min_c
  GROUP BY l.l_partkey, mp.min_c)
SELECT p.p_partkey, p.p_name, w.s_suppkey, s.s_name,
       w.min_c / 100.0 AS min_price
FROM win w JOIN part p ON p.p_partkey = w.p_partkey
           JOIN supplier s ON s.s_suppkey = w.s_suppkey
WHERE p.p_size <= {Q2_MAX_SIZE}
ORDER BY p.p_partkey
"""


# ------------------------------------ q9: profit by nation and year

def q9_profit_by_nation_year(sf_dir: str):
    """Revenue by supplier nation and ship year (q9's rollup shape
    without partsupp, which the test tables do not carry).

    Lineitem pre-reduces per (suppkey, year) inside each batch, then one
    bucketed shuffle finishes the partials — the supplier ``hash_join``
    sees |suppliers|×|years| aggregate rows, never facts. Nation is a
    25-row broadcast dict; the final rollup is ≤ |nations|×|years|.
    """
    from ray.data.aggregate import Sum
    from .joins import hash_join

    nation_name = _nation_names(sf_dir)

    def li_rows(t: pa.Table) -> pd.DataFrame:
        ep_c = cents(t.column("l_extendedprice").to_numpy())
        disc_c = cents(t.column("l_discount").to_numpy())
        df = pd.DataFrame({
            "s_suppkey": t.column("l_suppkey").to_numpy(),
            "o_year": pc.cast(pc.year(t.column("l_shipdate")),
                              pa.int64()).to_numpy(),
            "rev_u": ep_c * (100 - disc_c)})
        return df.groupby(["s_suppkey", "o_year"], as_index=False).sum()

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]) \
        .map_batches(li_rows, batch_format="pyarrow")
    per_supp_year = bucketed_group_sum(li, ["s_suppkey", "o_year"], ["rev_u"])

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    joined = hash_join(per_supp_year, supp, on="s_suppkey")

    agg = joined.map_batches(
        lambda df: pd.DataFrame({
            "nation": df["s_nationkey"].map(nation_name).values,
            "o_year": df["o_year"].values,
            "rev_u": df["rev_u"].values}),
        batch_format="pandas") \
        .groupby(["nation", "o_year"]).aggregate(Sum("rev_u", alias_name="u")) \
        .sort(["nation", "o_year"], descending=[False, True])
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "nation": df["nation"].values,
            "o_year": df["o_year"].values,
            "profit": df["u"].to_numpy(np.float64) / 10000.0}),
        batch_format="pandas")


Q9_SQL = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
         AS profit
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, year(l_shipdate)
ORDER BY nation, o_year DESC
"""


# ---------------------- q12: order-priority classes per return flag

Q12_LO, Q12_HI = "1997-01-01", "1998-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_by_returnflag(sf_dir: str):
    """Count of high- vs low-priority order lines per return flag for one
    ship year — q12's fact⋈fact classification shape (return flag
    standing in for ship mode, which the test tables do not carry).

    Both join sides are fact tables, so the orderkey join is the
    distributed ``hash_join``; the classification then collapses per
    batch to ≤3×2 partial counts before the final 3-row rollup.
    """
    from ray.data.aggregate import Sum
    from .joins import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag",
                                    "l_shipdate"]).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(Q12_LO)),
            pc.less(t.column("l_shipdate"), _ts(Q12_HI))))
        .select(["l_orderkey", "l_returnflag"])
        .rename_columns(["o_orderkey", "l_returnflag"]),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = hash_join(li, orders, on="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hi = df["o_orderpriority"].isin(_Q12_HIGH)
        return (pd.DataFrame({"l_returnflag": df["l_returnflag"].values,
                              "high_line_count": hi.to_numpy(np.int64),
                              "low_line_count": (~hi).to_numpy(np.int64)})
                .groupby("l_returnflag", as_index=False).sum())

    return joined.map_batches(partial, batch_format="pandas") \
        .groupby("l_returnflag") \
        .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                   Sum("low_line_count", alias_name="low_line_count")) \
        .sort("l_returnflag")


Q12_SQL = f"""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_LO}'
  AND l_shipdate <  TIMESTAMP '{Q12_HI}'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ------------------------- q13: customer order-count distribution

Q13_EXCL_PRIORITY = "1-URGENT"


def q13_customer_distribution(sf_dir: str):
    """How many customers placed 0, 1, 2, … qualifying orders — the
    LEFT-join-then-distribution shape (zero-order customers must appear).

    Orders pre-count per custkey in one bucketed shuffle; customer LEFT
    hash-joins the counts (missing → 0); the count-of-counts rollup then
    collapses per batch to ≤ max_orders_per_customer partial rows.
    """
    from ray.data.aggregate import Sum
    from .joins import hash_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda df: df.loc[df["o_orderpriority"] != Q13_EXCL_PRIORITY,
                              ["o_custkey"]]
            .rename(columns={"o_custkey": "c_custkey"})
            .groupby("c_custkey", as_index=False).size()
            .rename(columns={"size": "c_count"}),
            batch_format="pandas")
    per_cust = bucketed_group_sum(orders, "c_custkey", ["c_count"])

    cust = _read(sf_dir, "customer", ["c_custkey"])
    left = hash_join(cust, per_cust, on="c_custkey", how="left",
                     right_cols_hint=["c_count"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c_count"].fillna(0).astype(np.int64)
        return (pd.DataFrame({"c_count": c.values})
                .groupby("c_count", as_index=False).size()
                .rename(columns={"size": "custdist"}))

    return left.map_batches(partial, batch_format="pandas") \
        .groupby("c_count").aggregate(Sum("custdist", alias_name="custdist")) \
        .sort(["custdist", "c_count"], descending=[True, True])


Q13_SQL = f"""
SELECT c_count, count(*) AS custdist
FROM (SELECT c.c_custkey, count(o.o_custkey) AS c_count
      FROM customer c
      LEFT JOIN (SELECT o_custkey FROM orders
                 WHERE o_orderpriority <> '{Q13_EXCL_PRIORITY}') o
        ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------- q15: top revenue supplier

Q15_LO, Q15_HI = "1997-01-01", "1997-04-01"


def q15_top_supplier(sf_dir: str):
    """Supplier(s) with the maximum quarterly revenue — the scalar-max
    subquery shape.

    Per-supplier revenue reduces per batch then in one bucketed shuffle;
    that aggregate set (|suppliers| rows, facts already collapsed) is
    materialized once so the global max and the equality filter reuse it
    without re-reading lineitem. Names attach via distributed hash_join.
    """
    from .joins import hash_join

    def li_rows(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), _ts(Q15_LO)),
            pc.less(t.column("l_shipdate"), _ts(Q15_HI))))
        ep_c = cents(t.column("l_extendedprice").to_numpy())
        disc_c = cents(t.column("l_discount").to_numpy())
        return (pd.DataFrame({"s_suppkey": t.column("l_suppkey").to_numpy(),
                              "rev_u": ep_c * (100 - disc_c)})
                .groupby("s_suppkey", as_index=False).sum())

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]) \
        .map_batches(li_rows, batch_format="pyarrow")
    rev = bucketed_group_sum(li, "s_suppkey", ["rev_u"]).materialize()
    mx = rev.max("rev_u")

    top = rev.map_batches(lambda df: df[df["rev_u"] == mx],
                          batch_format="pandas")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = hash_join(top, supp, on="s_suppkey").sort("s_suppkey")
    return out.map_batches(
        lambda df: pd.DataFrame({
            "s_suppkey": df["s_suppkey"].values,
            "s_name": df["s_name"].values,
            "total_revenue": df["rev_u"].to_numpy(np.float64) / 10000.0}),
        batch_format="pandas")


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
    AND l_shipdate <  TIMESTAMP '{Q15_HI}'
  GROUP BY l_suppkey)
SELECT r.s_suppkey, s.s_name, r.rev_u / 10000.0 AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.rev_u = (SELECT max(rev_u) FROM rev)
ORDER BY r.s_suppkey
"""


# ---------------- q16: supplier variety per part class (anti-join)

Q16_EXCL_BAL = 2000.0


def q16_part_supplier_counts(sf_dir: str):
    """Distinct qualifying suppliers per (brand, type, size) part class —
    the distinct-count-after-anti-join shape.

    (partkey, suppkey) pairs dedup per batch then in one bucketed
    shuffle; low-balance suppliers drop via distributed ``anti_join``
    (the right side ships keys only); part attributes attach via
    ``hash_join``; a second bucketed dedup on (brand, type, size,
    suppkey) makes the final count DISTINCT across parts sharing a
    class. Every shuffle carries keys/attributes, never fact rows.
    """
    from .joins import anti_join, hash_join
    from ._util import bucketed_group_sum as _bgs

    # per-batch dedup only: a global pair dedup here would cost a whole
    # extra shuffle to remove <2% of rows (the class-level distinct below
    # is the dedup that matters)
    pairs = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
        .map_batches(
            lambda df: df.rename(columns={"l_partkey": "p_partkey",
                                          "l_suppkey": "s_suppkey"})
            .drop_duplicates(),
            batch_format="pandas")

    excl = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]) \
        .map_batches(
            lambda df: df.loc[df["s_acctbal"] < Q16_EXCL_BAL, ["s_suppkey"]],
            batch_format="pandas")
    kept = anti_join(pairs, excl, on="s_suppkey")

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    attrs = hash_join(kept, part, on="p_partkey").map_batches(
        lambda df: df[["p_brand", "p_type", "p_size", "s_suppkey"]]
        .drop_duplicates(),
        batch_format="pandas")

    distinct = _bgs(attrs.map_batches(lambda df: df.assign(__one=1),
                                      batch_format="pandas"),
                    ["p_brand", "p_type", "p_size", "s_suppkey"], ["__one"])

    # final count rides the bucketed grouped sum, not Ray's native
    # groupby().aggregate(): at ~10^4 (brand, type, size) classes the
    # native path pays per-group overhead (23 s at sf0.1 vs <1 s bucketed)
    counts = distinct.map_batches(
        lambda df: df.groupby(["p_brand", "p_type", "p_size"],
                              as_index=False).size()
        .rename(columns={"size": "supplier_cnt"}),
        batch_format="pandas")
    return _bgs(counts, ["p_brand", "p_type", "p_size"], ["supplier_cnt"]) \
        .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
              descending=[True, False, False, False])


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_EXCL_BAL})
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ------------------ q17: small-quantity revenue for one brand

Q17_BRAND = "Brand#2"


def q17_small_quantity_revenue(sf_dir: str):
    """Average yearly revenue from orders far below a part's typical
    quantity — the per-group-threshold self-aggregation shape.

    The brand's partkeys select lineitem via distributed ``semi_join``;
    one bucketed shuffle then computes each part's (sum_qty, count) AND
    the thresholded revenue sum in a single pass — no second scan, no
    join back. The threshold compares integers (5·qty·cnt < sum_qty ⟺
    qty < avg/5), so the boundary is exact in both plans.
    """
    from ray.data.aggregate import Sum
    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of, semi_join

    parts_b = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda df: df.loc[df["p_brand"] == Q17_BRAND, ["p_partkey"]],
        batch_format="pandas")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
        lambda t: pd.DataFrame({
            "p_partkey": t.column("l_partkey").to_numpy(),
            "q": t.column("l_quantity").to_numpy().astype(np.int64),
            "ep_c": cents(t.column("l_extendedprice").to_numpy())}),
        batch_format="pyarrow")
    li_b = semi_join(li, parts_b, on="p_partkey")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__bucket=_bucket_of(df["p_partkey"], 64))

    def below_threshold_sum(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("p_partkey")
        sq = grp["q"].transform("sum").to_numpy(np.int64)
        cnt = grp["q"].transform("size").to_numpy(np.int64)
        mask = 5 * g["q"].to_numpy(np.int64) * cnt < sq
        return pd.DataFrame({"ep_sum":
                             [int(g["ep_c"].to_numpy(np.int64)[mask].sum())]})

    total = (li_b.map_batches(add_bucket, batch_format="pandas")
             .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
             .map_groups(below_threshold_sum, batch_format="pandas")
             .aggregate(Sum("ep_sum", alias_name="s")))
    s = total["s"] if total and total.get("s") is not None else 0
    return pa.table({"avg_yearly": pa.array([s / 700.0], pa.float64())})


Q17_SQL = f"""
WITH t AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c,
         sum(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_partkey) AS sq,
         count(*) OVER (PARTITION BY l_partkey) AS cnt
  FROM lineitem)
SELECT sum(ep_c) / 700.0 AS avg_yearly
FROM t JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}' AND 5 * q * cnt < sq
"""


# ------------- q22: well-funded customers with no recent orders

Q22_SINCE = "1999-01-01"


def q22_idle_rich_customers(sf_dir: str):
    """Customers above the average positive balance with no orders since
    a cutoff, rolled up by nation — scalar-subquery threshold plus
    anti-join.

    The global (sum, count) of positive balances reduces to two driver
    ints (a true scalar broadcast); the threshold compares
    ``bal_c · n > sum_c`` in integers so the boundary matches DuckDB
    exactly; recent orderers drop via distributed ``anti_join`` (keys
    only move); the nation rollup collapses per batch first.
    """
    from ray.data.aggregate import Sum
    from .joins import anti_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        lambda t: pd.DataFrame({
            "c_custkey": t.column("c_custkey").to_numpy(),
            "c_nationkey": t.column("c_nationkey").to_numpy(),
            "bal_c": cents(t.column("c_acctbal").to_numpy())}),
        batch_format="pyarrow")

    pos = cust.map_batches(
        lambda df: pd.DataFrame({
            "s": [int(df.loc[df["bal_c"] > 0, "bal_c"].sum())],
            "n": [int((df["bal_c"] > 0).sum())]}),
        batch_format="pandas").aggregate(Sum("s", alias_name="s"),
                                         Sum("n", alias_name="n"))
    s_c, n = int(pos["s"]), int(pos["n"])

    rich = cust.map_batches(lambda df: df[df["bal_c"] * n > s_c],
                            batch_format="pandas")
    recent = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("o_orderdate"),
                                                _ts(Q22_SINCE)))
            .select(["o_custkey"]).rename_columns(["c_custkey"]),
            batch_format="pyarrow")
    idle = anti_join(rich, recent, on="c_custkey")

    agg = idle.map_batches(
        lambda df: df.groupby("c_nationkey", as_index=False)
        .agg(numcust=("c_custkey", "size"), bal=("bal_c", "sum")),
        batch_format="pandas") \
        .groupby("c_nationkey").aggregate(Sum("numcust", alias_name="numcust"),
                                          Sum("bal", alias_name="bal")) \
        .sort("c_nationkey")
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "c_nationkey": df["c_nationkey"].values,
            "numcust": df["numcust"].values,
            "totacctbal": df["bal"].to_numpy(np.float64) / 100.0}),
        batch_format="pandas")


# ------------------------ q8: supplier-nation market share per year

Q8_TARGET_NATION = 0       # supplier nation whose share we track
Q8_REGION = "EUROPE"       # customer market


def q8_market_share(sf_dir: str):
    """The target supplier nation's share of revenue in one customer
    region, per order year — q8's grouped ratio-of-sums shape.

    Mirrors the q7 plan: lineitem ⋈ supplier collapses to per-(order,
    is-target) partials, orders attach year/custkey inside a
    ``sum_join``, a bucketed reduce re-keys to custkey, customer attaches
    its nation, and the region gate uses the 25-row nation broadcast.
    The share divides two exact integer sums once per year at the end.
    """
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from .joins import hash_join, sum_join

    nat = pq.read_table(_pq(sf_dir, "nation"),
                        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = pq.read_table(_pq(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"]).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"].iloc[0])
    region_nations = set(nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"])

    def li_rows(t: pa.Table) -> pa.Table:
        ep_c = cents(t.column("l_extendedprice").to_numpy())
        disc_c = cents(t.column("l_discount").to_numpy())
        return pa.table({"s_suppkey": t.column("l_suppkey"),
                         "o_orderkey": t.column("l_orderkey"),
                         "rev_u": pa.array(ep_c * (100 - disc_c), pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_rows, batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li_s = hash_join(li, supp, on="s_suppkey").map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].values,
            "tgt_u": np.where(df["s_nationkey"] == Q8_TARGET_NATION,
                              df["rev_u"], 0).astype(np.int64),
            "rev_u": df["rev_u"].values})
        .groupby("o_orderkey", as_index=False).sum(),
        batch_format="pandas")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_orderdate"]).map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].values,
            "c_custkey": df["o_custkey"].values,
            "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64)}),
        batch_format="pandas")
    per_cust = bucketed_group_sum(
        sum_join(li_s, orders, on="o_orderkey",
                 sum_keys=["o_orderkey"], sum_cols=["tgt_u", "rev_u"])
        .map_batches(lambda df: df[["c_custkey", "o_year", "tgt_u", "rev_u"]],
                     batch_format="pandas"),
        ["c_custkey", "o_year"], ["tgt_u", "rev_u"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = hash_join(per_cust, cust, on="c_custkey").map_batches(
        lambda df: df.loc[df["c_nationkey"].isin(region_nations),
                          ["o_year", "tgt_u", "rev_u"]],
        batch_format="pandas")

    agg = joined.groupby("o_year") \
        .aggregate(Sum("tgt_u", alias_name="t"), Sum("rev_u", alias_name="r")) \
        .sort("o_year")
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "o_year": df["o_year"].values,
            "mkt_share": np.round(df["t"].to_numpy(np.float64)
                                  / df["r"].to_numpy(np.float64), 6)}),
        batch_format="pandas")


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN s_nationkey = {Q8_TARGET_NATION}
                 THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 ELSE 0 END)
             / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))), 6)
         AS mkt_share
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q8_REGION}'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


# --------------------- q19: disjunctive-predicate join revenue

Q19_CLAUSES = (("Brand#1", 1, 15, 1, 20),
               ("Brand#2", 10, 30, 10, 35),
               ("Brand#3", 20, 50, 20, 50))


def q19_disjunctive_revenue(sf_dir: str):
    """Revenue from lineitems matching any of three (brand, size-range,
    qty-range) conjunctions — q19's OR-of-ANDs predicate join.

    The common predicate components push into both scans (part prunes to
    the three brands, ~12% of rows, before the join), the residual
    disjunction evaluates as one vectorized boolean expression per
    batch, and only two int64 cells reach the driver.
    """
    from ray.data.aggregate import Sum
    from .joins import hash_join

    brands = {c[0] for c in Q19_CLAUSES}
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]) \
        .map_batches(lambda df: df[df["p_brand"].isin(brands)],
                     batch_format="pandas")

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"]).map_batches(
        lambda t: pd.DataFrame({
            "p_partkey": t.column("l_partkey").to_numpy(),
            "qty": t.column("l_quantity").to_numpy().astype(np.int64),
            "rev_u": cents(t.column("l_extendedprice").to_numpy())
            * (100 - cents(t.column("l_discount").to_numpy()))}),
        batch_format="pyarrow")

    def residual(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.zeros(len(df), dtype=bool)
        for brand, slo, shi, qlo, qhi in Q19_CLAUSES:
            keep |= ((df["p_brand"] == brand)
                     & df["p_size"].between(slo, shi)
                     & df["qty"].between(qlo, qhi)).to_numpy()
        return pd.DataFrame({"rev_u": [int(df["rev_u"].to_numpy()[keep].sum())],
                             "n": [int(keep.sum())]})

    agg = hash_join(li, part, on="p_partkey") \
        .map_batches(residual, batch_format="pandas") \
        .aggregate(Sum("rev_u", alias_name="r"), Sum("n", alias_name="n"))
    return pa.table({
        "revenue": pa.array([agg["r"] / 10000.0], pa.float64()),
        "n_lines": pa.array([int(agg["n"])], pa.int64())})


_Q19_PRED = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
    f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_CLAUSES)

Q19_SQL = f"""
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_PRED}
"""


Q20_FAIR_MULT = 2  # dominant = supplier's share > 2x the part's fair share


def q20_dominant_suppliers(sf_dir: str):
    """Suppliers that dominate at least one part (shipped more than 2x
    the part's fair per-supplier share), with how many parts they
    dominate — q20's grouped-threshold semi-join shape. The fair-share
    form (ns·q > 2·qt, integer-exact) keeps the predicate meaningful at
    every scale factor, unlike a fixed percentage that degenerates as
    supplier count grows.

    One bucketed shuffle on partkey computes the per-(part, supplier)
    sums AND each part's total in the same group (they are co-located by
    construction), applies the integer-exact share test, and emits only
    (suppkey, 1) survivors; a second bucketed sum counts per supplier and
    the name attaches via distributed ``hash_join``.
    """
    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of, hash_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"]).map_batches(
        lambda t: pd.DataFrame({
            "p_partkey": t.column("l_partkey").to_numpy(),
            "s_suppkey": t.column("l_suppkey").to_numpy(),
            "q": t.column("l_quantity").to_numpy().astype(np.int64)})
        .groupby(["p_partkey", "s_suppkey"], as_index=False).sum(),
        batch_format="pyarrow")

    def dominant(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["p_partkey", "s_suppkey"], as_index=False)["q"].sum()
        grp = ps.groupby("p_partkey")["q"]
        qt = grp.transform("sum").to_numpy(np.int64)
        ns = grp.transform("size").to_numpy(np.int64)
        win = ps[ns * ps["q"].to_numpy(np.int64) > Q20_FAIR_MULT * qt]
        return (win.groupby("s_suppkey", as_index=False).size()
                .rename(columns={"size": "n_dominant_parts"}))

    per_supp = bucketed_group_sum(
        (li.map_batches(
            lambda df: df.assign(__bucket=_bucket_of(df["p_partkey"], 64)),
            batch_format="pandas")
         .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
         .map_groups(lambda g: dominant(g.drop(columns="__bucket")),
                     batch_format="pandas")),
        "s_suppkey", ["n_dominant_parts"])

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return hash_join(per_supp, supp, on="s_suppkey").sort("s_suppkey") \
        .map_batches(lambda df: df[["s_suppkey", "s_name",
                                    "n_dominant_parts"]],
                     batch_format="pandas")


Q20_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
agg AS (
  SELECT l_partkey, CAST(sum(q) AS BIGINT) AS qt,
         CAST(count(*) AS BIGINT) AS ns
  FROM ps GROUP BY 1)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dominant_parts
FROM ps JOIN agg USING (l_partkey)
        JOIN supplier ON s_suppkey = l_suppkey
WHERE agg.ns * ps.q > {Q20_FAIR_MULT} * agg.qt
GROUP BY s_suppkey, s_name
ORDER BY s_suppkey
"""


def q21_problem_suppliers(sf_dir: str):
    """For multi-supplier orders where exactly one supplier produced the
    returned ('R') lines, count such orders per offending supplier —
    q21's per-group multi-EXISTS shape.

    The whole EXISTS/NOT-EXISTS evaluation happens inside one bucketed
    shuffle on orderkey (all of an order's lines share a bucket):
    distinct-supplier and distinct-R-supplier counts per order reduce to
    (suppkey, 1) partials, a second bucketed sum totals them, and names
    attach via distributed ``hash_join``.
    """
    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of, hash_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_returnflag"]).map_batches(
        lambda df: df.drop_duplicates(),
        batch_format="pandas")

    def offenders(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_suppkey"]].drop_duplicates()
        ns = d.groupby("l_orderkey").size()
        r = g.loc[g["l_returnflag"] == "R",
                  ["l_orderkey", "l_suppkey"]].drop_duplicates()
        nr = r.groupby("l_orderkey").size()
        bad = r.groupby("l_orderkey")["l_suppkey"].min()
        ok = (ns.reindex(bad.index) > 1) & (nr == 1)
        return (pd.DataFrame({"s_suppkey": bad[ok].values})
                .groupby("s_suppkey", as_index=False).size()
                .rename(columns={"size": "numwait"}))

    per_supp = bucketed_group_sum(
        (li.map_batches(
            lambda df: df.assign(__bucket=_bucket_of(df["l_orderkey"], 64)),
            batch_format="pandas")
         .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
         .map_groups(lambda g: offenders(g.drop(columns="__bucket")),
                     batch_format="pandas")),
        "s_suppkey", ["numwait"])

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return hash_join(per_supp, supp, on="s_suppkey") \
        .sort(["numwait", "s_suppkey"], descending=[True, False]) \
        .map_batches(lambda df: df[["s_suppkey", "s_name", "numwait"]],
                     batch_format="pandas")


Q21_SQL = """
WITH g AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns,
         count(DISTINCT CASE WHEN l_returnflag = 'R'
                        THEN l_suppkey END) AS nr,
         min(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS bad
  FROM lineitem GROUP BY l_orderkey)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM g JOIN supplier ON s_suppkey = bad
WHERE ns > 1 AND nr = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
"""


def daily_activity_full_join(sf_dir: str):
    """Daily order revenue FULL OUTER JOIN daily event volume — the only
    join type the other modules do not exercise (days with only orders
    and days with only events must both survive with nulls).

    Each side collapses to per-day aggregates per batch, finishes in a
    bucketed shuffle, and the outer merge runs per day-bucket — correct
    globally because bucketing is on the join key. Missing-side counts
    surface as NaN (mirroring SQL NULL→float64), never as zeros.
    """
    from .joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(
            lambda df: pd.DataFrame({
                "day": df["o_orderdate"].dt.floor("D"),
                "order_cnt": np.int64(1),
                "rev_c": cents(df["o_totalprice"])})
            .groupby("day", as_index=False).sum(),
            batch_format="pandas")
    o_agg = bucketed_group_sum(orders, "day", ["order_cnt", "rev_c"])

    events = _read(sf_dir, "events", ["ts"]).map_batches(
        lambda df: pd.DataFrame({"day": df["ts"].dt.floor("D"),
                                 "event_cnt": np.int64(1)})
        .groupby("day", as_index=False).sum(),
        batch_format="pandas")
    e_agg = bucketed_group_sum(events, "day", ["event_cnt"])

    out = hash_join(o_agg, e_agg, on="day", how="outer").sort("day")
    return out.map_batches(
        lambda df: pd.DataFrame({
            "day": df["day"].values,
            "order_cnt": df["order_cnt"].to_numpy(np.float64),
            "order_revenue": df["rev_c"].to_numpy(np.float64) / 100.0,
            "event_cnt": df["event_cnt"].to_numpy(np.float64)}),
        batch_format="pandas")


DAILY_ACTIVITY_SQL = """
WITH o AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(count(*) AS BIGINT) AS order_cnt,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1),
e AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS event_cnt
  FROM events GROUP BY 1)
SELECT coalesce(o.day, e.day) AS day, o.order_cnt,
       o.rev_c / 100.0 AS order_revenue, e.event_cnt
FROM o FULL JOIN e ON o.day = e.day
ORDER BY day
"""


Q22_SQL = f"""
WITH pos AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
         count(*) AS n
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS numcust,
       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM customer, pos
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '{Q22_SINCE}')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ------------- q11: value-concentration per part for one nation's suppliers

Q11_NATION_KEY = 3   # has suppliers at every test SF (sf0.001's 10-supplier sample skips most nations)
# a part qualifies iff Q11_FRACTION_DEN * its value > the grand total
# (TPC-H q11's `> 0.0001 * total` restated as an exact integer compare;
# the denominator is scaled down because the graft tables are narrower
# than a partsupp table)
Q11_FRACTION_DEN = 2000


def q11_important_stock(sf_dir: str):
    """Parts representing an outsized share of one nation's shipped value
    — the TPC-H q11 value-concentration shape, adapted to the graft
    schema (which has no partsupp table): "stock value" is
    sum(extendedprice_cents x quantity) over lineitems shipped by that
    nation's suppliers.

    Shape: the nation's supplier keys reduce the fact table via a
    distributed ``semi_join`` (the supplier side grows with SF — never a
    broadcast); per-part values pre-aggregate per batch, then one
    bucketed shuffle; the aggregate set (one row per part) materializes
    once so the grand-total scalar and the share filter both reuse it
    without re-reading lineitem. Integer-exact threshold:
    ``DEN * value > total`` instead of ``value > total/DEN``.
    """
    from .joins import semi_join

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(
            lambda df: df.loc[df["s_nationkey"] == Q11_NATION_KEY,
                              ["s_suppkey"]]
            .rename(columns={"s_suppkey": "l_suppkey"}),
            batch_format="pandas")

    def li_rows(t: pa.Table) -> pd.DataFrame:
        ep_c = cents(t.column("l_extendedprice").to_numpy())
        qty = t.column("l_quantity").to_numpy().astype(np.int64)
        return (pd.DataFrame({"l_partkey": t.column("l_partkey").to_numpy(),
                              "value_c": ep_c * qty})
                .groupby("l_partkey", as_index=False).sum())

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
    vals = semi_join(li, sup, on="l_suppkey") \
        .map_batches(li_rows, batch_format="pyarrow")
    per_part = bucketed_group_sum(vals, "l_partkey", ["value_c"]).materialize()
    total = int(per_part.sum("value_c"))

    out = per_part.map_batches(
        lambda df: pd.DataFrame({
            "l_partkey": df.loc[Q11_FRACTION_DEN * df["value_c"] > total,
                                "l_partkey"].values,
            "stock_value": df.loc[Q11_FRACTION_DEN * df["value_c"] > total,
                                  "value_c"].to_numpy(np.float64) / 100.0}),
        batch_format="pandas")
    return out.sort(["stock_value", "l_partkey"], descending=[True, False])


Q11_SQL = f"""
WITH v AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) AS value_c
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = {Q11_NATION_KEY}
  GROUP BY l_partkey),
t AS (SELECT sum(value_c) AS total FROM v)
SELECT l_partkey, value_c / 100.0 AS stock_value
FROM v, t
WHERE {Q11_FRACTION_DEN} * value_c > t.total
ORDER BY stock_value DESC, l_partkey
"""

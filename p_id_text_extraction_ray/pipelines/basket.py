"""Market-basket association rules over order line items.

The classic co-purchase mining query (Agrawal & Srikant 1994 shape,
pair-level): for every unordered pair of parts appearing together in at
least ``MIN_PAIR_ORDERS`` orders, report support, confidence and lift —
the association-rule statistics a recommendation / assortment analysis
starts from.

Scale shape: line items shuffle ONCE keyed by a hash bucket of the
order key (all items of an order share a bucket — exact); per-group
pair generation loops only over each order's item list (TPC-H orders
hold ≤ a dozen items; a pathological >``BASKET_ITEM_CAP``-item order is
truncated to its smallest part keys, mirrored in the oracle, so pair
blowup is capped by construction); pair partials reduce via a bucketed
sum; the post-threshold pair table and the per-part order counts are
catalog-bounded, so the final statistics join runs on driver-sized
frames. No all-pairs over the catalog, nothing corpus-scale on the
driver."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

MIN_PAIR_ORDERS = 2
BASKET_ITEM_CAP = 50    # items per order entering pair generation


def order_basket_rules(sf_dir: str):
    """(part_a, part_b, n_ab, n_a, n_b, support, confidence, lift) for
    part pairs co-purchased in >= MIN_PAIR_ORDERS orders; support =
    n_ab/N_orders, confidence = n_ab/n_a (a->b), lift =
    n_ab*N/(n_a*n_b); 6 dp; ordered by (part_a, part_b)."""
    import ray.data as rd

    from ._util import bucketed_group_sum
    from .joins import _bucket_of

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_partkey"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__b=_bucket_of(df["l_orderkey"], 256))

    def group_partials(df: pd.DataFrame) -> pd.DataFrame:
        """ONE pass over each order-bucket group emits all three
        partial kinds (every order lives in exactly one group, so the
        per-group sums add up exactly): kind 0 = pair counts, kind 1 =
        per-part distinct-order counts (pb = -1), kind 2 = the group's
        distinct-order count (pa = pb = -1)."""
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        pa_, pb_ = [], []
        for _, grp in d.groupby("l_orderkey"):
            items = np.sort(grp["l_partkey"].to_numpy(np.int64))
            items = items[:BASKET_ITEM_CAP]
            k = len(items)
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, k=1)
            pa_.append(items[ii])
            pb_.append(items[jj])
        parts = []
        if pa_:
            pairs = pd.DataFrame({"pa": np.concatenate(pa_),
                                  "pb": np.concatenate(pb_)})
            pairs = pairs.groupby(["pa", "pb"], as_index=False).size() \
                .rename(columns={"size": "n"})
            parts.append(pairs.assign(kind=np.int64(0)))
        pc = d.groupby("l_partkey", as_index=False).size() \
            .rename(columns={"l_partkey": "pa", "size": "n"})
        parts.append(pc.assign(pb=np.int64(-1), kind=np.int64(1)))
        parts.append(pd.DataFrame({
            "pa": np.array([-1], np.int64), "pb": np.array([-1], np.int64),
            "n": np.array([d["l_orderkey"].nunique()], np.int64),
            "kind": np.array([2], np.int64)}))
        out = pd.concat(parts, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out[["kind", "pa", "pb", "n"]]

    agg = bucketed_group_sum(
        li.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b", num_partitions=16)
        .map_groups(group_partials, batch_format="pandas"),
        ["kind", "pa", "pb"], ["n"])
    flat = agg.map_batches(
        lambda df: df[(df["kind"] != 0) | (df["n"] >= MIN_PAIR_ORDERS)],
        batch_format="pandas").to_pandas()
    if "kind" not in flat.columns:
        flat = pd.DataFrame({"kind": pd.Series([], dtype=np.int64),
                             "pa": pd.Series([], dtype=np.int64),
                             "pb": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64)})
    part_counts = flat[flat["kind"] == 1].rename(
        columns={"pa": "l_partkey", "n": "c"})
    n_orders = int(flat.loc[flat["kind"] == 2, "n"].sum())
    pairs = flat[flat["kind"] == 0]
    if "pa" not in pairs.columns or pairs.empty:
        return pd.DataFrame({
            "part_a": pd.Series([], dtype=np.int64),
            "part_b": pd.Series([], dtype=np.int64),
            "n_ab": pd.Series([], dtype=np.int64),
            "n_a": pd.Series([], dtype=np.int64),
            "n_b": pd.Series([], dtype=np.int64),
            "support": pd.Series([], dtype=np.float64),
            "confidence": pd.Series([], dtype=np.float64),
            "lift": pd.Series([], dtype=np.float64)})
    cmap = dict(zip(part_counts["l_partkey"].to_numpy(np.int64),
                    part_counts["c"].to_numpy(np.int64)))
    n_a = pairs["pa"].map(cmap).to_numpy(np.int64)
    n_b = pairs["pb"].map(cmap).to_numpy(np.int64)
    n_ab = pairs["n"].to_numpy(np.int64)
    from ._util import round_sql
    out = pd.DataFrame({
        "part_a": pairs["pa"].to_numpy(np.int64),
        "part_b": pairs["pb"].to_numpy(np.int64),
        "n_ab": n_ab, "n_a": n_a, "n_b": n_b,
        "support": round_sql(n_ab / n_orders),
        "confidence": round_sql(n_ab / n_a),
        "lift": round_sql(n_ab.astype(np.float64) * n_orders
                          / (n_a * n_b).astype(np.float64))})
    return out.sort_values(["part_a", "part_b"], kind="mergesort") \
        .reset_index(drop=True)


ORDER_BASKET_RULES_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
capped AS (
  SELECT l_orderkey, l_partkey FROM items
  QUALIFY row_number() OVER (PARTITION BY l_orderkey
                             ORDER BY l_partkey) <= {BASKET_ITEM_CAP}),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem),
cnt AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM capped a JOIN capped b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)
SELECT part_a, part_b, n_ab, ca.c AS n_a, cb.c AS n_b,
       round(n_ab * 1.0 / n.n_orders, 6) AS support,
       round(n_ab * 1.0 / ca.c, 6) AS confidence,
       round(n_ab * 1.0 * n.n_orders / (ca.c * cb.c), 6) AS lift
FROM pairs
JOIN cnt ca ON ca.l_partkey = part_a
JOIN cnt cb ON cb.l_partkey = part_b
CROSS JOIN n
WHERE n_ab >= {MIN_PAIR_ORDERS}
ORDER BY part_a, part_b
"""

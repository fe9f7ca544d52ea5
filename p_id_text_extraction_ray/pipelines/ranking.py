"""Ranking-window operators: NTILE bucketing and DENSE_RANK.

``doc_ntile_by_lang`` assigns each document its length quartile within
its language (DuckDB's exact NTILE split: the first n%k tiles get the
extra row) and rolls up per-(lang, quartile) stats — the
stratify-by-percentile stage of a curation pipeline. ``brand_revenue_rank``
dense-ranks part brands by total revenue. Both carry exact DuckDB
oracles.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _read(sf_dir: str, name: str, columns: list[str], rows_per_block: int):
    from ._util import sized_read
    return sized_read(os.path.join(sf_dir, f"{name}.parquet"), columns,
                      rows_per_block=rows_per_block)


# ----------------------------------------- NTILE quartiles per language

NTILE_K = 4


def doc_ntile_by_lang(sf_dir: str):
    """Per-(language, length-quartile) document counts and char-length
    bounds, with DuckDB-exact NTILE semantics.

    Quartile assignment needs each language's documents in one ordered
    group, so a language-bucketed shuffle carries (lang, n_chars, doc_id)
    triples — never text — and the in-bucket assignment is a vectorized
    argsort + the closed-form NTILE split (first n%k tiles one row
    larger). The rollup emits ≤ |langs|·k rows.
    """
    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"],
                 rows_per_block=150_000)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, d in g.groupby("lang"):
            d = d.sort_values(["n_chars", "doc_id"])
            n = len(d)
            base, extra = divmod(n, NTILE_K)
            sizes = np.full(min(NTILE_K, n), base, dtype=np.int64)
            sizes[:extra] += 1
            tile = np.repeat(np.arange(1, len(sizes) + 1, dtype=np.int64),
                             sizes)
            out.append(pd.DataFrame({
                "lang": lang, "quartile": tile,
                "n_chars": d["n_chars"].to_numpy(np.int64)}))
        df = pd.concat(out) if out else pd.DataFrame(
            {"lang": pd.Series([], dtype="object"),
             "quartile": pd.Series([], dtype="int64"),
             "n_chars": pd.Series([], dtype="int64")})
        return (df.groupby(["lang", "quartile"], as_index=False)
                .agg(n_docs=("n_chars", "size"),
                     min_chars=("n_chars", "min"),
                     max_chars=("n_chars", "max")))

    return (docs.map_batches(
        lambda df: df.assign(__bucket=_bucket_of(df["lang"], 64)),
        batch_format="pandas")
        .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
        .map_groups(lambda g: assign(g.drop(columns="__bucket")),
                    batch_format="pandas")
        .sort(["lang", "quartile"]))


DOC_NTILE_SQL = f"""
WITH t AS (
  SELECT lang, n_chars,
         ntile({NTILE_K}) OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS quartile
  FROM documents)
SELECT lang, CAST(quartile AS BIGINT) AS quartile,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM t GROUP BY lang, quartile
ORDER BY lang, quartile
"""


# ------------------------------------------ DENSE_RANK brand revenue

def brand_revenue_rank(sf_dir: str):
    """Part brands dense-ranked by total lineitem revenue.

    Brand cardinality is fixed (25), so the heavy work is the revenue
    rollup: lineitem partials pre-reduce per batch inside the part
    ``sum_join``'s shuffle, brands collapse to one row each, and the
    dense rank over ≤25 rows computes in the final (driver-sized) batch.
    """
    from ._util import bucketed_group_sum, cents, collect_with_schema
    from .joins import sum_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"],
               rows_per_block=150_000).map_batches(
        lambda t: pd.DataFrame({
            "p_partkey": t.column("l_partkey").to_numpy(),
            "rev_u": cents(t.column("l_extendedprice").to_numpy())
            * (100 - cents(t.column("l_discount").to_numpy()))})
        .groupby("p_partkey", as_index=False).sum(),
        batch_format="pyarrow")

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"],
                 rows_per_block=150_000)
    per_brand = bucketed_group_sum(
        sum_join(li, part, on="p_partkey",
                 sum_keys=["p_partkey"], sum_cols=["rev_u"])
        .map_batches(lambda df: df[["p_brand", "rev_u"]],
                     batch_format="pandas"),
        "p_brand", ["rev_u"])

    small = collect_with_schema(per_brand, pa.schema(
        [("p_brand", pa.string()), ("rev_u", pa.int64())]))
    small = small.sort_values(["rev_u", "p_brand"],
                              ascending=[False, True]).reset_index(drop=True)
    rank = small["rev_u"].rank(method="dense", ascending=False) \
        .astype(np.int64)
    return pd.DataFrame({
        "p_brand": small["p_brand"].values,
        "revenue": small["rev_u"].to_numpy(np.float64) / 10000.0,
        "rev_rank": rank.values})


BRAND_REVENUE_RANK_SQL = """
WITH b AS (
  SELECT p_brand,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_u
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_brand)
SELECT p_brand, rev_u / 10000.0 AS revenue,
       CAST(dense_rank() OVER (ORDER BY rev_u DESC) AS BIGINT) AS rev_rank
FROM b
ORDER BY rev_rank, p_brand
"""


# ------------------------------------- percent_rank / cume_dist windows

def events_value_percentile(sf_dir: str):
    """(event_id, user_id, value, pct_rank, cume_dist): each event's
    relative standing among the SAME user's event values —
    PERCENT_RANK() = (min-rank-of-peers - 1)/(n - 1) (0 for a single-row
    partition) and CUME_DIST() = rows-at-or-below/n. Users are hash-
    bucketed; within a bucket both statistics fall out of one sort +
    two vectorized peer-group transforms. Both divisions are exact-int
    numerator/denominator pairs, so the floats are bit-identical to the
    window-function oracle."""
    from ._util import user_bucket
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"],
               rows_per_block=150_000)

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "value"], kind="mergesort",
                            na_position="last")
        pos = df.groupby("user_id", dropna=False).cumcount().to_numpy() + 1
        first = pd.Series(pos, index=df.index).groupby(
            [df["user_id"], df["value"]], dropna=False).transform("min") \
            .to_numpy(dtype=np.int64)
        last = pd.Series(pos, index=df.index).groupby(
            [df["user_id"], df["value"]], dropna=False).transform("max") \
            .to_numpy(dtype=np.int64)
        n = df.groupby("user_id", dropna=False)["value"] \
            .transform("size").to_numpy(dtype=np.int64)
        pct = np.where(n > 1, (first - 1) / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "value": df["value"].to_numpy(),
            "pct_rank": pct,
            "cume_dist": last / n})

    return (ev.map_batches(user_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(ranks, batch_format="pandas"))


EVENTS_VALUE_PERCENTILE_SQL = """
SELECT event_id, user_id, value,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume_dist
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value)
"""

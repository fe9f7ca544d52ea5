"""Ordered-window and semi-structured analytics operators.

* inter-arrival stats   — LAG()-based per-entity gap features: users are
                          hash-bucketed, each bucket sorts once and
                          diffs timestamps vectorized (exact integer
                          microseconds), so the shuffle moves each event
                          exactly once and no per-user Python runs.
* cumulative revenue    — a running total over day-level aggregates. The
                          distributed part reduces fact rows to one
                          partial per (batch, day); the prefix sum runs
                          over the day table, whose cardinality is the
                          date range — independent of fact-table size —
                          in a single final block.
* event paths           — ordered string_agg per user (the session-path
                          feature): bucketed sort + one per-group join.
* JSON props extraction — typed field pulled out of a JSON string column
                          with one compiled regex per batch (the props
                          are machine-written ``{"k": int}``; a regex is
                          exact here and ~20× cheaper than a JSON parse
                          per row), then a standard grouped aggregate.

All money/time math is exact-integer until one final division that
mirrors the DuckDB oracle's operand order (see relational.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import cents, sized_read


def _read(sf_dir: str, name: str, columns: list[str]):
    return sized_read(os.path.join(sf_dir, f"{name}.parquet"), columns,
                      rows_per_block=150_000)


def _user_bucket(df: pd.DataFrame, col: str = "user_id",
                 n: int = 64) -> pd.DataFrame:
    k = df[col].to_numpy(dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        b = (k * np.uint64(2654435761)) % np.uint64(n)
    return df.assign(bucket=b.astype(np.int64))


# -------------------------------------------------- inter-arrival stats

def events_interarrival(sf_dir: str):
    """Per-user inter-event-gap statistics (count / mean / max seconds),
    the LAG(ts)-difference feature. Gaps are computed as exact int64
    microseconds inside each user bucket; only per-user aggregate rows
    leave the bucket."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        d = df.groupby("user_id")["ts"].diff()
        keep = d.notna().to_numpy()     # first event per user has no gap
        gap = d.to_numpy(dtype="timedelta64[us]").astype(np.int64)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy()[keep],
                          "gap_us": gap[keep]})
        a = g.groupby("user_id", as_index=False).agg(
            n_gaps=("gap_us", "size"), sum_us=("gap_us", "sum"),
            max_us=("gap_us", "max"))
        return pd.DataFrame({
            "user_id": a["user_id"].values,
            "n_gaps": a["n_gaps"].to_numpy(dtype=np.int64),
            "avg_gap_s": np.round(a["sum_us"].values / a["n_gaps"].values
                                  / 1_000_000.0, 6),
            "max_gap_s": a["max_us"].values / 1_000_000.0})

    return (ev.map_batches(_user_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(gaps, batch_format="pandas"))


EVENTS_INTERARRIVAL_SQL = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id), ts) AS gap_us
  FROM events)
SELECT user_id,
       count(gap_us)                                     AS n_gaps,
       round(sum(gap_us) / count(gap_us) / 1000000.0, 6) AS avg_gap_s,
       max(gap_us) / 1000000.0                           AS max_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------- cumulative daily revenue

def orders_cumulative_revenue(sf_dir: str):
    """Daily order revenue plus its running total.

    Fact rows collapse to per-(batch, day) partials before the shuffle;
    the grouped day table (cardinality = #days in the date range, NOT a
    function of row count) is then repartitioned to one block where the
    prefix sum runs vectorized. At 100 TB the day table is still a few
    thousand rows, so the single-block scan is not a bottleneck; a
    longer-range variant would scan per-partition subtotals the same way.
    """

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["o_orderdate"].dt.floor("D")
        g = pd.DataFrame({"day": day.values,
                          "rev_c": cents(df["o_totalprice"])}) \
            .groupby("day", as_index=False)["rev_c"].sum()
        return g

    # bucketed pandas reduce — Ray's native aggregate pays per-group
    # overhead (~1.7 ms/group/suboperator) at ~2.4k day groups
    from ._util import bucketed_group_sum
    daily = bucketed_group_sum(
        orders.map_batches(partial, batch_format="pandas"),
        "day", ["rev_c"])

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", kind="mergesort")
        c = df["rev_c"].to_numpy(dtype=np.int64).cumsum()
        return pd.DataFrame({"day": df["day"].values,
                             "day_rev": df["rev_c"].values / 100.0,
                             "cum_rev": c / 100.0})

    return daily.repartition(1).map_batches(running, batch_format="pandas",
                                            batch_size=None)


ORDERS_CUMULATIVE_REVENUE_SQL = """
WITH d AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1)
SELECT day,
       rev_c / 100.0 AS day_rev,
       CAST(sum(rev_c) OVER (ORDER BY day) AS BIGINT) / 100.0 AS cum_rev
FROM d
"""


# ------------------------------------------------------ user event paths

def user_event_paths(sf_dir: str):
    """Ordered event-type path per user (``a>b>c`` in (ts, event_id)
    order) — the clickstream/session-path feature. Bucketed by user so
    each bucket sorts once; the only per-group step is the string join
    itself (no vectorized kernel exists for ordered concat)."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id")["event_type"]
        out = g.agg(">".join).reset_index()
        out.columns = ["user_id", "path"]
        out["n_events"] = g.size().to_numpy(dtype=np.int64)
        return out[["user_id", "n_events", "path"]]

    return (ev.map_batches(_user_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(paths, batch_format="pandas"))


USER_EVENT_PATHS_SQL = """
SELECT user_id,
       count(*) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id
"""


# ------------------------------------------------- JSON props extraction

import re

_PROPS_K = re.compile(r'"k"\s*:\s*(-?\d+)')


def events_props_stats(sf_dir: str):
    """Grouped aggregate over a field extracted from the JSON ``props``
    column — the semi-structured-projection operator. One compiled regex
    per batch via pandas' vectorized ``str.extract`` (exact for the
    machine-written ``{"k": int}`` payloads), partials per (batch,
    event_type), tiny final shuffle."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(_PROPS_K, expand=False) \
            .astype(np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].values, "k": k.values}) \
            .groupby("event_type", as_index=False) \
            .agg(n_events=("k", "size"), sum_k=("k", "sum"))
        return g

    agg = ev.map_batches(partial, batch_format="pandas") \
        .groupby("event_type") \
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_k", alias_name="sum_k"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"].values,
            "n_events": df["n_events"].to_numpy(dtype=np.int64),
            "sum_k": df["sum_k"].to_numpy(dtype=np.int64),
            "avg_k": np.round(df["sum_k"].values / df["n_events"].values, 6)})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_PROPS_STATS_SQL = """
WITH e AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       count(*)                         AS n_events,
       CAST(sum(k) AS BIGINT)           AS sum_k,
       round(sum(k) / count(*), 6)      AS avg_k
FROM e GROUP BY event_type
"""


# ------------------------------------------------------ funnel analysis

def events_funnel(sf_dir: str):
    """signup→purchase conversion funnel: of the users who ever signed
    up, how many later purchased. One bucketed shuffle carries per-user
    (first-signup, last-purchase) partials — min/max combine across
    batches, so each event row is reduced before the all-to-all — and
    three integers reach the driver."""
    from ray.data.aggregate import Max, Min, Sum

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[df["event_type"] == "signup"].groupby("user_id")["ts"].min()
        p = df[df["event_type"] == "purchase"].groupby("user_id")["ts"].max()
        out = pd.concat([s.rename("first_signup"), p.rename("last_purchase")],
                        axis=1).reset_index()
        return out

    per_user = ev.map_batches(partial, batch_format="pandas") \
        .groupby("user_id") \
        .aggregate(Min("first_signup", alias_name="first_signup",
                       ignore_nulls=True),
                   Max("last_purchase", alias_name="last_purchase",
                       ignore_nulls=True))

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        signed = df["first_signup"].notna()
        conv = signed & df["last_purchase"].notna() \
            & (df["last_purchase"] > df["first_signup"])
        return pd.DataFrame({"n_signup_users": [int(signed.sum())],
                             "n_converted": [int(conv.sum())]})

    agg = per_user.map_batches(count_partial, batch_format="pandas") \
        .aggregate(Sum("n_signup_users", alias_name="s"),
                   Sum("n_converted", alias_name="c"))
    # empty/zero-signup corpus: Ray's Sum yields None on no rows; the SQL
    # oracle still emits one row with NULL pct (DuckDB x/0 -> NULL)
    s = agg["s"] or 0
    c = agg["c"] or 0
    return pd.DataFrame({
        "n_signup_users": pd.Series([s], dtype="int64"),
        "n_converted": pd.Series([c], dtype="int64"),
        "conversion_pct": [round(100.0 * c / s, 6) if s else None]})


EVENTS_FUNNEL_SQL = """
WITH s AS (SELECT user_id, min(ts) AS first_signup
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT user_id, max(ts) AS last_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT count(*) AS n_signup_users,
       count(CASE WHEN last_purchase > first_signup THEN 1 END)
         AS n_converted,
       round(100.0 * count(CASE WHEN last_purchase > first_signup THEN 1 END)
             / count(*), 6) AS conversion_pct
FROM s LEFT JOIN p USING (user_id)
"""


# ------------------------------------- left join with zero-fill rollup

def customer_order_totals(sf_dir: str):
    """Per-customer order count and lifetime spend INCLUDING customers
    with no orders (left-outer semantics): order partials pre-reduce per
    custkey inside the join's shuffle; unmatched customers zero-fill."""
    from .joins import sum_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c_custkey": df["o_custkey"].values,
                             "n_orders": np.ones(len(df), dtype=np.int64),
                             "sp_c": cents(df["o_totalprice"])})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = sum_join(orders.map_batches(o_rows, batch_format="pandas"),
                      cust, on="c_custkey", sum_cols=["n_orders", "sp_c"],
                      how="right")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_orders"].fillna(0).to_numpy(dtype=np.int64)
        sp = df["sp_c"].fillna(0).to_numpy(dtype=np.int64)
        return pd.DataFrame({"c_custkey": df["c_custkey"].values,
                             "c_mktsegment": df["c_mktsegment"].values,
                             "n_orders": n,
                             "total_spent": sp / 100.0})

    return joined.map_batches(finish, batch_format="pandas")


CUSTOMER_ORDER_TOTALS_SQL = """
SELECT c_custkey, c_mktsegment,
       count(o_custkey) AS n_orders,
       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) / 100.0 AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


# ----------------------------------------------------- value histogram

HIST_BIN_WIDTH = 50.0


def events_value_histogram(sf_dir: str):
    """Fixed-width histogram of event value (count + exact-cents sum per
    bin): per-batch vectorized binning and partial aggregation, then a
    tiny per-bin shuffle — the profiling scan that sizes downstream
    quantile/outlier work."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        b = np.floor(v / HIST_BIN_WIDTH).astype(np.int64)
        g = pd.DataFrame({"bin": b, "n": np.ones(len(b), dtype=np.int64),
                          "sum_c": cents(v)}) \
            .groupby("bin", as_index=False).sum()
        return g

    agg = ev.map_batches(partial, batch_format="pandas") \
        .groupby("bin").aggregate(Sum("n", alias_name="n_events"),
                                  Sum("sum_c", alias_name="sum_c"))
    return agg.map_batches(
        lambda df: pd.DataFrame({
            "bin": df["bin"].to_numpy(dtype=np.int64),
            "lo": df["bin"].to_numpy(dtype=np.float64) * HIST_BIN_WIDTH,
            "n_events": df["n_events"].to_numpy(dtype=np.int64),
            "bin_sum": df["sum_c"].to_numpy(dtype=np.int64) / 100.0}),
        batch_format="pandas")


EVENTS_VALUE_HISTOGRAM_SQL = f"""
WITH b AS (
  SELECT CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin, value
  FROM events)
SELECT bin,
       CAST(bin AS DOUBLE) * {HIST_BIN_WIDTH} AS lo,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS bin_sum
FROM b GROUP BY bin
"""


# ------------------------------------- exact-integer Pearson correlation

def discount_quantity_corr(sf_dir: str):
    """Pearson correlation of l_discount vs l_quantity from exact
    integer moment sums: the five sufficient statistics accumulate as
    int64 partials per batch (products are bounded — discount-cents
    ≤ 1000, quantity ≤ 50 — so the global sums stay in int64 to ~10^12
    rows), and the final normalized products run in Python arbitrary-
    precision ints on the driver, so the result is bit-identical to the
    oracle's HUGEINT math at any scale."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_discount", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = cents(df["l_discount"])                       # 0..1000
        y = np.rint(df["l_quantity"].to_numpy(dtype=np.float64)) \
            .astype(np.int64)                             # 1..50
        return pd.DataFrame({
            "n": [len(df)], "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxy": [int((x * y).sum())], "sxx": [int((x * x).sum())],
            "syy": [int((y * y).sum())]})

    a = li.map_batches(partial, batch_format="pandas") \
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
                   Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"))
    n, sx, sy = int(a["n"]), int(a["sx"]), int(a["sy"])
    sxy, sxx, syy = int(a["sxy"]), int(a["sxx"]), int(a["syy"])
    import math
    r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx)
                                        * (n * syy - sy * sy))
    return pd.DataFrame({"pearson_r": [round(r, 6)]})


DISCOUNT_QUANTITY_CORR_SQL = """
WITH m AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
         CAST(round(l_quantity) AS BIGINT)       AS y
  FROM lineitem),
s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      FROM m)
SELECT round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
       AS pearson_r
FROM s
"""


# ------------------------------------------------ grouped mode (argmax)

def user_mode_event_type(sf_dir: str):
    """(user_id, mode_type, n_mode): each user's most frequent event
    type, ties broken by lexicographically smallest type — the grouped
    MODE/argmax-by-count feature. Batches pre-collapse to (user, type)
    partial counts, the bucket shuffle reduces them exactly, and the
    argmax is one vectorized sort + head per bucket."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["user_id", "event_type"], as_index=False) \
            .size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        df = df.sort_values(["user_id", "n", "event_type"],
                            ascending=[True, False, True], kind="mergesort")
        top = df.groupby("user_id", as_index=False).head(1)
        return pd.DataFrame({
            "user_id": top["user_id"].to_numpy(),
            "mode_type": top["event_type"].to_numpy(),
            "n_mode": top["n"].to_numpy(dtype=np.int64)})

    return (ev.map_batches(partial, batch_format="pandas")
            .map_batches(_user_bucket, batch_format="pandas")
            .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(argmax, batch_format="pandas"))


USER_MODE_EVENT_TYPE_SQL = """
WITH c AS (SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY user_id, event_type)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n_mode
FROM c
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) = 1
"""


# --------------------------------------- Spearman via joint histogram

def discount_quantity_spearman(sf_dir: str):
    """Spearman (rank) correlation of l_discount vs l_quantity. A global
    rank normally needs a full sort, but both columns are low-cardinality
    (11 discounts × 50 quantities), so average ranks are derivable from
    the JOINT HISTOGRAM: each batch emits per-cell counts (≤ 550 rows),
    one tiny shuffle reduces them, and the driver computes tied average
    ranks and the rank-Pearson in doubled-rank INTEGER units — every
    moment sum is an exact Python bigint, so the final expression is
    bit-identical to the oracle's HUGEINT math at any scale."""
    import math

    li = _read(sf_dir, "lineitem", ["l_discount", "l_quantity"])

    def cell_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "x": cents(df["l_discount"]),
            "y": np.rint(df["l_quantity"].to_numpy(dtype=np.float64))
                 .astype(np.int64)})
        out = g.groupby(["x", "y"], as_index=False).size() \
            .rename(columns={"size": "w"})
        out["w"] = out["w"].astype(np.int64)
        return out

    from ._util import bucketed_group_sum
    cells = bucketed_group_sum(
        li.map_batches(cell_counts, batch_format="pandas"),
        ["x", "y"], ["w"]).to_pandas()
    n = 0 if cells.empty else int(cells["w"].sum())
    if n == 0:
        # SQL aggregates over zero rows still emit one row (NULL, 0)
        return pd.DataFrame({"spearman_r": [np.nan], "n": [np.int64(0)]})

    def dbl_ranks(margin: pd.Series) -> dict[int, int]:
        """value -> doubled average rank (2*rank is integral with ties):
        2*avg_rank = 2*(#smaller) + cnt + 1."""
        m = margin.sort_index()
        before = np.concatenate(([0], np.cumsum(m.to_numpy())))[:-1]
        return {int(v): int(2 * b + c + 1)
                for v, b, c in zip(m.index, before, m.to_numpy())}

    rx = dbl_ranks(cells.groupby("x")["w"].sum())
    ry = dbl_ranks(cells.groupby("y")["w"].sum())
    sx = sy = sxy = sxx = syy = 0
    for x, y, w in zip(cells["x"], cells["y"], cells["w"]):
        ax, ay, w = rx[int(x)], ry[int(y)], int(w)
        sx += w * ax; sy += w * ay; sxy += w * ax * ay
        sxx += w * ax * ax; syy += w * ay * ay
    num = n * sxy - sx * sy
    # each variance term fits a 128-bit int but their PRODUCT does not:
    # cast each to double first, exactly as the oracle does
    den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    r = float(num) / den if den else float("nan")
    return pd.DataFrame({"spearman_r": [r], "n": [np.int64(n)]})


DISCOUNT_QUANTITY_SPEARMAN_SQL = """
WITH t AS (SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
                  CAST(round(l_quantity) AS BIGINT)       AS y
           FROM lineitem),
r AS (SELECT CAST(2 * rank() OVER (ORDER BY x)
               + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
             CAST(2 * rank() OVER (ORDER BY y)
               + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
      FROM t),
s AS (SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
             sum(rx*ry) AS sxy, sum(rx*rx) AS sxx, sum(ry*ry) AS syy
      FROM r)
SELECT CAST(n*sxy - sx*sy AS DOUBLE)
         / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
         AS spearman_r,
       CAST(n AS BIGINT) AS n
FROM s
"""


# ---------------------------------------------------- funnel latency

def funnel_latency(sf_dir: str):
    """Time from first signup to the first purchase AFTER it: converted-
    user count, mean and max latency seconds. Each user bucket holds all
    of that user's events, so first-signup / first-qualifying-purchase
    resolve vectorized inside the bucket; constant-size (n, sum, max)
    partials are all that reach the final reduce."""
    from ray.data.aggregate import Max, Sum
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    ev = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def bucket_latency(df: pd.DataFrame) -> pd.DataFrame:
        fs = df[df["event_type"] == "signup"].groupby("user_id")["ts"].min()
        p = df[df["event_type"] == "purchase"][["user_id", "ts"]].merge(
            fs.rename("fs"), left_on="user_id", right_index=True)
        p = p[p["ts"] > p["fs"]]
        if not len(p):
            return pd.DataFrame({"n": np.array([0], np.int64),
                                 "sum_us": np.array([0], np.int64),
                                 "max_us": np.array([0], np.int64)})
        fp = p.groupby("user_id").agg(fp=("ts", "min"), fs=("fs", "first"))
        lat = (fp["fp"] - fp["fs"]).to_numpy(dtype="timedelta64[us]") \
            .astype(np.int64)
        return pd.DataFrame({"n": np.array([len(lat)], np.int64),
                             "sum_us": np.array([int(lat.sum())], np.int64),
                             "max_us": np.array([int(lat.max())], np.int64)})

    agg = (ev.map_batches(_user_bucket, batch_format="pandas")
           .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
           .map_groups(bucket_latency, batch_format="pandas")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_us", alias_name="sum_us"),
                      Max("max_us", alias_name="max_us")))
    n = int(agg["n"])
    return pd.DataFrame({
        "n_converted": pd.Series([n], dtype="int64"),
        "avg_latency_s": [round(agg["sum_us"] / n / 1_000_000.0, 6)],
        "max_latency_s": [agg["max_us"] / 1_000_000.0]})


FUNNEL_LATENCY_SQL = """
WITH s AS (SELECT user_id, min(ts) AS fs
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id, min(e.ts) AS fp
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.fs
      GROUP BY e.user_id),
lat AS (SELECT date_diff('microsecond', fs, fp) AS us
        FROM s JOIN p USING (user_id))
SELECT count(*) AS n_converted,
       round(sum(us) / count(*) / 1000000.0, 6) AS avg_latency_s,
       max(us) / 1000000.0 AS max_latency_s
FROM lat
"""


# ------------------------------------------------- rollup grouping sets

def segment_priority_rollup(sf_dir: str):
    """GROUP BY ROLLUP(segment, priority): base cells plus per-segment
    subtotals plus a grand total. The fact side reduces to per-custkey
    partials inside the customer join's shuffle; the (5 × 5)-cell base
    cube is scale-independent, so the subtotal levels derive from it in
    one final block — the rollup costs nothing beyond the base
    aggregate."""
    from ray.data.aggregate import Sum
    from .joins import sum_join

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderpriority", "o_totalprice"])

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c_custkey": df["o_custkey"].values,
                             "priority": df["o_orderpriority"].values,
                             "n_orders": np.ones(len(df), dtype=np.int64),
                             "rev_c": cents(df["o_totalprice"])})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = sum_join(orders.map_batches(o_rows, batch_format="pandas"),
                      cust, on="c_custkey",
                      sum_keys=["c_custkey", "priority"],
                      sum_cols=["n_orders", "rev_c"])

    base = joined.map_batches(
        lambda df: df.groupby(["c_mktsegment", "priority"], as_index=False)
        [["n_orders", "rev_c"]].sum().rename(columns={"c_mktsegment": "segment"}),
        batch_format="pandas") \
        .groupby(["segment", "priority"]) \
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("rev_c", alias_name="rev_c"))

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        seg = df.groupby("segment", as_index=False)[["n_orders", "rev_c"]] \
            .sum().assign(priority="ALL")
        total = pd.DataFrame({"segment": ["ALL"], "priority": ["ALL"],
                              "n_orders": [df["n_orders"].sum()],
                              "rev_c": [df["rev_c"].sum()]})
        out = pd.concat([df, seg, total], ignore_index=True)
        return pd.DataFrame({"segment": out["segment"].values,
                             "priority": out["priority"].values,
                             "n_orders": out["n_orders"].to_numpy(np.int64),
                             "revenue": out["rev_c"].to_numpy(np.int64) / 100.0})

    return base.repartition(1).map_batches(rollup, batch_format="pandas",
                                           batch_size=None)


SEGMENT_PRIORITY_ROLLUP_SQL = """
SELECT coalesce(c_mktsegment, 'ALL')   AS segment,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
"""


# --------------------------------------------------- retention cohorts

def retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users cohorted by first-activity day,
    distinct active users per (cohort_day, day_offset). Each user bucket
    derives first-activity and per-day activity vectorized; the bucket
    emits DISTINCT (cohort_day, offset, user) rows — global distinctness
    is free because a user lives in exactly one bucket — and the final
    shuffle carries one count partial per cohort cell."""
    from ._util import bucketed_group_sum

    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def cohort_rows(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.floor("D")
        first = day.groupby(df["user_id"]).transform("min")
        off = (day - first).dt.days.to_numpy(dtype=np.int64)
        out = pd.DataFrame({"cohort_day": first.values,
                            "day_offset": off,
                            "user_id": df["user_id"].values}) \
            .drop_duplicates()
        return pd.DataFrame({"cohort_day": out["cohort_day"].values,
                             "day_offset": out["day_offset"].values,
                             "n_active": np.ones(len(out), dtype=np.int64)})

    return bucketed_group_sum(
        (ev.map_batches(_user_bucket, batch_format="pandas")
         .groupby("bucket", num_partitions=16)
         .map_groups(cohort_rows, batch_format="pandas")),
        ["cohort_day", "day_offset"], ["n_active"])


RETENTION_COHORTS_SQL = """
WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
           FROM events GROUP BY user_id)
SELECT cohort_day,
       date_diff('day', cohort_day, date_trunc('day', e.ts)) AS day_offset,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
"""


# ------------------------------------- gap-filled hourly densification

def events_hourly_gapfill(sf_dir: str):
    """Per-(event type, hour) counts with ZERO rows for every hour in the
    global [min, max] range that saw no events — the densification pass a
    time-series store runs before windowed models (missing ≠ absent).

    The distributed side reduces to per-(type, hour) partials per batch
    plus two timestamp scalars; the dense grid (|types| × |hours|, a
    fixed-size frame independent of event volume) is then built and
    zero-filled driver-side from those aggregates.
    """
    from ._util import bucketed_group_sum

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (pd.DataFrame({"event_type": df["event_type"].values,
                             "hour": df["ts"].dt.floor("h")})
               .groupby(["event_type", "hour"], as_index=False).size()
               .rename(columns={"size": "n_events"}))
        return out

    counts = bucketed_group_sum(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour"], ["n_events"]).to_pandas()

    if not len(counts):   # empty input shard: empty grid, like the oracle
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "hour": pd.Series([], dtype="datetime64[us]"),
                             "n_events": pd.Series([], dtype="int64")})
    lo, hi = counts["hour"].min(), counts["hour"].max()
    hours = pd.date_range(lo, hi, freq="h")
    types = sorted(counts["event_type"].unique())
    grid = pd.MultiIndex.from_product([types, hours],
                                      names=["event_type", "hour"]) \
        .to_frame(index=False)
    out = grid.merge(counts, on=["event_type", "hour"], how="left")
    out["n_events"] = out["n_events"].fillna(0).astype(np.int64)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


EVENTS_HOURLY_GAPFILL_SQL = """
WITH b AS (
  SELECT min(date_trunc('hour', ts)) AS lo,
         max(date_trunc('hour', ts)) AS hi
  FROM events),
grid AS (
  SELECT t.event_type, h.hour
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
              FROM b) h),
c AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2)
SELECT g.event_type, g.hour, coalesce(c.n_events, 0) AS n_events
FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour
ORDER BY g.event_type, g.hour
"""


# --------------------------------------------- CUBE grouping sets

def segment_status_cube(sf_dir: str):
    """GROUP BY CUBE(segment, order status): base cells plus BOTH
    one-dimension subtotal levels plus the grand total — the full
    grouping-sets lattice (ROLLUP only emits one subtotal chain).

    Same plan as the rollup: the fact side reduces per custkey inside
    the customer join's shuffle, the scale-independent base cube
    finishes distributed, and all four grouping sets derive from it in
    one final block.
    """
    from ray.data.aggregate import Sum
    from .joins import sum_join

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderstatus", "o_totalprice"])

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c_custkey": df["o_custkey"].values,
                             "status": df["o_orderstatus"].values,
                             "n_orders": np.ones(len(df), dtype=np.int64),
                             "rev_c": cents(df["o_totalprice"])})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = sum_join(orders.map_batches(o_rows, batch_format="pandas"),
                      cust, on="c_custkey",
                      sum_keys=["c_custkey", "status"],
                      sum_cols=["n_orders", "rev_c"])

    base = joined.map_batches(
        lambda df: df.groupby(["c_mktsegment", "status"], as_index=False)
        [["n_orders", "rev_c"]].sum()
        .rename(columns={"c_mktsegment": "segment"}),
        batch_format="pandas") \
        .groupby(["segment", "status"]) \
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("rev_c", alias_name="rev_c"))

    def cube(df: pd.DataFrame) -> pd.DataFrame:
        seg = df.groupby("segment", as_index=False)[["n_orders", "rev_c"]] \
            .sum().assign(status="ALL")
        st = df.groupby("status", as_index=False)[["n_orders", "rev_c"]] \
            .sum().assign(segment="ALL")
        total = pd.DataFrame({"segment": ["ALL"], "status": ["ALL"],
                              "n_orders": [df["n_orders"].sum()],
                              "rev_c": [df["rev_c"].sum()]})
        out = pd.concat([df, seg, st, total], ignore_index=True)
        return pd.DataFrame({"segment": out["segment"].values,
                             "status": out["status"].values,
                             "n_orders": out["n_orders"].to_numpy(np.int64),
                             "revenue": out["rev_c"].to_numpy(np.int64) / 100.0})

    return base.repartition(1).map_batches(cube, batch_format="pandas",
                                           batch_size=None)


SEGMENT_STATUS_CUBE_SQL = """
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY CUBE (c_mktsegment, o_orderstatus)
"""


# ------------------------------------------- grouped OLS regression

def price_quantity_regression(sf_dir: str):
    """Per-returnflag ordinary-least-squares fit of extended price
    (cents) against quantity: (l_returnflag, n_rows, slope_cents,
    intercept_cents). Sufficient statistics (n, Σx, Σy, Σxy, Σxx)
    accumulate as exact int64 partials inside each batch — per-row
    products are bounded (x ≤ 50, y ≤ ~10^7 cents ⇒ xy ≤ 5·10^8, xx ≤
    2500), so the global sums hold to ~10^9 rows per group — and the
    closed-form slope/intercept run once on the ≤|flags| reduced rows.
    Final arithmetic converts the exact integer moments through float64
    in the same operand order as the oracle's HUGEINT→DOUBLE casts, so
    the rounded result is bit-identical."""
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(df["l_quantity"].to_numpy(dtype=np.float64)) \
            .astype(np.int64)
        y = cents(df["l_extendedprice"])
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"].values,
                          "n": np.ones(len(df), dtype=np.int64),
                          "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        return g.groupby("l_returnflag", as_index=False).sum()

    from ray.data.aggregate import Sum
    agg = (li.map_batches(partial, batch_format="pandas")
           .groupby("l_returnflag")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"))
           .to_pandas())

    rows = []
    for r in agg.itertuples(index=False):
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        sxy, sxx = int(r.sxy), int(r.sxx)
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        rows.append((r.l_returnflag, n, round(slope, 6),
                     round(intercept, 6)))
    out = pd.DataFrame(rows, columns=["l_returnflag", "n_rows",
                                      "slope_cents", "intercept_cents"])
    return out.sort_values("l_returnflag", kind="mergesort") \
        .reset_index(drop=True)


PRICE_QUANTITY_REGRESSION_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT)            AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem),
s AS (SELECT l_returnflag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x*y) AS sxy, sum(x*x) AS sxx
      FROM m GROUP BY l_returnflag)
SELECT l_returnflag, n AS n_rows,
       round(CAST(n*sxy - sx*sy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope_cents,
       round((CAST(sy AS DOUBLE)
              - (CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept_cents
FROM s ORDER BY l_returnflag
"""


def events_trimmed_mean(sf_dir: str) -> pd.DataFrame:
    """(event_type, lo, hi, n_kept, trimmed_mean) — robust per-type
    value aggregate: percentile_disc(0.05/0.95) bounds, then the exact
    mean of the values inside [lo, hi] (the winsorize-free trimmed mean
    an outlier-robust profiling pass reports).

    Scale shape: values are 2-decimal, so the distributed part reduces
    to an exact (event_type, value-cents) histogram — per-batch counts,
    one bucketed sum; the shuffle carries one row per DISTINCT
    (type, cents) pair per batch, bounded by the value GRID (types ×
    ~56k cents), independent of row count. Quantile ranks and the
    trimmed sum are read off per-type cumulative counts on the driver
    (grid-sized frame). Same exactness argument as
    ``textstats.doc_length_quantiles``; rank rule matches DuckDB
    ``quantile_disc`` (first value with cumulative count >=
    max(1, ceil(q*n)))."""
    from ._util import bucketed_group_sum

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"event_type": df["event_type"].values,
                          "v_c": cents(df["value"]),
                          "cnt": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["event_type", "v_c"], as_index=False).sum()

    from ._util import collect_with_schema
    hist = collect_with_schema(
        bucketed_group_sum(ev.map_batches(partial, batch_format="pandas"),
                           ["event_type", "v_c"], ["cnt"]),
        pa.schema([("event_type", pa.string()), ("v_c", pa.int64()),
                   ("cnt", pa.int64())])) \
        .sort_values(["event_type", "v_c"], kind="mergesort")

    out = []
    for etype, g in hist.groupby("event_type", sort=True):
        v = g["v_c"].to_numpy()
        c = g["cnt"].to_numpy()
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = v[np.searchsorted(cum, max(1, int(np.ceil(0.05 * n))))]
        hi = v[np.searchsorted(cum, max(1, int(np.ceil(0.95 * n))))]
        keep = (v >= lo) & (v <= hi)
        n_kept = int(c[keep].sum())
        sum_c = int((v[keep] * c[keep]).sum())
        out.append({"event_type": etype, "lo": lo / 100.0, "hi": hi / 100.0,
                    "n_kept": n_kept,
                    # operand order mirrors the oracle: cents / 100.0 / n
                    "trimmed_mean": sum_c / 100.0 / n_kept})
    return pd.DataFrame(out, columns=["event_type", "lo", "hi", "n_kept",
                                      "trimmed_mean"])


EVENTS_TRIMMED_MEAN_SQL = """
WITH q AS (
  SELECT event_type,
         quantile_disc(value, 0.05) AS lo,
         quantile_disc(value, 0.95) AS hi
  FROM events GROUP BY event_type),
a AS (
  SELECT e.event_type,
         count(*) AS n_kept,
         sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 / count(*)
           AS trimmed_mean
  FROM events e JOIN q USING (event_type)
  WHERE e.value >= q.lo AND e.value <= q.hi
  GROUP BY e.event_type)
SELECT a.event_type, q.lo, q.hi, a.n_kept, a.trimmed_mean
FROM a JOIN q USING (event_type)
"""

"""Data-quality operators: column profiling, expectation-style audit
rules, and chi-square term-source feature selection.

* ``profile_lineitem`` — the "describe" pass a 100 TB ingest runs before
  anything else: per-column row/null counts, EXACT distinct count,
  min/max. Counts and extrema fold per batch into one constant-width
  partial row (driver reduce is O(batches)); the exact distinct count
  shuffles batch-distinct values hash-bucketed per column, counts
  uniques per bucket, and sums — the shuffle carries each distinct
  value once per batch, never the raw rows. (The HLL sketch in
  ``sketches.approx_distinct_users`` is the one-pass approximate
  alternative at vastly lower shuffle volume.)

* ``audit_lineitem`` — declarative expectation checks (Great-
  Expectations-style): domain/range/format rules evaluate vectorized
  per batch into per-rule violation-count partials; the referential
  rule (every l_orderkey resolves in orders) runs as a distributed
  anti-join on batch-distinct keys (``joins.anti_join`` — no broadcast
  of the fact-sized key set). Output is one (rule, n_violations) row
  per rule — hard rules expect 0, *_warn rules are soft signals.

* ``chi2_term_source`` — per-(term, source) chi-square association for
  the top-V vocabulary: the classic feature-selection score for corpus
  curation (which terms are over-represented in which source). Per
  batch a binary doc×V membership matrix and a doc×source one-hot give
  all n11 cell counts as ONE matmul (S.T @ M); marginals derive from
  the cell sums (sources partition the corpus), so a single
  (source, term, n11) partial stream carries everything. The chi2
  float expression is evaluated in a fixed operand order mirrored
  exactly by the DuckDB oracle (see retrieval.py for the technique).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ._util import bucketed_group_sum, sized_read

PROFILE_COLS = ["l_discount", "l_extendedprice", "l_orderkey",
                "l_quantity", "l_tax"]

CHI2_TOP_V = 32            # vocabulary cap, as in retrieval.TOP_V


def _li(sf_dir: str, columns: list[str]):
    return sized_read(os.path.join(sf_dir, "lineitem.parquet"),
                      columns, rows_per_block=150_000)


# ------------------------------------------------------ column profile

def profile_lineitem(sf_dir: str):
    """(column, n_rows, n_null, n_distinct, min_v, max_v) per profiled
    lineitem column, ordered by column name. min/max as DOUBLE."""
    ds = _li(sf_dir, PROFILE_COLS)

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in PROFILE_COLS:
            v = df[c]
            nn = int(v.isna().sum())
            vv = v.dropna().to_numpy(dtype=np.float64)
            rows.append({"column": c, "n_rows": np.int64(len(v)),
                         "n_null": np.int64(nn),
                         "min_v": vv.min() if len(vv) else np.inf,
                         "max_v": vv.max() if len(vv) else -np.inf})
        return pd.DataFrame(rows)

    stats = (ds.map_batches(stat_partial, batch_format="pandas")
             .to_pandas())                       # batches × columns rows
    if stats.empty:
        # the SQL aggregate still yields one row per column (NULL extrema)
        return pd.DataFrame({
            "column": PROFILE_COLS,
            "n_rows": np.zeros(len(PROFILE_COLS), dtype=np.int64),
            "n_null": np.zeros(len(PROFILE_COLS), dtype=np.int64),
            "n_distinct": np.zeros(len(PROFILE_COLS), dtype=np.int64),
            "min_v": np.full(len(PROFILE_COLS), np.nan),
            "max_v": np.full(len(PROFILE_COLS), np.nan)})
    agg = stats.groupby("column").agg(
        n_rows=("n_rows", "sum"), n_null=("n_null", "sum"),
        min_v=("min_v", "min"), max_v=("max_v", "max")).reset_index()

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for c in PROFILE_COLS:
            u = pd.unique(df[c].dropna().to_numpy(dtype=np.float64))
            outs.append(pd.DataFrame({"column": c, "v": u}))
        return pd.concat(outs, ignore_index=True)

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["column", "v"]).groupby("column")
        out = g.size().reset_index(name="n_distinct")
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out

    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # bucket on the VALUE hash so all copies of a value co-locate;
        # per-bucket uniques then sum exactly to the global distinct
        h = (_bucket_of(df["v"].astype(str), 1 << 30)
             + _bucket_of(df["column"], 1 << 30))
        return df.assign(__bucket=(h % 64).astype(np.int64))

    nd = bucketed_group_sum(
        (ds.map_batches(distinct_partial, batch_format="pandas")
         .map_batches(add_bucket, batch_format="pandas")
         .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
         .map_groups(count_bucket, batch_format="pandas")),
        key="column", sum_cols=["n_distinct"]).to_pandas()

    out = agg.merge(nd, on="column", how="left")   # all-null column: no
    out["n_distinct"] = out["n_distinct"].fillna(0)  # distinct rows emitted
    # all-null column: the ±inf partial sentinels mean "no value seen";
    # the SQL aggregate yields NULL there
    out.loc[out["min_v"] == np.inf, "min_v"] = np.nan
    out.loc[out["max_v"] == -np.inf, "max_v"] = np.nan
    out = out[["column", "n_rows", "n_null", "n_distinct", "min_v", "max_v"]]
    out[["n_rows", "n_null", "n_distinct"]] = \
        out[["n_rows", "n_null", "n_distinct"]].astype(np.int64)
    return out.sort_values("column", kind="mergesort").reset_index(drop=True)


PROFILE_LINEITEM_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min_v, CAST(max({c}) AS DOUBLE) AS max_v
FROM lineitem""" for c in PROFILE_COLS) + '\nORDER BY "column"'


# ------------------------------------------------- expectation audit

AUDIT_RULES: list[tuple[str, str]] = [
    # (rule name, DuckDB violation predicate) — the Ray side mirrors
    # each. NULL fails a range/domain expectation (explicit IS NULL arm,
    # matching the vectorized NaN semantics); *_warn rules skip NULLs.
    ("discount_range",
     "l_discount IS NULL OR NOT (l_discount >= 0 AND l_discount <= 0.1)"),
    ("high_discount_warn", "l_discount > 0.05"),
    ("orphan_orderkey", None),     # referential: anti-join vs orders
    ("price_positive",
     "l_extendedprice IS NULL OR l_extendedprice <= 0"),
    ("quantity_range",
     "l_quantity IS NULL OR NOT (l_quantity >= 1 AND l_quantity <= 50)"),
    ("returnflag_domain",
     "l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N', 'R')"),
    ("shipdate_window",
     "l_shipdate IS NULL OR NOT (l_shipdate >= TIMESTAMP '1992-01-01'"
     " AND l_shipdate < TIMESTAMP '1999-01-01')"),
    ("tax_range", "l_tax IS NULL OR NOT (l_tax >= 0 AND l_tax <= 0.08)"),
    ("zero_tax_warn", "l_tax = 0"),
]


def audit_lineitem(sf_dir: str):
    """(rule, n_violations) for every AUDIT_RULES entry, ordered by
    rule. Row-level rules count vectorized per batch; orphan_orderkey
    is a distributed anti-join of distinct lineitem keys vs orders."""
    from .joins import anti_join

    ds = _li(sf_dir, ["l_orderkey", "l_quantity", "l_extendedprice",
                      "l_discount", "l_tax", "l_returnflag", "l_shipdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        disc = df["l_discount"].to_numpy()
        tax = df["l_tax"].to_numpy()
        qty = df["l_quantity"].to_numpy()
        price = df["l_extendedprice"].to_numpy()
        flag = df["l_returnflag"]
        ship = df["l_shipdate"]
        counts = {
            "discount_range": int((~((disc >= 0) & (disc <= 0.1))).sum()),
            "high_discount_warn": int((disc > 0.05).sum()),
            "price_positive": int((~(price > 0)).sum()),
            "quantity_range": int((~((qty >= 1) & (qty <= 50))).sum()),
            "returnflag_domain": int((~flag.isin(["A", "N", "R"])).sum()),
            "shipdate_window": int((~((ship >= pd.Timestamp("1992-01-01"))
                                      & (ship < pd.Timestamp("1999-01-01"))))
                                   .sum()),
            "tax_range": int((~((tax >= 0) & (tax <= 0.08))).sum()),
            "zero_tax_warn": int((tax == 0).sum()),
        }
        return pd.DataFrame({"rule": list(counts),
                             "n_violations": np.array(list(counts.values()),
                                                      dtype=np.int64)})

    rows = bucketed_group_sum(
        ds.map_batches(partial, batch_format="pandas"),
        key="rule", sum_cols=["n_violations"]).to_pandas()
    empty_table = rows.empty
    if empty_table:
        # empty table: every row-level rule still reports 0 (SQL parity)
        rules = [r for r, p in AUDIT_RULES if p is not None]
        rows = pd.DataFrame({"rule": rules,
                             "n_violations": np.zeros(len(rules),
                                                      dtype=np.int64)})

    if empty_table:
        n_orphans = 0
    else:
        from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of

        # GLOBAL key dedup (batch-local dedup alone double-counts a key
        # whose rows straddle a block boundary): all copies of a key
        # share a bucket, one drop_duplicates per bucket is exact
        def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
            u = df.drop_duplicates("l_orderkey")
            return u.assign(__bucket=_bucket_of(u["l_orderkey"], 64))

        li_keys = (_li(sf_dir, ["l_orderkey"])
                   .map_batches(local_dedup, batch_format="pandas")
                   .groupby("__bucket",
                            num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
                   .map_groups(
                       lambda g: g.drop_duplicates(
                           "l_orderkey")[["l_orderkey"]],
                       batch_format="pandas"))
        ord_keys = sized_read(os.path.join(sf_dir, "orders.parquet"),
                              ["o_orderkey"], rows_per_block=150_000)
        orphans = anti_join(
            li_keys, ord_keys.map_batches(
                lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
                batch_format="pandas"),
            on="l_orderkey")
        # count(): streaming row count of the anti-join survivors
        n_orphans = orphans.count()
    rows = pd.concat(
        [rows, pd.DataFrame({"rule": ["orphan_orderkey"],
                             "n_violations": np.array([n_orphans],
                                                      dtype=np.int64)})],
        ignore_index=True)
    return rows.sort_values("rule", kind="mergesort").reset_index(drop=True)


def _audit_sql() -> str:
    parts = []
    for rule, pred in AUDIT_RULES:
        if pred is None:
            parts.append(
                "SELECT 'orphan_orderkey' AS rule, CAST(count(*) AS BIGINT)"
                " AS n_violations FROM (SELECT DISTINCT l_orderkey FROM"
                " lineitem WHERE l_orderkey NOT IN"
                " (SELECT o_orderkey FROM orders))")
        else:
            parts.append(
                f"SELECT '{rule}' AS rule, CAST(count(*) FILTER ({pred})"
                f" AS BIGINT) AS n_violations FROM lineitem")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY rule"


AUDIT_LINEITEM_SQL = _audit_sql()


# ------------------------------------- chi-square term-source selection

def chi2_term_source(sf_dir: str):
    """(term, source, n11, chi2) for every (top-V term × source) cell:
    n11 = docs of that source containing the term; chi2 the 2×2 test
    statistic. Rows with a zero marginal (degenerate table) are
    excluded. Ordered by (term, source)."""
    import ray
    from .retrieval import membership_matrix, top_terms

    docs = sized_read(os.path.join(sf_dir, "documents.parquet"),
                      ["text", "source"], rows_per_block=4096)

    vocab = top_terms(docs, CHI2_TOP_V)
    if not vocab:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "source": pd.Series([], dtype=object),
                             "n11": pd.Series([], dtype=np.int64),
                             "chi2": pd.Series([], dtype=np.float64)})
    vocab_ref = ray.put(vocab)

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        srcs, s_inv = np.unique(df["source"].to_numpy(), return_inverse=True)
        m = membership_matrix(df["text"], v)
        s = np.zeros((len(df), len(srcs)), dtype=np.float64)
        s[np.arange(len(df)), s_inv] = 1.0
        n11 = (s.T @ m).astype(np.int64)         # (n_sources, V)
        si, ti = np.indices(n11.shape)
        cells = pd.DataFrame({
            "source": srcs[si.ravel()],
            "term": np.array(v, dtype=object)[ti.ravel()],
            "n": n11.ravel()})
        # marker rows carry per-source doc counts (term "" never occurs)
        marks = pd.DataFrame({"source": srcs, "term": "",
                              "n": np.bincount(s_inv,
                                               minlength=len(srcs))
                              .astype(np.int64)})
        return pd.concat([cells, marks], ignore_index=True)

    flat = bucketed_group_sum(
        docs.map_batches(cell_partial, batch_format="pandas"),
        key=["source", "term"], sum_cols=["n"]).to_pandas()

    marks = flat[flat["term"] == ""]
    n_s = dict(zip(marks["source"], marks["n"].astype(np.int64)))
    n_docs = int(marks["n"].sum())
    cells = flat[flat["term"] != ""].copy()
    c1 = cells.groupby("term")["n"].sum()        # docs containing term
    n11 = cells["n"].to_numpy(dtype=np.int64)
    r1 = cells["source"].map(n_s).to_numpy(dtype=np.int64)
    c1v = cells["term"].map(c1).to_numpy(dtype=np.int64)
    r0 = n_docs - r1
    c0 = n_docs - c1v
    n10 = r1 - n11
    n01 = c1v - n11
    n00 = r0 - n01
    det = (n11 * n00 - n10 * n01).astype(np.float64)
    # fixed operand order, mirrored literally by the oracle SQL
    num = (np.float64(n_docs) * det) * det
    den = ((r1.astype(np.float64) * r0.astype(np.float64))
           * c1v.astype(np.float64)) * c0.astype(np.float64)
    keep = den > 0
    out = pd.DataFrame({"term": cells["term"].to_numpy()[keep],
                        "source": cells["source"].to_numpy()[keep],
                        "n11": n11[keep],
                        "chi2": num[keep] / den[keep]})
    return (out.sort_values(["term", "source"], kind="mergesort")
            .reset_index(drop=True))


CHI2_TERM_SOURCE_SQL = rf"""
WITH tf AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
            FROM documents),
top AS (SELECT tok FROM (
          SELECT tok, count(*) AS c FROM tf GROUP BY tok
          QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= {CHI2_TOP_V})),
dt AS (SELECT DISTINCT doc_id, tok FROM (
         SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
         FROM documents)
       WHERE tok IN (SELECT tok FROM top)),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        FROM documents GROUP BY source),
c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY tok),
cells AS (SELECT d.source, t.tok AS term, CAST(count(*) AS BIGINT) AS n11
          FROM dt t JOIN documents d USING (doc_id)
          GROUP BY d.source, t.tok),
grid AS (SELECT s.source, c.tok AS term, s.n_s, c.c,
                coalesce(x.n11, 0) AS n11
         FROM src s CROSS JOIN c1 c
         LEFT JOIN cells x ON x.source = s.source AND x.term = c.tok),
calc AS (SELECT term, source, n11,
                CAST(n11 * (n.n_docs - n_s - c + n11)
                     - (n_s - n11) * (c - n11) AS DOUBLE) AS det,
                CAST(n_s AS DOUBLE) AS r1,
                CAST(n.n_docs - n_s AS DOUBLE) AS r0,
                CAST(c AS DOUBLE) AS c1v,
                CAST(n.n_docs - c AS DOUBLE) AS c0,
                CAST(n.n_docs AS DOUBLE) AS nd
         FROM grid, n)
SELECT term, source, n11,
       ((nd * det) * det) / (((r1 * r0) * c1v) * c0) AS chi2
FROM calc
WHERE (((r1 * r0) * c1v) * c0) > 0
ORDER BY term, source
"""


# ---------------------------------------------- correlation matrix

_CORR_COLS = ["l_discount", "l_quantity", "l_tax"]


def lineitem_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation matrix over the bounded-magnitude
    lineitem measures (discount-cents <= 10, quantity <= 50, tax-cents
    <= 8) — the profiling step that flags collinear features. All five
    sufficient statistics per pair accumulate as exact int64 batch
    partials (bounded values keep the global sums in int64 to ~10^14
    rows); the final normalization runs in Python bigints, bit-identical
    to the oracle's HUGEINT math. Output: one row per ordered pair
    (col_a < col_b)."""
    import math
    from ray.data.aggregate import Sum

    li = _li(sf_dir, _CORR_COLS)
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS)
             for b in _CORR_COLS[i + 1:]]

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        from ._util import cents
        v = {
            "l_discount": cents(df["l_discount"]),
            "l_quantity": np.rint(df["l_quantity"]
                                  .to_numpy(dtype=np.float64))
                          .astype(np.int64),
            "l_tax": cents(df["l_tax"])}
        out = {"n": [np.int64(len(df))]}
        for c in _CORR_COLS:
            out[f"s_{c}"] = [int(v[c].sum())]
            out[f"ss_{c}"] = [int((v[c] * v[c]).sum())]
        for a, b in pairs:
            out[f"sp_{a}_{b}"] = [int((v[a] * v[b]).sum())]
        return pd.DataFrame(out)

    aggs = [Sum("n", alias_name="n")]
    for c in _CORR_COLS:
        aggs += [Sum(f"s_{c}", alias_name=f"s_{c}"),
                 Sum(f"ss_{c}", alias_name=f"ss_{c}")]
    for a, b in pairs:
        aggs.append(Sum(f"sp_{a}_{b}", alias_name=f"sp_{a}_{b}"))
    m = li.map_batches(moments, batch_format="pandas").aggregate(*aggs)

    n = int(m["n"]) if m and m.get("n") is not None else 0
    rows = []
    for a, b in pairs:
        if n == 0:
            rows.append((a, b, float("nan")))
            continue
        sa, sb = int(m[f"s_{a}"]), int(m[f"s_{b}"])
        num = n * int(m[f"sp_{a}_{b}"]) - sa * sb
        da = n * int(m[f"ss_{a}"]) - sa * sa
        db = n * int(m[f"ss_{b}"]) - sb * sb
        den = math.sqrt(float(da) * float(db))
        rows.append((a, b, float(num) / den if den else float("nan")))
    return pd.DataFrame({
        "col_a": [r[0] for r in rows], "col_b": [r[1] for r in rows],
        "pearson_r": np.array([r[2] for r in rows], dtype=np.float64)})


LINEITEM_CORR_MATRIX_SQL = """
WITH m AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS x1,
         CAST(round(l_quantity) AS BIGINT)       AS x2,
         CAST(round(l_tax * 100) AS BIGINT)      AS x3
  FROM lineitem),
s AS (SELECT count(*) AS n,
             sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
             sum(x1*x1) AS ss1, sum(x2*x2) AS ss2, sum(x3*x3) AS ss3,
             sum(x1*x2) AS p12, sum(x1*x3) AS p13, sum(x2*x3) AS p23
      FROM m)
SELECT 'l_discount' AS col_a, 'l_quantity' AS col_b,
       CAST(n*p12 - s1*s2 AS DOUBLE)
         / sqrt(CAST(n*ss1 - s1*s1 AS DOUBLE)
                * CAST(n*ss2 - s2*s2 AS DOUBLE)) AS pearson_r FROM s
UNION ALL
SELECT 'l_discount', 'l_tax',
       CAST(n*p13 - s1*s3 AS DOUBLE)
         / sqrt(CAST(n*ss1 - s1*s1 AS DOUBLE)
                * CAST(n*ss3 - s3*s3 AS DOUBLE)) FROM s
UNION ALL
SELECT 'l_quantity', 'l_tax',
       CAST(n*p23 - s2*s3 AS DOUBLE)
         / sqrt(CAST(n*ss2 - s2*s2 AS DOUBLE)
                * CAST(n*ss3 - s3*s3 AS DOUBLE)) FROM s
"""

"""Iterative distributed graph computation: PageRank over the
token-adjacency graph.

The graph: one node per distinct corpus token, one directed edge per
DISTINCT adjacent token pair (same tokenization as ``top_bigrams`` —
whitespace split of lowercased text). PageRank runs in the unnormalized
formulation r' = (1-d) + d * Σ_in r/outdeg (values are O(1) regardless
of vocabulary size, so the 6-dp compare keeps full precision), for a
FIXED iteration count so the DuckDB oracle can mirror it with unrolled
CTE levels (recursive CTEs cannot aggregate over the recursive table).

The distributed shape is the canonical bulk-synchronous iteration:
edges (with out-degree attached) and nodes are built once, materialized
(vocabulary/edge-set sized — object-store-spillable), and each
iteration is one co-partitioned ``hash_join`` (edges ⋈ ranks on src) +
one ``bucketed_group_sum`` (incoming mass per dst) + one LEFT join back
onto the node set. Nothing driver-side grows with the corpus; per-
iteration state is one rank row per vocabulary token.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from ._util import bucketed_group_sum, sized_read

DAMPING = 0.85
PAGERANK_ITERS = 3
_WS = re.compile(r"\s+")


def _docs(sf_dir: str):
    return sized_read(os.path.join(sf_dir, "documents.parquet"),
                      ["text"], rows_per_block=2_000)


def _dedup_on(ds, cols: list[str]):
    """Global distinct rows via hash-bucket shuffle + per-bucket dedup
    (batch-local dedup alone double-counts rows straddling blocks)."""
    from .joins import _bucket_of, DEFAULT_SHUFFLE_PARTITIONS

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), dtype=np.int64)
        for c in cols:
            h = h * np.int64(1000003) + _bucket_of(df[c], 1 << 30)
        return df.assign(__bucket=(h % 64).astype(np.int64))

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(lambda g: g.drop_duplicates(cols)[cols],
                        batch_format="pandas"))


def pagerank_tokens(sf_dir: str):
    """(token, pagerank) for every distinct corpus token after
    PAGERANK_ITERS damped iterations over the distinct-bigram edge set."""
    from .joins import hash_join

    def edge_partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = set()
        for text in df["text"]:
            w = [t for t in _WS.split(text.lower()) if t]
            pairs.update(zip(w, w[1:]))
        return pd.DataFrame({
            "src": pd.Series([a for a, _ in pairs], dtype=object),
            "dst": pd.Series([b for _, b in pairs], dtype=object)})

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for text in df["text"]:
            toks.update(t for t in _WS.split(text.lower()) if t)
        return pd.DataFrame({"tok": pd.Series(sorted(toks), dtype=object)})

    edges = _dedup_on(_docs(sf_dir).map_batches(edge_partial,
                                                batch_format="pandas"),
                      ["src", "dst"])
    nodes = _dedup_on(_docs(sf_dir).map_batches(node_partial,
                                                batch_format="pandas"),
                      ["tok"]).materialize()
    if nodes.count() == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "pagerank": pd.Series([], dtype=np.float64)})

    # out-degree (edges are distinct, so count == distinct out-neighbors),
    # attached to each edge once, reused every iteration
    outdeg = bucketed_group_sum(
        edges.map_batches(lambda df: df.assign(od=np.int64(1)),
                          batch_format="pandas"),
        "src", ["od"])
    edges_od = hash_join(edges, outdeg, on="src").materialize()

    base = 1.0 - DAMPING          # rank of a node with no incoming mass

    def damp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "tok": df["tok"].values,
            "r": base + DAMPING * np.nan_to_num(
                df["s"].to_numpy(np.float64))})

    # Ranks are kept SPARSE — one row per node with incoming mass; every
    # absent node's rank is the constant ``base``, supplied as the LEFT-
    # join default. That removes the dense nodes-join from every
    # superstep: each iteration is ONE co-partitioned join + ONE bucketed
    # reduce. (Each superstep is materialized — a vocabulary-bounded
    # barrier; measured faster than one fused 9-shuffle lazy plan,
    # 9-10 s vs 15-18 s on this host.)
    ranks_sparse = None           # iteration 0: every rank is exactly 1.0

    for _ in range(PAGERANK_ITERS):
        if ranks_sparse is None:
            contrib = edges_od.map_batches(
                lambda df: df.assign(r=np.float64(1.0)),
                batch_format="pandas")
        else:
            contrib = hash_join(
                edges_od,
                ranks_sparse.map_batches(
                    lambda df: df.rename(columns={"tok": "src"}),
                    batch_format="pandas"),
                on="src", how="left", right_cols_hint=["r"]).map_batches(
                lambda df: df.assign(r=np.where(
                    np.isnan(df["r"].to_numpy(np.float64)),
                    base, df["r"].to_numpy(np.float64))),
                batch_format="pandas")
        inc = bucketed_group_sum(
            contrib.map_batches(
                lambda df: pd.DataFrame({
                    "tok": df["dst"].values,
                    "s": df["r"].to_numpy(np.float64)
                         / df["od"].to_numpy(np.int64)}),
                batch_format="pandas"),
            "tok", ["s"])
        ranks_sparse = inc.map_batches(damp,
                                       batch_format="pandas").materialize()

    # one dense join at the very end reintroduces zero-in-degree nodes
    return hash_join(nodes, ranks_sparse, on="tok", how="left",
                     right_cols_hint=["r"]).map_batches(
        lambda df: pd.DataFrame({
            "token": df["tok"].values,
            "pagerank": np.where(np.isnan(df["r"].to_numpy(np.float64)),
                                 base, df["r"].to_numpy(np.float64))}),
        batch_format="pandas")


def _pr_level(prev: str) -> str:
    return f"""
  SELECT t.tok, {1.0 - DAMPING}e0 + {DAMPING}e0 * coalesce(i.s, 0.0e0) AS r
  FROM tok t LEFT JOIN (
    SELECT e.dst AS tok, sum(p.r / o.od) AS s
    FROM {prev} p JOIN edges e ON e.src = p.tok
                  JOIN outd  o ON o.src = p.tok
    GROUP BY e.dst) i USING (tok)"""


PAGERANK_TOKENS_SQL = rf"""
WITH words AS (
  SELECT regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
tok AS (SELECT DISTINCT unnest(w) AS tok FROM words),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                 i -> w[i]))   AS src,
           unnest(list_transform(generate_series(1, len(w) - 1),
                                 i -> w[i+1])) AS dst
    FROM words WHERE len(w) >= 2)),
outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
p0 AS (SELECT tok, 1.0e0 AS r FROM tok),
p1 AS ({_pr_level("p0")}),
p2 AS ({_pr_level("p1")}),
p3 AS ({_pr_level("p2")})
SELECT tok AS token, r AS pagerank FROM p3
"""


# ----------------------------------------------- triangle counting

TRIANGLE_MIN_COOC = 2
# edge count below which wedge/triangle closing runs on the driver
# (adjacency sets) instead of two distributed joins
TRIANGLE_LOCAL_EDGE_CAP = 200_000


def token_triangle_count(sf_dir: str):
    """One-row summary of the token co-occurrence graph's triangle
    structure: edge / oriented-wedge / triangle counts and the closure
    ratio (triangles per oriented wedge; 1.0 = every wedge closes).

    Distributed node-iterator with lexicographic orientation: per-doc
    distinct token pairs (a < b) -> bucketed count -> edges (count >=
    {T}); wedges a<b<c from one partitioned self-join on the middle
    node; triangles from a second join probing the closing (a, c) edge.
    Each triangle is produced exactly once, so no division by symmetry
    is needed. Skew note: a hub token of degree d contributes O(d^2)
    wedges — the co-occurrence threshold is the degree-capping knob (at
    web scale raise it, or pre-drop stopword-degree nodes, before the
    wedge join).

    Oracle mirrors with string pairs (``doc_id``-grouped self-joins).
    """
    from itertools import combinations

    from ._util import bucketed_group_sum
    from .joins import hash_join

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        # combiner: aggregate pair counts WITHIN the batch before the
        # shuffle — the distinct-pair space is bounded by the batch's
        # vocabulary (C(V,2)), so this collapses the O(docs x w^2) raw
        # pair stream by orders of magnitude
        from collections import Counter
        cnt: Counter = Counter()
        for t in df["text"]:
            toks = sorted(set(t.split()))
            cnt.update(combinations(toks, 2))
        if not cnt:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        pairs, counts = zip(*cnt.items())
        return pd.DataFrame({"a": pd.Series([p[0] for p in pairs],
                                            dtype=object),
                             "b": pd.Series([p[1] for p in pairs],
                                            dtype=object),
                             "c": np.fromiter(counts, np.int64,
                                              count=len(counts))})

    edges = (bucketed_group_sum(
        docs.map_batches(pair_rows, batch_format="pandas"), ["a", "b"],
        ["c"])
        .map_batches(lambda df: df.loc[df["c"] >= TRIANGLE_MIN_COOC,
                                       ["a", "b"]],
                     batch_format="pandas").materialize())

    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame({
            "n_edges": pd.Series([0], dtype="int64"),
            "n_wedges": pd.Series([0], dtype="int64"),
            "n_triangles": pd.Series([0], dtype="int64"),
            "closure_ratio": pd.Series([float("nan")], dtype="float64")})

    if n_edges <= TRIANGLE_LOCAL_EDGE_CAP:
        # a thresholded graph this small is pure plan overhead as a pair
        # of distributed joins — close it out with adjacency sets on the
        # driver (identical counts; the join path below is the scale
        # path and is pinned to this one by an equivalence test)
        edf = edges.to_pandas()
        nbrs: dict[str, set[str]] = {}
        for a, b in zip(edf["a"], edf["b"]):
            nbrs.setdefault(a, set()).add(b)
        n_wedges = 0
        n_tri = 0
        for a, b in zip(edf["a"], edf["b"]):
            succ = nbrs.get(b)
            if not succ:
                continue
            n_wedges += len(succ)
            n_tri += len(succ & nbrs.get(a, set()))
        return pd.DataFrame({
            "n_edges": pd.Series([n_edges], dtype="int64"),
            "n_wedges": pd.Series([n_wedges], dtype="int64"),
            "n_triangles": pd.Series([n_tri], dtype="int64"),
            "closure_ratio": pd.Series(
                [round(n_tri * 1.0 / n_wedges, 6) if n_wedges
                 else float("nan")], dtype="float64")})

    mid = edges.map_batches(
        lambda df: df.rename(columns={"a": "b", "b": "cc"}),
        batch_format="pandas")
    wedges = hash_join(edges, mid, on="b").materialize()
    n_wedges = wedges.count()

    closing = edges.map_batches(
        lambda df: df.rename(columns={"b": "cc"}),
        batch_format="pandas")
    tri = hash_join(
        wedges.map_batches(lambda df: df[["a", "cc"]],
                           batch_format="pandas"),
        closing.map_batches(lambda df: df.assign(hit=np.int64(1)),
                            batch_format="pandas"),
        on=["a", "cc"])
    tp = tri.map_batches(
        lambda df: pd.DataFrame({"n": [np.int64(len(df))]}),
        batch_format="pandas").to_pandas()
    n_tri = int(tp["n"].sum()) if "n" in tp.columns else 0

    return pd.DataFrame({
        "n_edges": pd.Series([n_edges], dtype="int64"),
        "n_wedges": pd.Series([n_wedges], dtype="int64"),
        "n_triangles": pd.Series([n_tri], dtype="int64"),
        "closure_ratio": pd.Series(
            [round(n_tri * 1.0 / n_wedges, 6) if n_wedges else float("nan")],
            dtype="float64")})


TOKEN_TRIANGLE_COUNT_SQL = rf"""
WITH words AS (SELECT doc_id,
                      list_distinct(regexp_extract_all(text, '\S+')) w
               FROM documents),
tok AS (SELECT doc_id, unnest(w) t FROM words),
pairs AS (SELECT a.doc_id, a.t AS a, b.t AS b
          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t),
edges AS (SELECT a, b FROM pairs GROUP BY a, b
          HAVING count(*) >= {TRIANGLE_MIN_COOC}),
wedges AS (SELECT e1.a, e1.b, e2.b AS c
           FROM edges e1 JOIN edges e2 ON e1.b = e2.a),
tri AS (SELECT CAST(count(*) AS BIGINT) n
        FROM wedges w JOIN edges e ON w.a = e.a AND w.c = e.b)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
       (SELECT n FROM tri) AS n_triangles,
       round((SELECT n FROM tri) * 1.0
             / (SELECT count(*) FROM wedges), 6) AS closure_ratio
"""

"""Full-text retrieval operators over the documents corpus.

* ``inverted_index`` — the classic postings-statistics build (term →
  document frequency + total term frequency). Per-batch partial counts
  (one dict pass per batch, rows out = batch-distinct terms, never
  corpus tokens) feed a bucketed grouped sum, so the shuffle carries
  O(batches × vocab) tiny rows; the final table is vocabulary-sized.

* ``bm25_search`` — BM25 ranked retrieval (Robertson & Spärck Jones /
  Okapi; the standard k1/b form with the "plus-one" idf
  ``ln(1 + (N - df + 0.5)/(df + 0.5))``) for a fixed query panel.
  Phase 1 streams the corpus once for (N, total_len, per-term df) — a
  constant-width aggregate. Phase 2 re-streams, scores every doc
  against all queries vectorized (numpy float64), keeps a per-batch
  top-k, and reduces per query (3 groups) — the shuffle carries at most
  ``batches × queries × k`` candidate rows. The oracle is the SAME
  arithmetic in DuckDB: every float expression is written with
  identical operand order and double literals (``ln`` is bit-identical
  between DuckDB and libm — verified), so the driver's value-hash
  compare holds on the raw float64 scores.

* ``token_cooccurrence`` — document-level co-occurrence counts + lift
  for the top-V vocabulary (the capped-vocab co-occurrence matrix of
  GloVe-style pipelines, Pennington et al. '14). Per batch a binary
  doc×V membership matrix M gives the pair counts as ``M.T @ M`` (one
  BLAS call; the diagonal is each term's document frequency, so a
  single triangular emission carries both). Partials are V²-bounded
  per batch regardless of corpus size; lift = (N·n_ab)/(n_a·n_b) is a
  single integer-operand division, bit-exact vs the oracle.

The vocabulary cap (TOP_V) is the scale contract: pair state is V²,
never vocab². Reference repo has no retrieval surface; these extend
the training-data operator set (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from ._util import bucketed_group_sum, sized_read

K1 = 1.2                    # BM25 term-frequency saturation
B = 0.75                    # BM25 length normalization
ONE_MINUS_B = 1.0 - B
K1P1 = K1 + 1.0
BM25_TOP_K = 10

# fixed query panel (terms are drawn from the synthetic corpus vocab;
# term order inside a query is load-bearing: the score sum is evaluated
# left-to-right in this order on BOTH the Ray and the oracle side)
BM25_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["hash", "join"]),
    (1, ["window", "sort", "batch"]),
    (2, ["customer", "order"]),
]

TOP_V = 32                  # co-occurrence vocabulary cap (scale knob)
MIN_PAIR_DOCS = 5           # emit pairs co-occurring in >= this many docs


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return sized_read(os.path.join(sf_dir, "documents.parquet"),
                      list(columns), rows_per_block=4096)


def _dlit(x: float) -> str:
    """A DuckDB DOUBLE literal with the exact bits of the Python float
    (plain decimals parse as DECIMAL in DuckDB; an exponent forces
    DOUBLE). repr() round-trips, so both sides see the same double."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s or "inf" in s) else s + "e0"


# ---------------------------------------------------- inverted index

def inverted_index(sf_dir: str):
    """(term, doc_freq, total_tf) for every whitespace token in the
    corpus, ordered by term."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dfreq: dict[str, int] = {}
        tfreq: dict[str, int] = {}
        for text in df["text"]:
            words = text.split()
            for w in words:
                tfreq[w] = tfreq.get(w, 0) + 1
            for w in set(words):
                dfreq[w] = dfreq.get(w, 0) + 1
        terms = sorted(tfreq)
        return pd.DataFrame({
            "term": pd.Series(terms, dtype=object),
            "doc_freq": np.array([dfreq[t] for t in terms], dtype=np.int64),
            "total_tf": np.array([tfreq[t] for t in terms], dtype=np.int64)})

    counts = bucketed_group_sum(
        _docs(sf_dir, ("text",)).map_batches(partial, batch_format="pandas"),
        key="term", sum_cols=["doc_freq", "total_tf"])
    # final table is vocabulary-sized — driver collect is result-sized
    out = counts.to_pandas()
    if out.empty:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "doc_freq": pd.Series([], dtype=np.int64),
                             "total_tf": pd.Series([], dtype=np.int64)})
    return out.sort_values("term", kind="mergesort").reset_index(drop=True)


INVERTED_INDEX_SQL = r"""
SELECT tok AS term,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
       CAST(count(*) AS BIGINT) AS total_tf
FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY term
"""


# -------------------------------------------------------- BM25 search

def _corpus_stats(sf_dir: str, terms: list[str]):
    """(n_docs, total_words, {term: df}) in one constant-width pass."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n_words = 0
        dfc = dict.fromkeys(terms, 0)
        for text in df["text"]:
            words = text.split()
            n_words += len(words)
            ws = set(words)
            for t in terms:
                if t in ws:
                    dfc[t] += 1
        row = {"n_docs": np.int64(len(df)), "n_words": np.int64(n_words)}
        for t in terms:
            row[f"df_{t}"] = np.int64(dfc[t])
        return pd.DataFrame([row])

    parts = (_docs(sf_dir, ("text",))
             .map_batches(partial, batch_format="pandas")
             .to_pandas())                      # one row per batch
    if parts.empty:
        return 0, 0, dict.fromkeys(terms, 0)
    n_docs = int(parts["n_docs"].sum())
    n_words = int(parts["n_words"].sum())
    dfs = {t: int(parts[f"df_{t}"].sum()) for t in terms}
    return n_docs, n_words, dfs


def bm25_search(sf_dir: str):
    """Top-{BM25_TOP_K} documents per fixed query under BM25
    (k1=1.2, b=0.75, plus-one idf). Output:
    (query_id, rank, doc_id, score) ordered by (query_id, rank);
    ties broken by doc_id ascending, zero-score docs excluded."""
    import ray

    all_terms = sorted({t for _, terms in BM25_QUERIES for t in terms})
    n_docs, n_words, dfs = _corpus_stats(sf_dir, all_terms)
    if n_docs == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    avgdl = float(n_words) / float(n_docs)
    idf = {t: math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
           for t in all_terms}
    consts_ref = ray.put((avgdl, idf))

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        avgdl_, idf_ = ray.get(consts_ref)
        n = len(df)
        dl = np.empty(n, dtype=np.float64)
        tf = {t: np.empty(n, dtype=np.float64) for t in all_terms}
        for i, text in enumerate(df["text"]):
            words = text.split()
            dl[i] = len(words)
            for t in all_terms:
                tf[t][i] = words.count(t)
        # shared length-normalized denominator component
        norm = ONE_MINUS_B + B * (dl / avgdl_)
        doc_ids = df["doc_id"].to_numpy()
        out = []
        for qid, terms in BM25_QUERIES:
            score = np.zeros(n, dtype=np.float64)
            any_tf = np.zeros(n, dtype=bool)
            for t in terms:                      # fixed left-to-right order
                tft = tf[t]
                score = score + idf_[t] * (tft * K1P1 / (tft + K1 * norm))
                any_tf |= tft > 0
            keep = np.nonzero(any_tf)[0]
            if len(keep) == 0:
                continue
            s = score[keep]
            ids = doc_ids[keep]
            take = min(BM25_TOP_K, len(s))
            top = np.lexsort((ids, -s))[:take]   # score desc, doc_id asc
            out.append(pd.DataFrame({"query_id": np.int64(qid),
                                     "doc_id": ids[top], "score": s[top]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    def reduce_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df["score"].to_numpy()
        ids = df["doc_id"].to_numpy()
        take = min(BM25_TOP_K, len(df))
        top = np.lexsort((ids, -s))[:take]
        return pd.DataFrame({
            "query_id": df["query_id"].to_numpy()[top],
            "rank": np.arange(1, take + 1, dtype=np.int64),
            "doc_id": ids[top], "score": s[top]})

    out = (_docs(sf_dir)
           .map_batches(score_block, batch_format="pandas")
           .groupby("query_id")
           .map_groups(reduce_topk, batch_format="pandas")
           .to_pandas())                         # <= queries × k rows
    if out.empty:
        # non-empty corpus, zero hits: no groups ever reach reduce_topk
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    return (out.sort_values(["query_id", "rank"], kind="mergesort")
            [["query_id", "rank", "doc_id", "score"]]
            .reset_index(drop=True))


def _bm25_sql() -> str:
    """DuckDB mirror of bm25_search: identical expression trees, double
    literals via _dlit, per-term idf from scalar subqueries (same ln)."""
    all_terms = sorted({t for _, terms in BM25_QUERIES for t in terms})
    df_cols = ",\n       ".join(
        f"(SELECT count(*) FROM d WHERE list_contains(w, '{t}'))"
        f" AS df_{t}" for t in all_terms)
    blocks = []
    for qid, terms in BM25_QUERIES:
        score = None
        nonzero = []
        for t in terms:
            tft = f"CAST(len(list_filter(w, x -> x = '{t}')) AS DOUBLE)"
            idf = (f"ln({_dlit(1.0)} + ((st.n - st.df_{t}) + {_dlit(0.5)})"
                   f" / (st.df_{t} + {_dlit(0.5)}))")
            wgt = (f"({tft} * {_dlit(K1P1)} / ({tft} + {_dlit(K1)}"
                   f" * ({_dlit(ONE_MINUS_B)} + {_dlit(B)}"
                   f" * (dl / st.avgdl))))")
            term_score = f"{idf} * {wgt}"
            score = term_score if score is None else f"({score}) + {term_score}"
            nonzero.append(f"list_contains(w, '{t}')")
        blocks.append(
            f"SELECT {qid} AS query_id, doc_id, {score} AS score\n"
            f"  FROM dd, st WHERE {' OR '.join(nonzero)}")
    union = "\n  UNION ALL\n".join(blocks)
    return f"""
WITH d AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
           FROM documents),
st AS (SELECT count(*) AS n,
       CAST(sum(len(w)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
       {df_cols}
       FROM d),
dd AS (SELECT doc_id, w, CAST(len(w) AS DOUBLE) AS dl FROM d),
scored AS (
  {union}),
ranked AS (SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rank
           FROM scored)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score
FROM ranked WHERE rank <= {BM25_TOP_K}
ORDER BY query_id, rank
"""


BM25_SEARCH_SQL = _bm25_sql()


# --------------------------------------------- token co-occurrence/lift

def _term_tf_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Batch-local total term frequencies: (term, n) rows."""
    c: dict[str, int] = {}
    for text in df["text"]:
        for w in text.split():
            c[w] = c.get(w, 0) + 1
    terms = sorted(c)
    return pd.DataFrame({
        "term": pd.Series(terms, dtype=object),
        "n": np.array([c[t] for t in terms], dtype=np.int64)})


def top_terms(docs, v: int) -> list[str]:
    """The corpus' top-``v`` terms by total tf (ties by term), sorted
    alphabetically. Distributed: bucketed partial counts, then a
    distributed (n desc, term) sort — only ``v`` rows reach the driver.
    Shared by token_cooccurrence and profiling.chi2_term_source so the
    two operators' vocabulary semantics cannot drift."""
    counts = bucketed_group_sum(
        docs.map_batches(_term_tf_partial, batch_format="pandas"),
        key="term", sum_cols=["n"])
    top = (counts.sort(["n", "term"], descending=[True, False])
           .limit(v).to_pandas())
    return sorted(top["term"].tolist()) if not top.empty else []


def membership_matrix(texts, vocab: list[str]) -> np.ndarray:
    """Binary doc×|vocab| term-presence matrix (float64 so ``M.T @ M``
    is one BLAS call)."""
    m = np.zeros((len(texts), len(vocab)), dtype=np.float64)
    for i, text in enumerate(texts):
        ws = set(text.split())
        for j, t in enumerate(vocab):
            if t in ws:
                m[i, j] = 1.0
    return m


def token_cooccurrence(sf_dir: str):
    """(tok_a, tok_b, n_ab, n_a, n_b, lift) for unordered pairs of
    top-{TOP_V} terms (by total tf, ties by term) co-occurring in
    >= {MIN_PAIR_DOCS} documents; lift = (N * n_ab) / (n_a * n_b).
    Ordered by (tok_a, tok_b)."""
    import ray

    vocab = top_terms(_docs(sf_dir, ("text",)), TOP_V)
    if not vocab:
        return pd.DataFrame({"tok_a": pd.Series([], dtype=object),
                             "tok_b": pd.Series([], dtype=object),
                             "n_ab": pd.Series([], dtype=np.int64),
                             "n_a": pd.Series([], dtype=np.int64),
                             "n_b": pd.Series([], dtype=np.int64),
                             "lift": pd.Series([], dtype=np.float64)})
    vocab_ref = ray.put(vocab)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        vn = len(v)
        m = membership_matrix(df["text"], v)
        co = (m.T @ m).astype(np.int64)          # diagonal = per-term df
        ii, jj = np.triu_indices(vn)             # k=0: keep the diagonal
        n = co[ii, jj]
        keep = n > 0
        out = pd.DataFrame({
            "tok_a": np.array(v, dtype=object)[ii[keep]],
            "tok_b": np.array(v, dtype=object)[jj[keep]],
            "n": n[keep]})
        # one counter row per batch carries N (tokens are never empty)
        return pd.concat(
            [out, pd.DataFrame({"tok_a": [""], "tok_b": [""],
                                "n": np.int64(len(df))})],
            ignore_index=True)

    agg = bucketed_group_sum(
        _docs(sf_dir, ("text",)).map_batches(pair_partial,
                                             batch_format="pandas"),
        key=["tok_a", "tok_b"], sum_cols=["n"])
    flat = agg.to_pandas()                       # <= V²/2 + 1 rows
    n_docs = int(flat.loc[(flat["tok_a"] == "") & (flat["tok_b"] == ""),
                          "n"].sum())
    diag = {r.tok_a: int(r.n) for r in flat.itertuples()
            if r.tok_a == r.tok_b and r.tok_a != ""}
    pairs = flat[(flat["tok_a"] != flat["tok_b"])
                 & (flat["n"] >= MIN_PAIR_DOCS)].copy()
    n_a = pairs["tok_a"].map(diag).to_numpy(dtype=np.int64)
    n_b = pairs["tok_b"].map(diag).to_numpy(dtype=np.int64)
    n_ab = pairs["n"].to_numpy(dtype=np.int64)
    lift = (n_docs * n_ab).astype(np.float64) / (n_a * n_b).astype(np.float64)
    out = pd.DataFrame({"tok_a": pairs["tok_a"].to_numpy(),
                        "tok_b": pairs["tok_b"].to_numpy(),
                        "n_ab": n_ab, "n_a": n_a, "n_b": n_b, "lift": lift})
    return (out.sort_values(["tok_a", "tok_b"], kind="mergesort")
            .reset_index(drop=True))


TOKEN_COOCCURRENCE_SQL = rf"""
WITH tf AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
            FROM documents),
top AS (SELECT tok FROM (
          SELECT tok, count(*) AS c FROM tf GROUP BY tok
          QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= {TOP_V})),
dt AS (SELECT DISTINCT doc_id, tok FROM (
         SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
         FROM documents)
       WHERE tok IN (SELECT tok FROM top)),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM dt GROUP BY tok),
pairs AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
                 CAST(count(*) AS BIGINT) AS n_ab
          FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
          GROUP BY a.tok, b.tok)
SELECT p.tok_a, p.tok_b, p.n_ab, ca.c AS n_a, cb.c AS n_b,
       CAST(n.n_docs * p.n_ab AS DOUBLE)
         / CAST(ca.c * cb.c AS DOUBLE) AS lift
FROM pairs p
JOIN cnt ca ON ca.tok = p.tok_a
JOIN cnt cb ON cb.tok = p.tok_b
CROSS JOIN n
WHERE p.n_ab >= {MIN_PAIR_DOCS}
ORDER BY tok_a, tok_b
"""

"""Fuzzy string matching and corpus boilerplate removal.

* fuzzy_token_pairs — all unordered pairs of corpus-distinct tokens
  within Levenshtein distance ≤ 2, found WITHOUT an all-pairs scan via
  delete-neighborhood blocking (the SymSpell construction, Garbe '12 /
  FAROO blog; also Boytsov '11 "Indexing methods for approximate
  dictionary searching" §neighborhood generation): if lev(a,b) ≤ d then
  deleting ≤ d characters from each side yields a common string, so
  tokens sharing any delete-≤d variant are a SUPERSET of the true pairs
  and an exact per-pair verify finishes the job. The shuffle carries
  (variant_hash, token) rows — |token|·O(L²) per distinct token, never
  |vocab|² — and candidate pairs are deduped by pair-hash buckets before
  the (cheap, banded) exact distance check. The blocking is exact, not
  approximate: the oracle is a brute-force DuckDB ``levenshtein`` self-
  join and must match row-for-row.

  Scale note: buckets are per variant string. Very short variants (from
  length ≤ d+1 tokens) collect at most alphabet^(d+1)-ish tokens, so no
  bucket grows with corpus size; the length cap (MAX_FUZZY_TOKEN_LEN,
  mirrored into the SQL) bounds the O(L²) variant fan-out per token.

* strip_boilerplate_ngrams — the C4 repeated-span rule (Raffel et al.
  '20 §2.2: drop any span occurring more than once in the corpus),
  here at word-8-gram granularity: every token covered by an 8-gram
  whose document frequency ≥ 2 is removed and the document re-joined.
  Pass A computes gram doc-frequencies distributively (distinct per-doc
  gram hashes → bucketed partial counts); only the HOT grams (df ≥ 2 —
  the boilerplate set, small relative to the corpus by construction)
  are collected and ``ray.put`` once; pass B re-streams the docs and
  masks covered token positions vectorized (searchsorted membership +
  diff-array coverage). No driver-side pass ever holds O(corpus) rows.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..functions.hashing import stable_hash64
from ._util import sized_read

MAX_FUZZY_TOKEN_LEN = 24   # bounds the O(L^2) delete-variant fan-out
FUZZY_MAX_DIST = 2         # delete-neighborhood depth == verify threshold
BOIL_K = 8                 # boilerplate gram width (words)
BOIL_MIN_DF = 2            # C4 rule: "occurs in more than one document"


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return sized_read(os.path.join(sf_dir, "documents.parquet"),
                      list(columns), rows_per_block=4096)


# ------------------------------------------------- fuzzy token matching

def delete_variants(tok: str) -> set[str]:
    """All strings reachable by deleting ≤ FUZZY_MAX_DIST characters
    (including the token itself — 0 deletions)."""
    out = {tok}
    n = len(tok)
    for i in range(n):
        out.add(tok[:i] + tok[i + 1:])
    for i in range(n):
        for j in range(i + 1, n):
            out.add(tok[:i] + tok[i + 1:j] + tok[j + 1:])
    return out


def levenshtein_banded(a: str, b: str, max_dist: int = FUZZY_MAX_DIST) -> int:
    """Exact Levenshtein distance if ≤ max_dist, else max_dist+1.
    Banded DP: only the 2·max_dist+1 diagonal band is evaluated, O(len·d)
    per pair. Runs on the candidate pairs only — the blocked survivors,
    a vanishing fraction of vocab² — so per-pair Python cost is off the
    hot path by construction."""
    if len(a) > len(b):
        a, b = b, a
    la, lb = len(a), len(b)
    if lb - la > max_dist:
        return max_dist + 1
    big = max_dist + 1
    prev = [j if j <= max_dist else big for j in range(la + 1)]
    for i in range(1, lb + 1):
        lo = max(1, i - max_dist)
        hi = min(la, i + max_dist)
        cur = [big] * (la + 1)
        if i - max_dist <= 0:
            cur[0] = i
        bi = b[i - 1]
        best = cur[0]
        for j in range(lo, hi + 1):
            c = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (a[j - 1] != bi))
            cur[j] = c
            if c < best:
                best = c
        if best > max_dist:
            return big
        prev = cur
    return prev[la] if prev[la] <= max_dist else big


def _distinct_tokens(sf_dir: str):
    """Corpus-distinct tokens (whitespace split, length-capped) as a
    Dataset of (tok) rows: per-batch distinct, then a bucketed global
    distinct (the shuffle carries each surviving token once per batch)."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS, _bucket_of

    def batch_tokens(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for text in df["text"]:
            toks.update(t for t in text.split()
                        if len(t) <= MAX_FUZZY_TOKEN_LEN)
        s = pd.Series(sorted(toks), dtype=object, name="tok")
        return pd.DataFrame({"tok": s,
                             "__bucket": _bucket_of(s, 64)})

    return (_docs(sf_dir, ("text",))
            .map_batches(batch_tokens, batch_format="pandas")
            .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(lambda df: df.drop_duplicates("tok")[["tok"]],
                        batch_format="pandas"))


def fuzzy_token_pairs(sf_dir: str):
    """(tok_a, tok_b, dist) for every unordered pair of corpus-distinct
    tokens with Levenshtein distance ≤ 2 (tok_a < tok_b). Exact — the
    delete-neighborhood blocking over-generates and the banded verify
    prunes back to the true set."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        vk, tk = [], []
        for tok in df["tok"]:
            for v in delete_variants(tok):
                vk.append(stable_hash64(v))
                tk.append(tok)
        return pd.DataFrame({
            "vkey": pd.array(np.array(vk, dtype=np.uint64).astype(np.int64)),
            "tok": pd.Series(tk, dtype=object),
            "__bucket": (np.array(vk, dtype=np.uint64)
                         % np.uint64(256)).astype(np.int64)})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """All token pairs sharing a variant key within this bucket.
        Groups are tiny (see module doc), so the per-vkey triu expansion
        is bounded; pairs are emitted canonically ordered (a < b)."""
        a_out, b_out = [], []
        df = df.sort_values(["vkey", "tok"], kind="mergesort")
        for _, g in df.groupby("vkey", sort=False):
            toks = g["tok"].drop_duplicates().to_numpy()
            if len(toks) < 2:
                continue
            ii, jj = np.triu_indices(len(toks), k=1)
            a_out.append(toks[ii])
            b_out.append(toks[jj])
        if not a_out:
            return pd.DataFrame({"tok_a": pd.Series([], dtype=object),
                                 "tok_b": pd.Series([], dtype=object)})
        return pd.DataFrame({"tok_a": np.concatenate(a_out),
                             "tok_b": np.concatenate(b_out)})

    def tag_pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (stable_hash64(a + "\x00" + b)
             for a, b in zip(df["tok_a"], df["tok_b"])),
            dtype=np.uint64, count=len(df))
        return df.assign(__bucket=(h % np.uint64(256)).astype(np.int64))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["tok_a", "tok_b"])
        dist = np.fromiter(
            (levenshtein_banded(a, b)
             for a, b in zip(df["tok_a"], df["tok_b"])),
            dtype=np.int64, count=len(df))
        out = df.loc[dist <= FUZZY_MAX_DIST, ["tok_a", "tok_b"]].copy()
        out["dist"] = dist[dist <= FUZZY_MAX_DIST]
        return out

    pairs = (_distinct_tokens(sf_dir)
             .map_batches(variants, batch_format="pandas")
             .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
             .map_groups(bucket_pairs, batch_format="pandas")
             .map_batches(tag_pair_bucket, batch_format="pandas")
             .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
             .map_groups(verify, batch_format="pandas"))
    out = pairs.to_pandas()
    return out.sort_values(["tok_a", "tok_b"], kind="mergesort") \
        .reset_index(drop=True)


FUZZY_TOKEN_PAIRS_SQL = rf"""
WITH v AS (
  SELECT DISTINCT unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents),
vf AS (SELECT tok FROM v WHERE length(tok) <= {MAX_FUZZY_TOKEN_LEN})
SELECT a.tok AS tok_a, b.tok AS tok_b,
       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
FROM vf a JOIN vf b ON a.tok < b.tok
WHERE levenshtein(a.tok, b.tok) <= {FUZZY_MAX_DIST}
ORDER BY tok_a, tok_b
"""


# --------------------------------------------- boilerplate n-gram removal

def _doc_gram_hashes(words: list[str]) -> np.ndarray:
    """uint64 hashes of the document's word-{BOIL_K}-grams, one per start
    position (NOT distinct — pass B needs every position)."""
    n = len(words) - BOIL_K + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter(
        (stable_hash64(" ".join(words[i:i + BOIL_K])) for i in range(n)),
        dtype=np.uint64, count=n)


def strip_boilerplate_ngrams(sf_dir: str):
    """(doc_id, text_stripped, n_removed): every token covered by a word
    8-gram appearing in ≥ {BOIL_MIN_DF} distinct documents is removed;
    the rest re-join with single spaces. The C4 repeated-span rule at
    8-gram granularity."""
    import ray
    from ._util import bucketed_group_sum

    docs = _docs(sf_dir)

    def gram_doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for text in df["text"]:
            g = np.unique(_doc_gram_hashes(text.split()))
            out_g.append(g)
            out_n.append(len(g))
        if not out_g:
            return pd.DataFrame({"gram": pd.Series([], dtype="int64"),
                                 "n_docs": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "gram": np.concatenate(out_g).astype(np.int64),
            "n_docs": np.ones(int(np.sum(out_n)), dtype=np.int64)})

    counts = bucketed_group_sum(
        docs.map_batches(gram_doc_rows, batch_format="pandas"),
        key="gram", sum_cols=["n_docs"])
    hot = counts.map_batches(
        lambda df: df.loc[df["n_docs"] >= BOIL_MIN_DF, ["gram"]],
        batch_format="pandas")
    # the hot set is the corpus' boilerplate inventory — bounded by the
    # volume of repeated content, not by corpus size; broadcast once
    hot_arr = np.sort(hot.to_pandas()["gram"].to_numpy(dtype=np.int64)
                      .astype(np.uint64))
    hot_ref = ray.put(hot_arr)

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        hot_sorted = ray.get(hot_ref)
        ids, texts, removed = [], [], []
        for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"]):
            words = text.split()
            gh = _doc_gram_hashes(words)
            cover = np.zeros(len(words) + 1, dtype=np.int64)
            if len(gh) and len(hot_sorted):
                idx = np.searchsorted(hot_sorted, gh)
                idx[idx == len(hot_sorted)] = 0
                starts = np.nonzero(hot_sorted[idx] == gh)[0]
                # diff-array coverage: +1 at each hot start, -1 past its end
                np.add.at(cover, starts, 1)
                np.add.at(cover, np.minimum(starts + BOIL_K, len(words)), -1)
            mask = np.cumsum(cover[:-1]) > 0 if len(words) else \
                np.zeros(0, dtype=bool)
            kept = np.array(words, dtype=object)[~mask] if len(words) else []
            ids.append(doc_id)
            texts.append(" ".join(kept))
            removed.append(int(mask.sum()))
        return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                             "text_stripped": pd.Series(texts, dtype=object),
                             "n_removed": np.array(removed, dtype=np.int64)})

    return docs.map_batches(strip, batch_format="pandas")


STRIP_BOILERPLATE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w
  FROM documents),
npos AS (SELECT doc_id, w, len(w) AS n FROM toks),
gpos AS (SELECT doc_id, w, unnest(generate_series(1, n - {BOIL_K - 1})) AS i
         FROM npos WHERE n >= {BOIL_K}),
grams AS (SELECT doc_id, i, array_to_string(w[i:i + {BOIL_K - 1}], ' ') AS g
          FROM gpos),
hot AS (SELECT g FROM (
          SELECT g, count(DISTINCT doc_id) AS c FROM grams GROUP BY g)
        WHERE c >= {BOIL_MIN_DF}),
cover AS (SELECT DISTINCT doc_id, p FROM (
            SELECT doc_id, i + unnest(generate_series(0, {BOIL_K - 1})) AS p
            FROM grams JOIN hot USING (g))),
tokpos AS (SELECT doc_id, unnest(w) AS tok,
                  unnest(generate_series(1, len(w))) AS p
           FROM npos),
kept AS (SELECT tp.doc_id,
                coalesce(string_agg(tp.tok, ' ' ORDER BY tp.p)
                         FILTER (c.p IS NULL), '') AS text_stripped,
                CAST(count(*) FILTER (c.p IS NOT NULL) AS BIGINT)
                  AS n_removed
         FROM tokpos tp
         LEFT JOIN cover c ON c.doc_id = tp.doc_id AND c.p = tp.p
         GROUP BY tp.doc_id)
SELECT d.doc_id, coalesce(k.text_stripped, '') AS text_stripped,
       coalesce(k.n_removed, 0) AS n_removed
FROM documents d LEFT JOIN kept k USING (doc_id)
ORDER BY d.doc_id
"""

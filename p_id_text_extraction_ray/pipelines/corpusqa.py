"""Corpus quality-assurance analytics: the audit queries a curation team
runs to characterize a corpus before/after filtering — language-ID
confusion against labels, n-gram diversity (the repetition/degeneration
metric), and Zipf-slope token-distribution fits. All three are
oracle-backed (exact SQL mirrors).

Scale shapes: every op is one streaming corpus pass reduced through
``bucketed_group_sum`` (grams/tokens pre-deduplicated or pre-counted per
batch), with driver state bounded by the label/vocab domain — never
corpus-scale.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import textops as T


def _docs(sf_dir: str, columns):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=list(columns))


# ------------------------------------------------ language confusion

def lang_confusion_matrix(sf_dir: str):
    """(lang, lang_pred, n) — the labeled language column crossed with
    the marker-stopword predictor (`textstats.lang_id_pred`): the
    confusion matrix that tells a curation team where the cheap
    language gate mis-routes documents. Ordered by (lang, lang_pred).

    Scale shape: prediction is the vectorized Arrow kernel per batch;
    each batch collapses to (lang, lang_pred) partial counts, reduced
    by one bucketed sum to a |langs|² table."""
    from ._util import bucketed_group_sum

    def partial(t: pa.Table) -> pd.DataFrame:
        pred = T.lang_id(t.column("text").combine_chunks()).to_pylist()
        df = pd.DataFrame({"lang": t.column("lang").to_pylist(),
                           "lang_pred": pred})
        out = df.value_counts(["lang", "lang_pred"]).reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    agg = bucketed_group_sum(
        _docs(sf_dir, ("lang", "text")).map_batches(
            partial, batch_format="pyarrow"),
        ["lang", "lang_pred"], ["n"])
    out = agg.to_pandas()
    if "lang" not in out.columns:
        return pd.DataFrame({"lang": pd.Series([], dtype=object),
                             "lang_pred": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    return out.sort_values(["lang", "lang_pred"], kind="mergesort") \
        .reset_index(drop=True)


def _lang_count_sql(lang: str) -> str:
    words = "|".join(T.LANG_MARKERS[lang])
    return rf"len(regexp_extract_all(lower(text), '\b({words})\b'))"


LANG_CONFUSION_SQL = f"""
WITH c AS (
  SELECT doc_id, lang,
         {_lang_count_sql('en')} AS en, {_lang_count_sql('de')} AS de,
         {_lang_count_sql('fr')} AS fr, {_lang_count_sql('es')} AS es
  FROM documents),
p AS (
  SELECT lang,
       CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
            WHEN en = greatest(en, de, fr, es) THEN 'en'
            WHEN de = greatest(de, fr, es) THEN 'de'
            WHEN fr = greatest(fr, es) THEN 'fr'
            ELSE 'es' END AS lang_pred
  FROM c)
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY lang, lang_pred ORDER BY lang, lang_pred
"""


# ------------------------------------------------ n-gram diversity

NGRAM_DIVERSITY_N = 3


def ngram_diversity(sf_dir: str):
    """(source, n_grams, n_distinct, diversity) — word-trigram
    type/token ratio per source: the distinct-n-gram fraction that
    repetition/degeneration audits report (low diversity = boilerplate
    or TEMPLATED spam; the distinct-n-grams metric of Li et al. 2016).
    diversity = n_distinct / n_grams (6 dp), sources with fewer than
    one trigram in total are omitted. Ordered by source.

    Scale shape: per batch, trigram totals collapse to one count per
    source AND (source, gram) pairs pre-dedupe before the shuffle; one
    bucketed shuffle keyed on the gram then dedupes globally and emits
    per-source distinct partials; both reduce to |sources|-row tables.
    The shuffle carries 8-byte gram HASHES, never gram text (the
    `dedup_substring` stance: blake2b-64 collisions are negligible at
    any corpus size, and the distinct count over hashes equals the
    oracle's distinct count over strings absent a collision)."""
    from ..functions.hashing import stable_hash64
    from ._util import bucketed_group_sum

    n = NGRAM_DIVERSITY_N

    def grams_of(text: str) -> list[str]:
        w = text.split()
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    def total_partial(df: pd.DataFrame) -> pd.DataFrame:
        cnt: dict[str, int] = {}
        for src, text in zip(df["source"], df["text"]):
            cnt[src] = cnt.get(src, 0) + max(0, len(text.split()) - n + 1)
        return pd.DataFrame({"source": pd.Series(list(cnt), dtype=object),
                             "n_grams": np.fromiter(cnt.values(), np.int64,
                                                    len(cnt))})

    totals = bucketed_group_sum(
        _docs(sf_dir, ("source", "text")).map_batches(
            total_partial, batch_format="pandas"),
        "source", ["n_grams"]).to_pandas()

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        seen: set[tuple[str, int]] = set()
        for src, text in zip(df["source"], df["text"]):
            for g in grams_of(text):
                seen.add((src, stable_hash64(g) - (1 << 63)))
        return pd.DataFrame({
            "source": pd.Series([p[0] for p in seen], dtype=object),
            "g": np.fromiter((p[1] for p in seen), np.int64, len(seen))})

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["source", "g"])
        out = d.groupby("source", as_index=False).size() \
            .rename(columns={"size": "n_distinct"})
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out

    from .joins import _bucket_of

    pairs = _docs(sf_dir, ("source", "text")).map_batches(
        pair_partial, batch_format="pandas")
    # shuffle keyed on the GRAM so all copies of a (source, gram) land
    # together; per-group dedup then counts distinct grams per source
    distinct = bucketed_group_sum(
        pairs.map_batches(
            lambda df: df.assign(__b=_bucket_of(df["g"], 256)),
            batch_format="pandas")
        .groupby("__b", num_partitions=16)
        .map_groups(distinct_partial, batch_format="pandas"),
        "source", ["n_distinct"]).to_pandas()

    if "source" not in totals.columns or totals.empty:
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "n_grams": pd.Series([], dtype=np.int64),
                             "n_distinct": pd.Series([], dtype=np.int64),
                             "diversity": pd.Series([], dtype=np.float64)})
    out = totals.merge(distinct, on="source", how="inner")
    out = out[out["n_grams"] > 0].copy()
    out["diversity"] = np.round(
        out["n_distinct"].to_numpy(np.float64)
        / out["n_grams"].to_numpy(np.float64), 6)
    return out.sort_values("source", kind="mergesort") \
        .reset_index(drop=True)


NGRAM_DIVERSITY_SQL = rf"""
WITH toks AS (
  SELECT source, regexp_extract_all(text, '\S+') AS w FROM documents),
g AS (
  SELECT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
  FROM (SELECT source, w, unnest(range(1, len(w) - 1)) AS i
        FROM toks WHERE len(w) >= {NGRAM_DIVERSITY_N}))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
       round(count(DISTINCT gram) * 1.0 / count(*), 6) AS diversity
FROM g GROUP BY source ORDER BY source
"""


# ------------------------------------------------ Zipf slope

ZIPF_TOP_K = 500


def zipf_slope(sf_dir: str):
    """(source, n_tokens_ranked, slope) — the OLS slope of ln(freq) on
    ln(rank) over each source's top-{ZIPF_TOP_K} tokens (rank by count
    desc, token asc): natural corpora fit slope ≈ −1 (Zipf's law);
    machine-generated or templated text bends the fit, which makes the
    slope a cheap distribution-level quality gate. 6 dp; ordered by
    source.

    Scale shape: one bucketed token-count pass; the per-source top-K
    tables are K-bounded (two-stage: per-block nlargest then a
    driver-side cut over |sources|×K candidate rows); the regression
    itself is K points per source on the driver."""
    from ._util import bucketed_group_sum

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        cnt: dict[tuple[str, str], int] = {}
        for src, text in zip(df["source"], df["text"]):
            for w in text.split():
                k = (src, w)
                cnt[k] = cnt.get(k, 0) + 1
        ks = list(cnt)
        return pd.DataFrame({
            "source": pd.Series([k[0] for k in ks], dtype=object),
            "tok": pd.Series([k[1] for k in ks], dtype=object),
            "c": np.fromiter(cnt.values(), np.int64, len(ks))})

    counts = bucketed_group_sum(
        _docs(sf_dir, ("source", "text")).map_batches(
            tok_partial, batch_format="pandas"),
        ["source", "tok"], ["c"])
    # two-stage bounded top-K per source before the driver pull
    part = counts.map_batches(
        lambda df: df.sort_values(["c", "tok"], ascending=[False, True],
                                  kind="mergesort")
        .groupby("source", as_index=False).head(ZIPF_TOP_K),
        batch_format="pandas").to_pandas()
    if "source" not in part.columns or part.empty:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_tokens_ranked": pd.Series([], dtype=np.int64),
            "slope": pd.Series([], dtype=np.float64)})
    rows = []
    for src, grp in part.groupby("source"):
        grp = grp.sort_values(["c", "tok"], ascending=[False, True],
                              kind="mergesort").head(ZIPF_TOP_K)
        c = grp["c"].to_numpy(np.float64)
        rank = np.arange(1, len(c) + 1, dtype=np.float64)
        x, y = np.log(rank), np.log(c)
        vx = x.var()
        slope = float(((x - x.mean()) * (y - y.mean())).mean() / vx) \
            if vx > 0 else 0.0
        rows.append({"source": src,
                     "n_tokens_ranked": np.int64(len(c)),
                     "slope": np.round(slope, 6)})
    return pd.DataFrame(rows).sort_values("source", kind="mergesort") \
        .reset_index(drop=True)


# ------------------------------------------------ token burstiness

BURST_TOP_K = 50


def token_burstiness(sf_dir: str):
    """(tok, n_docs_with, total_c, burstiness) for the corpus's
    top-{BURST_TOP_K} tokens by total count: burstiness = the
    variance-to-mean ratio (index of dispersion) of the token's
    per-document count, zeros included — ~1 for Poisson-scattered
    function words, >> 1 for topical/bursty terms (Church & Gale 1995).
    The dispersion audit that separates glue vocabulary from content
    vocabulary when building stopword lists or quality features.
    6 dp; ordered by (total_c desc, tok).

    Scale shape: one streaming pass emits per-(token) partials of
    Σc and Σc² over the docs in each batch (zeros contribute nothing,
    so only present-token pairs are counted) plus a doc-count partial;
    a bucketed sum reduces to the token domain; the top-K cut happens
    on per-block nlargest then a driver cut over blocks × K candidate
    rows. Moments are exact integers; the division happens once at the
    end."""
    from ._util import bucketed_group_sum, round_sql

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        s: dict[str, int] = {}
        s2: dict[str, int] = {}
        nd: dict[str, int] = {}
        for text in df["text"]:
            cnt: dict[str, int] = {}
            for w in text.split():
                cnt[w] = cnt.get(w, 0) + 1
            for w, c in cnt.items():
                s[w] = s.get(w, 0) + c
                s2[w] = s2.get(w, 0) + c * c
                nd[w] = nd.get(w, 0) + 1
        ks = list(s)
        out = pd.DataFrame({
            "tok": pd.Series(ks, dtype=object),
            "c": np.fromiter((s[k] for k in ks), np.int64, len(ks)),
            "c2": np.fromiter((s2[k] for k in ks), np.int64, len(ks)),
            "nd": np.fromiter((nd[k] for k in ks), np.int64, len(ks))})
        # one marker row per batch carries the doc count
        return pd.concat([out, pd.DataFrame({
            "tok": [""], "c": np.array([len(df)], np.int64),
            "c2": np.zeros(1, np.int64), "nd": np.zeros(1, np.int64)})],
            ignore_index=True)

    agg = bucketed_group_sum(
        _docs(sf_dir, ("text",)).map_batches(partials,
                                             batch_format="pandas"),
        "tok", ["c", "c2", "nd"])
    part = agg.map_batches(
        lambda df: pd.concat([df[df["tok"] == ""],
                              df[df["tok"] != ""].nlargest(BURST_TOP_K,
                                                           "c")]),
        batch_format="pandas").to_pandas()
    if "tok" not in part.columns or part.empty:
        return pd.DataFrame({"tok": pd.Series([], dtype=object),
                             "n_docs_with": pd.Series([], dtype=np.int64),
                             "total_c": pd.Series([], dtype=np.int64),
                             "burstiness": pd.Series([], dtype=np.float64)})
    n_docs = int(part.loc[part["tok"] == "", "c"].sum())
    top = part[part["tok"] != ""] \
        .sort_values(["c", "tok"], ascending=[False, True],
                     kind="mergesort").head(BURST_TOP_K)
    c = top["c"].to_numpy(np.int64)
    c2 = top["c2"].to_numpy(np.int64)
    mean = c / n_docs
    var = c2 / n_docs - mean * mean
    return pd.DataFrame({
        "tok": top["tok"].to_numpy(),
        "n_docs_with": top["nd"].to_numpy(np.int64),
        "total_c": c,
        "burstiness": round_sql(var / mean)}).reset_index(drop=True)


TOKEN_BURSTINESS_SQL = rf"""
WITH dc AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents),
per AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
  FROM dc GROUP BY doc_id, tok),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
tot AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_docs_with,
         CAST(sum(c) AS BIGINT) AS total_c,
         CAST(sum(c * c) AS BIGINT) AS total_c2
  FROM per GROUP BY tok),
top AS (
  SELECT * FROM tot
  QUALIFY row_number() OVER (ORDER BY total_c DESC, tok)
          <= {BURST_TOP_K})
SELECT tok, n_docs_with, total_c,
       round(((total_c2 * 1.0 / n.n_docs)
              - (total_c * 1.0 / n.n_docs) * (total_c * 1.0 / n.n_docs))
             / (total_c * 1.0 / n.n_docs), 6) AS burstiness
FROM top CROSS JOIN n
ORDER BY total_c DESC, tok
"""


ZIPF_SLOPE_SQL = rf"""
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(text, '\S+')) AS t
  FROM documents),
cnt AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY source, t),
ranked AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source
                            ORDER BY c DESC, t) AS rank
  FROM cnt
  QUALIFY rank <= {ZIPF_TOP_K})
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens_ranked,
       round(regr_slope(ln(c), ln(rank)), 6) AS slope
FROM ranked GROUP BY source ORDER BY source
"""

"""Corpus-composition analytics: vocabulary growth and mixture resampling.

* ``vocab_growth_curve`` — Heaps'-law style curve: for ten doc_id-grid
  checkpoints, how many documents / distinct tokens / token occurrences
  the corpus prefix below the checkpoint contains. Distributed shape:
  token first-occurrence (min doc_id per token) via a hash-bucketed
  shuffle (the token space is unbounded — never a driver dict), then the
  curve reduces to 10-bin histograms computed as per-batch partials +
  one tiny reduce; the driver only ever sees 10 rows. Checkpoints use a
  doc_id VALUE grid with pure integer arithmetic (``mn + k*(mx-mn)//10``)
  so the DuckDB oracle is bit-identical.

* ``resample_to_lang_mix`` — deterministic importance resampling to a
  uniform language mixture (the CCNet/data-mixing rebalance step): each
  doc keeps with probability m/n_lang (m = smallest language count) via
  an exact integer threshold on its md5 uniform — ``md5_52(doc_id) *
  n_lang < m * 2^52`` — all in arbitrary-precision ints on the Python
  side and HUGEINT in the oracle, so acceptance is reproducible
  bit-for-bit and shard-independent (pure function of doc_id). Language
  counts are a per-batch ``value_counts`` partial reduced to |langs|
  rows; only that tiny table reaches the driver and ships back into the
  filter closure.

* ``dsir_importance_weights`` — DSIR data selection (Xie et al. 2023):
  hashed-unigram bucket LMs for a target source vs the raw pool, per-doc
  log importance weights for the raw docs. Bucket counts reduce to a
  bounded <= 64 Ki-row table (the only driver materialization); scoring
  streams through an actor pool holding the broadcast log-prob arrays.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

N_CHECKPOINTS = 10
_U52 = 4503599627370496  # 2^52: 13 hex digits of md5 -> exact integer


def _docs(sf_dir: str, columns: list[str]):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _scalar_minmax_docid(ds, parquet_path: str | None = None
                         ) -> tuple[int, int]:
    """(min, max+1) of doc_id. With ``parquet_path``, read the answer
    from the parquet ROW-GROUP STATISTICS — a pure footer read, no data
    pass (the standard pruning metadata every writer emits; at 100 TB
    this saves a full corpus scan). Falls back to per-batch partials on
    missing stats (driver sees one row per block)."""
    if parquet_path is not None:
        import os
        import pyarrow.parquet as pq
        files = ([parquet_path] if os.path.isfile(parquet_path) else
                 sorted(os.path.join(r, f)
                        for r, _, ns in os.walk(parquet_path)
                        for f in ns if f.endswith((".parquet", ".pq"))))
        mns, mxs, ok = [], [], bool(files)
        for fp in files:
            md = pq.ParquetFile(fp).metadata
            if md.num_rows == 0:
                continue
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                st = next((rg.column(i).statistics
                           for i in range(rg.num_columns)
                           if rg.column(i).path_in_schema == "doc_id"),
                          None)
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mns.append(int(st.min))
                mxs.append(int(st.max))
            if not ok:
                break
        if ok:
            if not mns:        # zero rows in every file
                return 0, 0
            return min(mns), max(mxs) + 1
    part = ds.map_batches(
        lambda df: pd.DataFrame({"mn": [df["doc_id"].min()],
                                 "mx": [df["doc_id"].max()]}),
        batch_format="pandas").to_pandas()
    if part.empty or "mn" not in part.columns:
        return 0, 0
    return int(part["mn"].min()), int(part["mx"].max()) + 1


def vocab_growth_curve(sf_dir: str):
    """(decile, cutoff_doc_id, n_docs, vocab_size, n_tokens) x 10."""
    from .joins import _bucket_of, DEFAULT_SHUFFLE_PARTITIONS

    docs = _docs(sf_dir, ["doc_id", "text"])
    mn, mx = _scalar_minmax_docid(docs, f"{sf_dir}/documents.parquet")
    if mx == 0 and mn == 0:
        # empty corpus: zero counts and NULL cutoffs, exactly like the
        # oracle (min/max over zero rows is NULL) — NaN is pandas' null
        return pd.DataFrame({
            "decile": np.arange(1, N_CHECKPOINTS + 1, dtype=np.int64),
            "cutoff_doc_id": np.full(N_CHECKPOINTS, np.nan),
            "n_docs": np.zeros(N_CHECKPOINTS, np.int64),
            "vocab_size": np.zeros(N_CHECKPOINTS, np.int64),
            "n_tokens": np.zeros(N_CHECKPOINTS, np.int64)})
    cuts = np.array([mn + (k * (mx - mn)) // N_CHECKPOINTS
                     for k in range(1, N_CHECKPOINTS + 1)], dtype=np.int64)

    # token -> first doc_id: per-batch partial min, bucket-shuffled exact
    # min (vectorized: one np.unique over the batch token stream, then an
    # unbuffered minimum scatter — integer-exact, no ordering concerns)
    def partial_first(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [t.split() for t in df["text"]]
        lens = np.fromiter((len(x) for x in tok_lists), np.int64,
                           len(tok_lists))
        total = int(lens.sum())
        if total == 0:
            return pd.DataFrame({"t": pd.Series([], dtype=object),
                                 "fd": pd.Series([], dtype=np.int64),
                                 "__bucket": pd.Series([], dtype=np.int64)})
        all_tokens = np.empty(total, dtype=object)
        p = 0
        for x in tok_lists:
            if x:
                all_tokens[p:p + len(x)] = x
                p += len(x)
        doc_of = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        uniq, inv = np.unique(all_tokens, return_inverse=True)
        fd = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(fd, inv, doc_of)
        out = pd.DataFrame({"t": pd.Series(uniq, dtype=object), "fd": fd})
        out["__bucket"] = _bucket_of(out["t"], 64)
        return out

    def bucket_min_hist(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("t")["fd"].min().to_numpy()
        # 10 cumulative counts: tokens first seen below each cutoff
        counts = (fd[:, None] < cuts[None, :]).sum(axis=0)
        return pd.DataFrame({"decile": np.arange(1, N_CHECKPOINTS + 1,
                                                 dtype=np.int64),
                             "vocab_size": counts.astype(np.int64)})

    vocab = (docs.map_batches(partial_first, batch_format="pandas")
             .groupby("__bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
             .map_groups(lambda g: bucket_min_hist(g.drop(columns="__bucket")),
                         batch_format="pandas"))

    # docs + token occurrences below each cutoff: per-batch 10-bin partials
    def doc_hist(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        ntok = df["text"].str.count(r"\S+").to_numpy(np.int64)
        below = ids[:, None] < cuts[None, :]
        return pd.DataFrame({
            "decile": np.arange(1, N_CHECKPOINTS + 1, dtype=np.int64),
            "n_docs": below.sum(axis=0).astype(np.int64),
            "n_tokens": (below * ntok[:, None]).sum(axis=0).astype(np.int64)})

    dh = (docs.map_batches(doc_hist, batch_format="pandas").to_pandas()
          .groupby("decile", as_index=False).sum())
    vp = vocab.to_pandas()
    # all-empty texts: no token rows at all -> a column-less frame
    vh = (vp.groupby("decile", as_index=False)["vocab_size"].sum()
          if "decile" in vp.columns
          else pd.DataFrame({"decile": pd.Series([], dtype=np.int64),
                             "vocab_size": pd.Series([], dtype=np.int64)}))
    out = dh.merge(vh, on="decile", how="left").fillna({"vocab_size": 0})
    out["cutoff_doc_id"] = cuts
    return out[["decile", "cutoff_doc_id", "n_docs",
                "vocab_size", "n_tokens"]].astype(
        {"vocab_size": np.int64}).sort_values("decile") \
        .reset_index(drop=True)


VOCAB_GROWTH_CURVE_SQL = rf"""
WITH b AS (SELECT min(doc_id) mn, max(doc_id)+1 mx FROM documents),
cp AS (SELECT CAST(k AS BIGINT) AS decile,
              mn + (k*(mx-mn))//{N_CHECKPOINTS} AS cutoff_doc_id
       FROM range(1,{N_CHECKPOINTS + 1}) r(k) CROSS JOIN b),
tok AS (SELECT doc_id, unnest(regexp_extract_all(text,'\S+')) t
        FROM documents),
fo AS (SELECT t, min(doc_id) fd FROM tok GROUP BY t)
SELECT decile, cutoff_doc_id,
  (SELECT count(*) FROM documents d
   WHERE d.doc_id < cutoff_doc_id) AS n_docs,
  (SELECT count(*) FROM fo WHERE fd < cutoff_doc_id) AS vocab_size,
  (SELECT count(*) FROM tok WHERE doc_id < cutoff_doc_id) AS n_tokens
FROM cp ORDER BY decile
"""


def resample_to_lang_mix(sf_dir: str):
    """Kept (doc_id, lang) rows after exact uniform-mix downsampling."""
    docs = _docs(sf_dir, ["doc_id", "lang"])

    part = docs.map_batches(
        lambda df: df["lang"].value_counts().rename_axis("lang")
        .reset_index(name="n"), batch_format="pandas").to_pandas()
    # empty corpus: the partial frame has no columns at all
    counts = (part.groupby("lang")["n"].sum()
              if "lang" in part.columns else pd.Series([], dtype=np.int64))
    if counts.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "lang": pd.Series([], dtype=object)})
    nl = counts.to_dict()          # |langs| rows — the only driver state
    m = int(counts.min())

    def accept(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        n = df["lang"].map(nl).to_numpy(np.int64)
        keep = np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16)
             * int(nl_) < m * _U52 for d, nl_ in zip(ids, n)),
            dtype=bool, count=len(ids))
        return pd.DataFrame({"doc_id": ids[keep],
                             "lang": df["lang"].to_numpy()[keep]})

    return docs.map_batches(accept, batch_format="pandas")


RESAMPLE_TO_LANG_MIX_SQL = f"""
WITH nl AS (SELECT lang, count(*) n FROM documents GROUP BY lang),
m AS (SELECT min(n) m FROM nl)
SELECT doc_id, lang
FROM documents JOIN nl USING (lang) CROSS JOIN m
WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                AS BIGINT) AS HUGEINT) * n
      < CAST(m AS HUGEINT) * {_U52}
"""


# ------------------------------------------------ DSIR importance weights

DSIR_BUCKETS = 65536
DSIR_TARGET_SOURCE = "src0"


class _DsirScoreStage:
    """Per-doc log importance weight under hashed-unigram bucket LMs
    (Xie et al. 2023, Data Selection via Importance Resampling). The two
    log-prob tables (64 Ki doubles each, built from corpus bucket counts)
    arrive via constructor args — shipped once per actor, the canonical
    broadcast-small-side shape — and a token->bucket md5 cache warms up
    as actor state."""

    def __init__(self, lt, lr):
        import numpy as np
        self.lt = np.asarray(lt, np.float64)
        self.lr = np.asarray(lr, np.float64)
        # per-bucket contribution values: lt[b] - lr[b] is the same
        # float64 subtraction the scalar loop performed per term
        self.diff = self.lt - self.lr
        self._bucket: dict[str, int] = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ._util import doc_token_weight_sums
        pos, _, sums = doc_token_weight_sums(
            df["text"].tolist(), self.diff, self._bucket)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[pos],
            "log_importance": np.array([round(s, 6) for s in sums],
                                       np.float64)})


def dsir_importance_weights(sf_dir: str):
    """(doc_id, log_importance) for every non-target doc: how much more
    likely under the target source's hashed-unigram LM than the raw
    pool's (add-one smoothing on the bucket space).

    Scale shape: bucket counts are per-batch ``bincount`` partials
    reduced by a bounded (<= 64 Ki rows) groupby — the ONLY driver-side
    materialization is that bounded table; scoring streams through an
    actor pool holding the broadcast log-prob arrays. Bit-exact vs the
    DuckDB oracle: md5 buckets, exact integer counts, libm ``ln`` of
    identical doubles, per-doc sums in ascending token order, 6 dp."""
    import math

    docs = _docs(sf_dir, ["doc_id", "source", "text"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket counts: ONE np.unique over the batch's
        # token stream, md5 only the batch-distinct tokens, bincount per
        # source class (exact integers — no ordering concerns)
        from ._util import md5_buckets
        tok_lists = [t.split() for t in df["text"]]
        lens = np.fromiter((len(x) for x in tok_lists), np.int64,
                           len(tok_lists))
        total = int(lens.sum())
        if total == 0:
            return pd.DataFrame({"b": np.empty(0, np.int64),
                                 "ct": np.empty(0, np.int64),
                                 "cr": np.empty(0, np.int64)})
        all_tokens = np.empty(total, dtype=object)
        p = 0
        for x in tok_lists:
            if x:
                all_tokens[p:p + len(x)] = x
                p += len(x)
        is_tgt = np.repeat(
            (df["source"] == DSIR_TARGET_SOURCE).to_numpy(), lens)
        uniq, inv = np.unique(all_tokens, return_inverse=True)
        b_all = md5_buckets(uniq, {})[inv]
        ct = np.bincount(b_all[is_tgt], minlength=DSIR_BUCKETS)
        cr = np.bincount(b_all[~is_tgt], minlength=DSIR_BUCKETS)
        nz = np.flatnonzero(ct | cr)
        return pd.DataFrame({"b": nz.astype(np.int64),
                             "ct": ct[nz].astype(np.int64),
                             "cr": cr[nz].astype(np.int64)})

    from ._util import bucketed_group_sum
    counts = bucketed_group_sum(
        docs.map_batches(partial_counts, batch_format="pandas"),
        "b", ["ct", "cr"]).to_pandas()

    ctf = np.zeros(DSIR_BUCKETS, np.int64)
    crf = np.zeros(DSIR_BUCKETS, np.int64)
    if not counts.empty:
        ctf[counts["b"].to_numpy(np.int64)] = counts["ct"].to_numpy(np.int64)
        crf[counts["b"].to_numpy(np.int64)] = counts["cr"].to_numpy(np.int64)
    nt, nr = int(ctf.sum()), int(crf.sum())
    lt = np.array([math.log((int(c) + 1) / (nt + DSIR_BUCKETS))
                   for c in ctf])
    lr = np.array([math.log((int(c) + 1) / (nr + DSIR_BUCKETS))
                   for c in crf])

    def raw_only(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["source"] != DSIR_TARGET_SOURCE,
                      ["doc_id", "text"]]

    return (docs.map_batches(raw_only, batch_format="pandas")
            .map_batches(_DsirScoreStage, fn_constructor_args=(lt, lr),
                         batch_format="pandas", concurrency=(1, 8),
                         num_cpus=1))


DSIR_IMPORTANCE_WEIGHTS_SQL = rf"""
WITH tok AS (SELECT doc_id, source,
                    unnest(regexp_extract_all(text, '\S+')) t
             FROM documents),
tb AS (SELECT doc_id, source, t,
              CAST(concat('0x', substr(md5(t), 1, 4)) AS BIGINT) b
       FROM tok),
tgt AS (SELECT b, CAST(count(*) AS BIGINT) c FROM tb
        WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY b),
nt AS (SELECT CAST(count(*) AS BIGINT) n FROM tb
       WHERE source = '{DSIR_TARGET_SOURCE}'),
rawc AS (SELECT b, CAST(count(*) AS BIGINT) c FROM tb
         WHERE source <> '{DSIR_TARGET_SOURCE}' GROUP BY b),
nr AS (SELECT CAST(count(*) AS BIGINT) n FROM tb
       WHERE source <> '{DSIR_TARGET_SOURCE}'),
dt AS (SELECT doc_id, t, b, CAST(count(*) AS BIGINT) tf FROM tb
       WHERE source <> '{DSIR_TARGET_SOURCE}' GROUP BY doc_id, t, b)
SELECT doc_id,
       round(sum(tf * (ln((coalesce(tgt.c, 0) + 1) * 1.0
                          / (nt.n + {DSIR_BUCKETS}))
                       - ln((coalesce(rawc.c, 0) + 1) * 1.0
                            / (nr.n + {DSIR_BUCKETS})))
                 ORDER BY t), 6) AS log_importance
FROM dt LEFT JOIN tgt USING (b) LEFT JOIN rawc USING (b)
CROSS JOIN nt CROSS JOIN nr
GROUP BY doc_id
"""


# ------------------------------------- temperature-smoothed lang mixing

MIX_ALPHA = 0.7   # the multilingual-LM exponent (XLM-R / mBERT style)


def resample_temperature_mix(sf_dir: str):
    """Kept (doc_id, lang) rows after temperature-based language
    resampling: target share of lang l is n_l^alpha / sum_k n_k^alpha
    (alpha = 0.7 — the standard multilingual-pretraining smoothing that
    upweights low-resource languages without flattening the mix the way
    the uniform resample does). Per-doc acceptance probability is
    q_l = (n_min / n_l)^(1 - alpha) (the smallest language keeps
    everything; alpha = 0 degenerates to `resample_to_lang_mix`),
    applied as a deterministic md5-uniform threshold per doc_id.

    Scale shape: identical to `resample_to_lang_mix` — one streaming
    counts pass reduced to |langs| driver rows, then a pure row-local
    accept filter (zero shuffle). Determinism contract vs the oracle:
    q_l uses libm `pow` on exact doubles (DuckDB `power` is the same
    libm call), the uniform is the exact integer md5_52(doc_id), and
    the comparison u < q_l * 2^52 happens in float64 on both sides
    (u < 2^52 is exactly representable)."""
    docs = _docs(sf_dir, ["doc_id", "lang"])

    part = docs.map_batches(
        lambda df: df["lang"].value_counts().rename_axis("lang")
        .reset_index(name="n"), batch_format="pandas").to_pandas()
    counts = (part.groupby("lang")["n"].sum()
              if "lang" in part.columns else pd.Series([], dtype=np.int64))
    if counts.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "lang": pd.Series([], dtype=object)})
    m = int(counts.min())
    # threshold per lang, float64: (m / n_l) ** (1 - alpha) * 2^52
    thr = {lang: ((m / int(n)) ** (1.0 - MIX_ALPHA)) * float(_U52)
           for lang, n in counts.items()}

    def accept(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        t = df["lang"].map(thr).to_numpy(np.float64)
        u = np.fromiter(
            (float(int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16))
             for d in ids), dtype=np.float64, count=len(ids))
        keep = u < t
        return pd.DataFrame({"doc_id": ids[keep],
                             "lang": df["lang"].to_numpy()[keep]})

    return docs.map_batches(accept, batch_format="pandas")


RESAMPLE_TEMPERATURE_MIX_SQL = f"""
WITH nl AS (SELECT lang, count(*) n FROM documents GROUP BY lang),
m AS (SELECT min(n) m FROM nl)
SELECT doc_id, lang
FROM documents JOIN nl USING (lang) CROSS JOIN m
WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                AS BIGINT) AS DOUBLE)
      < power(CAST(m AS DOUBLE) / n, {1.0 - MIX_ALPHA})
        * {float(_U52)!r}
"""

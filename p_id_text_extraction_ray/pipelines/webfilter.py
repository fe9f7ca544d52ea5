"""Web-corpus hygiene operators: PII redaction and C4-style quality flags.

Both are single-pass ``map_batches`` transforms (no shuffle at any scale:
each doc is scored/rewritten independently, so 100 TB streams straight
through task-pool workers with the read's own partitioning).

* ``pii_redact`` — the standard pre-training scrub pass: emails, IPv4
  addresses and phone-like digit runs are replaced with typed
  placeholders, with per-category counts kept as columns (the counts
  feed corpus audits; the placeholders keep token positions stable).
  Patterns are written in the RE2-compatible subset that Python ``re``
  evaluates identically (explicit ``[0-9]``, no lookaround), and the
  three rewrites apply in a fixed order (email -> ip -> phone) so the
  DuckDB oracle can mirror them as nested ``regexp_replace`` stages.
  The sandbox corpus is digit-free word soup, so corpus counts are
  zero and the text passes through — planted-PII pytest cases carry
  the redaction semantics (``tests/test_webfilter.py``).

* ``c4_quality_flags`` — C4's heuristic page filters (Raffel et al.
  2020), adapted doc-level: word-count band, terminal punctuation,
  lorem-ipsum / curly-brace / boilerplate-phrase tripwires. ``keep``
  applies the band + tripwires; the punctuation flag is reported but
  (unlike line-level C4) not fatal, because whole docs are the unit
  here.
"""

from __future__ import annotations

import re

import pandas as pd

# RE2 + Python-re identical subset (ASCII classes, leftmost-first greedy)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9() \-]{6,}[0-9]"

C4_MIN_WORDS = 50        # corpus docs are 10-99 words: the band splits it
C4_MAX_WORDS = 100_000
C4_PHRASES = ("lorem ipsum", "javascript", "cookie policy",
              "privacy policy", "terms of use")


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=list(columns))


def redact_frame(df: pd.DataFrame) -> pd.DataFrame:
    """The pii_redact kernel on a pandas frame (reused by the composed
    curation chain and by planted-case tests)."""
    email = re.compile(EMAIL_RE)
    ipv4 = re.compile(IPV4_RE)
    phone = re.compile(PHONE_RE)
    t1 = df["text"].str.replace(email, "<EMAIL>", regex=True)
    t2 = t1.str.replace(ipv4, "<IP>", regex=True)
    t3 = t2.str.replace(phone, "<PHONE>", regex=True)
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "clean_text": t3,
        "n_emails": df["text"].str.count(email).astype("int64"),
        "n_ips": t1.str.count(ipv4).astype("int64"),
        "n_phones": t2.str.count(phone).astype("int64")})


def pii_redact(sf_dir: str):
    """(doc_id, clean_text, n_emails, n_ips, n_phones) per document."""
    return _docs(sf_dir).map_batches(redact_frame, batch_format="pandas")


PII_REDACT_SQL = rf"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM documents),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{IPV4_RE}')) AS n_ips,
         regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2
  FROM s1)
SELECT doc_id,
       regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       n_emails, n_ips,
       len(regexp_extract_all(t2, '{PHONE_RE}')) AS n_phones
FROM s2
"""


def c4_flags_frame(df: pd.DataFrame) -> pd.DataFrame:
    """The c4_quality_flags kernel on a pandas frame."""
    text = df["text"]
    lower = text.str.lower()
    n_words = text.str.count(r"\S+").astype("int64")
    # \Z, not $: Python's $ also matches before a trailing newline, while
    # the oracle's RE2 $ is end-of-text only (ADVICE r3) — \Z matches RE2.
    has_term = text.str.contains('[.!?"]\\Z', regex=True)
    no_lorem = ~lower.str.contains("lorem ipsum", regex=False)
    no_curly = ~text.str.contains("{", regex=False)
    any_phrase = pd.Series(False, index=df.index)
    for p in C4_PHRASES:
        any_phrase |= lower.str.contains(p, regex=False)
    no_phrase = ~any_phrase
    keep = ((n_words >= C4_MIN_WORDS) & (n_words <= C4_MAX_WORDS)
            & no_lorem & no_curly & no_phrase)
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "n_words": n_words,
        "has_terminal_punct": has_term,
        "no_lorem_ipsum": no_lorem,
        "no_curly_brace": no_curly,
        "no_policy_phrase": no_phrase,
        "keep": keep})


def c4_quality_flags(sf_dir: str):
    """Per-doc C4 heuristic flags + the resulting keep decision."""
    return _docs(sf_dir).map_batches(c4_flags_frame, batch_format="pandas")


_PHRASE_PRED = " OR ".join(
    f"contains(lower(text), '{p}')" for p in C4_PHRASES)

C4_QUALITY_FLAGS_SQL = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_words,
       regexp_matches(text, '[.!?"]$') AS has_terminal_punct,
       NOT contains(lower(text), 'lorem ipsum') AS no_lorem_ipsum,
       NOT contains(text, '{{') AS no_curly_brace,
       NOT ({_PHRASE_PRED}) AS no_policy_phrase,
       (len(regexp_extract_all(text, '\S+')) BETWEEN {C4_MIN_WORDS}
            AND {C4_MAX_WORDS})
       AND NOT contains(lower(text), 'lorem ipsum')
       AND NOT contains(text, '{{')
       AND NOT ({_PHRASE_PRED}) AS keep
FROM documents
"""


# ------------------------------------------------- model-based quality

class QualityModelStage:
    """Hashed-bag-of-words linear quality scorer — the batched
    model-inference pattern: the weight table (64 Ki float64, standing in
    for fasttext/classifier weights) and a token->bucket hash cache are
    actor state built once in ``__init__``; each batch runs pure-local
    scoring (one doc = one row, so there is NO shuffle at any scale).

    Determinism contract (what lets DuckDB mirror it bit-for-bit):
    bucket = first 4 hex digits of md5(token); weight = bucket/2^16 - 0.5
    (both exact doubles); per-doc logit sums tf*w in ascending token
    order (left-associative, == SQL ``sum(x ORDER BY t)``); sigmoid via
    libm ``math.exp``; rounded to 6 dp. Swapping in real trained weights
    only changes ``self.w``."""

    def __init__(self):
        import numpy as np
        self.w = np.arange(65536, dtype=np.float64) / 65536.0 - 0.5
        self._bucket: dict[str, int] = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        from ._util import doc_token_weight_sums
        pos, ns, sums = doc_token_weight_sums(
            df["text"].tolist(), self.w, self._bucket)
        scores = [round(1.0 / (1.0 + math.exp(-(s / n))), 6)
                  for s, n in zip(sums, ns.tolist())]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[pos],
            "n_tokens": ns,
            "quality_score": np.array(scores, np.float64)})


def quality_model_score(sf_dir: str):
    """(doc_id, n_tokens, quality_score) per document on a warm-weight
    actor pool."""
    return _docs(sf_dir).map_batches(
        QualityModelStage, batch_format="pandas",
        concurrency=(1, 8), num_cpus=1)


QUALITY_MODEL_SCORE_SQL = r"""
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS t
             FROM documents),
dt AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, t),
s AS (SELECT doc_id,
             sum(tf * (CAST(concat('0x', substr(md5(t), 1, 4)) AS BIGINT)
                       / 65536.0 - 0.5) ORDER BY t) AS num,
             CAST(sum(tf) AS BIGINT) AS n_tokens
      FROM dt GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(1.0 / (1.0 + exp(-(num / n_tokens))), 6) AS quality_score
FROM s
"""


# ------------------------------------------- composed curation pipeline

CURATE_SCORE_MIN = 0.49


class CurateWebStage(QualityModelStage):
    """Fused per-doc curation: PII redact -> C4 keep -> quality-model
    score -> threshold, all inside one actor call (each step is a pure
    row-local transform, so fusing them removes three intermediate
    materializations; the weight table still loads once per actor).
    Emits only survivors: (doc_id, lang, clean_text, quality_score)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:  # type: ignore[override]
        red = redact_frame(df)
        merged = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                               "lang": df["lang"].to_numpy(),
                               "text": red["clean_text"]})
        keep = c4_flags_frame(merged)["keep"].to_numpy()
        surv = merged.loc[keep]
        scores = QualityModelStage.__call__(self, surv)
        out = surv.merge(scores[["doc_id", "quality_score"]], on="doc_id")
        out = out.loc[out["quality_score"] >= CURATE_SCORE_MIN]
        return pd.DataFrame({"doc_id": out["doc_id"].to_numpy(),
                             "lang": out["lang"].to_numpy(),
                             "clean_text": out["text"].to_numpy(),
                             "quality_score":
                                 out["quality_score"].to_numpy()})


def curate_web_pipeline(sf_dir: str):
    """The full web-curation chain as ONE streaming plan + a tiny
    counts pass: redact -> C4 -> model score -> threshold (fused,
    row-local, actor pool) -> deterministic resample of the survivors
    to a uniform language mix (exact integer md5 threshold, as in
    ``corpusstats.resample_to_lang_mix``). Survivors materialize once
    (object store, spillable) so the mix counts don't re-run the chain.
    Every stage is mirrored exactly in the DuckDB oracle."""
    import hashlib

    from .corpusstats import _U52

    docs = _docs(sf_dir, ("doc_id", "text", "lang"))
    surv = docs.map_batches(CurateWebStage, batch_format="pandas",
                            concurrency=(1, 8), num_cpus=1).materialize()

    part = surv.map_batches(
        lambda df: df["lang"].value_counts().rename_axis("lang")
        .reset_index(name="n"), batch_format="pandas").to_pandas()
    counts = (part.groupby("lang")["n"].sum()
              if "lang" in part.columns else pd.Series([], dtype="int64"))
    if counts.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "lang": pd.Series([], dtype=object),
                             "clean_text": pd.Series([], dtype=object),
                             "quality_score": pd.Series([], dtype="float64")})
    nl = counts.to_dict()
    m = int(counts.min())

    def accept(df: pd.DataFrame) -> pd.DataFrame:
        keep = [int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16)
                * int(nl[l]) < m * _U52
                for d, l in zip(df["doc_id"], df["lang"])]
        return df.loc[keep]

    return surv.map_batches(accept, batch_format="pandas")


_C4_CLEAN_PRED = " OR ".join(
    f"contains(lower(clean_text), '{p}')" for p in C4_PHRASES)

CURATE_WEB_PIPELINE_SQL = rf"""
WITH s1 AS (
  SELECT doc_id, lang,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM documents),
s2 AS (SELECT doc_id, lang,
              regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2 FROM s1),
red AS (SELECT doc_id, lang,
               regexp_replace(t2, '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
        FROM s2),
keepc4 AS (
  SELECT doc_id, lang, clean_text FROM red
  WHERE len(regexp_extract_all(clean_text, '\S+'))
        BETWEEN {C4_MIN_WORDS} AND {C4_MAX_WORDS}
    AND NOT contains(lower(clean_text), 'lorem ipsum')
    AND NOT contains(clean_text, '{{')
    AND NOT ({_C4_CLEAN_PRED})),
tok AS (SELECT doc_id, unnest(regexp_extract_all(clean_text, '\S+')) AS t
        FROM keepc4),
dt AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, t),
s AS (SELECT doc_id,
             sum(tf * (CAST(concat('0x', substr(md5(t), 1, 4)) AS BIGINT)
                       / 65536.0 - 0.5) ORDER BY t) AS num,
             CAST(sum(tf) AS BIGINT) AS n FROM dt GROUP BY doc_id),
q AS (SELECT doc_id,
             round(1.0 / (1.0 + exp(-(num / n))), 6) AS quality_score
      FROM s),
surv AS (SELECT k.doc_id, k.lang, k.clean_text, q.quality_score
         FROM keepc4 k JOIN q USING (doc_id)
         WHERE q.quality_score >= {CURATE_SCORE_MIN}),
nl AS (SELECT lang, count(*) n FROM surv GROUP BY lang),
m AS (SELECT min(n) m FROM nl)
SELECT doc_id, lang, clean_text, quality_score
FROM surv JOIN nl USING (lang) CROSS JOIN m
WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                AS BIGINT) AS HUGEINT) * n
      < CAST(m AS HUGEINT) * 4503599627370496
"""


def curate_web_resumable(sf_dir: str, out_dir: str, *,
                         num_partitions: int = 16,
                         wave_partitions: int = 8) -> dict:
    """``curate_web_pipeline`` as a checkpointed job, in TWO resumable
    stages so the expensive chain runs exactly once per partition:

    1. survivors: redact -> C4 -> model score -> threshold
       (``CurateWebStage``) lands in ``out_dir/surv/rows/part=N`` with
       its own manifest — the only pass that ever touches the raw text.
    2. mix: language counts come from a column-pruned ``lang`` read of
       the persisted survivors (tiny), cached atomically in
       ``out_dir/mix.json``.
    3. accept: the mix downsampling filter re-reads the persisted
       survivor partitions (cheap, no re-scoring) into
       ``out_dir/rows/part=N`` with the final manifest.

    A killed run resumes from whichever stage's partitions are missing;
    the survivor parquet is the checkpoint that makes the second stage
    free. Union of all final partitions == the one-shot query,
    pytest-verified."""
    import json
    import hashlib
    import os
    import uuid

    import ray.data as rd

    from ..state.rowsink import key_partition_filter, write_resumable_rows
    from .corpusstats import _U52

    # ---- stage 1: the expensive row-local chain, checkpointed
    surv_dir = os.path.join(out_dir, "surv")

    def make_surv_ds(wave: frozenset[int]):
        docs = _docs(sf_dir, ("doc_id", "text", "lang")).map_batches(
            key_partition_filter("doc_id", wave, num_partitions),
            batch_format="pyarrow")
        return docs.map_batches(CurateWebStage, batch_format="pandas",
                                concurrency=(1, 8), num_cpus=1)

    write_resumable_rows(make_surv_ds, surv_dir, key_col="doc_id",
                         num_partitions=num_partitions,
                         wave_partitions=wave_partitions)
    # per-partition parquet FILE lists (pyarrow rejects a list of dirs)
    import glob as _glob
    surv_parts = {}
    for p in range(num_partitions):
        files = sorted(_glob.glob(os.path.join(
            surv_dir, "rows", f"part={p}", "*.parquet")))
        if files:
            surv_parts[p] = files

    # ---- stage 2: language mix from the persisted survivors (pruned
    # read of ONE small column; never re-runs the chain)
    mix_path = os.path.join(out_dir, "mix.json")
    if os.path.exists(mix_path):
        with open(mix_path) as f:
            mix = json.load(f)
        nl = {k: int(v) for k, v in mix["nl"].items()}
        m = int(mix["m"])
    else:
        if surv_parts:
            all_files = [f for fs in surv_parts.values() for f in fs]
            part = (rd.read_parquet(sorted(all_files),
                                    columns=["lang"])
                    .map_batches(lambda df: df["lang"].value_counts()
                                 .rename_axis("lang").reset_index(name="n"),
                                 batch_format="pandas").to_pandas())
        else:
            part = pd.DataFrame()
        counts = (part.groupby("lang")["n"].sum()
                  if "lang" in part.columns
                  else pd.Series([], dtype="int64"))
        nl = {str(k): int(v) for k, v in counts.items()}
        m = int(counts.min()) if not counts.empty else 0
        os.makedirs(out_dir, exist_ok=True)
        tmp = f"{mix_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"nl": nl, "m": m}, f)
        os.replace(tmp, mix_path)

    # ---- stage 3: the cheap accept filter over persisted survivors
    def accept(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "lang", "clean_text", "quality_score"]]
        if df.empty or m == 0:
            return df.iloc[0:0]
        keep = [int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16)
                * nl[l] < m * _U52
                for d, l in zip(df["doc_id"], df["lang"])]
        return df.loc[keep]

    def make_accept_ds(wave: frozenset[int]):
        paths = [f for p in sorted(wave) if p in surv_parts
                 for f in surv_parts[p]]
        if not paths:
            import pyarrow as pa
            return rd.from_arrow(pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "lang": pa.array([], pa.string()),
                 "clean_text": pa.array([], pa.string()),
                 "quality_score": pa.array([], pa.float64())}))
        return rd.read_parquet(paths).map_batches(
            accept, batch_format="pandas")

    return write_resumable_rows(make_accept_ds, out_dir, key_col="doc_id",
                                num_partitions=num_partitions,
                                wave_partitions=wave_partitions)


def curate_web_checkpointed(sf_dir: str):
    """Driver-visible wrapper over ``curate_web_resumable``: runs the
    checkpointed job into a fresh scratch dir and returns the LAZY union
    of its output partitions (a ``ray.data`` read — the curated corpus
    is corpus-scale at 100 TB, so it must never concat on the driver;
    rows-only in the driver check, and equality with
    ``curate_web_pipeline`` is pytest-carried by the kill/resume test)."""
    import glob
    import os
    import tempfile

    import ray.data as rd

    out = tempfile.mkdtemp(prefix="curate_ckpt_")
    curate_web_resumable(sf_dir, out)
    files = sorted(glob.glob(os.path.join(out, "rows", "part=*",
                                          "*.parquet")))
    if not files:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "lang": pd.Series([], dtype=object),
                             "clean_text": pd.Series([], dtype=object),
                             "quality_score": pd.Series([], dtype="float64")})
    return rd.read_parquet(files, columns=[
        "doc_id", "lang", "clean_text", "quality_score"])

"""vocab_growth_curve / resample_to_lang_mix semantics beyond the shared
oracle gate: skew, determinism, and mixture balance."""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_vocab_growth_monotone_and_exact_tail(ray_session):
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.corpusstats import vocab_growth_curve
    out = vocab_growth_curve(SF)
    assert list(out["decile"]) == list(range(1, 11))
    for c in ("n_docs", "vocab_size", "n_tokens"):
        assert (np.diff(out[c].to_numpy()) >= 0).all(), c
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    # the final checkpoint covers the whole corpus exactly
    assert out["n_docs"].iloc[-1] == len(docs)
    assert out["n_tokens"].iloc[-1] == int(
        docs["text"].str.count(r"\S+").sum())
    assert out["vocab_size"].iloc[-1] == len(
        set(w for t in docs["text"] for w in t.split()))


def test_resample_balance_and_determinism(ray_session):
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.corpusstats import (
        _U52, resample_to_lang_mix)
    kept = resample_to_lang_mix(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    nl = docs["lang"].value_counts()
    m = int(nl.min())
    # per-lang kept counts hover near m (md5 uniforms, not quotas)
    per_lang = kept["lang"].value_counts()
    for lang in nl.index:
        assert abs(per_lang.get(lang, 0) - m) <= 3 * np.sqrt(m)
    # membership is the exact integer threshold, recomputed independently
    sample = docs.sample(50, random_state=0)
    for d, lang in zip(sample["doc_id"], sample["lang"]):
        u = int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16)
        want = u * int(nl[lang]) < m * _U52
        assert (d in set(kept["doc_id"])) == want
    # rerun is identical (pure function of doc_id + counts)
    again = resample_to_lang_mix(SF).to_pandas()
    pd.testing.assert_frame_equal(
        kept.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))


def test_vocab_growth_skewed_ids(ray_session, tmp_path):
    """Non-dense, non-zero-based doc_ids: the value-grid checkpoints and
    the bucketed first-occurrence stay exact vs a local recomputation."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.corpusstats import vocab_growth_curve
    rng = np.random.default_rng(5)
    ids = np.sort(rng.choice(np.arange(1000, 9000), 120, replace=False))
    vocab = [f"w{j}" for j in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in ids]
    root = str(tmp_path)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string()),
                             "lang": pa.array(["en"] * len(ids)),
                             "source": pa.array(["s"] * len(ids)),
                             "n_chars": pa.array([len(t) for t in texts],
                                                 pa.int64())}),
                   f"{root}/documents.parquet")
    out = vocab_growth_curve(root)
    mn, mx = int(ids.min()), int(ids.max()) + 1
    first = {}
    for d, t in zip(ids, texts):
        for w in t.split():
            first.setdefault(w, d)
    fd = np.array(list(first.values()))
    ntok = np.array([len(t.split()) for t in texts])
    for k in range(1, 11):
        cut = mn + (k * (mx - mn)) // 10
        row = out[out["decile"] == k].iloc[0]
        assert row["cutoff_doc_id"] == cut
        assert row["n_docs"] == int((ids < cut).sum())
        assert row["vocab_size"] == int((fd < cut).sum())
        assert row["n_tokens"] == int(ntok[ids < cut].sum())


def test_dsir_prefers_target_like_docs(ray_session, tmp_path):
    """Docs written in the target source's vocabulary score higher than
    docs from a disjoint vocabulary; scores recompute exactly."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.corpusstats import (
        DSIR_BUCKETS, dsir_importance_weights)
    tgt_vocab = ["alpha", "beta", "gamma", "delta"]
    other = ["omega", "sigma", "kappa", "lambda"]
    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):   # target corpus defines the LM
        rows.append((i, " ".join(rng.choice(tgt_vocab, 12)), "src0"))
    for i in range(30, 45):   # raw docs in target vocabulary
        rows.append((i, " ".join(rng.choice(tgt_vocab, 12)), "src1"))
    for i in range(45, 60):   # raw docs in disjoint vocabulary
        rows.append((i, " ".join(rng.choice(other, 12)), "src1"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    root = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "text": pa.array(df["text"], pa.string()),
        "lang": pa.array(["en"] * len(df)),
        "source": pa.array(df["source"], pa.string()),
        "n_chars": pa.array(df["text"].str.len(), pa.int64())}),
        f"{root}/documents.parquet")
    out = dsir_importance_weights(root).to_pandas().set_index("doc_id")
    assert len(out) == 30    # only raw docs scored
    in_vocab = out.loc[30:44, "log_importance"]
    off_vocab = out.loc[45:59, "log_importance"]
    assert in_vocab.min() > off_vocab.max()
    # independent exact recomputation for one doc
    tgt_counts = {}
    raw_counts = {}
    for _, r in df.iterrows():
        tbl = tgt_counts if r["source"] == "src0" else raw_counts
        for w in r["text"].split():
            b = int(hashlib.md5(w.encode()).hexdigest()[:4], 16)
            tbl[b] = tbl.get(b, 0) + 1
    nt, nr = sum(tgt_counts.values()), sum(raw_counts.values())
    doc = df[df["doc_id"] == 31].iloc[0]
    from collections import Counter
    acc = 0.0
    for t in sorted(Counter(doc["text"].split())):
        tf = Counter(doc["text"].split())[t]
        b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
        acc += tf * (math.log((tgt_counts.get(b, 0) + 1) / (nt + DSIR_BUCKETS))
                     - math.log((raw_counts.get(b, 0) + 1)
                                / (nr + DSIR_BUCKETS)))
    assert out.loc[31, "log_importance"] == pytest.approx(round(acc, 6),
                                                          abs=1e-9)


def test_resample_temperature_mix_semantics(ray_session, tmp_path):
    """alpha = 0.7 temperature resampling: the smallest language keeps
    every doc, larger languages keep with probability (m/n)^0.3, and
    the accepted set equals a direct per-doc re-derivation of the
    md5-threshold rule (pure function of doc_id — deterministic)."""
    import hashlib
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.corpusstats import (
        MIX_ALPHA, _U52, resample_temperature_mix)
    langs = ["rare"] * 5 + ["mid"] * 50 + ["big"] * 445
    docs = pa.table({
        "doc_id": pa.array(range(500), pa.int64()),
        "text": pa.array(["w"] * 500), "lang": pa.array(langs),
        "source": pa.array(["s"] * 500),
        "n_chars": pa.array([1] * 500, pa.int64())})
    root = str(tmp_path)
    pq.write_table(docs, f"{root}/documents.parquet")
    kept = resample_temperature_mix(root).to_pandas()
    n = {"rare": 5, "mid": 50, "big": 445}
    want = set()
    for d, lang in enumerate(langs):
        u = float(int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16))
        if u < ((5 / n[lang]) ** (1.0 - MIX_ALPHA)) * float(_U52):
            want.add(d)
    assert set(kept["doc_id"]) == want
    assert (kept["lang"] == "rare").sum() == 5          # min lang keeps all
    # temperature keeps MORE of the big lang than the uniform resample
    # would (uniform expectation ~ m/n * 445 = 5): upweighting is gentle
    assert (kept["lang"] == "big").sum() > 5
    again = resample_temperature_mix(root).to_pandas()
    assert set(again["doc_id"]) == want

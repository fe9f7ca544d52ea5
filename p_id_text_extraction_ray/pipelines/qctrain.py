"""Distributed quality-classifier TRAINING: full-batch logistic
regression over hashed token features (the fastText-style linear
classifier corpus-curation pipelines train to separate a reference
distribution from a crawl — here the deterministic stand-in target is
``lang == 'en'``, the "is this the target distribution" label every
CCNet/DSIR-style setup starts from).

Why this shape at 100 TB: the model is TINY (``QC_DIM + 1`` float64
weights) and the data is huge, so the only thing that moves is the
model — each epoch broadcasts the weight vector once (``ray.put``,
every task reads the same object-store copy) and each feature block
returns ONE constant-size partial row (gradient sum, loss sum, correct
count).  The corpus is featurized EXACTLY ONCE into a materialized
sparse-CSR feature table (doc_id, y, idx[], val[]) — text is read and
tokenized once, the epoch loop touches only the compact features, and
at real scale that table is what you would persist to Parquet between
jobs.  No shuffle anywhere: gradient aggregation is an
embarrassingly-parallel sum of ~num_blocks 8 KB rows, folded on the
driver in a deterministic (min-doc_id-sorted) order.

The trainer is full-batch gradient descent with a fixed epoch count
and learning rate — deliberately not SGD: full-batch makes every epoch
a pure deterministic function of (corpus, epoch count), so the
training curve is reproducible row-for-row and the distributed path
can be pinned against a single-process numpy re-derivation
(``tests/test_qctrain.py``).  Not SQL-expressible (iterative
optimization), so the driver check is rows-only; the pytest parity
test carries the semantics.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..functions.hashing import stable_hash64
from ._util import sized_read

QC_DIM = 1024        # hashed feature dimension (weights = QC_DIM + bias)
QC_EPOCHS = 8        # fixed full-batch GD rounds
QC_LR = 2.0          # learning rate on the mean gradient
QC_L2 = 1e-4         # ridge penalty (keeps weights bounded, convex)


def _docs(sf_dir: str, columns=("doc_id", "text", "lang")):
    return sized_read(os.path.join(sf_dir, "documents.parquet"),
                      list(columns), rows_per_block=4096)


def featurize_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Per-doc sparse TF features: distinct hashed tokens (mod QC_DIM)
    with count/len(tokens) values. One row per doc; idx/val are numpy
    arrays (list columns), y is the lang=='en' target."""
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    ys = (df["lang"].astype(str) == "en").to_numpy(dtype=np.float64)
    idx_col, val_col = [], []
    for text in df["text"]:
        toks = text.lower().split()
        if not toks:
            idx_col.append(np.zeros(0, dtype=np.int32))
            val_col.append(np.zeros(0, dtype=np.float32))
            continue
        h = np.fromiter((stable_hash64(t) % QC_DIM for t in toks),
                        dtype=np.int64, count=len(toks))
        uniq, cnt = np.unique(h, return_counts=True)
        idx_col.append(uniq.astype(np.int32))
        val_col.append((cnt / len(toks)).astype(np.float32))
    return pd.DataFrame({"doc_id": ids, "y": ys,
                         "idx": pd.Series(idx_col, dtype="object"),
                         "val": pd.Series(val_col, dtype="object")})


def _grad_partial(df: pd.DataFrame, w: np.ndarray, b: float) -> pd.DataFrame:
    """One constant-size partial row for the batch: sparse-CSR forward
    pass + gradient scatter, all vectorized (no per-doc Python loop in
    the epoch-hot path beyond the concatenate)."""
    lens = np.fromiter((len(a) for a in df["idx"]), dtype=np.int64,
                       count=len(df))
    idx = (np.concatenate(list(df["idx"])).astype(np.int64)
           if lens.sum() else np.zeros(0, dtype=np.int64))
    val = (np.concatenate(list(df["val"])).astype(np.float64)
           if lens.sum() else np.zeros(0, dtype=np.float64))
    starts = np.zeros(len(df) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    contrib = val * w[idx]
    # reduceat misbehaves on empty segments; segment sums via cumsum diff
    csum = np.concatenate(([0.0], np.cumsum(contrib)))
    z = csum[starts[1:]] - csum[starts[:-1]] + b
    y = df["y"].to_numpy(dtype=np.float64)
    p = 1.0 / (1.0 + np.exp(-z))
    eps = 1e-12
    loss = -np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
    correct = int(np.sum((p >= 0.5) == (y >= 0.5)))
    r = p - y
    g = np.zeros(QC_DIM, dtype=np.float64)
    np.add.at(g, idx, val * np.repeat(r, lens))
    key = int(df["doc_id"].min()) if len(df) else 0
    return pd.DataFrame({"key": [key], "n": [len(df)], "loss": [loss],
                         "correct": [correct], "gb": [g.tobytes()],
                         "gbias": [float(np.sum(r))]})


def _combine_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Tree-reduce level: fold up to ``batch_size`` partial rows into
    one, summing in key-sorted order. Keeps the driver's final fold at
    O(num_blocks / batch_size) rows — bounded at any corpus size."""
    df = df.sort_values("key", kind="mergesort")
    g = np.zeros(QC_DIM, dtype=np.float64)
    for buf in df["gb"]:
        g += np.frombuffer(buf, dtype=np.float64)
    return pd.DataFrame({
        "key": [int(df["key"].min())],
        "n": [int(df["n"].sum())],
        "loss": [float(df["loss"].sum())],
        "correct": [int(df["correct"].sum())],
        "gb": [g.tobytes()],
        "gbias": [float(df["gbias"].sum())]})


def _fold_partials(rows: list[dict]) -> tuple[np.ndarray, float, float,
                                              int, int]:
    """Deterministic driver fold: sort partials by min-doc_id key so the
    float sum order never depends on task completion order."""
    rows = sorted(rows, key=lambda r: int(r["key"]))
    g = np.zeros(QC_DIM, dtype=np.float64)
    gb = loss = 0.0
    n = correct = 0
    for r in rows:
        g += np.frombuffer(r["gb"], dtype=np.float64)
        gb += float(r["gbias"])
        loss += float(r["loss"])
        n += int(r["n"])
        correct += int(r["correct"])
    return g, gb, loss, n, correct


def quality_classifier_train(sf_dir: str,
                             epochs: int = QC_EPOCHS) -> pd.DataFrame:
    """(epoch, loss, accuracy, grad_norm) training curve of the
    distributed full-batch trainer; loss/accuracy are measured at the
    weights BEFORE that epoch's update (epoch 1 = the log(2) zero-init
    point). Returns the curve — the audit artifact; the fitted weights
    are the last fold's state and come back via ``train_weights``."""
    curve, _ = train_weights(sf_dir, epochs)
    return curve


def train_weights(sf_dir: str,
                  epochs: int = QC_EPOCHS) -> tuple[pd.DataFrame,
                                                    np.ndarray]:
    import ray

    feats = _docs(sf_dir).map_batches(
        featurize_frame, batch_format="pandas").materialize()
    if feats.count() == 0:
        # empty corpus: no epochs to measure, zero-init weights stand
        curve = pd.DataFrame({"epoch": pd.Series(dtype="int64"),
                              "loss": pd.Series(dtype="float64"),
                              "accuracy": pd.Series(dtype="float64"),
                              "grad_norm": pd.Series(dtype="float64")})
        return curve, np.zeros(QC_DIM + 1, dtype=np.float64)

    w = np.zeros(QC_DIM, dtype=np.float64)
    b = 0.0
    out = []
    for epoch in range(1, epochs + 1):
        w_ref = ray.put((w.copy(), b))

        def partial(df: pd.DataFrame, _ref=w_ref) -> pd.DataFrame:
            ww, bb = ray.get(_ref)
            return _grad_partial(df, ww, bb)

        rows = (feats.map_batches(partial, batch_format="pandas",
                                  batch_size=4096)
                .map_batches(_combine_partials, batch_format="pandas",
                             batch_size=512)
                .take_all())
        g, gb, loss, n, correct = _fold_partials(rows)
        out.append({"epoch": epoch, "loss": loss / n,
                    "accuracy": correct / n,
                    "grad_norm": float(np.sqrt(
                        np.sum((g / n) ** 2) + (gb / n) ** 2))})
        w -= QC_LR * (g / n + QC_L2 * w)
        b -= QC_LR * (gb / n)
    curve = pd.DataFrame(out)
    curve["loss"] = curve["loss"].round(9)
    curve["accuracy"] = curve["accuracy"].round(9)
    curve["grad_norm"] = curve["grad_norm"].round(9)
    return curve, np.concatenate([w, [b]])


QC_FILTER_THRESHOLD = 0.5


def quality_classifier_filter(sf_dir: str):
    """(doc_id, score, keep) — the composed train→apply pass: fit the
    classifier on the corpus, then score every document with the
    fitted weights and gate at ``QC_FILTER_THRESHOLD`` (the
    classifier-filter step a curation pipeline runs after training the
    reference-vs-crawl model).

    Scale shape: training as in ``train_weights`` (model-only
    movement); scoring is ONE row-local map_batches pass with the
    (QC_DIM+1)-float weight vector broadcast via ``ray.put`` — no
    shuffle, the output streams. Iterative training is not
    SQL-expressible, so the driver check is rows-only; the planted
    separable-corpus pytest pins keep == (lang=='en') exactly.

    On the synthetic sf corpora every language draws from the SAME
    vocabulary, so lang is unlearnable from tokens and the fitted model
    correctly degenerates to the base rate — all scores sit at the
    en-share (~0.39) and the 0.5 gate keeps nothing. That is the right
    answer for that data, not a defect; separation is exercised by the
    planted corpus in ``tests/test_qctrain.py``."""
    import ray

    curve, wb = train_weights(sf_dir)
    if not len(curve):
        # empty corpus: schema-stable empty result
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64"),
                             "keep": pd.Series(dtype="bool")})
    wb_ref = ray.put(wb)

    def score(df: pd.DataFrame, _ref=wb_ref) -> pd.DataFrame:
        wb = ray.get(_ref)
        w, b = wb[:-1], float(wb[-1])
        f = featurize_frame(df)
        z = np.fromiter(
            (float(v.astype(np.float64) @ w[i.astype(np.int64)]) + b
             for i, v in zip(f["idx"], f["val"])),
            dtype=np.float64, count=len(f))
        p = 1.0 / (1.0 + np.exp(-z))
        return pd.DataFrame({"doc_id": f["doc_id"],
                             "score": np.round(p, 9),
                             "keep": p >= QC_FILTER_THRESHOLD})

    return _docs(sf_dir).map_batches(score, batch_format="pandas")


def local_reference_train(docs: pd.DataFrame,
                          epochs: int = QC_EPOCHS) -> tuple[pd.DataFrame,
                                                            np.ndarray]:
    """Single-process numpy re-derivation of the same GD (the parity
    oracle for tests): identical featurization, whole-corpus batch in
    doc_id order, same update rule."""
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    f = featurize_frame(docs)
    w = np.zeros(QC_DIM, dtype=np.float64)
    b = 0.0
    out = []
    for epoch in range(1, epochs + 1):
        row = _grad_partial(f, w, b).iloc[0]
        g = np.frombuffer(row["gb"], dtype=np.float64)
        n = int(row["n"])
        out.append({"epoch": epoch, "loss": float(row["loss"]) / n,
                    "accuracy": int(row["correct"]) / n,
                    "grad_norm": float(np.sqrt(
                        np.sum((g / n) ** 2) + (row["gbias"] / n) ** 2))})
        w = w - QC_LR * (g / n + QC_L2 * w)
        b -= QC_LR * float(row["gbias"]) / n
    curve = pd.DataFrame(out)
    curve["loss"] = curve["loss"].round(9)
    curve["accuracy"] = curve["accuracy"].round(9)
    curve["grad_norm"] = curve["grad_norm"].round(9)
    return curve, np.concatenate([w, [b]])

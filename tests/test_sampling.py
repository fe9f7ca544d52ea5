"""Sampling/compaction operators on planted fixtures: hot-key skew and
under-quota groups, each checked against an independent pandas
re-derivation."""

import os

import numpy as np
import pandas as pd
import pytest

from p_id_text_extraction_ray.pipelines.sampling import (
    SAMPLE_QUOTA, events_window_dedup, stratified_sample_by_source)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sampling"))
    rng = np.random.default_rng(7)

    # documents: one source far under quota, one exactly at it, one hot
    rows = []
    for src, n in [("tiny", 3), ("exact", SAMPLE_QUOTA), ("hot", 500)]:
        for i in range(n):
            rows.append({"doc_id": len(rows) * 17 + 3, "text": f"doc {i}",
                         "lang": "en", "source": src, "n_chars": 6})
    pd.DataFrame(rows).to_parquet(os.path.join(root, "documents.parquet"))

    # events: one hot user owns half the rows, with in-hour duplicates
    n = 2000
    user = np.where(rng.random(n) < 0.5, 1,
                    rng.integers(2, 50, n)).astype(np.int64)
    ts = (pd.Timestamp("2024-01-01")
          + pd.to_timedelta(rng.integers(0, 48 * 3600, n), unit="s"))
    pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": user,
        "event_type": rng.choice(["view", "click", "buy"], n),
        "value": rng.random(n),
        "props": ["{}"] * n,
    }).to_parquet(os.path.join(root, "events.parquet"))
    return root


def test_stratified_quota_and_under_quota(ray_session, planted_dir):
    out = stratified_sample_by_source(planted_dir).to_pandas()
    sizes = out.groupby("source")["doc_id"].count().to_dict()
    assert sizes == {"tiny": 3, "exact": SAMPLE_QUOTA, "hot": SAMPLE_QUOTA}

    # equals the single-machine re-derivation (pure function of keys)
    import hashlib
    docs = pd.read_parquet(os.path.join(planted_dir, "documents.parquet"),
                           columns=["doc_id", "source"])
    docs["h"] = [hashlib.md5(str(d).encode()).hexdigest()
                 for d in docs["doc_id"]]
    expect = (docs.sort_values(["h", "doc_id"])
              .groupby("source", as_index=False).head(SAMPLE_QUOTA))
    assert set(map(tuple, out[["source", "doc_id"]].to_numpy())) \
        == set(map(tuple, expect[["source", "doc_id"]].to_numpy()))


def test_window_dedup_hot_user_matches_pandas(ray_session, planted_dir):
    out = events_window_dedup(planted_dir).to_pandas()
    ev = pd.read_parquet(os.path.join(planted_dir, "events.parquet"),
                         columns=["event_id", "user_id", "event_type", "ts"])
    ev["hour"] = ev["ts"].dt.floor("h")
    expect = (ev.sort_values(["user_id", "event_type", "hour", "ts",
                              "event_id"])
              .drop_duplicates(["user_id", "event_type", "hour"])
              .sort_values("event_id").reset_index(drop=True)
              [["event_id", "user_id", "event_type", "ts"]])
    assert len(out) < len(ev)          # the hot user actually collides
    pd.testing.assert_frame_equal(out.reset_index(drop=True), expect)

"""Planted-data checks for the distributed prefix-scan operator."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import scanops as SC


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """5000 events with shuffled values spanning several scan buckets
    (BUCKET_WIDTH is monkeypatched down in the cross-bucket test)."""
    root = tmp_path_factory.mktemp("scanops")
    rng = np.random.RandomState(7)
    n = 5000
    tbl = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(pd.date_range("2024-01-01", periods=n, freq="min")),
        "user_id": pa.array([0] * n, type=pa.int64()),
        "event_type": pa.array(rng.choice(["a", "b"], size=n)),
        "value": pa.array(rng.uniform(0, 1000, size=n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, str(root / "events.parquet"))
    return str(root)


def _brute(planted_dir):
    df = (pq.read_table(planted_dir + "/events.parquet")
          .to_pandas().sort_values("event_id"))
    v = df["value"].to_numpy()
    c = np.maximum.accumulate(np.concatenate(([-np.inf], v)))[:-1]
    rec = v > c
    return df.loc[rec, ["event_id", "event_type", "value"]] \
        .reset_index(drop=True)


def test_records_match_bruteforce(ray_session, planted_dir):
    out = SC.events_running_records(planted_dir)
    expect = _brute(planted_dir)
    pd.testing.assert_frame_equal(out, expect)


def test_records_cross_bucket_seeding(ray_session, planted_dir,
                                      monkeypatch):
    """Force many buckets so records must respect maxima from EARLIER
    buckets (the exclusive-scan seed path)."""
    monkeypatch.setattr(SC, "BUCKET_WIDTH", 257)
    out = SC.events_running_records(planted_dir)
    pd.testing.assert_frame_equal(out, _brute(planted_dir))
    # sanity: with 5000 uniform draws there are few records, >1 bucket
    assert 1 <= len(out) < 50


def test_first_event_is_record(ray_session, planted_dir):
    out = SC.events_running_records(planted_dir)
    assert out.iloc[0]["event_id"] == 0

"""Property tests for the distributed join family against pandas ground
truth on randomized inputs — the joins back most relational/dedup
pipelines, so their semantics are pinned independently of any query."""

import numpy as np
import pandas as pd
import pytest

from p_id_text_extraction_ray.pipelines.joins import (anti_join, asof_join,
                                                      hash_join, sum_join)


def _ds(df):
    import ray.data as rd
    return rd.from_pandas(df).repartition(5)


def _canon(df, cols):
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("seed,how", [(0, "inner"), (1, "inner"), (2, "left")])
def test_hash_join_matches_pandas(ray_session, seed, how):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame({"k": rng.randint(0, 40, 300),
                         "v": rng.randint(0, 1000, 300)})
    right = pd.DataFrame({"k": rng.permutation(60)[:35],
                          "w": rng.randint(0, 1000, 35)})
    got = hash_join(_ds(left), _ds(right), on="k", how=how,
                    num_buckets=7).to_pandas()
    exp = left.merge(right, on="k", how=how)
    cols = ["k", "v", "w"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)


def test_hash_join_string_keys(ray_session):
    rng = np.random.RandomState(3)
    left = pd.DataFrame({"k": [f"key-{i}" for i in rng.randint(0, 30, 200)],
                         "v": rng.randint(0, 99, 200)})
    right = pd.DataFrame({"k": [f"key-{i}" for i in range(0, 40, 2)],
                          "w": np.arange(20)})
    got = hash_join(_ds(left), _ds(right), on="k").to_pandas()
    exp = left.merge(right, on="k")
    cols = ["k", "v", "w"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)


def test_sum_join_equals_groupby_then_join(ray_session):
    rng = np.random.RandomState(4)
    left = pd.DataFrame({"k": rng.randint(0, 25, 400),
                         "g": rng.randint(0, 3, 400),
                         "x": rng.randint(-50, 50, 400)})
    right = pd.DataFrame({"k": np.arange(0, 30), "name": [f"n{i}" for i in range(30)]})
    got = sum_join(_ds(left), _ds(right), on="k", sum_keys=["k", "g"],
                   sum_cols=["x"], num_buckets=5).to_pandas()
    exp = left.groupby(["k", "g"], as_index=False)["x"].sum().merge(right, on="k")
    cols = ["k", "g", "x", "name"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)


def test_anti_join_matches_pandas(ray_session):
    rng = np.random.RandomState(5)
    left = pd.DataFrame({"k": rng.randint(0, 50, 300),
                         "v": rng.randint(0, 9, 300)})
    right = pd.DataFrame({"k": rng.permutation(70)[:30]})
    got = anti_join(_ds(left), _ds(right), on="k", num_buckets=6).to_pandas()
    exp = left[~left["k"].isin(set(right["k"]))]
    cols = ["k", "v"]
    if len(got) == 0:
        assert len(exp) == 0
    else:
        pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                      check_dtype=False)


def test_asof_join_matches_pandas(ray_session):
    rng = np.random.RandomState(6)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "k": rng.randint(0, 8, 120),
        "ts": base + pd.to_timedelta(rng.randint(0, 10_000, 120), unit="s"),
        "v": np.arange(120)})
    right = pd.DataFrame({
        "k": rng.randint(0, 8, 60),
        "ts": base + pd.to_timedelta(rng.randint(0, 10_000, 60), unit="s")})
    got = asof_join(_ds(left), _ds(right), key="k", ts="ts",
                    right_ts_out="rts", num_buckets=4).to_pandas()
    exp = pd.merge_asof(left.sort_values("ts"),
                        right.sort_values("ts").rename(columns={"ts": "rts"}),
                        left_on="ts", right_on="rts", by="k",
                        direction="backward").dropna(subset=["rts"])
    cols = ["k", "ts", "v", "rts"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)


def test_hash_join_hot_key_skew(ray_session):
    """A key owning half of both sides (hot-key skew) still joins
    exactly: the bucketed plan concentrates the key in one group but
    produces the full cross-product for it, matching a pandas merge."""
    rng = np.random.RandomState(11)
    lk = np.where(rng.rand(400) < 0.5, 7, rng.randint(100, 160, 400))
    rk = np.where(rng.rand(80) < 0.5, 7, rng.randint(100, 160, 80))
    left = pd.DataFrame({"k": lk, "v": np.arange(400)})
    right = pd.DataFrame({"k": rk, "w": np.arange(80)})
    got = hash_join(_ds(left), _ds(right), on="k", num_buckets=8).to_pandas()
    exp = left.merge(right, on="k")
    cols = ["k", "v", "w"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)
    # the hot key's fan-out really happened (cross product ~200x40)
    assert (got["k"] == 7).sum() == (lk == 7).sum() * (rk == 7).sum()

"""Interval-join and skyline operator tests: planted overlap semantics,
brute-force dominance parity, and partition invariance."""

import numpy as np
import pandas as pd
import pytest

from p_id_text_extraction_ray.pipelines import rangeops as RO
from p_id_text_extraction_ray.pipelines.joins import broadcast_interval_join


def _brute_skyline(price, date):
    n = len(price)
    keep = np.ones(n, dtype=bool)
    for j in range(n):
        dom = (price >= price[j]) & (date <= date[j]) & \
            ((price > price[j]) | (date < date[j]))
        if dom.any():
            keep[j] = False
    return keep


def test_interval_join_overlap_semantics(ray_session):
    import ray.data as rd
    left = rd.from_pandas(pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "v": np.array([0.0, 1.0, 5.0, 10.0, 15.0, 100.0])}))
    ivals = pd.DataFrame({
        "name": ["a", "b", "c"],
        "lo": np.array([0.0, 0.0, 10.0]),
        "hi": np.array([10.0, 2.0, 15.0])})
    out = broadcast_interval_join(left, ivals, value_col="v") \
        .to_pandas().sort_values(["id", "name"]).reset_index(drop=True)
    # v=0,1 match a AND b (overlap duplicates the row); v=5 matches a
    # only; v=10 is OUT of a (hi exclusive) and IN c (lo inclusive);
    # v=15 and v=100 match nothing (unmatched rows dropped).
    expect = pd.DataFrame({
        "id": np.array([0, 0, 1, 1, 2, 3], dtype=np.int64),
        "v": [0.0, 0.0, 1.0, 1.0, 5.0, 10.0],
        "name": ["a", "b", "a", "b", "a", "c"]})
    pd.testing.assert_frame_equal(out, expect)


def test_interval_join_datetime_and_collision(ray_session):
    import ray.data as rd
    left = rd.from_pandas(pd.DataFrame({
        "ts": np.array(["1995-01-01", "1995-06-30", "1995-07-01"],
                       dtype="datetime64[us]")}))
    ivals = pd.DataFrame({"tag": ["w"],
                          "lo": np.array(["1995-01-01"],
                                         dtype="datetime64[us]"),
                          "hi": np.array(["1995-07-01"],
                                         dtype="datetime64[us]")})
    out = broadcast_interval_join(left, ivals, value_col="ts").to_pandas()
    assert len(out) == 2 and set(out["tag"]) == {"w"}
    with pytest.raises(ValueError, match="collision"):
        broadcast_interval_join(left, ivals.rename(columns={"tag": "ts"}),
                                value_col="ts")


def test_pareto_mask_matches_bruteforce():
    rng = np.random.default_rng(7)
    for n in (1, 2, 17, 400):
        # coarse grids force price ties and exact duplicate points
        price = rng.integers(0, 12, n).astype(np.float64)
        date = rng.integers(0, 9, n).astype(np.int64)
        got = RO.pareto_mask(price, date)
        np.testing.assert_array_equal(got, _brute_skyline(price, date))
    assert RO.pareto_mask(np.zeros(0), np.zeros(0, np.int64)).shape == (0,)


def test_skyline_partition_invariance(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_orderdate": (np.datetime64("1995-01-01", "us")
                        + rng.integers(0, 2000, n)
                        * np.timedelta64(1, "D").astype("timedelta64[us]")),
        "o_totalprice": rng.integers(100, 50000, n) / 100.0})
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "orders.parquet")
    out = RO.orders_skyline(str(tmp_path))
    keep = _brute_skyline(
        df["o_totalprice"].to_numpy(),
        df["o_orderdate"].to_numpy().astype("datetime64[us]")
        .astype(np.int64))
    expect = df.loc[keep].sort_values(["o_orderdate", "o_orderkey"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), expect, check_dtype=False)


def test_promo_windows_overlap_counts(ray_session):
    # every promo-window hit also lands in clearance, so clearance's
    # n_orders equals the full table and exceeds any other window
    out = RO.orders_promo_windows("/root/testdata/sf0.001").set_index("promo")
    assert out.loc["clearance", "n_orders"] == 1500
    assert (out.drop(index="clearance")["n_orders"]
            < out.loc["clearance", "n_orders"]).all()
    # containment: spring95 ⊂ launch95, summer97 ⊂ y97_allyear
    assert out.loc["spring95", "n_orders"] <= out.loc["launch95", "n_orders"]
    assert out.loc["summer97", "n_orders"] <= out.loc["y97_allyear",
                                                      "n_orders"]


def test_rangeops_empty_orders(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "o_orderkey": pa.array([], type=pa.int64()),
        "o_orderdate": pa.array([], type=pa.timestamp("us")),
        "o_totalprice": pa.array([], type=pa.float64())}),
        tmp_path / "orders.parquet")
    sky = RO.orders_skyline(str(tmp_path))
    assert len(sky) == 0
    assert list(sky.columns) == ["o_orderkey", "o_orderdate",
                                 "o_totalprice"]
    promo = RO.orders_promo_windows(str(tmp_path))
    assert len(promo) == 0
    assert set(promo.columns) == {"promo", "n_orders", "total_price"}


def test_interval_join_random_bruteforce(ray_session):
    """Randomized (seeded) parity of the distributed interval join vs a
    pandas cross-product re-derivation: arbitrary overlapping/nested/
    degenerate intervals, multiple blocks."""
    import ray.data as rd
    rng = np.random.default_rng(19)
    n, m = 3000, 25
    vals = rng.integers(0, 100, n).astype(np.float64)
    lo = rng.integers(0, 100, m).astype(np.float64)
    hi = lo + rng.integers(0, 30, m)            # zero-width allowed
    left = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "v": vals})
    ivals = pd.DataFrame({"iv": np.arange(m, dtype=np.int64),
                          "lo": lo, "hi": hi})
    got = broadcast_interval_join(
        rd.from_pandas(left, override_num_blocks=7), ivals,
        value_col="v", chunk=256) \
        .to_pandas().sort_values(["id", "iv"]).reset_index(drop=True)
    cross = left.merge(ivals, how="cross")
    want = cross[(cross["v"] >= cross["lo"]) & (cross["v"] < cross["hi"])] \
        [["id", "v", "iv"]].sort_values(["id", "iv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "v", "iv"]], want)

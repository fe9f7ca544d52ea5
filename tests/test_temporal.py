"""Temporal operators: range-join boundary semantics, transition-matrix
user isolation, decay weighting — each against a planted fixture and the
operator's own DuckDB oracle."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import analytics_ext as AX
from p_id_text_extraction_ray.pipelines import temporal as TM


def _write_events(root, rows):
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        "value": pa.array([r[4] for r in rows], type=pa.float64())}),
        os.path.join(root, "events.parquet"))


def _oracle(root, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT *"
                f" FROM '{root}/events.parquet'")
    return con.execute(sql).df()


T0 = pd.Timestamp("2024-01-01 00:00:00")
S = pd.Timedelta(seconds=1)


def test_range_join_boundaries_and_bucket_straddle(ray_session, tmp_path):
    """Window is (t, t+600s]: a purchase AT t is excluded, AT t+600s is
    included; an error near the end of an hour bucket must see purchases
    that fall in the NEXT bucket (boundary replication)."""
    root = str(tmp_path)
    err_late = T0 + pd.Timedelta(minutes=55)           # window crosses 01:00
    _write_events(root, [
        (1, T0, 1, "error", 0.0),
        (2, T0, 1, "purchase", 10.0),                  # == e.ts: excluded
        (3, T0 + 600 * S, 1, "purchase", 20.0),        # == e.ts+W: included
        (4, T0 + 601 * S, 1, "purchase", 40.0),        # past window
        (5, err_late, 2, "error", 0.0),
        (6, err_late + 300 * S, 2, "purchase", 1.25),  # next hour bucket
        (7, T0 + pd.Timedelta(hours=5), 3, "error", 0.0),  # no follow-ups
    ])
    out = TM.events_error_followups(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == [1, 5, 7]
    assert out["n_follow"].tolist() == [1, 1, 0]
    assert out["follow_value"].tolist() == [20.0, 1.25, 0.0]
    orc = _oracle(root, TM.EVENTS_ERROR_FOLLOWUPS_SQL)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_range_join_null_ts_and_null_value(ray_session, tmp_path):
    """NULL-ts errors emit 0 rows of matches (still one output row);
    NULL-ts purchases never match; a NULL-value purchase counts toward
    n_follow but adds nothing to the sum (SQL SUM skips NULLs)."""
    root = str(tmp_path)
    _write_events(root, [
        (1, None, 1, "error", 0.0),
        (2, T0, 1, "purchase", 5.0),
        (3, T0 + S, 1, "error", 0.0),
        (4, None, 1, "purchase", 99.0),
        (5, T0 + 2 * S, 1, "purchase", None),
        (6, T0 + 3 * S, 1, "purchase", 7.5),
    ])
    out = TM.events_error_followups(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    orc = _oracle(root, TM.EVENTS_ERROR_FOLLOWUPS_SQL)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)
    got = dict(zip(out["event_id"], out["n_follow"]))
    assert got == {1: 0, 3: 2}
    assert dict(zip(out["event_id"], out["follow_value"]))[3] == 7.5


def test_transition_matrix_user_isolation(ray_session, tmp_path):
    """The last event of one user never pairs with the first event of
    the next; probabilities are per-from_type conditionals."""
    root = str(tmp_path)
    _write_events(root, [
        (1, T0, 1, "view", 0.0),
        (2, T0 + S, 1, "click", 0.0),
        (3, T0 + 2 * S, 1, "view", 0.0),
        (4, T0 + 3 * S, 2, "purchase", 0.0),   # user boundary: no view->purchase
        (5, T0 + 4 * S, 2, "view", 0.0),
    ])
    out = TM.event_transition_matrix(root)
    pairs = {(f, t): (n, p) for f, t, n, p in
             zip(out["from_type"], out["to_type"],
                 out["n_pairs"], out["p_next"])}
    assert ("view", "purchase") not in pairs
    assert pairs[("view", "click")] == (1, 1.0)
    assert pairs[("click", "view")] == (1, 1.0)
    assert pairs[("purchase", "view")] == (1, 1.0)
    orc = _oracle(root, TM.EVENT_TRANSITION_MATRIX_SQL)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_transition_matrix_empty(ray_session, tmp_path):
    root = str(tmp_path)
    _write_events(root, [])
    out = TM.event_transition_matrix(root)
    assert list(out.columns) == ["from_type", "to_type", "n_pairs", "p_next"]
    assert len(out) == 0


def test_decayed_value_exact_weights(ray_session, tmp_path):
    """Ages are whole days off the corpus max ts; weights are exact
    powers of two, so expected values are exact decimals."""
    root = str(tmp_path)
    day = pd.Timedelta(days=1)
    _write_events(root, [
        (1, T0 + 3 * day, 1, "purchase", 8.0),    # age 0 -> weight 1
        (2, T0 + 2 * day, 1, "purchase", 8.0),    # age 1 -> 1/2
        (3, T0, 1, "purchase", 8.0),              # age 3 -> 1/8
        (4, T0, 2, "purchase", 4.0),              # age 3 -> 1/8
        (5, T0 + 3 * day, 2, "click", 1000.0),    # not a purchase
        (6, T0 + 1 * day, 3, "view", 0.0),
    ])
    out = TM.user_decayed_value(root).to_pandas() \
        .sort_values("user_id", kind="mergesort").reset_index(drop=True)
    got = dict(zip(out["user_id"], out["decayed_value"]))
    assert got == {1: 8.0 + 4.0 + 1.0, 2: 0.5}
    assert dict(zip(out["user_id"], out["n_purchases"])) == {1: 3, 2: 1}
    orc = _oracle(root, TM.USER_DECAYED_VALUE_SQL)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_decayed_value_empty(ray_session, tmp_path):
    root = str(tmp_path)
    _write_events(root, [])
    out = TM.user_decayed_value(root)
    assert list(out.columns) == ["user_id", "n_purchases", "decayed_value"]
    assert len(out) == 0


def test_trailing_window_peers_and_boundary(ray_session, tmp_path):
    """RANGE frame: [t-1h, t] is CLOSED on both ends and includes ALL
    peers of the current ts (even later-positioned ones); an all-NULL
    window sums to NULL; NULL-ts rows form one peer group per user."""
    root = str(tmp_path)
    h = pd.Timedelta(hours=1)
    _write_events(root, [
        (1, T0, 1, "view", 1.0),
        (2, T0 + h, 1, "view", 2.0),            # t-1h == ts of 1: included
        (3, T0 + h, 1, "view", 4.0),            # peer of 2 (tie)
        (4, T0 + 2 * h + S, 1, "view", 8.0),    # 1h+1s after 2/3: alone
        (5, T0, 2, "view", None),               # all-NULL window -> NULL
        (6, None, 2, "view", 16.0),             # NULL-ts peer group
        (7, None, 2, "view", 32.0),
    ])
    out = TM.events_trailing_window(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    orc = _oracle(root, TM.EVENTS_TRAILING_WINDOW_SQL) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)
    got = dict(zip(out["event_id"], zip(out["w_n"], out["w_sum"])))
    assert got[2] == (3, 7.0) and got[3] == (3, 7.0)   # peers see peers
    assert got[4] == (1, 8.0)
    assert got[5][0] == 1 and np.isnan(got[5][1])
    assert got[6] == (2, 48.0) and got[7] == (2, 48.0)


def test_activity_streaks_islands(ray_session, tmp_path):
    """Distinct-day islands: duplicate events on one day count once;
    a gap splits the streak; the streak can span a month boundary."""
    root = str(tmp_path)
    day = pd.Timedelta(days=1)
    _write_events(root, [
        (1, T0, 1, "view", 0.0),
        (2, T0 + pd.Timedelta(hours=5), 1, "view", 0.0),  # same day
        (3, T0 + day, 1, "view", 0.0),
        (4, T0 + 2 * day, 1, "view", 0.0),       # 3-day streak
        (5, T0 + 4 * day, 1, "view", 0.0),       # gap -> new island
        (6, pd.Timestamp("2024-01-31 23:00"), 2, "view", 0.0),
        (7, pd.Timestamp("2024-02-01 01:00"), 2, "view", 0.0),  # month edge
        (8, None, 3, "view", 0.0),               # NULL ts: no active day
    ])
    out = TM.user_activity_streaks(root).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 2]
    assert out["n_active_days"].tolist() == [4, 2]
    assert out["max_streak"].tolist() == [3, 2]
    orc = _oracle(root, TM.USER_ACTIVITY_STREAKS_SQL) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_mode_event_type_tiebreak(ray_session, tmp_path):
    """Equal counts resolve to the lexicographically smallest type."""
    from p_id_text_extraction_ray.pipelines import analytics_ext as AXX
    root = str(tmp_path)
    _write_events(root, [
        (1, T0, 1, "view", 0.0), (2, T0 + S, 1, "view", 0.0),
        (3, T0 + 2 * S, 1, "click", 0.0),
        (4, T0 + 3 * S, 2, "view", 0.0), (5, T0 + 4 * S, 2, "click", 0.0),
    ])
    out = AXX.user_mode_event_type(root).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["mode_type"].tolist() == ["view", "click"]   # tie -> click
    assert out["n_mode"].tolist() == [2, 1]
    orc = _oracle(root, AXX.USER_MODE_EVENT_TYPE_SQL) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_spearman_perfect_monotone(ray_session, tmp_path):
    """A strictly monotone (with ties) relationship gives r = 1; the
    doubled-rank integer math must agree with the oracle bit-for-bit."""
    root = str(tmp_path)
    q = [1.0, 1.0, 2.0, 3.0, 5.0, 8.0, 8.0, 9.0]
    d = [0.00, 0.00, 0.01, 0.02, 0.03, 0.04, 0.04, 0.05]
    pq.write_table(pa.table({
        "l_discount": pa.array(d, type=pa.float64()),
        "l_quantity": pa.array(q, type=pa.float64())}),
        os.path.join(root, "lineitem.parquet"))
    out = AX.discount_quantity_spearman(root)
    assert out["spearman_r"].iloc[0] == pytest.approx(1.0)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT *"
                f" FROM '{root}/lineitem.parquet'")
    orc = con.execute(AX.DISCOUNT_QUANTITY_SPEARMAN_SQL).df()
    assert out["spearman_r"].iloc[0] == orc["spearman_r"].iloc[0]
    assert int(out["n"].iloc[0]) == 8


def _random_events(seed: int, n: int = 300):
    """Adversarial random fixture: clustered timestamps (many window/
    bucket boundary hits), exact-second collisions (peer ties), NULL ts
    and NULL values sprinkled in."""
    rng = np.random.default_rng(seed)
    rows = []
    types = ["error", "purchase", "view", "click"]
    for i in range(n):
        if rng.random() < 0.05:
            ts = None
        else:
            # second-resolution offsets cluster events onto shared
            # instants and exact window edges
            sec = int(rng.integers(0, 4 * 3600))
            ts = T0 + sec * S
        val = None if rng.random() < 0.1 else round(float(rng.uniform(0, 50)), 2)
        rows.append((i, ts, int(rng.integers(1, 8)),
                     types[int(rng.integers(0, 4))], val))
    return rows


@pytest.mark.parametrize("seed", [7, 41])
def test_range_join_randomized_vs_oracle(ray_session, tmp_path, seed):
    root = str(tmp_path)
    _write_events(root, _random_events(seed))
    out = TM.events_error_followups(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    orc = _oracle(root, TM.EVENTS_ERROR_FOLLOWUPS_SQL)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_range_join_bucket_width_invariance(ray_session, tmp_path,
                                            monkeypatch):
    """The boundary-replication decomposition must be invariant to the
    bucket width knob (any width >= the window is legal)."""
    root = str(tmp_path)
    _write_events(root, _random_events(13))
    base = TM.events_error_followups(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    monkeypatch.setattr(TM, "BUCKET_SECONDS", 600)   # == window
    narrow = TM.events_error_followups(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, narrow)


@pytest.mark.parametrize("seed", [11, 23])
def test_trailing_window_randomized_vs_oracle(ray_session, tmp_path, seed):
    root = str(tmp_path)
    _write_events(root, _random_events(seed))
    out = TM.events_trailing_window(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    orc = _oracle(root, TM.EVENTS_TRAILING_WINDOW_SQL) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_streaks_randomized_vs_oracle(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    rows = [(i,
             None if rng.random() < 0.05
             else T0 + int(rng.integers(0, 20)) * pd.Timedelta(days=1),
             int(rng.integers(1, 6)), "view", 0.0)
            for i in range(200)]
    root = str(tmp_path)
    _write_events(root, rows)
    out = TM.user_activity_streaks(root).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    orc = _oracle(root, TM.USER_ACTIVITY_STREAKS_SQL) \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_spearman_empty_emits_one_row(ray_session, tmp_path):
    """SQL aggregates over zero rows still emit one row (NULL, 0)."""
    root = str(tmp_path)
    pq.write_table(pa.table({
        "l_discount": pa.array([], type=pa.float64()),
        "l_quantity": pa.array([], type=pa.float64())}),
        os.path.join(root, "lineitem.parquet"))
    out = AX.discount_quantity_spearman(root)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT *"
                f" FROM '{root}/lineitem.parquet'")
    orc = con.execute(AX.DISCOUNT_QUANTITY_SPEARMAN_SQL).df()
    assert len(out) == len(orc) == 1
    assert np.isnan(out["spearman_r"].iloc[0]) and \
        np.isnan(orc["spearman_r"].iloc[0])
    assert int(out["n"].iloc[0]) == int(orc["n"].iloc[0]) == 0


def test_percent_rank_ties_and_singleton(ray_session, tmp_path):
    """PERCENT_RANK uses the peer group's MIN rank ((rank-1)/(n-1), 0
    for a single-row partition); CUME_DIST uses rows-at-or-below
    including later peers."""
    from p_id_text_extraction_ray.pipelines import ranking as RKK
    root = str(tmp_path)
    _write_events(root, [
        (1, T0, 1, "view", 5.0),
        (2, T0 + S, 1, "view", 5.0),       # tie with 1
        (3, T0 + 2 * S, 1, "view", 9.0),
        (4, T0 + 3 * S, 2, "view", 3.0),   # singleton partition
    ])
    out = RKK.events_value_percentile(root).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    got = {e: (p, c) for e, p, c in
           zip(out["event_id"], out["pct_rank"], out["cume_dist"])}
    assert got[1] == (0.0, 2 / 3) and got[2] == (0.0, 2 / 3)
    assert got[3] == (1.0, 1.0)
    assert got[4] == (0.0, 1.0)
    orc = _oracle(root, RKK.EVENTS_VALUE_PERCENTILE_SQL) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, orc, check_dtype=False)


def test_corr_matrix_planted(ray_session, tmp_path):
    """quantity == 10×discount-cents (r=1), tax anti-correlated with
    both (r=-1): the exact-int moment math hits ±1 precisely."""
    from p_id_text_extraction_ray.pipelines import profiling as PFF
    root = str(tmp_path)
    d = [0.01, 0.02, 0.03, 0.04]
    pq.write_table(pa.table({
        "l_discount": pa.array(d, type=pa.float64()),
        "l_quantity": pa.array([100 * x for x in d], type=pa.float64()),
        "l_tax": pa.array([0.05 - x for x in d], type=pa.float64())}),
        os.path.join(root, "lineitem.parquet"))
    out = PFF.lineitem_corr_matrix(root)
    r = {(a, b): v for a, b, v in
         zip(out["col_a"], out["col_b"], out["pearson_r"])}
    assert r[("l_discount", "l_quantity")] == pytest.approx(1.0)
    assert r[("l_discount", "l_tax")] == pytest.approx(-1.0)
    assert r[("l_quantity", "l_tax")] == pytest.approx(-1.0)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT *"
                f" FROM '{root}/lineitem.parquet'")
    orc = con.execute(PFF.LINEITEM_CORR_MATRIX_SQL).df()
    pd.testing.assert_frame_equal(
        out.sort_values(["col_a", "col_b"]).reset_index(drop=True),
        orc.sort_values(["col_a", "col_b"]).reset_index(drop=True),
        check_dtype=False)


def test_spearman_reversed_is_negative_one(ray_session, tmp_path):
    root = str(tmp_path)
    q = [1.0, 2.0, 3.0, 4.0]
    d = [0.04, 0.03, 0.02, 0.01]
    pq.write_table(pa.table({
        "l_discount": pa.array(d, type=pa.float64()),
        "l_quantity": pa.array(q, type=pa.float64())}),
        os.path.join(root, "lineitem.parquet"))
    out = AX.discount_quantity_spearman(root)
    assert out["spearman_r"].iloc[0] == pytest.approx(-1.0)

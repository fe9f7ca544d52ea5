"""Runtime guards added after review: the Misra–Gries exactness bound
fallback in ``heavy_hitter_tokens`` and ``events_funnel``'s zero-signup
NULL-pct semantics, plus the fsspec probe leaving ``sys.modules`` clean."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import sketches as SK
from p_id_text_extraction_ray.pipelines import analytics_ext as AX


@pytest.fixture(scope="module")
def flat_vocab_dir(tmp_path_factory):
    """A corpus whose token distribution is perfectly flat and wider than
    MG_COUNTERS — the case where the MG candidate union's exactness
    precondition (20th count > N/MG_COUNTERS) FAILS."""
    root = str(tmp_path_factory.mktemp("flat_vocab"))
    n_tok = SK.MG_COUNTERS + 500
    toks = [f"tok{i:05d}" for i in range(n_tok)]
    docs = [" ".join(toks[i:i + 50]) for i in range(0, n_tok, 50)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["src0"] * len(docs), pa.string()),
        "n_chars": pa.array([len(d) for d in docs], pa.int64())}),
        os.path.join(root, "documents.parquet"))
    return root


def test_heavy_hitters_flat_distribution_falls_back_exact(
        ray_session, flat_vocab_dir):
    res = SK.heavy_hitter_tokens(flat_vocab_dir)
    # every token appears exactly once -> exact top-20 is the 20 smallest
    # token strings, each with n=1
    assert list(res["token"]) == [f"tok{i:05d}" for i in range(20)]
    assert (res["n"] == 1).all()


@pytest.fixture(scope="module")
def no_signup_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("no_signup"))
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01"),
                        pd.Timestamp("2024-01-02")],
                       pa.timestamp("us")),
        "user_id": pa.array([7, 7], pa.int64()),
        "event_type": pa.array(["purchase", "view"], pa.string()),
        "value": pa.array([1.0, 2.0], pa.float64()),
        "props": pa.array(["{}", "{}"], pa.string())}),
        os.path.join(root, "events.parquet"))
    return root


def test_events_funnel_zero_signups_matches_oracle(ray_session,
                                                   no_signup_dir):
    import duckdb
    res = AX.events_funnel(no_signup_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{no_signup_dir}/events.parquet'")
    exp = con.execute(AX.EVENTS_FUNNEL_SQL).df()
    assert int(res["n_signup_users"].iloc[0]) == int(exp["n_signup_users"].iloc[0]) == 0
    assert int(res["n_converted"].iloc[0]) == int(exp["n_converted"].iloc[0]) == 0
    assert res["conversion_pct"].iloc[0] is None or \
        pd.isna(res["conversion_pct"].iloc[0])
    assert pd.isna(exp["conversion_pct"].iloc[0])


def test_fsspec_probe_leaves_no_placeholder_modules():
    from p_id_text_extraction_ray.state.manifest import \
        _settle_fsspec_http_import
    _settle_fsspec_http_import()
    for name in ("aiohttp", "yarl"):
        mod = sys.modules.get(name)
        # either genuinely importable (has a file) or absent — never an
        # empty inert placeholder
        assert mod is None or getattr(mod, "__file__", None)

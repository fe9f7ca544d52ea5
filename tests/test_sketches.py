"""Sketch-operator guarantees: HLL error bound, Bloom semi-join exactness,
Misra–Gries candidate superset."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_hll_estimate_within_bound(ray_session):
    from p_id_text_extraction_ray.pipelines.sketches import approx_distinct_users
    res = approx_distinct_users(SF_DIR).set_index("event_type")["approx_users"]
    exact = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY 1").df() \
        .set_index("event_type")["n"]
    assert set(res.index) == set(exact.index)
    for et in exact.index:
        err = abs(res[et] - exact[et]) / max(1, exact[et])
        # p=12 → ~1.6% standard error; linear counting regime is tighter
        assert err < 0.05, f"{et}: est {res[et]} vs exact {exact[et]}"


def test_hll_registers_merge_associative():
    from p_id_text_extraction_ray.pipelines.sketches import (
        _hll_registers, _hll_estimate)
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, size=30_000, dtype=np.int64)
    whole = _hll_registers(keys)
    parts = [_hll_registers(c) for c in np.array_split(keys, 7)]
    merged = np.maximum.reduce(parts)
    assert np.array_equal(whole, merged)
    n_exact = len(np.unique(keys))
    est = _hll_estimate(whole)
    assert abs(est - n_exact) / n_exact < 0.05


def test_bloom_semi_join_equals_plain_semi_join(ray_session):
    import ray.data as rd
    from p_id_text_extraction_ray.pipelines.joins import (
        bloom_semi_join, semi_join)
    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(0, 5000, size=20_000),
                         "v": rng.normal(size=20_000)})
    right = pd.DataFrame({"k": rng.choice(5000, size=300, replace=False)})
    lds = rd.from_pandas(left).repartition(8)
    rds = rd.from_pandas(right).repartition(4)
    got = bloom_semi_join(lds, rds, on="k", num_bits=1 << 16).to_pandas()
    want = semi_join(rd.from_pandas(left).repartition(8),
                     rd.from_pandas(right).repartition(4), on="k").to_pandas()
    key = ["k", "v"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # and equals the pandas ground truth
    truth = left[left["k"].isin(set(right["k"]))][key] \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, truth)


def test_bloom_prefilter_actually_prunes(ray_session):
    """The bitmap must reject (almost all) non-members — otherwise the
    operator silently degrades to a full-shuffle semi-join."""
    from p_id_text_extraction_ray.pipelines.joins import (
        _bloom_positions, build_bloom)
    import ray
    import ray.data as rd
    members = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    ref, m, k = build_bloom(rd.from_pandas(members), "k", num_bits=1 << 16)
    bits = ray.get(ref)
    probes = np.arange(50_000, 80_000, dtype=np.int64)  # non-members
    hit = np.ones(len(probes), dtype=bool)
    for pos in _bloom_positions(probes, m, k):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        hit &= ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1) > 0
    assert hit.mean() < 0.02  # ≤2% false positives at this sizing
    # members always hit
    mhit = np.ones(1000, dtype=bool)
    for pos in _bloom_positions(members["k"].to_numpy(), m, k):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        mhit &= ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1) > 0
    assert mhit.all()


def test_histogram_quantiles_within_bin_error(ray_session):
    from p_id_text_extraction_ray.pipelines.sketches import (
        approx_length_quantiles, QUANTILES)
    res = approx_length_quantiles(SF_DIR).set_index("q")["approx_value"]
    exact = duckdb.sql(
        f"SELECT " + ", ".join(
            f"percentile_disc({q}) WITHIN GROUP (ORDER BY n_chars) AS q{i}"
            for i, q in enumerate(QUANTILES)) +
        f" FROM '{SF_DIR}/documents.parquet'").df().iloc[0]
    for i, q in enumerate(QUANTILES):
        ex = float(exact[f"q{i}"])
        # log-spaced 512 bins over 7 decades → ≤ ~3.3% relative bin width;
        # allow 2 bins of slack
        assert abs(res[q] - ex) / ex < 0.08, f"q={q}: {res[q]} vs {ex}"


def test_misra_gries_superset_guarantee():
    """Every token with true frequency > n/k appears in the summary."""
    from collections import Counter
    from p_id_text_extraction_ray.pipelines.sketches import _misra_gries
    rng = np.random.default_rng(3)
    # zipf-ish stream over a 5k vocab
    toks = [f"t{int(v)}" for v in rng.zipf(1.3, size=50_000) % 5000]
    k = 100
    summary = _misra_gries(toks, k)
    true = Counter(toks)
    thresh = len(toks) / k
    for tok, n in true.items():
        if n > thresh:
            assert tok in summary, f"{tok} (freq {n}) missing at k={k}"


def test_cms_bounds_vs_exact(ray_session):
    import duckdb
    import numpy as np
    from p_id_text_extraction_ray.pipelines.sketches import (
        CMS_D, CMS_W, CMS_PROBE_USERS, cms_user_event_counts)
    est = cms_user_event_counts(SF_DIR).to_pandas().set_index("user_id")
    con = duckdb.connect()
    exact = dict(con.sql(
        f"SELECT user_id, count(*) FROM '{SF_DIR}/events.parquet' "
        f"WHERE user_id < {CMS_PROBE_USERS} GROUP BY 1").fetchall())
    n_total = con.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet'").fetchone()[0]
    eps_bound = int(np.ceil(np.e / CMS_W * n_total))
    for uid, e in est["est_events"].items():
        ex = exact.get(uid, 0)
        assert e >= ex                      # never undercounts
        assert e <= ex + eps_bound          # over-count bounded by e/W * N


def test_cms_merge_is_partition_invariant(ray_session):
    import numpy as np
    from p_id_text_extraction_ray.pipelines.sketches import _cms_rows
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 500, 10_000).astype(np.int64)
    whole = _cms_rows(keys)
    parts = sum(_cms_rows(c) for c in np.array_split(keys, 7))
    assert np.array_equal(whole, parts)

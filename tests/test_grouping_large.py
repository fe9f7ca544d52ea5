"""Property test: the spatial-decomposition grouping path is exactly
equivalent to the direct O(n^2) path (SURVEY.md §5.2 salt/no-salt
equality)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from p_id_text_extraction_ray.functions.geometry import (
    ConnectParams, group_boxes, group_boxes_large)

P = ConnectParams()


def _random_boxes(rng, n):
    # cluster boxes around line anchors so overlaps/connections happen
    xs = rng.integers(0, 3000, n)
    ys = rng.integers(0, 2000, n)
    ws = rng.integers(8, 200, n)
    hs = np.where(rng.random(n) < 0.8, 14, rng.integers(8, 160, n))
    boxes = np.stack([xs, ys, xs + ws, ys + hs], axis=1).astype(np.float64)
    rot = np.where((boxes[:, 3] - boxes[:, 1]) > (boxes[:, 2] - boxes[:, 0]), 90, 0)
    tord = rng.integers(0, 12, n)
    return boxes, rot.astype(np.int8), tord.astype(np.int64)


def _assert_equal(a, b):
    assert a.n_after == b.n_after
    np.testing.assert_array_equal(a.boxes, b.boxes)
    np.testing.assert_array_equal(a.rot, b.rot)
    np.testing.assert_array_equal(a.is_grouped, b.is_grouped)
    np.testing.assert_array_equal(a.group_keys, b.group_keys)
    for ta, tb in zip(a.tile_ords, b.tile_ords):
        np.testing.assert_array_equal(ta, tb)
    assert a.n_suppressed == b.n_suppressed
    assert a.n_merges == b.n_merges


@given(seed=st.integers(0, 10_000), n=st.integers(0, 400))
@settings(max_examples=40, deadline=None)
def test_large_path_equals_direct(seed, n):
    rng = np.random.default_rng(seed)
    boxes, rot, tord = _random_boxes(rng, n)
    _assert_equal(group_boxes(boxes, rot, tord, P),
                  group_boxes_large(boxes, rot, tord, P))


def test_large_path_dense_cluster():
    # heavy-overlap cluster: suppression + merge interplay across the
    # decomposition boundary
    rng = np.random.default_rng(7)
    base = np.array([500.0, 500.0, 700.0, 514.0])
    jitter = rng.integers(-40, 40, (120, 4)).astype(np.float64)
    boxes = base[None, :] + jitter
    boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 4)
    boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 2)
    rot = np.zeros(len(boxes), dtype=np.int8)
    tord = np.arange(len(boxes)) % 4
    _assert_equal(group_boxes(boxes, rot, tord, P),
                  group_boxes_large(boxes, rot, tord, P))

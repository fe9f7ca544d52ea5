"""Parity of the vectorized grouping kernels against a straight-line,
loop-based re-derivation of the reference algorithm (semantics from
/root/reference/src/grouping/grouping_logic.py; written here independently
as plain Python so the vectorized kernels are checked against a second,
structurally different implementation)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from p_id_text_extraction_ray.functions.geometry import (
    ConnectParams, connection_edges, suppress_contained)

P = ConnectParams()


def _params(b):
    x1, y1, x2, y2 = b
    w, h = x2 - x1, y2 - y1
    return dict(x_min=x1, y_min=y1, x_max=x2, y_max=y2, w=w, h=h,
                cx=(x1 + x2) / 2, cy=(y1 + y2) / 2, area=w * h)


def _iou(a, b):
    xl, yt = max(a["x_min"], b["x_min"]), max(a["y_min"], b["y_min"])
    xr, yb = min(a["x_max"], b["x_max"]), min(a["y_max"], b["y_max"])
    if xr < xl or yb < yt:
        return 0.0
    inter = (xr - xl) * (yb - yt)
    union = a["area"] + b["area"] - inter
    return inter / union if union else 0.0


def _iol(a, b):
    xl, yt = max(a["x_min"], b["x_min"]), max(a["y_min"], b["y_min"])
    xr, yb = min(a["x_max"], b["x_max"]), min(a["y_max"], b["y_max"])
    if xr < xl or yb < yt:
        return 0.0, 0.0
    inter = (xr - xl) * (yb - yt)
    if a["area"] == 0 or b["area"] == 0:
        return 0.0, 0.0
    return inter / a["area"], inter / b["area"]


def _suppress_loop(boxes, thr):
    """Reference Step 0 as literal greedy loops (grouping_logic.py:190-255)."""
    ps = [_params(b) for b in boxes]
    dead = set()
    n = len(ps)
    for i in range(n):
        for j in range(i + 1, n):
            if i in dead or j in dead:
                continue
            i_in_j, j_in_i = _iol(ps[i], ps[j])
            if i_in_j > thr:
                dead.add(i)
            elif j_in_i > thr:
                dead.add(j)
    return [k not in dead for k in range(n)]


def _connect_loop(boxes, p):
    """Reference connection predicate as literal branches
    (grouping_logic.py:324-436)."""
    ps = [_params(b) for b in boxes]
    edges = set()
    n = len(ps)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = ps[i], ps[j]
            if (a["w"] > a["h"]) != (b["w"] > b["h"]):
                continue
            big, small = (a, b) if a["area"] >= b["area"] else (b, a)
            we = big["w"] * p.neighborhood_expansion_factor / 2
            he = big["h"] * p.neighborhood_expansion_factor / 2
            if not (big["x_min"] - we <= small["cx"] <= big["x_max"] + we and
                    big["y_min"] - he <= small["cy"] <= big["y_max"] + he):
                continue
            iou = _iou(a, b)
            if iou > p.high_overlap_threshold or iou > p.high_iou_threshold:
                edges.add((i, j))
                continue
            if a["w"] > a["h"]:
                if abs(a["cy"] - b["cy"]) >= min(a["h"], b["h"]) * p.vertical_alignment_factor:
                    continue
                gap = min(abs(a["x_min"] - b["x_max"]), abs(b["x_min"] - a["x_max"]))
                if gap < max(a["h"], b["h"]) * p.proximity_factor:
                    edges.add((i, j))
            else:
                if abs(a["cx"] - b["cx"]) >= min(a["w"], b["w"]) * p.horizontal_alignment_factor:
                    continue
                gap = min(abs(a["y_min"] - b["y_max"]), abs(b["y_min"] - a["y_max"]))
                if gap < max(a["w"], b["w"]) * p.proximity_factor:
                    edges.add((i, j))
    return edges


boxes_strategy = st.lists(
    st.tuples(st.integers(0, 800), st.integers(0, 600),
              st.integers(1, 300), st.integers(1, 160)),
    min_size=0, max_size=60,
).map(lambda lst: np.array([[x, y, x + w, y + h] for x, y, w, h in lst],
                           dtype=np.float64).reshape(-1, 4))


@given(boxes=boxes_strategy)
@settings(max_examples=120, deadline=None)
def test_suppression_matches_reference_loop(boxes):
    got = suppress_contained(boxes, 0.9).tolist()
    want = _suppress_loop(boxes, 0.9)
    assert got == want


@given(boxes=boxes_strategy)
@settings(max_examples=120, deadline=None)
def test_connection_matches_reference_loop(boxes):
    ei, ej = connection_edges(boxes, P)
    got = set(zip(ei.tolist(), ej.tolist()))
    want = _connect_loop(boxes, P)
    assert got == want

"""Unit tests for the grouping geometry kernels against the reference
semantics (/root/reference/src/grouping/grouping_logic.py; see file:line
citations in functions/geometry.py)."""

import numpy as np
import pytest

from p_id_text_extraction_ray.functions.geometry import (
    ConnectParams, box_params, connected_components, connection_edges,
    group_boxes, high_iou_survivors, iou_matrix, suppress_contained)

P = ConnectParams()


def test_iou_basic():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[5, 0, 15, 10], [20, 20, 30, 30], [0, 0, 10, 10]])
    iou = iou_matrix(a, b)[0]
    assert iou[0] == pytest.approx(50 / 150)
    assert iou[1] == 0.0
    assert iou[2] == 1.0


def test_iou_zero_area():
    # grouping_logic.py:155-158 — zero union -> 0
    a = np.array([[5, 5, 5, 5]])
    assert iou_matrix(a, a)[0, 0] == 0.0


def test_suppress_contained_basic():
    # inner box 90%+ inside outer -> suppressed (grouping_logic.py:224-231)
    boxes = np.array([[0, 0, 100, 100], [10, 10, 90, 90], [200, 0, 300, 100]])
    keep = suppress_contained(boxes, 0.9)
    assert keep.tolist() == [True, False, True]


def test_suppress_identical_suppresses_first():
    # IoL both directions = 1: the pair rule fires iol_1_in_2 first -> i dropped
    boxes = np.array([[0, 0, 50, 50], [0, 0, 50, 50]])
    keep = suppress_contained(boxes, 0.9)
    assert keep.tolist() == [False, True]


def test_suppress_greedy_skip_order_sensitivity():
    # Box 1 suppressed by box 0; pair (1,2) must then be SKIPPED even though
    # box 2 is contained in box 1 (grouping_logic.py:213-214) — box 2 can
    # still be suppressed by a later pair only if contained in a live box.
    boxes = np.array([
        [0, 0, 100, 100],     # 0: big
        [10, 10, 90, 90],     # 1: inside 0 -> suppressed at pair (0,1)
        [20, 20, 40, 40],     # 2: inside both 0 and 1 -> suppressed at (0,2)
    ])
    keep = suppress_contained(boxes, 0.9)
    assert keep.tolist() == [True, False, False]

    # Now make 2 contained ONLY in 1 (not in 0): since 1 is dead, 2 survives.
    boxes2 = np.array([
        [0, 0, 100, 100],
        [200, 0, 290, 100],    # overlaps nothing... make it contain box 2
    ])
    boxes2 = np.vstack([boxes2, [[210, 10, 280, 90]]])
    # pair (0,1): disjoint; (0,2): disjoint; (1,2): 2 in 1 -> suppressed
    keep2 = suppress_contained(boxes2, 0.9)
    assert keep2.tolist() == [True, True, False]


def test_connection_high_overlap():
    # IoU > 0.1 with same orientation + neighborhood -> connect
    b = np.array([[0, 0, 100, 14], [50, 0, 150, 14]])
    ei, ej = connection_edges(b, P)
    assert (ei.tolist(), ej.tolist()) == ([0], [1])


def test_connection_orientation_mismatch():
    # horizontal vs vertical never connect (grouping_logic.py:329-334)
    b = np.array([[0, 0, 100, 14], [0, 20, 14, 120]])
    ei, _ = connection_edges(b, P)
    assert len(ei) == 0


def test_connection_alignment_rejection():
    # same orientation, close in x, but vertical centers differ >= 0.2*min_h
    b = np.array([[0, 0, 100, 14], [110, 20, 210, 34]])
    ei, _ = connection_edges(b, P)
    assert len(ei) == 0


def test_connection_proximity_accept_and_gap_reject():
    # NOTE: the reference's neighborhood filter (expansion factor 1 -> half
    # the larger box's width each side) means equal-size adjacent boxes are
    # never neighbors unless they overlap; proximity connections need a
    # size-disparate pair (grouping_logic.py:336-369).
    near = np.array([[0, 0, 200, 14], [210, 0, 240, 14]])
    ei, ej = connection_edges(near, P)
    assert (ei.tolist(), ej.tolist()) == ([0], [1])
    # gap >= max_h*proximity_factor -> reject (grouping_logic.py:410-413)
    far = np.array([[0, 0, 200, 14], [215, 0, 245, 14]])
    ei, _ = connection_edges(far, P)
    assert len(ei) == 0


def test_connection_equal_size_nonoverlapping_not_neighbors():
    # adjacent equal-width words with any positive gap fail the
    # neighborhood filter (center of one outside the other's expansion)
    b = np.array([[0, 0, 100, 14], [105, 0, 205, 14]])
    ei, _ = connection_edges(b, P)
    assert len(ei) == 0


def test_connection_vertical_text_rules():
    near = np.array([[0, 0, 14, 200], [0, 210, 14, 240]])
    ei, ej = connection_edges(near, P)
    assert (ei.tolist(), ej.tolist()) == ([0], [1])
    misaligned = np.array([[0, 0, 14, 200], [20, 210, 34, 240]])
    ei, _ = connection_edges(misaligned, P)
    assert len(ei) == 0


def test_connection_neighborhood_rejection():
    # Same line, aligned, but the gap rule fires before neighborhood matters;
    # construct a pair passing alignment but with the smaller box's center
    # outside the expanded region of the larger -> primary filter rejects.
    # Larger box 200 wide; expansion factor 1 -> region extends 100 px each
    # side; smaller box center at x=350 is outside; choose overlap in y.
    b = np.array([[0, 0, 200, 14], [340, 0, 360, 14]])
    ei, _ = connection_edges(b, P)
    assert len(ei) == 0


def test_connected_components_min_label():
    labels = connected_components(5, np.array([0, 3]), np.array([2, 4]))
    assert labels.tolist() == [0, 1, 0, 3, 3]


def test_high_iou_survivors_keeps_larger():
    # two near-identical boxes IoU>0.95: smaller dropped (grouping_logic.py:574-599)
    boxes = np.array([[0, 0, 100, 100], [0, 0, 100, 101], [500, 0, 600, 100]])
    surv = high_iou_survivors(boxes, np.array([0, 1]), 0.95)
    assert surv.tolist() == [1]
    # equal areas -> both kept (strict < comparison in reference)
    eq = np.array([[0, 0, 100, 100], [0, 1, 100, 101]])
    surv = high_iou_survivors(eq, np.array([0, 1]), 0.95)
    assert surv.tolist() == [0, 1]


def test_group_boxes_merges_fragments():
    # two overlapping fragments of one word + one isolated word
    boxes = np.array([[100, 100, 300, 114], [250, 100, 400, 114],
                      [100, 300, 200, 314]])
    g = group_boxes(boxes, np.zeros(3, np.int8), np.array([0, 1, 0]), P)
    assert g.n_before == 3 and g.n_after == 2
    assert g.boxes.tolist()[0] == [100, 100, 400, 114]
    assert g.is_grouped.tolist() == [True, False]
    assert g.tile_ords[0].tolist() == [0, 1]


def test_group_boxes_empty():
    g = group_boxes(np.zeros((0, 4)), np.zeros(0), np.zeros(0), P)
    assert g.n_after == 0 and len(g.boxes) == 0


def test_box_params_matches_reference_formulae():
    p = box_params(np.array([[10, 20, 110, 60]]))
    assert p["w"][0] == 100 and p["h"][0] == 40
    assert p["cx"][0] == 60 and p["cy"][0] == 40
    assert p["area"][0] == 4000

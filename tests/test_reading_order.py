"""Reading-order sort: raster order with y-tolerance line grouping."""

import numpy as np

from p_id_text_extraction_ray.functions.reading_order import reading_order_ranks


def test_simple_raster():
    boxes = np.array([[10, 50, 90, 64],    # second line
                      [200, 12, 260, 26],  # first line, right
                      [10, 10, 90, 24]])   # first line, left
    ranks = reading_order_ranks(boxes, np.zeros(3))
    assert ranks.tolist() == [2, 1, 0]


def test_y_jitter_same_line():
    # small y offsets within tolerance fold into one line ordered by x
    boxes = np.array([[100, 12, 160, 26], [10, 10, 90, 24], [200, 14, 260, 28]])
    ranks = reading_order_ranks(boxes, np.zeros(3))
    assert ranks.tolist() == [1, 0, 2]


def test_vertical_anchor_top_edge():
    # vertical box anchored at its top edge sorts with the line containing
    # its top, not its center
    boxes = np.array([[10, 10, 90, 24],      # line 1 horizontal
                      [200, 12, 214, 112]])  # vertical, top at line 1
    ranks = reading_order_ranks(boxes, np.array([0, 90]))
    assert ranks.tolist() == [0, 1]


def test_deterministic_on_ties():
    boxes = np.array([[10, 10, 90, 24], [10, 10, 90, 24]])
    r1 = reading_order_ranks(boxes, np.zeros(2))
    r2 = reading_order_ranks(boxes[::-1], np.zeros(2))
    assert sorted(r1.tolist()) == [0, 1] and sorted(r2.tolist()) == [0, 1]


def test_empty():
    assert reading_order_ranks(np.zeros((0, 4)), np.zeros(0)).tolist() == []

"""Deterministic reading-order sort for grouped boxes.

The reference's output order is incidental (filesystem glob + DFS discovery,
SURVEY.md §2.6). The north star replaces it with a deterministic top-left
raster order with y-tolerance line grouping:

* anchor: horizontal boxes anchor at their y-center; vertical (rot=90)
  boxes anchor at their top edge (they read downward from their top).
* line grouping: scanning boxes by ascending anchor, a box joins the
  current line when its anchor differs from the line's first-box anchor by
  less than ``tol * min(box_h, line_first_h)`` — the alignment-factor
  semantics of the reference's connection rule
  (``/root/reference/src/grouping/grouping_logic.py:396-400``).
* order: lines by ascending anchor, boxes within a line by ascending x_min
  (ties by anchor, then input index — fully deterministic).
"""

from __future__ import annotations

import numpy as np


def reading_order_ranks(boxes: np.ndarray, rot: np.ndarray,
                        line_tolerance_factor: float = 0.5) -> np.ndarray:
    """Rank (0-based reading position) per box. ``boxes`` is (n,4)
    [x_min,y_min,x_max,y_max]; ``rot`` is 0 or 90 per box."""
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    n = len(boxes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rot = np.asarray(rot)
    h = boxes[:, 3] - boxes[:, 1]
    anchor = np.where(rot == 90, boxes[:, 1], (boxes[:, 1] + boxes[:, 3]) / 2.0)

    by_anchor = np.lexsort((np.arange(n), boxes[:, 0], anchor))
    line_id = np.empty(n, dtype=np.int64)
    cur_line = -1
    line_anchor = 0.0
    line_h = 0.0
    for idx in by_anchor:
        if cur_line < 0 or abs(anchor[idx] - line_anchor) >= \
                line_tolerance_factor * min(h[idx], line_h):
            cur_line += 1
            line_anchor = anchor[idx]
            line_h = h[idx]
        line_id[idx] = cur_line

    order = np.lexsort((np.arange(n), anchor, boxes[:, 0], line_id))
    ranks = np.empty(n, dtype=np.int64)
    ranks[order] = np.arange(n)
    return ranks

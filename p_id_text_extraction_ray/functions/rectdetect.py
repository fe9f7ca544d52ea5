"""Pixel text-region detector for value-coded rasters.

Stands in for the reference's CRAFT/EasyOCR detection
(``/root/reference/src/text_detection/text_detection.py:49-104``): it reads
tile pixels and returns axis-aligned boxes of non-background regions. On the
fixture codec (solid rectangles on a uniform background, ``media/codec.py``)
this is an *exact* detector, so the downstream pipeline — orientation
heuristic, cross-tile grouping, cropping, recognition — runs on genuinely
detected-from-pixels regions. A real CRAFT model would slot in behind the
same actor interface (``stages/cv.PixelDetector``).

Algorithm: single-pass run-merging connected components. Distinct fixture
strings never touch, and every region is a solid rectangle, so each run of a
row overlaps at most one component from the previous row.
"""

from __future__ import annotations

import numpy as np

from ..media.codec import BACKGROUND


def detect_rects(img: np.ndarray, bg: int = BACKGROUND) -> np.ndarray:
    """Bounding boxes of non-bg connected regions -> (n,4) int64
    [x1, y1, x2, y2) sorted by (y1, x1)."""
    fg = img != bg
    row_any = fg.any(axis=1)
    comp: dict[int, list[int]] = {}
    prev: list[tuple[int, int, int]] = []   # (start, end, comp_id) runs of prev row
    prev_row = -2
    next_id = 0
    for r in np.flatnonzero(row_any):
        r = int(r)
        if r != prev_row + 1:   # >=1 empty row breaks continuity
            prev = []
        prev_row = r
        d = np.diff(np.concatenate(([0], fg[r].view(np.int8), [0])))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        cur: list[tuple[int, int, int]] = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            cid = -1
            for ps, pe, pid in prev:
                if ps < e and s < pe:
                    cid = pid
                    break
            if cid < 0:
                cid = next_id
                next_id += 1
                comp[cid] = [s, r, e, r + 1]
            else:
                b = comp[cid]
                b[0] = min(b[0], s)
                b[2] = max(b[2], e)
                b[3] = r + 1
            cur.append((s, e, cid))
        prev = cur
    if not comp:
        return np.zeros((0, 4), dtype=np.int64)
    boxes = np.array([[b[0], b[1], b[2], b[3]] for b in comp.values()], dtype=np.int64)
    order = np.lexsort((boxes[:, 0], boxes[:, 1]))
    return boxes[order]


def detect_rects_dbnet(img: np.ndarray, bg: int = BACKGROUND,
                       dilate: int = 2) -> np.ndarray:
    """DBNet-style segmentation detector (Liao et al., AAAI '20 shape):
    binarize -> box-dilate the text map by ``dilate`` px (the "unclip"
    expansion) -> connected components of the dilated map -> shrink each
    component back to the tight foreground bbox.

    A weights-free stand-in with the same algorithmic skeleton as a real
    DBNet head (probability map -> threshold -> dilate -> boxes); regions
    whose gap is <= 2*dilate merge, exactly like unclipped text kernels.
    On the fixture corpus (string margin 12 px > 2*dilate) it is exact and
    must agree with ``detect_rects`` — the detector-swap test relies on
    that. [x1, y1, x2, y2) sorted by (y1, x1).
    """
    fg = img != bg
    if not fg.any():
        return np.zeros((0, 4), dtype=np.int64)
    # box dilation via integral image: window sum > 0 == sliding OR
    pad = np.pad(fg, dilate + 1).astype(np.int32)
    ii = pad.cumsum(axis=0).cumsum(axis=1)
    k = 2 * dilate + 1
    h, w = fg.shape
    y0, x0 = np.arange(h), np.arange(w)
    # window [y .. y+k) x [x .. x+k) in padded coords anchored so that the
    # window is centered on the original pixel
    a = ii[k:, k:][np.ix_(y0, x0)]
    b = ii[:-k, k:][np.ix_(y0, x0)]
    c = ii[k:, :-k][np.ix_(y0, x0)]
    d = ii[:-k, :-k][np.ix_(y0, x0)]
    dilated = (a - b - c + d) > 0
    comps = detect_rects(np.where(dilated, 0, 255).astype(np.uint8), bg=255)
    out = []
    for x1, y1, x2, y2 in comps:
        sub = fg[y1:y2, x1:x2]
        rows = np.flatnonzero(sub.any(axis=1))
        cols = np.flatnonzero(sub.any(axis=0))
        if not len(rows):
            continue
        out.append([x1 + cols[0], y1 + rows[0],
                    x1 + cols[-1] + 1, y1 + rows[-1] + 1])
    boxes = np.array(out, dtype=np.int64)
    order = np.lexsort((boxes[:, 0], boxes[:, 1]))
    return boxes[order]


def _components_bboxes(fg: np.ndarray) -> np.ndarray:
    """Tight bboxes of connected components of an ARBITRARY boolean map
    (union-find over row runs — unlike ``detect_rects``'s single-overlap
    fast path, correct for concave/merging shapes like dilated words)."""
    if not fg.any():
        return np.zeros((0, 4), dtype=np.int64)
    parent: list[int] = []
    bbox: list[list[int]] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> int:
        ra, rb = find(a), find(b)
        if ra == rb:
            return ra
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
        ba, bb = bbox[ra], bbox[rb]
        ba[0] = min(ba[0], bb[0]); ba[1] = min(ba[1], bb[1])
        ba[2] = max(ba[2], bb[2]); ba[3] = max(ba[3], bb[3])
        return ra

    prev: list[tuple[int, int, int]] = []
    prev_row = -2
    for r in np.flatnonzero(fg.any(axis=1)).tolist():
        if r != prev_row + 1:
            prev = []
        prev_row = r
        d = np.diff(np.concatenate(([0], fg[r].view(np.int8), [0])))
        starts = np.flatnonzero(d == 1).tolist()
        ends = np.flatnonzero(d == -1).tolist()
        cur: list[tuple[int, int, int]] = []
        for s, e in zip(starts, ends):
            cid = -1
            for ps, pe, pid in prev:
                if ps < e and s < pe:
                    cid = pid if cid < 0 else union(cid, pid)
            if cid < 0:
                cid = len(parent)
                parent.append(cid)
                bbox.append([s, r, e, r + 1])
            else:
                cid = find(cid)
                b = bbox[cid]
                b[0] = min(b[0], s); b[2] = max(b[2], e); b[3] = r + 1
            cur.append((s, e, cid))
        prev = cur
    roots = sorted({find(i) for i in range(len(parent))})
    boxes = np.array([bbox[r] for r in roots], dtype=np.int64)
    order = np.lexsort((boxes[:, 0], boxes[:, 1]))
    return boxes[order]


def merge_line_boxes(boxes: np.ndarray, height_ths: float, width_ths: float,
                     slope_ths: float, ycenter_ths: float) -> np.ndarray:
    """Same-line box merge — the engine's EasyOCR ``group_text_box`` step
    (the reference forwards its four thresholds at
    ``text_detection.py:67-81``). Two boxes join when their heights
    differ by <= height_ths * max(h), vertical centers by
    <= ycenter_ths * max(h), horizontal gap (negative if overlapping)
    is <= width_ths * max(h), and the center-to-center slope is
    <= slope_ths; joins are transitive (union-find) and the merged box
    is the bbox union. O(n^2) pairwise numpy per tile — n is the word
    count of ONE tile, never corpus-sized."""
    n = len(boxes)
    if n <= 1:
        return boxes
    x1, y1, x2, y2 = (boxes[:, i].astype(np.float64) for i in range(4))
    h = y2 - y1
    cy = (y1 + y2) / 2.0
    cx = (x1 + x2) / 2.0
    hmax = np.maximum(h[:, None], h[None, :])
    cond = np.abs(h[:, None] - h[None, :]) <= height_ths * hmax
    cond &= np.abs(cy[:, None] - cy[None, :]) <= ycenter_ths * hmax
    gap = np.maximum(x1[None, :] - x2[:, None], x1[:, None] - x2[None, :])
    cond &= gap <= width_ths * hmax
    dx = np.maximum(np.abs(cx[:, None] - cx[None, :]), 1.0)
    cond &= np.abs(cy[:, None] - cy[None, :]) / dx <= slope_ths
    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in zip(*(a.tolist() for a in np.nonzero(cond))):
        if i < j:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(n)])
    out = []
    for r in np.unique(roots):
        m = roots == r
        out.append([int(x1[m].min()), int(y1[m].min()),
                    int(x2[m].max()), int(y2[m].max())])
    merged = np.array(out, dtype=np.int64)
    order = np.lexsort((merged[:, 0], merged[:, 1]))
    return merged[order]


def detect_rects_words(img: np.ndarray, bg: int = BACKGROUND,
                       dilate: int = 8, *,
                       strong_max: int | None = None,
                       weak_max: int | None = None,
                       height_ths: float | None = None,
                       width_ths: float | None = None,
                       slope_ths: float | None = None,
                       ycenter_ths: float | None = None) -> np.ndarray:
    """Word-level detector for glyph-shaped ink (rendered TrueType text,
    scanned sheets): binarize -> box-dilate by ``dilate`` px (sized to
    INTER-CHARACTER gaps, ~1/3 of a 24pt-at-150dpi cap height) -> true
    union-find connected components (dilated word silhouettes are
    concave, so the rectangle fast path does not apply) -> shrink to the
    tight ink bbox. Emits the word granularity CRAFT emits and the
    grouping rules assume; gaps wider than 2*dilate (true word spaces)
    may still merge, and the template recognizer re-splits those by
    inserting spaces at wide in-box gaps.

    The keyword thresholds carry the reference's CRAFT/EasyOCR detect
    parameters (``config.DetectionConfig``): when ``weak_max`` is given,
    candidate ink is luminance <= weak_max (CRAFT's ``low_text`` region
    cut) instead of exact non-background; when ``strong_max`` is given,
    a component survives only if it contains a pixel with luminance
    <= strong_max (CRAFT's ``text_threshold`` confidence cut) —
    hysteresis thresholding. When all four line-merge factors are given,
    ``merge_line_boxes`` runs on the tight boxes (EasyOCR's
    ``height_ths/width_ths/slope_ths/ycenter_ths``)."""
    fg = (img != bg) if weak_max is None else (img <= weak_max)
    if not fg.any():
        return np.zeros((0, 4), dtype=np.int64)
    pad = np.pad(fg, dilate + 1).astype(np.int32)
    ii = pad.cumsum(axis=0).cumsum(axis=1)
    k = 2 * dilate + 1
    h, w = fg.shape
    y0, x0 = np.arange(h), np.arange(w)
    a = ii[k:, k:][np.ix_(y0, x0)]
    b = ii[:-k, k:][np.ix_(y0, x0)]
    c = ii[k:, :-k][np.ix_(y0, x0)]
    d = ii[:-k, :-k][np.ix_(y0, x0)]
    dilated = (a - b - c + d) > 0
    out = []
    for x1, y1, x2, y2 in _components_bboxes(dilated):
        sub = fg[y1:y2, x1:x2]
        rows = np.flatnonzero(sub.any(axis=1))
        cols = np.flatnonzero(sub.any(axis=0))
        if not len(rows):
            continue
        tx1, ty1 = x1 + cols[0], y1 + rows[0]
        tx2, ty2 = x1 + cols[-1] + 1, y1 + rows[-1] + 1
        if strong_max is not None:
            region = img[ty1:ty2, tx1:tx2]
            if not ((region <= strong_max) & fg[ty1:ty2, tx1:tx2]).any():
                continue        # weak-only component: below text_threshold
        out.append([tx1, ty1, tx2, ty2])
    if not out:
        return np.zeros((0, 4), dtype=np.int64)
    boxes = np.array(out, dtype=np.int64)
    if None not in (height_ths, width_ths, slope_ths, ycenter_ths):
        boxes = merge_line_boxes(boxes, height_ths, width_ths,
                                 slope_ths, ycenter_ths)
    order = np.lexsort((boxes[:, 0], boxes[:, 1]))
    return boxes[order]

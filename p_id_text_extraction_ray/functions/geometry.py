"""Vectorized box-geometry kernels for the grouping stage.

Reimplements (from behavior, not code) the reference's 5-step graph-based
grouping — ``/root/reference/src/grouping/grouping_logic.py``:

* Step 0 containment suppression (IoL greedy pair scan, ``:190-255``)
* connection predicate: orientation + neighborhood primary filter
  (``:324-369``), high-overlap IoU rule and alignment/gap proximity rules
  (``:371-436``)
* connected components (``:505-532``)
* per-component high-IoU keep-larger filter + envelope merge (``:534-651``)

The reference iterates Python dicts pairwise (O(n^2) interpreted); here every
pairwise predicate is evaluated as blockwise numpy over an (n,4) float64
``[x_min, y_min, x_max, y_max]`` array, and only the few candidate pairs fall
back to a tiny Python loop where the reference's greedy order-sensitivity
requires it.

Determinism contract (documented deviations from the reference, SURVEY.md
§2.6/§2.7): input boxes are in canonical order (tile ordinal asc, then
detection index asc); components are emitted ordered by their smallest member
index; the merged box takes scalar metadata from its smallest surviving
member; tile-id unions are sorted. The reference's corresponding orders are
filesystem-glob / set-iteration nondeterministic.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# Row-chunk size for blockwise pairwise evaluation: bounds peak memory at
# O(PAIR_CHUNK * n) per matrix instead of O(n^2).
_PAIR_CHUNK = 2048


def box_params(boxes: np.ndarray) -> dict[str, np.ndarray]:
    """Derived per-box quantities (reference ``calculate_box_parameters``,
    grouping_logic.py:118-135): width/height/center/area as float64."""
    b = np.asarray(boxes, dtype=np.float64)
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    return {
        "x_min": b[:, 0], "y_min": b[:, 1], "x_max": b[:, 2], "y_max": b[:, 3],
        "w": w, "h": h,
        "cx": (b[:, 0] + b[:, 2]) / 2.0, "cy": (b[:, 1] + b[:, 3]) / 2.0,
        "area": w * h,
    }


def _pair_intersection(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection areas between rows of a (m,4) and b (k,4) -> (m,k)."""
    x_left = np.maximum(a[:, None, 0], b[None, :, 0])
    y_top = np.maximum(a[:, None, 1], b[None, :, 1])
    x_right = np.minimum(a[:, None, 2], b[None, :, 2])
    y_bottom = np.minimum(a[:, None, 3], b[None, :, 3])
    iw = x_right - x_left
    ih = y_bottom - y_top
    # Reference returns 0 when x_right < x_left (strict); a zero-width touch
    # yields zero area either way.
    inter = iw * ih
    inter[(iw < 0) | (ih < 0)] = 0.0
    return inter


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU between rows of a and b (reference ``calculate_iou``,
    grouping_logic.py:137-158; 0 when the union is empty)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    inter = _pair_intersection(a, b)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


def suppress_contained(boxes: np.ndarray, threshold: float) -> np.ndarray:
    """Step-0 containment suppression -> boolean keep mask.

    Reference semantics (grouping_logic.py:190-255): scan unique pairs (i<j)
    in lexicographic order, skipping pairs where either side is already
    suppressed; if IoL(i in j) > thr suppress i, elif IoL(j in i) > thr
    suppress j. The greedy skip makes the result order-sensitive, so the
    final decision runs as a Python loop — but only over the (few) candidate
    pairs found by a vectorized IoL prefilter.
    """
    n = len(boxes)
    if n == 0:
        return np.zeros(0, dtype=bool)
    b = np.asarray(boxes, dtype=np.float64)
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    cand_i: list[np.ndarray] = []
    cand_j: list[np.ndarray] = []
    for s in range(0, n, _PAIR_CHUNK):
        e = min(s + _PAIR_CHUNK, n)
        inter = _pair_intersection(b[s:e], b)
        with np.errstate(divide="ignore", invalid="ignore"):
            iol_row_in_col = np.where(area[s:e, None] > 0, inter / area[s:e, None], 0.0)
            iol_col_in_row = np.where(area[None, :] > 0, inter / area[None, :], 0.0)
        # Reference returns (0,0) when either area is 0 — mask both directions.
        either_zero = (area[s:e, None] == 0) | (area[None, :] == 0)
        hit = ((iol_row_in_col > threshold) | (iol_col_in_row > threshold)) & ~either_zero
        # Upper triangle only (global i < j).
        rows, cols = np.nonzero(hit)
        gi = rows + s
        keep_ut = gi < cols
        cand_i.append(gi[keep_ut])
        cand_j.append(cols[keep_ut])
    ii = np.concatenate(cand_i) if cand_i else np.zeros(0, dtype=np.int64)
    jj = np.concatenate(cand_j) if cand_j else np.zeros(0, dtype=np.int64)
    # Row-chunked nonzero already yields lexicographic (i, j) order.

    suppressed = np.zeros(n, dtype=bool)
    if len(ii):
        # Recompute scalar IoLs only for candidates (elementwise, cheap).
        iw = np.minimum(b[ii, 2], b[jj, 2]) - np.maximum(b[ii, 0], b[jj, 0])
        ih = np.minimum(b[ii, 3], b[jj, 3]) - np.maximum(b[ii, 1], b[jj, 1])
        inter = iw * ih
        inter[(iw < 0) | (ih < 0)] = 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            iol_i_in_j = np.where(area[ii] > 0, inter / area[ii], 0.0)
            iol_j_in_i = np.where(area[jj] > 0, inter / area[jj], 0.0)
        for k in range(len(ii)):
            i, j = ii[k], jj[k]
            if suppressed[i] or suppressed[j]:
                continue
            if iol_i_in_j[k] > threshold:
                suppressed[i] = True
            elif iol_j_in_i[k] > threshold:
                suppressed[j] = True
    return ~suppressed


@dataclass(frozen=True)
class ConnectParams:
    high_overlap_threshold: float = 0.1
    high_iou_threshold: float = 0.95
    vertical_alignment_factor: float = 0.2
    horizontal_alignment_factor: float = 0.2
    proximity_factor: float = 1.0
    neighborhood_expansion_factor: float = 1.0


def connection_edges(boxes: np.ndarray, p: ConnectParams) -> tuple[np.ndarray, np.ndarray]:
    """All connected pairs (i<j) under the reference's strict predicate.

    Fully vectorized: the predicate (grouping_logic.py:324-436) is pure per
    pair with no cross-pair state, unlike suppression. Returns (i_idx, j_idx).
    """
    n = len(boxes)
    if n < 2:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    b = np.asarray(boxes, dtype=np.float64)
    prm = box_params(b)
    horiz = prm["w"] > prm["h"]

    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    for s in range(0, n, _PAIR_CHUNK):
        e = min(s + _PAIR_CHUNK, n)
        m = e - s
        # -- primary filter: orientation consistency (grouping_logic.py:329-334)
        ok = horiz[s:e, None] == horiz[None, :]
        # -- primary filter: neighborhood (grouping_logic.py:336-369)
        a_i, a_j = prm["area"][s:e, None], prm["area"][None, :]
        i_larger = a_i >= a_j
        lw = np.where(i_larger, prm["w"][s:e, None], prm["w"][None, :])
        lh = np.where(i_larger, prm["h"][s:e, None], prm["h"][None, :])
        lx0 = np.where(i_larger, prm["x_min"][s:e, None], prm["x_min"][None, :])
        lx1 = np.where(i_larger, prm["x_max"][s:e, None], prm["x_max"][None, :])
        ly0 = np.where(i_larger, prm["y_min"][s:e, None], prm["y_min"][None, :])
        ly1 = np.where(i_larger, prm["y_max"][s:e, None], prm["y_max"][None, :])
        scx = np.where(i_larger, prm["cx"][None, :], prm["cx"][s:e, None])
        scy = np.where(i_larger, prm["cy"][None, :], prm["cy"][s:e, None])
        we = lw * p.neighborhood_expansion_factor / 2.0
        he = lh * p.neighborhood_expansion_factor / 2.0
        ok &= (lx0 - we <= scx) & (scx <= lx1 + we) & (ly0 - he <= scy) & (scy <= ly1 + he)

        # -- rule A: high overlap (grouping_logic.py:381-388)
        iou = iou_matrix(b[s:e], b)
        conn = iou > p.high_overlap_threshold
        conn |= iou > p.high_iou_threshold  # subsumed but kept for parity

        # -- rule B: proximity; branch on box-i orientation (grouping_logic.py:390-434).
        # Orientation already matches when ok is True, so using either side's
        # orientation is equivalent.
        is_h = np.broadcast_to(horiz[s:e, None], (m, n))
        h_i, h_j = prm["h"][s:e, None], prm["h"][None, :]
        w_i, w_j = prm["w"][s:e, None], prm["w"][None, :]
        vdist = np.abs(prm["cy"][s:e, None] - prm["cy"][None, :])
        hdist = np.abs(prm["cx"][s:e, None] - prm["cx"][None, :])
        hgap = np.minimum(np.abs(prm["x_min"][s:e, None] - prm["x_max"][None, :]),
                          np.abs(prm["x_min"][None, :] - prm["x_max"][s:e, None]))
        vgap = np.minimum(np.abs(prm["y_min"][s:e, None] - prm["y_max"][None, :]),
                          np.abs(prm["y_min"][None, :] - prm["y_max"][s:e, None]))
        prox_h = (vdist < np.minimum(h_i, h_j) * p.vertical_alignment_factor) & \
                 (hgap < np.maximum(h_i, h_j) * p.proximity_factor)
        prox_v = (hdist < np.minimum(w_i, w_j) * p.horizontal_alignment_factor) & \
                 (vgap < np.maximum(w_i, w_j) * p.proximity_factor)
        conn |= np.where(is_h, prox_h, prox_v)

        conn &= ok
        rows, cols = np.nonzero(conn)
        gi = rows + s
        ut = gi < cols
        out_i.append(gi[ut])
        out_j.append(cols[ut])
    return (np.concatenate(out_i) if out_i else np.zeros(0, dtype=np.int64),
            np.concatenate(out_j) if out_j else np.zeros(0, dtype=np.int64))


def connected_components(n: int, edges_i: np.ndarray, edges_j: np.ndarray) -> np.ndarray:
    """Union-find component labels; each node's label is the smallest member
    index of its component (canonical replacement for the reference's DFS
    discovery order, grouping_logic.py:505-532)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, c in zip(edges_i.tolist(), edges_j.tolist()):
        ra, rc = find(a), find(c)
        if ra != rc:
            # Union by smaller index -> root is always the min member.
            if ra < rc:
                parent[rc] = ra
            else:
                parent[ra] = rc
    return np.array([find(x) for x in range(n)], dtype=np.int64)


def high_iou_survivors(boxes: np.ndarray, members: np.ndarray,
                       high_iou_threshold: float) -> np.ndarray:
    """Within-component near-duplicate filter -> surviving member indices.

    Reference (grouping_logic.py:574-599): a member is dropped when some other
    member overlaps it with IoU > thr and has strictly larger area. The
    largest-area member always survives, so survivors are never empty.
    """
    if len(members) <= 1:
        return members
    sub = np.asarray(boxes, dtype=np.float64)[members]
    area = (sub[:, 2] - sub[:, 0]) * (sub[:, 3] - sub[:, 1])
    iou = iou_matrix(sub, sub)
    np.fill_diagonal(iou, 0.0)
    dominated = ((iou > high_iou_threshold) & (area[None, :] > area[:, None])).any(axis=1)
    return members[~dominated]


@dataclass
class GroupedBoxes:
    """Grouping output for one image: one row per merged component."""

    boxes: np.ndarray          # (g,4) int64 envelope [x_min,y_min,x_max,y_max]
    rot: np.ndarray            # (g,) int8 rotation of the first surviving member
    tile_ords: list[np.ndarray]  # per group: sorted unique source tile ordinals
    is_grouped: np.ndarray     # (g,) bool: merged from >1 box
    # smallest input-box index of each group (canonical output-order key)
    group_keys: np.ndarray = None  # type: ignore[assignment]
    # metrics (reference grouping_logic.py:966-989 equivalents)
    n_before: int = 0
    n_suppressed: int = 0
    n_after: int = 0
    n_merges: int = 0


def interaction_components(boxes: np.ndarray, p: ConnectParams) -> np.ndarray:
    """Conservative spatial decomposition for dense images (skew valve).

    Two boxes can interact (suppression needs rectangle overlap; connection
    needs IoU>0 or the neighborhood+gap rules, all bounded by one box
    dimension) only if their rectangles, each expanded by its own
    ``max(w, h) * reach``, intersect. Components of that conservative graph
    are independent grouping subproblems: every suppression pair and every
    connection pair lies within one component, and the greedy suppression
    order restricted to a component equals the global order restricted to
    it — so solving components independently reproduces the global result
    exactly (SURVEY.md §4.2 "exact cross-boundary merge").

    Candidate pairs come from uniform grid binning (bin = p95 expanded
    size), so cost is O(n x local density), not O(n^2).
    """
    n = len(boxes)
    b = np.asarray(boxes, dtype=np.float64)
    reach = max(1.0, p.proximity_factor,
                p.neighborhood_expansion_factor / 2 + 0.5)
    dim = np.maximum(b[:, 2] - b[:, 0], b[:, 3] - b[:, 1])
    e = np.empty_like(b)
    e[:, 0] = b[:, 0] - dim * reach
    e[:, 1] = b[:, 1] - dim * reach
    e[:, 2] = b[:, 2] + dim * reach
    e[:, 3] = b[:, 3] + dim * reach

    cell = max(8.0, float(np.percentile(e[:, 2] - e[:, 0], 95)))
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, c: int) -> None:
        ra, rc = find(a), find(c)
        if ra != rc:
            if ra < rc:
                parent[rc] = ra
            else:
                parent[ra] = rc

    bins: dict[tuple[int, int], list[int]] = {}
    gx0 = np.floor(e[:, 0] / cell).astype(np.int64)
    gy0 = np.floor(e[:, 1] / cell).astype(np.int64)
    gx1 = np.floor(e[:, 2] / cell).astype(np.int64)
    gy1 = np.floor(e[:, 3] / cell).astype(np.int64)
    for i in range(n):
        for bx in range(gx0[i], gx1[i] + 1):
            for by in range(gy0[i], gy1[i] + 1):
                bins.setdefault((bx, by), []).append(i)
    for members in bins.values():
        if len(members) < 2:
            continue
        m = np.array(members)
        sub = e[m]
        # pairwise expanded-rect intersection within the bin
        for k in range(len(m)):
            hit = ((sub[k, 0] < sub[:, 2]) & (sub[:, 0] < sub[k, 2]) &
                   (sub[k, 1] < sub[:, 3]) & (sub[:, 1] < sub[k, 3]))
            for j in np.nonzero(hit)[0]:
                if j > k:
                    union(int(m[k]), int(m[j]))
    return np.array([find(x) for x in range(n)], dtype=np.int64)


def group_boxes_large(boxes: np.ndarray, rot: np.ndarray, tile_ord: np.ndarray,
                      p: ConnectParams,
                      contained_box_threshold: float = 0.9) -> GroupedBoxes:
    """Exact grouping for dense images: decompose via interaction
    components, run the full 5-step algorithm per component, concatenate.
    Output component order: ascending smallest original index (matches the
    canonical order of the direct path)."""
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    n = len(boxes)
    if n == 0:
        return group_boxes(boxes, rot, tile_ord, p, contained_box_threshold)
    labels = interaction_components(boxes, p)
    rot = np.asarray(rot)
    tile_ord = np.asarray(tile_ord)
    order = np.argsort(labels, kind="stable")
    sorted_labels = labels[order]
    starts = np.append(np.unique(sorted_labels, return_index=True)[1],
                       len(sorted_labels))
    parts: list[GroupedBoxes] = []
    keys: list[np.ndarray] = []
    totals = dict(n_before=0, n_suppressed=0, n_after=0, n_merges=0)
    for gi in range(len(starts) - 1):
        members = np.sort(order[starts[gi]:starts[gi + 1]])
        g = group_boxes(boxes[members], rot[members], tile_ord[members], p,
                        contained_box_threshold)
        parts.append(g)
        keys.append(members[g.group_keys])
        totals["n_before"] += g.n_before
        totals["n_suppressed"] += g.n_suppressed
        totals["n_after"] += g.n_after
        totals["n_merges"] += g.n_merges
    all_keys = np.concatenate(keys)
    # Restore the global canonical output order (ascending min member index)
    perm = np.argsort(all_keys, kind="stable")
    tile_lists = [t for g in parts for t in g.tile_ords]
    return GroupedBoxes(
        boxes=np.concatenate([g.boxes for g in parts])[perm],
        rot=np.concatenate([g.rot for g in parts])[perm],
        tile_ords=[tile_lists[i] for i in perm],
        is_grouped=np.concatenate([g.is_grouped for g in parts])[perm],
        group_keys=all_keys[perm],
        **totals)


def group_boxes(boxes: np.ndarray, rot: np.ndarray, tile_ord: np.ndarray,
                p: ConnectParams, contained_box_threshold: float = 0.9) -> GroupedBoxes:
    """The full 5-step grouping for one image's detections.

    ``boxes`` must already be in global image coordinates and canonical order
    (tile ordinal asc, detection index asc). Reference flow:
    grouping_logic.py:653-799.
    """
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    n = len(boxes)
    if n == 0:
        return GroupedBoxes(np.zeros((0, 4), dtype=np.int64), np.zeros(0, dtype=np.int8),
                            [], np.zeros(0, dtype=bool),
                            group_keys=np.zeros(0, dtype=np.int64))

    keep = suppress_contained(boxes, contained_box_threshold)
    kept_idx = np.nonzero(keep)[0]
    fb = boxes[kept_idx]
    f_rot = np.asarray(rot)[kept_idx]
    f_ord = np.asarray(tile_ord)[kept_idx]

    ei, ej = connection_edges(fb, p)
    labels = connected_components(len(fb), ei, ej)

    order = np.argsort(labels, kind="stable")
    sorted_labels = labels[order]
    uniq, starts = np.unique(sorted_labels, return_index=True)

    g_boxes = np.empty((len(uniq), 4), dtype=np.int64)
    g_rot = np.empty(len(uniq), dtype=np.int8)
    g_tiles: list[np.ndarray] = []
    g_isg = np.empty(len(uniq), dtype=bool)
    n_merges = 0
    bounds = np.append(starts, len(sorted_labels))
    for gi in range(len(uniq)):
        members = order[bounds[gi]:bounds[gi + 1]]
        members = np.sort(members)
        surv = high_iou_survivors(fb, members, p.high_iou_threshold)
        sb = fb[surv]
        g_boxes[gi] = [sb[:, 0].min(), sb[:, 1].min(), sb[:, 2].max(), sb[:, 3].max()]
        g_rot[gi] = f_rot[surv[0]]
        tiles = np.unique(f_ord[surv])
        g_tiles.append(tiles)
        g_isg[gi] = len(surv) > 1
        n_merges += max(0, len(surv) - 1)

    # Map each group's key back to its smallest ORIGINAL input index (the
    # component label is an index into the suppression-filtered subset).
    group_keys = kept_idx[uniq]
    return GroupedBoxes(g_boxes, g_rot, g_tiles, g_isg, group_keys=group_keys,
                        n_before=n, n_suppressed=int(n - keep.sum()),
                        n_after=len(uniq), n_merges=n_merges)

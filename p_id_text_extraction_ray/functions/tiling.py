"""Sliding-window tiling math (SAHI-equivalent, dependency-free).

Reproduces the tile placement the reference obtains from SAHI's
``slice_image`` (``/root/reference/src/data_loader/sahi_slicer.py:79-89``
with tile_size=720, overlap_ratio=0.1 from ``configs/base.yaml:12-16``):
full-size windows marching with stride ``tile - int(overlap*tile)``, the last
window of each row/column shifted inward so it ends exactly at the image
edge. Grid positions follow ``sahi_slicer.py:123-138``:
``row = y0 // int(tile_h*(1-overlap))`` (same for col).

Deviation (documented): the reference *raises* for images smaller than the
tile size (``sahi_slicer.py:73-76``) and its driver then skips that image
(``run_pipeline.py:107-108``). This engine instead emits one whole-image
tile — small diagrams are still extracted.
"""

from __future__ import annotations

import numpy as np


def _starts(length: int, tile: int, overlap_px: int) -> list[int]:
    """1-D window start offsets; the final window is clamped to end at
    ``length`` (SAHI's shifted last tile)."""
    if length <= tile:
        return [0]
    starts: list[int] = []
    pos = 0
    while True:
        if pos + tile >= length:
            starts.append(length - tile)
            break
        starts.append(pos)
        pos = pos + tile - overlap_px
    return starts


def tile_windows(width: int, height: int, tile_size: int,
                 overlap_ratio: float) -> np.ndarray:
    """All tile windows for one image -> (n,4) int64 [x1,y1,x2,y2].

    Ordinal order is row-major (y outer, x inner), matching SAHI's iteration
    order and therefore the reference's ``_T{idx:04d}`` numbering
    (``sahi_slicer.py:100-106``).
    """
    overlap_px = int(overlap_ratio * tile_size)
    tw = min(tile_size, width)
    th = min(tile_size, height)
    xs = _starts(width, tw, int(overlap_ratio * tw))
    ys = _starts(height, th, int(overlap_ratio * th))
    del overlap_px
    out = np.empty((len(ys) * len(xs), 4), dtype=np.int64)
    k = 0
    for y in ys:
        for x in xs:
            out[k] = (x, y, x + tw, y + th)
            k += 1
    return out


def grid_positions(windows: np.ndarray, tile_size: int,
                   overlap_ratio: float) -> np.ndarray:
    """(row, col) per window per the reference derivation
    (``sahi_slicer.py:123-138``) -> (n,2) int64."""
    w = windows[:, 2] - windows[:, 0]
    h = windows[:, 3] - windows[:, 1]
    eff_w = np.maximum(1, (w * (1 - overlap_ratio)).astype(np.int64))
    eff_h = np.maximum(1, (h * (1 - overlap_ratio)).astype(np.int64))
    return np.stack([windows[:, 1] // eff_h, windows[:, 0] // eff_w], axis=1)

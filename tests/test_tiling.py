"""Tiling math vs the reference slicer's placement (sahi_slicer.py:79-138)."""

import numpy as np
import pytest

from p_id_text_extraction_ray.config import TilingConfig
from p_id_text_extraction_ray.functions.tiling import grid_positions, tile_windows


def test_windows_with_shifted_last_tile():
    w = tile_windows(1368, 1000, 720, 0.1)
    assert w.tolist() == [[0, 0, 720, 720], [648, 0, 1368, 720],
                          [0, 280, 720, 1000], [648, 280, 1368, 1000]]


def test_windows_exact_fit():
    w = tile_windows(720, 720, 720, 0.1)
    assert w.tolist() == [[0, 0, 720, 720]]


def test_small_image_single_whole_tile():
    # documented deviation: reference raises (sahi_slicer.py:73-76), we emit
    # one whole-image window
    w = tile_windows(600, 400, 720, 0.1)
    assert w.tolist() == [[0, 0, 600, 400]]


def test_windows_cover_image_and_overlap():
    for width, height in [(2200, 1600), (2920, 2200), (721, 721), (1296, 648)]:
        w = tile_windows(width, height, 720, 0.1)
        assert w[:, 0].min() == 0 and w[:, 1].min() == 0
        assert w[:, 2].max() == width and w[:, 3].max() == height
        tw = np.minimum(720, width)
        th = np.minimum(720, height)
        assert ((w[:, 2] - w[:, 0]) == tw).all()
        assert ((w[:, 3] - w[:, 1]) == th).all()
        # stride 648 -> consecutive windows overlap by >= 72 px
        xs = np.unique(w[:, 0])
        if len(xs) > 1:
            assert (np.diff(xs) <= 648).all()


def test_grid_positions_reference_formula():
    w = tile_windows(1368, 1000, 720, 0.1)
    gp = grid_positions(w, 720, 0.1)
    # row = y0 // int(720*0.9)=648, col = x0 // 648 (sahi_slicer.py:123-138)
    assert gp.tolist() == [[0, 0], [0, 1], [0, 0], [0, 1]]


def test_tiling_config_validation():
    # sahi_slicer.py:47-51
    with pytest.raises(ValueError):
        TilingConfig(tile_size=32)
    with pytest.raises(ValueError):
        TilingConfig(overlap_ratio=1.5)
    with pytest.raises(ValueError):
        TilingConfig(overlap_ratio=0.0)

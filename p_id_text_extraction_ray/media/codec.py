"""Deterministic raster media codec + text renderer for the CV path.

The sandbox has no PIL/OpenCV, so real PNG decode is gated (see
``decode_image``); media blobs use a trivial container — magic, width,
height, zlib-compressed uint8 grayscale pixels — that numpy decodes
zero-copy-ish. The Ray-side plumbing (binary media column, decode stage,
tiling, crops) is identical to what a PNG/JPEG codec would need; only this
codec function would swap.

Text rendering is *value-coded*: background pixels are 255 and each
character of a rendered string fills a CELL_W x CELL_H block whose pixel
value is the character's ASCII code. A detector sees non-background
rectangles exactly like CRAFT sees text regions; the stub recognizer reads
the block values back — so detection, tiling, cross-tile grouping, cropping,
rotation handling and recognition all operate on real pixel data with a
deterministic ground truth (FIXTURES.md §2-3).

Vertical (rot=90) strings are rendered as the 90°-counter-clockwise rotation
of the horizontal strip, so rotating the crop clockwise (the reference's
fallback behavior, ``text_recognition.py:53-54,119-121``) restores the
readable strip.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"PIDR1"
BACKGROUND = 255
CELL_W = 8    # px per character cell (horizontal strip)
CELL_H = 14   # strip height


def encode_image(arr: np.ndarray) -> bytes:
    """uint8 grayscale (h, w) -> container bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape
    return MAGIC + struct.pack("<II", w, h) + zlib.compress(arr.tobytes(), level=1)


def peek_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the 13-byte container header — the cheap
    metadata read the tile planner uses to split giant images into
    tile-range work units without decoding pixels."""
    if data[:5] != MAGIC:
        raise NotImplementedError("non-PIDR media")
    w, h = struct.unpack("<II", data[5:13])
    return w, h


def decode_image(data: bytes) -> np.ndarray:
    """Container bytes -> uint8 grayscale (h, w).

    A production build would branch on the magic to PNG/JPEG decoders here;
    those libraries are absent in this container, so any other magic raises.
    """
    if data[:5] != MAGIC:
        raise NotImplementedError(
            "non-PIDR media (e.g. PNG/JPEG) requires an image decoder not "
            "available in this environment")
    w, h = struct.unpack("<II", data[5:13])
    pixels = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    return pixels.reshape(h, w)


def string_box_size(text: str, rot: int) -> tuple[int, int]:
    """(w, h) in px of a rendered string. Horizontal: (len*CELL_W, CELL_H);
    vertical is the rotation of that strip."""
    w, h = CELL_W * len(text), CELL_H
    return (w, h) if rot == 0 else (h, w)


def _strip(text: str) -> np.ndarray:
    """Horizontal value-coded strip (CELL_H, len*CELL_W)."""
    cells = np.array([ord(c) for c in text], dtype=np.uint8)
    if (cells >= BACKGROUND).any() or (cells < 33).any():
        raise ValueError(f"unrenderable characters in {text!r}")
    return np.repeat(cells, CELL_W)[None, :].repeat(CELL_H, axis=0)


def render_string(canvas: np.ndarray, text: str, x: int, y: int, rot: int) -> None:
    """Draw a value-coded string onto the canvas at top-left (x, y)."""
    strip = _strip(text)
    if rot == 90:
        strip = np.rot90(strip, k=1)  # CCW; clockwise crop rotation restores it
    h, w = strip.shape
    if y + h > canvas.shape[0] or x + w > canvas.shape[1] or x < 0 or y < 0:
        raise ValueError("string does not fit on canvas")
    canvas[y:y + h, x:x + w] = strip


def decode_text_from_crop(crop: np.ndarray, rot: int) -> str:
    """Read a value-coded string back from a (padded) crop.

    Mirrors the recognizer's contract: locate the non-background region,
    rotate clockwise when the text is vertical, then read one character per
    CELL_W column at the cell centers. Returns '' when the crop holds no
    non-background pixels or is malformed — the caller's fallback/drop
    semantics then apply (``text_recognition.py:174``).
    """
    if rot == 90:
        crop = np.rot90(crop, k=-1)
    fg = crop != BACKGROUND
    if not fg.any():
        return ""
    rows = np.nonzero(fg.any(axis=1))[0]
    cols = np.nonzero(fg.any(axis=0))[0]
    region = crop[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1]
    h, w = region.shape
    n_chars = max(1, round(w / CELL_W))
    mid_row = h // 2
    out = []
    for k in range(n_chars):
        cx = min(w - 1, int((k + 0.5) * w / n_chars))
        v = int(region[mid_row, cx])
        if v == BACKGROUND or v < 33:
            return ""
        out.append(chr(v))
    return "".join(out)

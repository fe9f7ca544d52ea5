"""Deterministic raster media codec + text renderer for the CV path.

Two container formats are supported, branched on magic bytes:

* **PNG** — a pure numpy/zlib decoder (no PIL/OpenCV needed): 8-bit
  non-interlaced grayscale / RGB / gray+alpha / RGBA / palette, all five
  PNG scanline filters. Color images are collapsed to BT.601 luma
  grayscale, matching the reference's grayscale detection input
  (``sahi_slicer.py:13-15`` loads via PIL; CRAFT detection is luminance-
  based). ``encode_png`` exists so tests can ingest real PNG corpora.
* **PIDR** — the trivial test container (magic, width, height,
  zlib-compressed uint8 grayscale) used by the deterministic fixtures.

* **JPEG** — a pure numpy baseline (SOF0/SOF1) decoder
  (``media/jpeg.py``): Huffman entropy decode, batched dequant + IDCT of
  the luminance plane (chroma is entropy-skipped — detection is
  luminance-based, matching the reference's grayscale input). Covers the
  reference's ``.jpg`` ingestion (``run_pipeline.py:75-77``); progressive
  (SOF2) raises.

* **TIFF** — a pure numpy strip-TIFF decoder (``media/tiff.py``):
  none/LZW/PackBits compression, horizontal-differencing predictor,
  gray/RGB/RGBA collapsed to luma. Covers the reference's ``.tiff``
  ingestion (``sahi_slicer.py:240``) and its rasterizer's LZW output
  (``PDF_to_image.py:73``); tiled/16-bit/palette TIFF raises.

The Ray-side plumbing (binary media column, decode stage, tiling,
crops) is codec-agnostic.

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
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
TIFF_MAGICS = (b"II*\x00", b"MM\x00*")
BACKGROUND = 255
CELL_W = 8    # px per character cell (horizontal strip)
CELL_H = 14   # strip height

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}   # color_type -> samples/px


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos:pos + 4], "big")
        ctype = data[pos + 4:pos + 8]
        yield ctype, data[pos + 8:pos + 8 + length]
        if ctype == b"IEND":
            return
        pos += 12 + length


def _png_header(data: bytes) -> tuple[int, int, int, int, int]:
    """(w, h, bit_depth, color_type, interlace) from IHDR."""
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
            bit_depth, color_type, _comp, _filt, interlace = body[8:13]
            return w, h, bit_depth, color_type, interlace
    raise ValueError("PNG missing IHDR")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 grayscale (h, w); see module doc for coverage."""
    w, h, bit_depth, color_type, interlace = _png_header(data)
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} unsupported (8-bit non-interlaced only)")
    palette = None
    idat = []
    for ctype, body in _png_chunks(data):
        if ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    rows = raw.reshape(h, 1 + stride)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:]
        if ftype == 0:                               # None
            line = cur.copy()
        elif ftype == 1:                             # Sub
            line = np.cumsum(cur.reshape(w, c).astype(np.uint32), axis=0) \
                     .astype(np.uint8).reshape(stride)
        elif ftype == 2:                             # Up
            line = cur + prev                        # uint8 wraps mod 256
        elif ftype == 3:                             # Average
            line = np.empty(stride, np.uint8)
            for i in range(stride):
                left = int(line[i - c]) if i >= c else 0
                line[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:                             # Paeth
            line = np.empty(stride, np.uint8)
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                line[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = line
        prev = line
    img = out.reshape(h, w, c)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]                  # -> (h, w, 3)
        c = 3
    if c == 1:
        return img[:, :, 0].copy()
    if c == 2:                                       # gray + alpha
        return img[:, :, 0].copy()
    rgb = img[:, :, :3].astype(np.float64)           # RGB / RGBA -> BT.601 luma
    return np.rint(rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587
                   + rgb[:, :, 2] * 0.114).astype(np.uint8)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def encode_png(arr: np.ndarray, row_filters: list[int] | None = None) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> PNG bytes.

    ``row_filters`` optionally forces a PNG filter type per scanline
    (default all 0) — used by tests to exercise every decode path.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        color_type, c = 0, 1
        flat = arr.reshape(h, w)
    else:
        h, w, c = arr.shape
        assert c == 3, "encode_png supports grayscale or RGB"
        color_type = 2
        flat = arr.reshape(h, w * c)
    stride = w * c
    filters = row_filters or [0] * h
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        line = flat[y].reshape(stride).astype(np.int32)
        f = filters[y]
        left = np.concatenate([np.zeros(c, np.int32), line[:-c]]) if stride > c \
            else np.zeros(stride, np.int32)
        up_left = np.concatenate([np.zeros(c, np.int32), prev[:-c]]) if stride > c \
            else np.zeros(stride, np.int32)
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - up_left
            pa, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - up_left)
            pred = np.where((pa <= pb) & (pa <= pc_), left,
                            np.where(pb <= pc_, prev, up_left))
            enc = line - pred
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), level=6))
            + _png_chunk(b"IEND", b""))


def encode_image(arr: np.ndarray) -> bytes:
    """uint8 grayscale (h, w) -> container bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape
    return MAGIC + struct.pack("<II", w, h) + zlib.compress(arr.tobytes(), level=1)


def peek_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the container header only — the cheap metadata
    read the tile planner uses to split giant images into tile-range work
    units without decoding pixels. PIDR: 13 bytes; PNG: IHDR (first ~33
    bytes), so a 64-byte ranged GET covers both; JPEG: SOF lives after
    the APP/DQT/DHT headers (a few KB ranged GET), still no entropy
    decode."""
    if data[:5] == MAGIC:
        w, h = struct.unpack("<II", data[5:13])
        return w, h
    if data[:8] == PNG_MAGIC:
        w, h, _bd, _ct, _il = _png_header(data)
        return w, h
    if data[:3] == JPEG_MAGIC:
        from .jpeg import peek_jpeg_dimensions
        return peek_jpeg_dimensions(data)
    if data[:4] in TIFF_MAGICS:
        from .tiff import peek_tiff_dimensions
        return peek_tiff_dimensions(data)
    raise NotImplementedError(
        "unsupported media container (PIDR/PNG/JPEG/TIFF only)")


def decode_image(data: bytes) -> np.ndarray:
    """Container bytes -> uint8 grayscale (h, w). Branches on magic:
    PIDR test container, real PNG (``decode_png``), or baseline JPEG
    (``jpeg.decode_jpeg``, luminance plane); TIFF has no pure-numpy
    decoder, so it raises."""
    if data[:5] == MAGIC:
        w, h = struct.unpack("<II", data[5:13])
        pixels = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
        return pixels.reshape(h, w)
    if data[:8] == PNG_MAGIC:
        return decode_png(data)
    if data[:3] == JPEG_MAGIC:
        from .jpeg import decode_jpeg
        return decode_jpeg(data)
    if data[:4] in TIFF_MAGICS:
        from .tiff import decode_tiff
        return decode_tiff(data)
    raise NotImplementedError(
        "unsupported media container (PIDR, PNG, baseline JPEG and "
        "strip TIFF supported)")


def decode_image_rgb(data: bytes) -> np.ndarray:
    """Container bytes -> uint8 RGB (h, w, 3) — the color-tile path a
    color-dependent detector consumes (the reference's EasyOCR takes
    color via PIL). JPEG decodes its chroma planes
    (``jpeg.decode_jpeg(rgb=True)``); grayscale-only containers
    (PIDR, PNG, TIFF here) replicate their plane."""
    if data[:3] == JPEG_MAGIC:
        from .jpeg import decode_jpeg
        return decode_jpeg(data, rgb=True)
    g = decode_image(data)
    if g.ndim == 3:
        return g
    return np.stack([g, g, g], axis=-1)


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

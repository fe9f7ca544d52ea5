"""Pure-numpy baseline TIFF codec (TIFF 6.0 grayscale/RGB strips).

Closes the reference's ``.tiff`` ingestion path: the reference glob-loads
``*.tiff`` sheets (``sahi_slicer.py:240``) and its PDF rasterizer writes
LZW-compressed TIFF (``PDF_to_image.py:73`` ``compression='lzw'``), so
LZW with the horizontal-differencing predictor is the codec that matters.

Supported: II/MM byte order, 8-bit samples, 1/3/4 samples per pixel
(alpha dropped, RGB collapsed to BT.601 luma like the PNG branch),
PhotometricInterpretation 0/1/2, strip layout, Compression 1 (none),
5 (LZW, with Predictor 2 horizontal differencing) and 32773 (PackBits),
PlanarConfiguration 1. Rejected with a clear error: tiled layout,
16-bit samples, palette color, planar configuration 2, other
compressions (JPEG-in-TIFF, Deflate).

LZW decode is a Python loop over variable-width codes (inherently
serial, like the JPEG Huffman scan); strip assembly, predictor undo and
the luma collapse are vectorized. The encoder (uncompressed or LZW)
exists for tests and fixture tooling; round trips are corroborated by an
external CPython-test-suite TIFF file in ``tests/test_tiff.py``.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}


class TiffError(ValueError):
    """Malformed or unsupported TIFF stream."""


def _read_ifd(data: bytes, bo: str):
    """First IFD -> {tag: list-of-values}."""
    off = struct.unpack(bo + "I", data[4:8])[0]
    n = struct.unpack(bo + "H", data[off:off + 2])[0]
    tags = {}
    for i in range(n):
        e = data[off + 2 + 12 * i:off + 14 + 12 * i]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        size = _TYPE_SIZE.get(typ, 1) * cnt
        raw = e[8:12] if size <= 4 else data[
            struct.unpack(bo + "I", e[8:12])[0]:][:size]
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", raw[:2 * cnt]))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", raw[:4 * cnt]))
        elif typ == 1:
            vals = list(raw[:cnt])
        else:
            continue                    # rationals/ASCII: not needed
        tags[tag] = vals
    return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(src)
    while i < n and len(out) < expected:
        c = src[i]
        i += 1
        if c < 128:
            out += src[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += src[i:i + 1] * (257 - c)
            i += 1
    return bytes(out)


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (MSB-first codes, 9->12 bit, early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(src)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | src[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (bitbuf >> nbits) & ((1 << width) - 1)
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError("corrupt LZW stream")
        out += entry
        prev = entry
        # TIFF "early change": bump width when the NEXT code would not fit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> uint8 grayscale (h, w) via the same luma collapse
    as the PNG branch."""
    if data[:4] not in TIFF_MAGICS:
        raise TiffError("not a TIFF (bad magic)")
    bo = "<" if data[:2] == b"II" else ">"
    t = _read_ifd(data, bo)
    if 322 in t or 323 in t:
        raise TiffError("tiled TIFF unsupported (strip layout only)")
    w = t.get(256, [0])[0]
    h = t.get(257, [0])[0]
    if not w or not h:
        raise TiffError("missing image dimensions")
    spp = t.get(277, [1])[0]
    bps = t.get(258, [8] * spp)
    if any(b != 8 for b in bps):
        raise TiffError("only 8-bit samples supported")
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    if photo == 3:
        raise TiffError("palette TIFF unsupported")
    if t.get(284, [1])[0] != 1:
        raise TiffError("planar configuration 2 unsupported")
    predictor = t.get(317, [1])[0]
    offsets = t.get(273)
    counts = t.get(279)
    if not offsets or not counts:
        raise TiffError("missing strip offsets/byte counts")
    rows_per_strip = t.get(278, [h])[0]

    rowbytes = w * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        expected = nrows * rowbytes
        chunk = data[off:off + cnt]
        if comp == 1:
            raw += chunk[:expected]
        elif comp == 5:
            raw += _lzw_decode(chunk, expected)
        elif comp == 32773:
            raw += _unpackbits(chunk, expected)
        else:
            raise TiffError(f"compression {comp} unsupported "
                            "(none/LZW/PackBits only)")
    if len(raw) < h * rowbytes:
        raise TiffError("truncated TIFF pixel data")
    img = np.frombuffer(bytes(raw[:h * rowbytes]),
                        dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        img = np.cumsum(img.astype(np.uint32), axis=1).astype(np.uint8) \
            .reshape(h, w, spp)
    elif predictor != 1:
        raise TiffError(f"predictor {predictor} unsupported")
    if spp >= 3:
        rgb = img[..., :3].astype(np.float64)
        gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        img = np.clip(np.round(gray), 0, 255).astype(np.uint8)
    else:
        img = img[..., 0]
    if photo == 0:                       # white-is-zero
        img = (255 - img.astype(np.int16)).astype(np.uint8)
    return img


def peek_tiff_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the IFD only."""
    if data[:4] not in TIFF_MAGICS:
        raise TiffError("not a TIFF (bad magic)")
    bo = "<" if data[:2] == b"II" else ">"
    t = _read_ifd(data, bo)
    w = t.get(256, [0])[0]
    h = t.get(257, [0])[0]
    if not w or not h:
        raise TiffError("missing image dimensions")
    return w, h


# ---------------------------------------------------------------- encode

def _lzw_encode(src: bytes) -> bytes:
    """TIFF-variant LZW encoder (MSB-first, early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(CLEAR, width)
    run = b""
    for byte in src:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = nxt
        nxt += 1
        # early change: width grows when the next emitted code could be
        # the first code of the wider range
        if nxt == (1 << width):
            width += 1
        if nxt == 4095:                 # table full: reset
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(arr: np.ndarray, compression: str = "lzw",
                predictor: bool = True) -> bytes:
    """uint8 grayscale (h, w) -> single-strip TIFF bytes (little-endian).

    ``compression``: ``"none"`` or ``"lzw"`` (the reference's rasterizer
    output format, ``PDF_to_image.py:73``). ``predictor`` applies
    horizontal differencing before LZW, as libtiff/PIL do for photos.
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("encode_tiff expects uint8 grayscale (h, w)")
    h, w = arr.shape
    use_pred = predictor and compression == "lzw"
    pix = arr
    if use_pred:
        d = arr.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        pix = (d & 0xFF).astype(np.uint8)
    payload = pix.tobytes()
    comp_id = 1
    if compression == "lzw":
        payload = _lzw_encode(payload)
        comp_id = 5
    elif compression != "none":
        raise ValueError("compression must be 'none' or 'lzw'")

    entries = [
        (256, 3, 1, w),            # ImageWidth
        (257, 3, 1, h),            # ImageLength
        (258, 3, 1, 8),            # BitsPerSample
        (259, 3, 1, comp_id),      # Compression
        (262, 3, 1, 1),            # Photometric: black-is-zero
        (273, 4, 1, 0),            # StripOffsets (patched below)
        (277, 3, 1, 1),            # SamplesPerPixel
        (278, 3, 1, h),            # RowsPerStrip
        (279, 4, 1, len(payload)),  # StripByteCounts
        (284, 3, 1, 1),            # PlanarConfiguration
    ]
    if use_pred:
        entries.append((317, 3, 1, 2))
    entries.sort()
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd = struct.pack("<H", len(entries))
    strip_off = 8 + 2 + 12 * len(entries) + 4
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = strip_off
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)    # no next IFD
    return header + ifd + payload

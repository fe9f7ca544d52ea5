"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Closes the last real-corpus ingestion gap the reference covers: the
reference pipeline ingests ``.jpg`` sheets via PIL
(``run_pipeline.py:75-77``, ``sahi_slicer.py:13-15``) and detects on
luminance, so the decoder here returns the Y plane directly for YCbCr
images (no chroma IDCT needed — chroma blocks are entropy-decoded only
to keep the bitstream in sync, which also makes decoding ~3x cheaper
for 4:2:0 scans).

Supported: SOF0/SOF1 (baseline + extended sequential Huffman), 1- or
3-component scans, arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 /
...), restart intervals (DRI / RSTn), 0xFF00 byte stuffing, multiple
DQT/DHT segments. Rejected with a clear error: progressive (SOF2),
arithmetic coding (SOF9+), 12-bit precision, DNL.

Decoding is vectorized where it matters: the Huffman scan is a Python
loop (inherently serial bit-level state), but dequantize + dezigzag +
IDCT run as one batched einsum over ALL blocks of the plane at once,
and block->plane placement is a single strided reshape/transpose.

The encoder exists for tests and fixture tooling: grayscale or YCbCr
4:4:4 / 4:2:0 baseline with the T.81 Annex K example quantization and
Huffman tables, scaled by a libjpeg-style quality factor. Encoder and
decoder are independent at the math level only (shared constants), so
round-trip tests are corroborated by an external libjpeg-produced file
parse and by direct cosine-sum IDCT checks in ``tests/test_jpeg.py``.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order: index k of the scan -> (row, col) of the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# T.81 Annex K.1 example quantization tables (luminance, chrominance)
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT-II basis: C[k, n] = s(k) * cos((2n+1) k pi / 16).
# IDCT(block) = C.T @ block @ C ; DCT(block) = C @ block @ C.T
_N = np.arange(8)
_DCT_C = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) * 0.5
_DCT_C[0, :] *= 1 / np.sqrt(2)


class JpegError(ValueError):
    """Malformed or unsupported JPEG stream."""


# ---------------------------------------------------------------- decode

def _build_decode_table(bits, huffval):
    """(bits, huffval) -> dict mapping (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any marker (caller handles RSTn)."""

    __slots__ = ("data", "pos", "bitbuf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: T.81 pads the final byte with 1-bits; feed
                # 1-bits without consuming so the caller sees the marker
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        return v

    def decode_huffman(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code in entropy stream")

    def align_restart(self) -> None:
        """Drop partial bits and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise JpegError("expected restart marker")
        self.pos = p + 2


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _parse_dqt(body: bytes, qtables: dict) -> None:
    i = 0
    while i < len(body):
        prec, tid = body[i] >> 4, body[i] & 15
        if prec != 0:
            raise JpegError("16-bit quantization tables unsupported")
        qtables[tid] = np.frombuffer(
            body[i + 1:i + 65], dtype=np.uint8).astype(np.int32)
        i += 65


def _parse_dht(body: bytes, htables: dict) -> None:
    i = 0
    while i < len(body):
        cls, tid = body[i] >> 4, body[i] & 15
        bits = list(body[i + 1:i + 17])
        cnt = sum(bits)
        huffval = list(body[i + 17:i + 17 + cnt])
        htables[(cls, tid)] = _build_decode_table(bits, huffval)
        i += 17 + cnt


def _parse_sos(body: bytes, frame: dict):
    ns = body[0]
    scan = []
    for k in range(ns):
        cs = body[1 + 2 * k]
        td_ta = body[2 + 2 * k]
        comp = next(c for c in frame["comps"] if c["id"] == cs)
        scan.append((comp, td_ta >> 4, td_ta & 15))
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    ah_al = body[3 + 2 * ns]
    return scan, ss, se, ah_al >> 4, ah_al & 15


def decode_jpeg(data: bytes, rgb: bool = False) -> np.ndarray:
    """JPEG bytes -> uint8 luminance plane (h, w), or (h, w, 3) RGB
    when ``rgb=True``. Baseline/extended sequential (SOF0/SOF1) and
    progressive (SOF2) Huffman streams.

    Default (luminance): for 3-component YCbCr the Y plane IS the
    luminance the detection path wants (the reference detects on
    PIL-decoded grayscale, ``sahi_slicer.py:13-15``); in sequential
    scans chroma blocks are entropy-decoded to stay bit-synced but
    never dequantized/IDCT'd, and in progressive streams chroma-only
    AC scans are skipped to the next marker without any decoding.

    ``rgb=True`` (the color-tile gap vs the reference's PIL
    ingestion): chroma coefficients are kept, dequantized and IDCT'd
    like luma, upsampled to full resolution by sample replication,
    and converted BT.601 full-range YCbCr -> RGB (JFIF). A grayscale
    stream returns its plane replicated to 3 channels.
    """
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:                                   # DQT
            _parse_dqt(body, qtables)
        elif marker == 0xC4:                                 # DHT
            _parse_dht(body, htables)
        elif marker in (0xC0, 0xC1, 0xC2):                   # SOF0/1/2
            prec = body[0]
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for k in range(nc):
                cid = body[6 + 3 * k]
                hv = body[7 + 3 * k]
                tq = body[8 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise JpegError(f"unsupported SOF marker 0x{marker:02X}")
        elif marker == 0xDD:                                 # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:                                 # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            if frame["progressive"]:
                return _decode_progressive(data, pos, frame, qtables,
                                           htables, restart_interval,
                                           rgb=rgb)
            scan, _ss, _se, _ah, _al = _parse_sos(body, frame)
            return _decode_scan(data, pos + 2 + seglen, frame, scan,
                                qtables, htables, restart_interval,
                                rgb=rgb)
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise JpegError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtables, htables,
                 restart_interval, rgb: bool = False):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    reader = _BitReader(data, pos)

    # luminance = first scan component (grayscale: the only one)
    luma = scan[0][0]
    if len(scan) == 1:
        if rgb and len(frame["comps"]) > 1:
            raise JpegError(
                "rgb decode of non-interleaved sequential color "
                "unsupported (interleaved baseline and progressive are)")
        # single-component scan: NON-interleaved per T.81 A.2 — the MCU
        # is ONE data unit and the grid is the component's own block
        # grid ceil(comp_dim/8), NOT the hmax/vmax-aligned MCU grid.
        # (Covers grayscale frames with any declared sampling factor,
        # and the first scan — the Y plane — of non-interleaved color.)
        comp_w = -(-w * luma["h"] // hmax)
        comp_h = -(-h * luma["v"] // vmax)
        mcux = -(-comp_w // 8)
        mcuy = -(-comp_h // 8)
        geo = {id(luma): (1, 1, mcux)}       # (ch, cv, blocks-per-row)
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        geo = {id(c): (c["h"], c["v"], mcux * c["h"])
               for c, _, _ in scan}
    # entropy-decode into zig-zag coefficient rows, per kept component
    coefs = {}
    for c, _, _ in scan:
        if rgb or c is luma:
            ch, cv, bw_c = geo[id(c)]
            coefs[id(c)] = np.zeros((mcuy * cv * bw_c, 64), np.int32)

    pred = {id(c): 0 for c, _, _ in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_restart()
                for c, _, _ in scan:
                    pred[id(c)] = 0
            mcu_count += 1
            for c, td, ta in scan:
                dc_tbl = htables[(0, td)]
                ac_tbl = htables[(1, ta)]
                ch, cv, bw_c = geo[id(c)]
                coef = coefs.get(id(c))
                for by in range(cv):
                    for bx in range(ch):
                        t = reader.decode_huffman(dc_tbl)
                        diff = _extend(reader.receive(t), t) if t else 0
                        pred[id(c)] += diff
                        if coef is not None:
                            row = (my * cv + by) * bw_c + (mx * ch + bx)
                            coef[row, 0] = pred[id(c)]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huffman(ac_tbl)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16       # ZRL
                                    continue
                                break             # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run past block end")
                            v = _extend(reader.receive(s), s)
                            if coef is not None:
                                coef[row, k] = v
                            k += 1

    if not rgb:
        ch, cv, bw_c = geo[id(luma)]
        return _finish_plane(coefs[id(luma)], qtables[luma["tq"]],
                             bw_c, mcuy * cv, w, h)
    return _finish_rgb(frame, coefs, qtables, mcuy, hmax, vmax,
                       single=len(scan) == 1, mcux=mcux)


def _finish_plane(lcoef: np.ndarray, q: np.ndarray, bw: int, bh: int,
                  w: int, h: int) -> np.ndarray:
    """(nblocks, 64) zig-zag luma coefficients -> uint8 plane: batched
    dequantize + dezigzag + IDCT over every block at once."""
    blocks = (lcoef * q[None, :])[:, UNZIGZAG].reshape(-1, 8, 8)
    pix = np.einsum("ki,nkl,lj->nij", _DCT_C, blocks.astype(np.float64),
                    _DCT_C, optimize=True) + 128.0
    plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
             .reshape(bh * 8, bw * 8))
    return np.clip(np.round(plane), 0, 255).astype(np.uint8)[:h, :w]


def _finish_rgb(frame, coefs, qtables, mcuy, hmax, vmax,
                single: bool = False, mcux: int = 0) -> np.ndarray:
    """Per-component dequant+IDCT, chroma upsample by sample
    replication, BT.601 full-range YCbCr -> RGB (JFIF convention,
    inverse of the encoder's forward matrix)."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    planes = []
    for c in comps:
        if single:
            bw_c, bh_c = mcux, mcuy
        else:
            bw_c, bh_c = -(-w // (8 * hmax)) * c["h"], mcuy * c["v"]
        cw = -(-w * c["h"] // hmax)          # component pixel dims
        ch = -(-h * c["v"] // vmax)
        plane = _finish_plane(coefs[id(c)], qtables[c["tq"]],
                              bw_c, bh_c, cw, ch)
        if (cw, ch) != (w, h):
            fy, fx = vmax // c["v"], hmax // c["h"]
            if fy * c["v"] == vmax and fx * c["h"] == hmax:
                plane = np.repeat(np.repeat(plane, fy, 0), fx, 1)
            else:                            # non-integer ratio: index map
                yi = (np.arange(h) * ch // h).clip(0, ch - 1)
                xi = (np.arange(w) * cw // w).clip(0, cw - 1)
                plane = plane[yi][:, xi]
            plane = plane[:h, :w]
        planes.append(plane.astype(np.float64))
    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(planes) != 3:
        raise JpegError(f"rgb decode needs 1 or 3 components, "
                        f"got {len(planes)}")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    out = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _skip_entropy(data: bytes, pos: int) -> int:
    """Advance past entropy-coded bytes (incl. stuffing and RSTn) to the
    next true marker."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00 \
                and not (0xD0 <= data[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return n


def _decode_progressive(data, pos, frame, qtables, htables,
                        restart_interval, rgb: bool = False):
    """Progressive (SOF2) decode — luminance only by default, all
    components when ``rgb=True``.

    T.81 G.2 semantics: DC scans (possibly interleaved) carry
    successive-approximation DC bits; AC scans are always single-
    component spectral bands. In luminance mode, scans that do not
    involve the luma component are skipped to the next marker without
    entropy decoding — their bits cannot affect luma coefficients.
    ``pos`` points AT the first SOS marker; this loop owns all markers
    until EOI.
    """
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    luma = comps[0]
    single = len(comps) == 1
    # per-component geometry: padded interleaved block grid (bw, bh)
    # and the component's own non-interleaved grid (cw, chh) — the
    # latter a prefix of the former
    if single:
        # single-component frame: the declared sampling factor does not
        # change the pixel-to-block mapping (same rule as _decode_scan)
        mcux, mcuy = -(-w // 8), -(-h // 8)
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
    st = {}                                  # id(c) -> mutable geo/coef
    for c in comps:
        if single:
            ch_, cv_ = 1, 1
            bw_c, bh_c = mcux, mcuy
            cw_c, chh_c = mcux, mcuy
        else:
            ch_, cv_ = c["h"], c["v"]
            bw_c, bh_c = mcux * ch_, mcuy * cv_
            cw_c = -((-(-(-w * ch_ // hmax))) // 8)
            chh_c = -((-(-(-h * cv_ // vmax))) // 8)
        coef = (np.zeros((bh_c * bw_c, 64), np.int32)
                if (rgb or c is luma) else None)
        st[id(c)] = {"coef": coef, "bw": bw_c, "cw": cw_c, "chh": chh_c,
                     "ch": ch_, "cv": cv_}

    n = len(data)
    dri = restart_interval
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:                                   # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:
            _parse_dqt(body, qtables)
        elif marker == 0xC4:
            _parse_dht(body, htables)
        elif marker == 0xDD:
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            scan, ss, se, ah, al = _parse_sos(body, frame)
            start = pos + 2 + seglen
            if not rgb and not any(c is luma for c, _, _ in scan):
                pos = _skip_entropy(data, start)             # chroma-only
                continue
            pos = _progressive_scan(data, start, scan, ss, se, ah, al,
                                    htables, dri, st, mcux, mcuy)
            continue
        pos += 2 + seglen
    if not rgb:
        g = st[id(luma)]
        return _finish_plane(g["coef"], qtables[luma["tq"]],
                             g["bw"], g["coef"].shape[0] // g["bw"],
                             w, h)
    coefs = {k: v["coef"] for k, v in st.items()}
    return _finish_rgb(frame, coefs, qtables, mcuy, hmax, vmax,
                       single=single, mcux=mcux)


def _progressive_scan(data, start, scan, ss, se, ah, al, htables,
                      dri, st, mcux, mcuy):
    """Decode one progressive scan into each component's coefficient
    array in ``st`` (components with ``coef=None`` are entropy-decoded
    for bit-sync only); returns the stream position of the next
    marker."""
    reader = _BitReader(data, start)
    if ss == 0:                                              # DC scan
        pred = {id(c): 0 for c, _, _ in scan}
        interleaved = len(scan) > 1
        g0 = st[id(scan[0][0])]
        nx, ny = (mcux, mcuy) if interleaved else (g0["cw"], g0["chh"])
        mcu_count = 0
        for my in range(ny):
            for mx in range(nx):
                if dri and mcu_count and mcu_count % dri == 0:
                    reader.align_restart()
                    for c, _, _ in scan:
                        pred[id(c)] = 0
                mcu_count += 1
                for c, td, _ta in scan:
                    g = st[id(c)]
                    coef = g["coef"]
                    ch_, cv_ = (g["ch"], g["cv"]) if interleaved \
                        else (1, 1)
                    for by in range(cv_):
                        for bx in range(ch_):
                            if interleaved:
                                row = ((my * g["cv"] + by) * g["bw"]
                                       + (mx * g["ch"] + bx))
                            else:
                                row = my * g["bw"] + mx
                            if ah == 0:                      # first DC scan
                                t = reader.decode_huffman(htables[(0, td)])
                                diff = _extend(reader.receive(t), t) if t else 0
                                pred[id(c)] += diff
                                if coef is not None:
                                    coef[row, 0] = pred[id(c)] << al
                            else:                            # DC refinement
                                bit = reader.read_bit()
                                if coef is not None and bit:
                                    coef[row, 0] |= 1 << al
        return _skip_entropy(data, reader.pos)

    # AC scan: always single-component (T.81 G.1.1.1.1)
    g = st[id(scan[0][0])]
    acoef, bw, cw, chh = g["coef"], g["bw"], g["cw"], g["chh"]
    if acoef is None:                        # luma-mode chroma AC scan
        return _skip_entropy(data, start)    # (caller filters; safety)
    ac_tbl = htables[(1, scan[0][2])]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    mcu_count = 0
    for my in range(chh):
        for mx in range(cw):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.align_restart()
                eobrun = 0
            mcu_count += 1
            row = my * bw + mx
            coef = acoef[row]
            if ah == 0:                                      # first AC scan
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_huffman(ac_tbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += 16                              # ZRL
                        continue
                    k += r
                    if k > se:
                        raise JpegError("AC run past band end")
                    coef[k] = _extend(reader.receive(s), s) << al
                    k += 1
            else:                                            # AC refinement
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode_huffman(ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.receive(r)
                                break                        # EOB path below
                            val = 0                          # ZRL: 16 zero-history
                        elif s == 1:
                            val = p1 if reader.read_bit() else m1
                        else:
                            raise JpegError("bad refinement magnitude")
                        # advance past r zero-HISTORY positions, sending
                        # correction bits to nonzero-history coefficients
                        while k <= se:
                            if coef[k] != 0:
                                if reader.read_bit() and not (coef[k] & p1):
                                    coef[k] += p1 if coef[k] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s and k <= se:
                            coef[k] = val
                        k += 1
                if eobrun > 0:
                    # EOB path: correction bits for every remaining
                    # nonzero-history coefficient of the band
                    while k <= se:
                        if coef[k] != 0:
                            if reader.read_bit() and not (coef[k] & p1):
                                coef[k] += p1 if coef[k] > 0 else m1
                        k += 1
                    eobrun -= 1
    return _skip_entropy(data, reader.pos)


def peek_jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the SOF header without entropy decoding."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError("expected marker")
        marker = data[pos + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return w, h
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        pos += 2 + seglen
    raise JpegError("no SOF marker found")


# ---------------------------------------------------------------- encode

def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (jcparam.c)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_encode_table(bits, huffval):
    """(bits, huffval) -> symbol -> (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    __slots__ = ("out", "bitbuf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.bitbuf = (self.bitbuf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bitbuf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)           # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)     # pad with 1-bits


def _encode_block(bw: _BitWriter, coef: np.ndarray, pred: int,
                  dc_tbl, ac_tbl) -> int:
    """Encode one zig-zag coefficient vector; returns the new DC pred."""
    dc = int(coef[0])
    diff = dc - pred
    if diff == 0:
        code, ln = dc_tbl[0]
        bw.write(code, ln)
    else:
        t = max(1, int(abs(diff)).bit_length())
        code, ln = dc_tbl[t]
        bw.write(code, ln)
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    nz = np.nonzero(coef[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    k = 1
    while k <= last:
        run = 0
        while coef[k] == 0:
            run += 1
            k += 1
        while run > 15:
            code, ln = ac_tbl[0xF0]
            bw.write(code, ln)
            run -= 16
        v = int(coef[k])
        s = int(abs(v)).bit_length()
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        k += 1
    if last < 63:
        code, ln = ac_tbl[0x00]
        bw.write(code, ln)                      # EOB
    return dc


def _plane_coefficients(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """uint8 plane (padded to 8-multiples) -> (nblocks, 64) zig-zag
    quantized coefficients, raster block order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1:h, :]          # edge replicate
    padded[:, w:] = padded[:, w - 1:w]
    blocks = (padded - 128.0).reshape(ph // 8, 8, pw // 8, 8) \
        .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    dct = np.einsum("ik,nkl,jl->nij", _DCT_C, blocks, _DCT_C, optimize=True)
    # q is in raster order here; quantize, then emit zig-zag scan order
    qz = np.round(dct.reshape(-1, 64) / q[None, :]).astype(np.int32)
    return qz[:, ZIGZAG]


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """uint8 grayscale (h, w) or RGB (h, w, 3) -> baseline JPEG bytes.

    RGB converts to BT.601 full-range YCbCr (the JFIF convention);
    ``subsampling`` is ``"444"`` or ``"420"`` for color inputs.
    """
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy = _quality_scale(QTBL_LUMA, quality)
    out = bytearray(b"\xff\xd8")                                 # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + \
        b"\x01\x01\x00\x00\x01\x00\x01\x00\x00"                  # APP0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + \
        bytes(qy[ZIGZAG].tolist())                               # DQT 0 (zig-zag)
    if not gray:
        qc = _quality_scale(QTBL_CHROMA, quality)
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + \
            bytes(qc[ZIGZAG].tolist())                           # DQT 1

    if gray:
        comps = [(1, 0x11, 0)]
    elif subsampling == "420":
        comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    elif subsampling == "444":
        comps = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    else:
        raise ValueError("subsampling must be '444' or '420'")
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
                                     len(comps))                 # SOF0
    for cid, hv, tq in comps:
        out += bytes([cid, hv, tq])

    def dht(cls, tid, tbl):
        bits, huffval = tbl
        return (b"\xff\xc4" + struct.pack(">H", 19 + len(huffval)) +
                bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval))

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)

    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _hv, tq in comps:
        out += bytes([cid, (tq << 4) | tq])     # Td=Ta=table id
    out += b"\x00\x3f\x00"                      # Ss=0 Se=63 Ah/Al=0

    bw = _BitWriter()
    dcy = _build_encode_table(*HUFF_DC_LUMA)
    acy = _build_encode_table(*HUFF_AC_LUMA)

    if gray:
        coefs = _plane_coefficients(arr, qy)
        pred = 0
        for i in range(len(coefs)):
            pred = _encode_block(bw, coefs[i], pred, dcy, acy)
    else:
        rgb = arr.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        y = np.clip(np.round(y), 0, 255).astype(np.uint8)
        qc = _quality_scale(QTBL_CHROMA, quality)
        if subsampling == "420":
            # pad to even, 2x2 box average
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def pad(p):
                o = np.empty((ph, pw))
                o[:h, :w] = p
                o[h:, :w] = p[h - 1:h, :]
                o[:, w:] = o[:, w - 1:w]
                return o
            cb = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cb = np.clip(np.round(cb), 0, 255).astype(np.uint8)
        cr = np.clip(np.round(cr), 0, 255).astype(np.uint8)
        dcc = _build_encode_table(*HUFF_DC_CHROMA)
        acc = _build_encode_table(*HUFF_AC_CHROMA)
        ycoef = _plane_coefficients(y, qy)
        cbcoef = _plane_coefficients(cb, qc)
        crcoef = _plane_coefficients(cr, qc)
        if subsampling == "444":
            preds = [0, 0, 0]
            for i in range(len(ycoef)):
                preds[0] = _encode_block(bw, ycoef[i], preds[0], dcy, acy)
                preds[1] = _encode_block(bw, cbcoef[i], preds[1], dcc, acc)
                preds[2] = _encode_block(bw, crcoef[i], preds[2], dcc, acc)
        else:
            # 4:2:0 MCU = 4 luma blocks (2x2) + 1 Cb + 1 Cr
            ybw = -(-w // 8)
            ybw += ybw & 1                      # luma padded to MCU grid
            ybh = -(-h // 8)
            ybh += ybh & 1
            # re-extract luma coefficients on the padded MCU grid
            ycoef = _plane_coefficients(
                _pad_plane(y, ybh * 8, ybw * 8), qy)
            cbw, cbh = ybw // 2, ybh // 2
            cbcoef = _plane_coefficients(
                _pad_plane(cb, cbh * 8, cbw * 8), qc)
            crcoef = _plane_coefficients(
                _pad_plane(cr, cbh * 8, cbw * 8), qc)
            preds = [0, 0, 0]
            for my in range(ybh // 2):
                for mx in range(ybw // 2):
                    for by in range(2):
                        for bx in range(2):
                            i = (my * 2 + by) * ybw + (mx * 2 + bx)
                            preds[0] = _encode_block(bw, ycoef[i], preds[0],
                                                     dcy, acy)
                    j = my * cbw + mx
                    preds[1] = _encode_block(bw, cbcoef[j], preds[1], dcc, acc)
                    preds[2] = _encode_block(bw, crcoef[j], preds[2], dcc, acc)

    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                          # EOI
    return bytes(out)


def _pad_plane(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    o = np.empty((ph, pw), dtype=p.dtype)
    o[:h, :w] = p
    o[h:, :w] = p[h - 1:h, :]
    o[:, w:] = o[:, w - 1:w]
    return o

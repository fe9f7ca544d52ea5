"""Minimal Type1 (PostScript) font reader: charstrings -> outlines.

Companion to ``media/cff.py`` for the PDF rasterizer's FontFile case
(classic eexec-encrypted Type1 programs — the other half of the
round-3 "Type1/CFF degrade to metric boxes" gap; the reference's
pdftocairo renders them natively, ``PDF_to_image.py:8-91``).
Duck-types ``media/ttf.TrueTypeFont``: ``units_per_em`` (1000 for
Type1), ``glyph_id``, ``advance``, ``glyph_contours``.

Parsing: PFB segment headers are stripped if present; the eexec
section is decrypted (r=55665), ``/lenIV``, ``/Subrs`` and
``/CharStrings`` are scanned out of the decrypted plaintext, and each
charstring is decrypted again (r=4330). The interpreter covers the
Type1 operator set: hsbw/sbw, r/h/v moveto-lineto, rrcurveto,
vh/hvcurveto, closepath, callsubr/return, endchar, seac accent
composition, div, dotsection and the stem hints (ignored), plus the
OtherSubrs 0-3 protocol (flex collected via rmoveto in flex mode,
hint replacement as a no-op). Encoding: the cleartext ``/Encoding``
(StandardEncoding or ``dup code /name put`` vector) maps codes, and
glyph names map from unicode like the CFF reader.
"""

from __future__ import annotations

import re

import numpy as np

from .cff import _UNI_TO_NAME, _UNI_TO_NAME_FALLBACK


class Type1Error(ValueError):
    pass


def _decrypt(data: bytes, r: int, skip: int) -> bytes:
    c1, c2 = 52845, 22719
    out = bytearray(len(data))
    for i, c in enumerate(data):
        out[i] = c ^ (r >> 8)
        r = ((c + r) * c1 + c2) & 0xFFFF
    return bytes(out[skip:])


def _strip_pfb(data: bytes) -> bytes:
    """PFB (0x80-segmented) -> concatenated ASCII+binary program."""
    if not data[:1] == b"\x80":
        return data
    out = b""
    pos = 0
    while pos < len(data) and data[pos] == 0x80:
        t = data[pos + 1]
        if t == 3:
            break
        ln = int.from_bytes(data[pos + 2:pos + 6], "little")
        out += data[pos + 6:pos + 6 + ln]
        pos += 6 + ln
    return out


class _T1Interp:
    """One Type1 charstring evaluation."""

    def __init__(self, font: "Type1Font"):
        self.font = font
        self.stack: list[float] = []
        self.ps_stack: list[float] = []
        self.x = self.y = 0.0
        self.sbx = 0.0
        self.width = 0.0
        self.contours: list[list] = []
        self.cur: list | None = None
        self.flex: list | None = None

    _T = np.linspace(0.0, 1.0, 7)[1:]

    def _moveto(self, x, y):
        if self.flex is not None:
            self.flex.append((x, y))
            self.x, self.y = x, y
            return
        self._close()
        self.x, self.y = x, y
        self.cur = [[x, y]]

    def _lineto(self, x, y):
        if self.cur is None:
            self.cur = [[self.x, self.y]]
        self.cur.append([x, y])
        self.x, self.y = x, y

    def _curveto(self, x1, y1, x2, y2, x3, y3):
        if self.cur is None:
            self.cur = [[self.x, self.y]]
        t = self._T
        mt = 1.0 - t
        x0, y0 = self.x, self.y
        xs = (mt ** 3 * x0 + 3 * mt ** 2 * t * x1
              + 3 * mt * t ** 2 * x2 + t ** 3 * x3)
        ys = (mt ** 3 * y0 + 3 * mt ** 2 * t * y1
              + 3 * mt * t ** 2 * y2 + t ** 3 * y3)
        self.cur.extend([[float(a), float(b)] for a, b in zip(xs, ys)])
        self.x, self.y = x3, y3

    def _close(self):
        if self.cur is not None and len(self.cur) >= 3:
            self.contours.append(self.cur)
        self.cur = None

    def run(self, code: bytes, depth: int = 0):
        if depth > 10:
            raise Type1Error("subr recursion too deep")
        st = self.stack
        i = 0
        n = len(code)
        while i < n:
            b0 = code[i]
            if b0 >= 32:
                if b0 <= 246:
                    st.append(float(b0 - 139))
                    i += 1
                elif b0 <= 250:
                    st.append(float((b0 - 247) * 256 + code[i + 1] + 108))
                    i += 2
                elif b0 <= 254:
                    st.append(float(-(b0 - 251) * 256 - code[i + 1] - 108))
                    i += 2
                else:
                    st.append(float(int.from_bytes(
                        code[i + 1:i + 5], "big", signed=True)))
                    i += 5
                continue
            i += 1
            if b0 == 13:                     # hsbw: sbx wx
                self.sbx, self.width = st[0], st[1]
                self.x = self.sbx
                st.clear()
            elif b0 == 9:                    # closepath
                self._close()
                st.clear()
            elif b0 == 21:                   # rmoveto
                self._moveto(self.x + st[-2], self.y + st[-1])
                st.clear()
            elif b0 == 22:                   # hmoveto
                self._moveto(self.x + st[-1], self.y)
                st.clear()
            elif b0 == 4:                    # vmoveto
                self._moveto(self.x, self.y + st[-1])
                st.clear()
            elif b0 == 5:                    # rlineto
                self._lineto(self.x + st[0], self.y + st[1])
                st.clear()
            elif b0 == 6:                    # hlineto
                self._lineto(self.x + st[0], self.y)
                st.clear()
            elif b0 == 7:                    # vlineto
                self._lineto(self.x, self.y + st[0])
                st.clear()
            elif b0 == 8:                    # rrcurveto
                x1 = self.x + st[0]
                y1 = self.y + st[1]
                x2 = x1 + st[2]
                y2 = y1 + st[3]
                self._curveto(x1, y1, x2, y2, x2 + st[4], y2 + st[5])
                st.clear()
            elif b0 == 30:                   # vhcurveto
                x1 = self.x
                y1 = self.y + st[0]
                x2 = x1 + st[1]
                y2 = y1 + st[2]
                self._curveto(x1, y1, x2, y2, x2 + st[3], y2)
                st.clear()
            elif b0 == 31:                   # hvcurveto
                x1 = self.x + st[0]
                y1 = self.y
                x2 = x1 + st[1]
                y2 = y1 + st[2]
                self._curveto(x1, y1, x2, y2, x2, y2 + st[3])
                st.clear()
            elif b0 == 10:                   # callsubr
                idx = int(st.pop())
                subrs = self.font.subrs
                if not 0 <= idx < len(subrs):
                    raise Type1Error("bad subr index")
                self.run(subrs[idx], depth + 1)
            elif b0 == 11:                   # return
                return
            elif b0 == 14:                   # endchar
                self._close()
                return
            elif b0 in (1, 3):               # h/vstem
                st.clear()
            elif b0 == 12:
                b1 = code[i]
                i += 1
                if b1 == 12:                 # div
                    b = st.pop()
                    st.append(st.pop() / b)
                elif b1 == 16:               # callothersubr
                    on = int(st.pop())
                    cnt = int(st.pop())
                    args = [st.pop() for _ in range(cnt)]
                    if on == 1:              # enter flex
                        self.flex = []
                    elif on == 2:            # flex point collector tick
                        pass
                    elif on == 0:            # finish flex: 7 pts queued
                        pts = self.flex or []
                        self.flex = None
                        if len(pts) >= 7:
                            ref, c1, c2, p1, c3, c4, p2 = pts[:7]
                            # rebuild from the pre-flex current point
                            self.x, self.y = pts[0][0], pts[0][1]
                            # reference point is a device hint; curves
                            # run from the point before flex started --
                            # p0 is implicit in self.cur's tail
                            if self.cur:
                                self.x, self.y = self.cur[-1]
                            self._curveto(c1[0], c1[1], c2[0], c2[1],
                                          p1[0], p1[1])
                            self._curveto(c3[0], c3[1], c4[0], c4[1],
                                          p2[0], p2[1])
                        # following "pop pop setcurrentpoint" reads x y
                        self.ps_stack = [self.y, self.x]
                    elif on == 3:            # hint replacement
                        self.ps_stack = [3.0]
                    else:
                        self.ps_stack = args
                elif b1 == 17:               # pop
                    st.append(self.ps_stack.pop()
                              if self.ps_stack else 0.0)
                elif b1 == 6:                # seac: asb adx ady bchar achar
                    from .cff import _STD_STRINGS
                    asb, adx, ady, bchar, achar = st[:5]
                    st.clear()
                    f = self.font
                    for ch, dx, dy in ((int(bchar), 0.0, 0.0),
                                       (int(achar),
                                        self.sbx - asb + adx, ady)):
                        name = _STD_STRINGS[ch - 31] \
                            if 32 <= ch <= 126 else None
                        cs = f.charstrings.get(name) if name else None
                        if cs is None:
                            continue
                        it = _T1Interp(f)
                        it.run(cs)
                        it._close()
                        for c in it.contours:
                            self.contours.append(
                                [[px + dx, py + dy] for px, py in c])
                    return
                elif b1 == 7:                # sbw: sbx sby wx wy
                    self.sbx, self.width = st[0], st[2]
                    self.x, self.y = st[0], st[1]
                    st.clear()
                elif b1 == 33:               # setcurrentpoint
                    self.x, self.y = st[0], st[1]
                    st.clear()
                else:                        # dotsection, *stem3, ...
                    st.clear()
            else:
                st.clear()


_CS_RE = re.compile(rb"/([^\s/{}()\[\]<>]+)\s+(\d+)\s+(RD|-\|)[ ]")
_SUBR_RE = re.compile(rb"dup\s+(\d+)\s+(\d+)\s+(RD|-\|)[ ]")
_ENC_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/]+)\s+put")


class Type1Font:
    """Parsed Type1 font with the ``TrueTypeFont`` outline interface."""

    units_per_em = 1000

    def __init__(self, data: bytes):
        data = _strip_pfb(data)
        k = data.find(b"eexec")
        if k < 0:
            raise Type1Error("no eexec section")
        clear = data[:k]
        enc = data[k + 5:].lstrip(b"\r\n\t ")
        # hex form if the first 4 bytes are all hex digits
        probe = enc[:4]
        if all(c in b"0123456789abcdefABCDEF" for c in probe):
            import binascii
            hx = re.sub(rb"[^0-9a-fA-F]", b"", enc)
            if len(hx) % 2:
                hx = hx[:-1]
            enc = binascii.unhexlify(hx)
        priv = _decrypt(enc, 55665, 4)

        m = re.search(rb"/lenIV\s+(\d+)", priv)
        len_iv = int(m.group(1)) if m else 4

        self.subrs: list[bytes] = []
        for m in _SUBR_RE.finditer(priv):
            idx, ln = int(m.group(1)), int(m.group(2))
            start = m.end()
            while len(self.subrs) <= idx:
                self.subrs.append(b"")
            self.subrs[idx] = _decrypt(priv[start:start + ln], 4330,
                                       len_iv)

        self.charstrings: dict[str, bytes] = {}
        cs_at = priv.find(b"/CharStrings")
        for m in _CS_RE.finditer(priv, cs_at if cs_at >= 0 else 0):
            name = m.group(1).decode("latin-1")
            ln = int(m.group(2))
            start = m.end()
            self.charstrings.setdefault(
                name, _decrypt(priv[start:start + ln], 4330, len_iv))
        if not self.charstrings:
            raise Type1Error("no CharStrings")
        # gid 0 must be the blank .notdef so a failed lookup draws
        # nothing (glyph_id misses return 0)
        self._names = sorted(self.charstrings, key=lambda n: n != ".notdef")
        self._name_to_gid = {n: g for g, n in enumerate(self._names)}

        # cleartext /Encoding: code -> glyph name
        self._code_to_name: dict[int, str] = {}
        if b"StandardEncoding" not in clear:
            for m in _ENC_RE.finditer(clear):
                self._code_to_name[int(m.group(1))] = \
                    m.group(2).decode("latin-1")

        self._contours: dict[int, list] = {}
        self._widths: dict[int, float] = {}

    # -------------------------------------------------------- interface

    def glyph_id(self, ch: str) -> int:
        code = ord(ch)
        for name in (_UNI_TO_NAME.get(code),
                     _UNI_TO_NAME_FALLBACK.get(code),
                     self._code_to_name.get(code)):
            if name and name in self._name_to_gid:
                return self._name_to_gid[name]
        return 0

    def _interp(self, gid: int) -> _T1Interp:
        it = _T1Interp(self)
        it.run(self.charstrings[self._names[gid]])
        it._close()
        return it

    def advance(self, gid: int) -> float:
        if not 0 <= gid < len(self._names):
            return 0.0
        if gid not in self._widths:
            try:
                self._widths[gid] = self._interp(gid).width
            except (Type1Error, IndexError, ZeroDivisionError):
                self._widths[gid] = 0.0
        return self._widths[gid]

    def glyph_contours(self, gid: int) -> list[np.ndarray]:
        if not 0 <= gid < len(self._names):
            return []
        if gid not in self._contours:
            try:
                it = self._interp(gid)
                self._contours[gid] = [np.asarray(c, np.float64)
                                       for c in it.contours]
                self._widths.setdefault(gid, it.width)
            except (Type1Error, IndexError, ZeroDivisionError):
                self._contours[gid] = []
        return self._contours[gid]

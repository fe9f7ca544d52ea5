"""Minimal CFF (Compact Font Format) reader: Type2 charstrings ->
filled glyph outlines.

Closes the round-3 degradation where PDF fonts embedded as FontFile3
(Subtype /Type1C — PostScript outlines in a CFF wrapper) rendered as
metric boxes (``media/pdfraster.py`` docstring; the reference's
pdftocairo renders them fully, ``PDF_to_image.py:8-91``). ``CffFont``
duck-types ``media/ttf.TrueTypeFont``: ``units_per_em``,
``glyph_id(ch)``, ``advance(gid)``, ``glyph_contours(gid)`` returning
closed (N, 2) float64 polylines in font units, so the rasterizer's
text loop is format-agnostic.

Parsed structure: header, Name/TopDICT/String/GlobalSubr INDEXes,
charset (formats 0/1/2 and the identity predefined), Private DICT
(defaultWidthX / nominalWidthX / local Subrs), and CID-keyed fonts
(ROS + FDArray/FDSelect formats 0/3, per-glyph Private). The Type2
interpreter covers the path operators (r/h/v moveto-lineto-curveto,
hh/hv/vh/vv curveto, rcurveline, rlinecurve), hints (h/vstem[hm],
hintmask/cntrmask with implicit vstem), local/global subrs with the
standard bias, flex (12 34..37), and the
leading-width convention (odd extra argument on the first
stack-clearing operator = width delta vs nominalWidthX). Cubic
Béziers are flattened by uniform sampling, matching the quadratic
flattening in ``ttf.py``.
"""

from __future__ import annotations

import struct

import numpy as np


class CffError(ValueError):
    pass


# Standard strings, SIDs 0-390 (CFF spec appendix A). Only the prefix
# needed to name ASCII + Latin-1 glyphs is spelled out; higher SIDs
# resolve through the font's own String INDEX (custom strings start at
# SID 391 regardless, so the gap never misattributes a custom name).
_STD_STRINGS = [
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "colon", "semicolon", "less", "equal", "greater",
    "question", "at", "A", "B", "C", "D", "E", "F", "G", "H", "I",
    "J", "K", "L", "M", "N", "O", "P", "Q", "R", "S", "T", "U", "V",
    "W", "X", "Y", "Z", "bracketleft", "backslash", "bracketright",
    "asciicircum", "underscore", "quoteleft", "a", "b", "c", "d",
    "e", "f", "g", "h", "i", "j", "k", "l", "m", "n", "o", "p", "q",
    "r", "s", "t", "u", "v", "w", "x", "y", "z", "braceleft", "bar",
    "braceright", "asciitilde", "exclamdown", "cent", "sterling",
    "fraction", "yen", "florin", "section", "currency",
    "quotesingle", "quotedblleft", "guillemotleft", "guilsinglleft",
    "guilsinglright", "fi", "fl", "endash", "dagger", "daggerdbl",
    "periodcentered", "paragraph", "bullet", "quotesinglbase",
    "quotedblbase", "quotedblright", "guillemotright", "ellipsis",
    "perthousand", "questiondown", "grave", "acute", "circumflex",
    "tilde", "macron", "breve", "dotaccent", "dieresis", "ring",
    "cedilla", "hungarumlaut", "ogonek", "caron", "emdash",
]

# unicode -> standard glyph name for the ASCII range (AGL subset; the
# apostrophe/backtick get both PostScript spellings).
_UNI_TO_NAME = {}
for _i, _n in enumerate(_STD_STRINGS[1:96], start=32):
    _UNI_TO_NAME.setdefault(_i, _n)
_UNI_TO_NAME[39] = "quotesingle"     # prefer modern name, fall back below
_UNI_TO_NAME[96] = "grave"
_UNI_TO_NAME_FALLBACK = {39: "quoteright", 96: "quoteleft"}

# Standard Encoding code -> SID for codes 32..126 is the identity into
# _STD_STRINGS[1:96] (SID = code - 31).
_STD_ENCODING_SID = {c: c - 31 for c in range(32, 127)}


def _read_index(data: bytes, pos: int):
    """CFF INDEX at ``pos`` -> (list of item bytes, pos after)."""
    count = struct.unpack(">H", data[pos:pos + 2])[0]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CffError(f"bad INDEX offSize {off_size}")
    n = count + 1
    raw = data[pos:pos + n * off_size]
    offs = np.zeros(n, np.int64)
    for b in range(off_size):
        offs = (offs << 8) | np.frombuffer(
            raw[b::off_size][:n], np.uint8).astype(np.int64)
    pos += n * off_size
    base = pos - 1                           # offsets are 1-based
    items = [data[base + int(offs[i]):base + int(offs[i + 1])]
             for i in range(count)]
    return items, base + int(offs[-1])


def _parse_dict(data: bytes) -> dict:
    """CFF DICT -> {op: [operands]}; two-byte ops keyed as 0xc00|op2."""
    out: dict[int, list] = {}
    stack: list[float] = []
    i = 0
    while i < len(data):
        b0 = data[i]
        if b0 <= 21:                         # operator
            if b0 == 12:
                op = 0xC00 | data[i + 1]
                i += 2
            else:
                op = b0
                i += 1
            out[op] = stack
            stack = []
        elif b0 == 28:
            stack.append(struct.unpack(">h", data[i + 1:i + 3])[0])
            i += 3
        elif b0 == 29:
            stack.append(struct.unpack(">i", data[i + 1:i + 5])[0])
            i += 5
        elif b0 == 30:                       # real (nibbles)
            s = ""
            i += 1
            done = False
            while not done:
                for nib in (data[i] >> 4, data[i] & 15):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            stack.append(float(s or "0"))
        elif 32 <= b0 <= 246:
            stack.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            stack.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            stack.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            raise CffError(f"bad DICT byte {b0}")
    return out


def _bias(subrs) -> int:
    n = len(subrs)
    return 107 if n < 1240 else (1131 if n < 33900 else 32768)


class _Type2Interp:
    """One charstring evaluation -> contours + advance width."""

    __slots__ = ("gsubrs", "subrs", "gbias", "lbias", "nominal_w",
                 "default_w", "x", "y", "width", "nstems", "stack",
                 "contours", "cur", "_width_parsed", "trans")

    def __init__(self, gsubrs, subrs, default_w, nominal_w):
        self.gsubrs, self.subrs = gsubrs, subrs
        self.gbias, self.lbias = _bias(gsubrs), _bias(subrs)
        self.default_w, self.nominal_w = default_w, nominal_w
        self.x = self.y = 0.0
        self.width = default_w
        self.nstems = 0
        self.stack: list[float] = []
        self.contours: list[list] = []
        self.cur: list | None = None
        self._width_parsed = False
        self.trans = [0.0] * 32              # put/get transient array

    # ---- path helpers

    def _moveto(self, x, y):
        self._close()
        self.x, self.y = x, y
        self.cur = [[x, y]]

    def _lineto(self, x, y):
        if self.cur is None:
            self.cur = [[self.x, self.y]]
        self.cur.append([x, y])
        self.x, self.y = x, y

    _T = np.linspace(0.0, 1.0, 7)[1:]        # 6 segments per cubic

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

    # ---- main loop

    def run(self, code: bytes, depth: int = 0):
        if depth > 10:
            raise CffError("subr recursion too deep")
        i = 0
        n = len(code)
        st = self.stack
        while i < n:
            b0 = code[i]
            if b0 >= 32 or b0 == 28:         # operand
                if b0 == 28:
                    st.append(float(struct.unpack(
                        ">h", code[i + 1:i + 3])[0]))
                    i += 3
                elif b0 <= 246:
                    st.append(float(b0 - 139))
                    i += 1
                elif b0 <= 250:
                    st.append(float((b0 - 247) * 256 + code[i + 1] + 108))
                    i += 2
                elif b0 <= 254:
                    st.append(float(-(b0 - 251) * 256 - code[i + 1] - 108))
                    i += 2
                else:                        # 255: 16.16 fixed
                    st.append(struct.unpack(
                        ">i", code[i + 1:i + 5])[0] / 65536.0)
                    i += 5
                continue
            i += 1
            if b0 in (1, 3, 18, 23):         # h/vstem[hm]
                if not self._width_parsed and len(st) % 2 == 1:
                    self.width = self.nominal_w + st.pop(0)
                self._width_parsed = True
                self.nstems += len(st) // 2
                st.clear()
            elif b0 in (19, 20):             # hintmask / cntrmask
                if not self._width_parsed and len(st) % 2 == 1:
                    self.width = self.nominal_w + st.pop(0)
                self._width_parsed = True
                self.nstems += len(st) // 2  # implicit vstem
                st.clear()
                i += (self.nstems + 7) // 8
            elif b0 == 21:                   # rmoveto
                if not self._width_parsed and len(st) > 2:
                    self.width = self.nominal_w + st.pop(0)
                self._width_parsed = True
                self._moveto(self.x + st[-2], self.y + st[-1])
                st.clear()
            elif b0 == 22:                   # hmoveto
                if not self._width_parsed and len(st) > 1:
                    self.width = self.nominal_w + st.pop(0)
                self._width_parsed = True
                self._moveto(self.x + st[-1], self.y)
                st.clear()
            elif b0 == 4:                    # vmoveto
                if not self._width_parsed and len(st) > 1:
                    self.width = self.nominal_w + st.pop(0)
                self._width_parsed = True
                self._moveto(self.x, self.y + st[-1])
                st.clear()
            elif b0 == 5:                    # rlineto
                for k in range(0, len(st) - 1, 2):
                    self._lineto(self.x + st[k], self.y + st[k + 1])
                st.clear()
            elif b0 in (6, 7):               # hlineto / vlineto
                horiz = b0 == 6
                for v in st:
                    if horiz:
                        self._lineto(self.x + v, self.y)
                    else:
                        self._lineto(self.x, self.y + v)
                    horiz = not horiz
                st.clear()
            elif b0 == 8:                    # rrcurveto
                for k in range(0, len(st) - 5, 6):
                    self._rrc(st[k:k + 6])
                st.clear()
            elif b0 == 24:                   # rcurveline
                k = 0
                while len(st) - k >= 8:
                    self._rrc(st[k:k + 6])
                    k += 6
                self._lineto(self.x + st[k], self.y + st[k + 1])
                st.clear()
            elif b0 == 25:                   # rlinecurve
                k = 0
                while len(st) - k > 6:
                    self._lineto(self.x + st[k], self.y + st[k + 1])
                    k += 2
                self._rrc(st[k:k + 6])
                st.clear()
            elif b0 == 26:                   # vvcurveto
                k = 0
                dx1 = 0.0
                if len(st) % 4 == 1:
                    dx1 = st[0]
                    k = 1
                while k + 3 < len(st):
                    x1 = self.x + dx1
                    y1 = self.y + st[k]
                    x2 = x1 + st[k + 1]
                    y2 = y1 + st[k + 2]
                    self._curveto(x1, y1, x2, y2, x2, y2 + st[k + 3])
                    dx1 = 0.0
                    k += 4
                st.clear()
            elif b0 == 27:                   # hhcurveto
                k = 0
                dy1 = 0.0
                if len(st) % 4 == 1:
                    dy1 = st[0]
                    k = 1
                while k + 3 < len(st):
                    x1 = self.x + st[k]
                    y1 = self.y + dy1
                    x2 = x1 + st[k + 1]
                    y2 = y1 + st[k + 2]
                    self._curveto(x1, y1, x2, y2, x2 + st[k + 3], y2)
                    dy1 = 0.0
                    k += 4
                st.clear()
            elif b0 in (30, 31):             # vhcurveto / hvcurveto
                horiz = b0 == 31
                k = 0
                while len(st) - k >= 4:
                    last = len(st) - k == 5
                    if horiz:
                        x1 = self.x + st[k]
                        y1 = self.y
                        x2 = x1 + st[k + 1]
                        y2 = y1 + st[k + 2]
                        x3 = x2 + (st[k + 4] if last else 0.0)
                        y3 = y2 + st[k + 3]
                    else:
                        x1 = self.x
                        y1 = self.y + st[k]
                        x2 = x1 + st[k + 1]
                        y2 = y1 + st[k + 2]
                        x3 = x2 + st[k + 3]
                        y3 = y2 + (st[k + 4] if last else 0.0)
                    self._curveto(x1, y1, x2, y2, x3, y3)
                    horiz = not horiz
                    k += 4
                st.clear()
            elif b0 == 10:                   # callsubr
                idx = int(st.pop()) + self.lbias
                if not 0 <= idx < len(self.subrs):
                    raise CffError("bad local subr index")
                self.run(self.subrs[idx], depth + 1)
            elif b0 == 29:                   # callgsubr
                idx = int(st.pop()) + self.gbias
                if not 0 <= idx < len(self.gsubrs):
                    raise CffError("bad global subr index")
                self.run(self.gsubrs[idx], depth + 1)
            elif b0 == 11:                   # return
                return
            elif b0 == 14:                   # endchar
                if not self._width_parsed and len(st) in (1, 5):
                    self.width = self.nominal_w + st.pop(0)
                self._width_parsed = True
                self._close()
                st.clear()
                return
            elif b0 == 12:
                b1 = code[i]
                i += 1
                if b1 == 35:                 # flex
                    a = st
                    self._rrc(a[0:6])
                    self._rrc(a[6:12])
                    st.clear()
                elif b1 == 34:               # hflex
                    y0 = self.y
                    self._curveto(self.x + st[0], y0,
                                  self.x + st[0] + st[1], y0 + st[2],
                                  self.x + st[0] + st[1] + st[3],
                                  y0 + st[2])
                    self._curveto(self.x + st[4], self.y,
                                  self.x + st[4] + st[5], y0,
                                  self.x + st[4] + st[5] + st[6], y0)
                    st.clear()
                elif b1 == 36:               # hflex1
                    y0 = self.y
                    x1 = self.x + st[0]
                    y1 = self.y + st[1]
                    x2 = x1 + st[2]
                    y2 = y1 + st[3]
                    self._curveto(x1, y1, x2, y2, x2 + st[4], y2)
                    x4 = self.x + st[5]
                    x5 = x4 + st[6]
                    y5 = self.y + st[7]
                    self._curveto(x4, self.y, x5, y5, x5 + st[8], y0)
                    st.clear()
                elif b1 == 37:               # flex1
                    sx, sy = self.x, self.y
                    dx = sum(st[k] for k in (0, 2, 4, 6, 8))
                    dy = sum(st[k] for k in (1, 3, 5, 7, 9))
                    x1 = self.x + st[0]
                    y1 = self.y + st[1]
                    x2 = x1 + st[2]
                    y2 = y1 + st[3]
                    x3 = x2 + st[4]
                    y3 = y2 + st[5]
                    self._curveto(x1, y1, x2, y2, x3, y3)
                    x4 = x3 + st[6]
                    y4 = y3 + st[7]
                    x5 = x4 + st[8]
                    y5 = y4 + st[9]
                    self._curveto(x4, y4, x5, y5, sx + dx, sy + dy)
                    st.clear()
                elif b1 == 3:                # and
                    b = st.pop(); a = st.pop()
                    st.append(1.0 if a and b else 0.0)
                elif b1 == 4:                # or
                    b = st.pop(); a = st.pop()
                    st.append(1.0 if a or b else 0.0)
                elif b1 == 9:                # abs
                    st.append(abs(st.pop()))
                elif b1 == 10:               # add
                    b = st.pop(); st.append(st.pop() + b)
                elif b1 == 11:               # sub
                    b = st.pop(); st.append(st.pop() - b)
                elif b1 == 12:               # div
                    b = st.pop(); st.append(st.pop() / b)
                elif b1 == 14:               # neg
                    st.append(-st.pop())
                elif b1 == 18:               # drop
                    st.pop()
                elif b1 == 20:               # put
                    j = int(st.pop()); self.trans[j & 31] = st.pop()
                elif b1 == 21:               # get
                    st.append(self.trans[int(st.pop()) & 31])
                elif b1 == 24:               # mul
                    b = st.pop(); st.append(st.pop() * b)
                elif b1 == 26:               # sqrt
                    st.append(abs(st.pop()) ** 0.5)
                elif b1 == 27:               # dup
                    st.append(st[-1])
                elif b1 == 28:               # exch
                    st[-1], st[-2] = st[-2], st[-1]
                else:                        # unknown escape: clear
                    st.clear()
            else:                            # reserved: clear defensively
                st.clear()

    def _rrc(self, a):
        x1 = self.x + a[0]
        y1 = self.y + a[1]
        x2 = x1 + a[2]
        y2 = y1 + a[3]
        self._curveto(x1, y1, x2, y2, x2 + a[4], y2 + a[5])


class CffFont:
    """Parsed CFF font with the ``TrueTypeFont`` outline interface."""

    def __init__(self, data: bytes):
        if len(data) < 4 or data[0] != 1:
            raise CffError("not a CFF v1 font")
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        self._gsubrs, pos = _read_index(data, pos)
        if not top_dicts:
            raise CffError("no Top DICT")
        top = _parse_dict(top_dicts[0])
        self._strings = strings

        cs_off = top.get(17)
        if not cs_off:
            raise CffError("no CharStrings")
        self.charstrings, _ = _read_index(data, int(cs_off[0]))
        self.num_glyphs = len(self.charstrings)

        fm = top.get(0xC07, [0.001, 0, 0, 0.001, 0, 0])
        self.units_per_em = round(1.0 / fm[0]) if fm[0] else 1000

        # ---- private dict(s) + local subrs
        self._is_cid = 0xC1E in top
        self._fd_privs = []                  # [(default_w, nominal_w, subrs)]
        self._fd_select = None
        if self._is_cid:
            fda_off = top.get(0xC24)
            if fda_off:
                fdicts, _ = _read_index(data, int(fda_off[0]))
                for fd in fdicts:
                    self._fd_privs.append(
                        self._read_private(data, _parse_dict(fd)))
            if not self._fd_privs:
                self._fd_privs = [(0.0, 0.0, [])]
            fds_off = top.get(0xC25)
            if fds_off:
                self._fd_select = self._read_fdselect(data, int(fds_off[0]))
        else:
            self._fd_privs = [self._read_private(data, top)]

        # ---- charset: gid -> SID (or CID); name -> gid for lookups
        self._name_to_gid: dict[str, int] = {}
        sids = self._read_charset(data, top)
        if not self._is_cid:
            for gid, sid in enumerate(sids):
                self._name_to_gid.setdefault(self._sid_name(sid), gid)

        # ---- built-in encoding: charcode -> gid
        self._code_to_gid: dict[int, int] = {}
        enc = top.get(16, [0])
        ev = int(enc[0])
        if ev == 0:                          # Standard Encoding
            sid_to_gid = {sid: gid for gid, sid in enumerate(sids)}
            for code, sid in _STD_ENCODING_SID.items():
                gid = sid_to_gid.get(sid)
                if gid:
                    self._code_to_gid[code] = gid
        elif ev > 1:                         # embedded encoding table
            epos = ev
            fmt = data[epos] & 0x7F
            if fmt == 0:
                ncodes = data[epos + 1]
                for k in range(ncodes):
                    self._code_to_gid[data[epos + 2 + k]] = k + 1
            elif fmt == 1:
                nranges = data[epos + 1]
                gid = 1
                p = epos + 2
                for _ in range(nranges):
                    first, nleft = data[p], data[p + 1]
                    p += 2
                    for c in range(first, first + nleft + 1):
                        self._code_to_gid[c] = gid
                        gid += 1

        self._contour_cache: dict[int, list] = {}
        self._width_cache: dict[int, float] = {}

    # ------------------------------------------------------------ parse

    def _read_private(self, data, d):
        pv = d.get(18)
        if not pv or len(pv) < 2:
            return 0.0, 0.0, []
        size, off = int(pv[0]), int(pv[1])
        priv = _parse_dict(data[off:off + size])
        default_w = float(priv.get(20, [0])[0])
        nominal_w = float(priv.get(21, [0])[0])
        subrs = []
        if 19 in priv:
            subrs, _ = _read_index(data, off + int(priv[19][0]))
        return default_w, nominal_w, subrs

    def _read_fdselect(self, data, pos):
        fmt = data[pos]
        sel = np.zeros(self.num_glyphs, np.int32)
        if fmt == 0:
            raw = data[pos + 1:pos + 1 + self.num_glyphs]
            sel[:len(raw)] = np.frombuffer(raw, np.uint8)
        elif fmt == 3:
            nr = struct.unpack(">H", data[pos + 1:pos + 3])[0]
            p = pos + 3
            for _ in range(nr):
                first, fd = struct.unpack(">HB", data[p:p + 3])
                nxt = struct.unpack(">H", data[p + 3:p + 5])[0]
                sel[first:nxt] = fd
                p += 3
        else:
            raise CffError(f"bad FDSelect format {fmt}")
        return sel

    def _read_charset(self, data, top):
        n = self.num_glyphs
        off = int(top.get(15, [0])[0])
        sids = [0] * n
        if off in (0, 1, 2):                 # predefined: identity is fine
            for g in range(n):
                sids[g] = g
            return sids
        fmt = data[off]
        p = off + 1
        if fmt == 0:
            for g in range(1, n):
                sids[g] = struct.unpack(">H", data[p:p + 2])[0]
                p += 2
        elif fmt in (1, 2):
            g = 1
            step = 3 if fmt == 1 else 4
            while g < n:
                first = struct.unpack(">H", data[p:p + 2])[0]
                nleft = data[p + 2] if fmt == 1 else \
                    struct.unpack(">H", data[p + 2:p + 4])[0]
                p += step
                for k in range(nleft + 1):
                    if g >= n:
                        break
                    sids[g] = first + k
                    g += 1
        else:
            raise CffError(f"bad charset format {fmt}")
        return sids

    def _sid_name(self, sid: int) -> str:
        if sid < len(_STD_STRINGS):
            return _STD_STRINGS[sid]
        if sid < 391:
            return f"sid{sid}"               # un-spelled standard tail
        k = sid - 391
        if k < len(self._strings):
            return self._strings[k].decode("latin-1")
        return f"sid{sid}"

    # -------------------------------------------------------- interface

    def glyph_id(self, ch: str) -> int:
        code = ord(ch)
        name = _UNI_TO_NAME.get(code)
        if name and name in self._name_to_gid:
            return self._name_to_gid[name]
        alt = _UNI_TO_NAME_FALLBACK.get(code)
        if alt and alt in self._name_to_gid:
            return self._name_to_gid[alt]
        if code in self._code_to_gid:
            return self._code_to_gid[code]
        # uniXXXX-style names used by subset embedders
        for cand in (f"uni{code:04X}", f"u{code:04X}"):
            if cand in self._name_to_gid:
                return self._name_to_gid[cand]
        return 0

    def gid_for_code(self, code: int) -> int:
        """Built-in-encoding lookup (PDF simple-font code path)."""
        return self._code_to_gid.get(
            code, self.glyph_id(chr(code)) if 0 <= code < 0x110000 else 0)

    def _interp(self, gid: int) -> _Type2Interp:
        fd = 0
        if self._fd_select is not None and gid < len(self._fd_select):
            fd = int(self._fd_select[gid])
        default_w, nominal_w, subrs = self._fd_privs[
            min(fd, len(self._fd_privs) - 1)]
        it = _Type2Interp(self._gsubrs, subrs, default_w, nominal_w)
        it.run(self.charstrings[gid])
        it._close()
        return it

    def advance(self, gid: int) -> float:
        """Advance width in font units (from the charstring's leading
        width, or the Private DICT's defaultWidthX)."""
        if not 0 <= gid < self.num_glyphs:
            return 0.0
        if gid not in self._width_cache:
            try:
                self._width_cache[gid] = self._interp(gid).width
            except (CffError, IndexError, ZeroDivisionError):
                self._width_cache[gid] = self._fd_privs[0][0]
        return self._width_cache[gid]

    def glyph_contours(self, gid: int) -> list[np.ndarray]:
        """Glyph outline -> list of closed polylines (N, 2) in font
        units (cubic Béziers flattened), like ``TrueTypeFont``."""
        if not 0 <= gid < self.num_glyphs:
            return []
        if gid not in self._contour_cache:
            try:
                it = self._interp(gid)
                self._contour_cache[gid] = [
                    np.asarray(c, np.float64) for c in it.contours]
                self._width_cache.setdefault(gid, it.width)
            except (CffError, IndexError, ZeroDivisionError):
                self._contour_cache[gid] = []
        return self._contour_cache[gid]

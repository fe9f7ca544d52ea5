"""Minimal TrueType font reader: character -> filled glyph outline.

Supports the tables needed to rasterize text in PDF content streams
(``media/pdfraster.py``): ``head`` (unitsPerEm, indexToLocFormat),
``cmap`` (formats 4 and 12, Windows/Unicode platforms), ``loca``,
``glyf`` (simple glyphs with quadratic Béziers, composite glyphs with
XY offsets), ``hmtx``/``hhea`` (advance widths). CFF-flavoured
OpenType (``CFF `` table, PostScript charstrings) is rejected — the
PDF layer then falls back to metric boxes.
"""

from __future__ import annotations

import struct

import numpy as np


class TtfError(ValueError):
    pass


class TrueTypeFont:
    def __init__(self, data: bytes):
        self.data = data
        tag = data[:4]
        if tag not in (b"\x00\x01\x00\x00", b"true", b"ttcf", b"OTTO"):
            raise TtfError("not a TrueType font")
        if tag == b"ttcf":                   # font collection: first font
            off = struct.unpack(">I", data[12:16])[0]
            tag = data[off:off + 4]
        else:
            off = 0
        if tag == b"OTTO":
            raise TtfError("CFF-flavoured OpenType unsupported")
        num_tables = struct.unpack(">H", data[off + 4:off + 6])[0]
        self.tables = {}
        for i in range(num_tables):
            rec = data[off + 12 + 16 * i:off + 28 + 16 * i]
            t, _chk, toff, tlen = struct.unpack(">4sIII", rec)
            self.tables[t] = (toff, tlen)
        if b"glyf" not in self.tables:
            raise TtfError("no glyf table (CFF font?)")
        head = self._table(b"head")
        self.units_per_em = struct.unpack(">H", head[18:20])[0]
        self.loc_format = struct.unpack(">h", head[50:52])[0]
        maxp = self._table(b"maxp")
        self.num_glyphs = struct.unpack(">H", maxp[4:6])[0]
        hhea = self._table(b"hhea")
        self.num_hmetrics = struct.unpack(">H", hhea[34:36])[0]
        self._cmap = self._parse_cmap()
        loca_raw = self._table(b"loca")
        if self.loc_format:
            self._loca = np.frombuffer(loca_raw, ">u4")
        else:
            self._loca = np.frombuffer(loca_raw, ">u2").astype(np.uint32) * 2
        self._glyf_off = self.tables[b"glyf"][0]

    def _table(self, tag: bytes) -> bytes:
        if tag not in self.tables:
            raise TtfError(f"missing table {tag!r}")
        off, ln = self.tables[tag]
        return self.data[off:off + ln]

    # ------------------------------------------------------------- cmap

    def _parse_cmap(self) -> dict[int, int]:
        raw = self._table(b"cmap")
        n = struct.unpack(">H", raw[2:4])[0]
        best = None
        for i in range(n):
            pid, eid, off = struct.unpack(">HHI", raw[4 + 8 * i:12 + 8 * i])
            score = {(3, 10): 5, (3, 1): 4, (0, 4): 3, (0, 3): 3,
                     (0, 6): 2, (3, 0): 1, (1, 0): 1}.get((pid, eid), 0)
            if score and (best is None or score > best[0]):
                best = (score, off)
        if best is None:
            raise TtfError("no usable cmap subtable")
        sub = raw[best[1]:]
        fmt = struct.unpack(">H", sub[:2])[0]
        mapping: dict[int, int] = {}
        if fmt == 4:
            segx2 = struct.unpack(">H", sub[6:8])[0]
            segs = segx2 // 2
            ends = np.frombuffer(sub[14:14 + segx2], ">u2")
            starts = np.frombuffer(sub[16 + segx2:16 + 2 * segx2], ">u2")
            deltas = np.frombuffer(sub[16 + 2 * segx2:16 + 3 * segx2], ">u2")
            range_off_pos = 16 + 3 * segx2
            range_offs = np.frombuffer(
                sub[range_off_pos:range_off_pos + segx2], ">u2")
            for s in range(segs):
                for code in range(int(starts[s]), int(ends[s]) + 1):
                    if code == 0xFFFF:
                        continue
                    if range_offs[s] == 0:
                        gid = (code + int(deltas[s])) & 0xFFFF
                    else:
                        idx = (range_off_pos + 2 * s + int(range_offs[s])
                               + 2 * (code - int(starts[s])))
                        gid = struct.unpack(">H", sub[idx:idx + 2])[0]
                        if gid:
                            gid = (gid + int(deltas[s])) & 0xFFFF
                    if gid:
                        mapping[code] = gid
        elif fmt == 12:
            ngroups = struct.unpack(">I", sub[12:16])[0]
            for g in range(ngroups):
                s, e, gid = struct.unpack(">III", sub[16 + 12 * g:28 + 12 * g])
                for code in range(s, e + 1):
                    mapping[code] = gid + (code - s)
        else:
            raise TtfError(f"unsupported cmap format {fmt}")
        return mapping

    def glyph_id(self, ch: str) -> int:
        return self._cmap.get(ord(ch), 0)

    # ------------------------------------------------------------ metrics

    def advance(self, gid: int) -> float:
        """Advance width in font units."""
        hmtx = self._table(b"hmtx")
        if gid < self.num_hmetrics:
            return struct.unpack(">H", hmtx[4 * gid:4 * gid + 2])[0]
        last = self.num_hmetrics - 1
        return struct.unpack(">H", hmtx[4 * last:4 * last + 2])[0]

    # ------------------------------------------------------------ outlines

    def glyph_contours(self, gid: int, _depth: int = 0) -> list[np.ndarray]:
        """Glyph outline -> list of closed polylines (N,2) in font units
        (quadratic Béziers flattened)."""
        if gid >= self.num_glyphs or _depth > 4:
            return []
        start, end = int(self._loca[gid]), int(self._loca[gid + 1])
        if end <= start:
            return []                        # empty glyph (space)
        g = self.data[self._glyf_off + start:self._glyf_off + end]
        ncont = struct.unpack(">h", g[:2])[0]
        if ncont < 0:
            return self._composite(g, _depth)
        end_pts = np.frombuffer(g[10:10 + 2 * ncont], ">u2")
        npts = int(end_pts[-1]) + 1
        pos = 10 + 2 * ncont
        ilen = struct.unpack(">H", g[pos:pos + 2])[0]
        pos += 2 + ilen
        flags = np.zeros(npts, np.uint8)
        i = 0
        while i < npts:
            f = g[pos]
            pos += 1
            flags[i] = f
            i += 1
            if f & 8:                        # repeat
                rep = g[pos]
                pos += 1
                flags[i:i + rep] = f
                i += rep
        xs = np.zeros(npts, np.int32)
        v = 0
        for i in range(npts):
            f = flags[i]
            if f & 2:
                d = g[pos]
                pos += 1
                v += d if f & 16 else -d
            elif not f & 16:
                v += struct.unpack(">h", g[pos:pos + 2])[0]
                pos += 2
            xs[i] = v
        ys = np.zeros(npts, np.int32)
        v = 0
        for i in range(npts):
            f = flags[i]
            if f & 4:
                d = g[pos]
                pos += 1
                v += d if f & 32 else -d
            elif not f & 32:
                v += struct.unpack(">h", g[pos:pos + 2])[0]
                pos += 2
            ys[i] = v
        on = (flags & 1).astype(bool)

        contours = []
        s = 0
        for ce in end_pts:
            ce = int(ce) + 1
            contours.append(self._flatten(xs[s:ce], ys[s:ce], on[s:ce]))
            s = ce
        return [c for c in contours if len(c) >= 3]

    @staticmethod
    def _flatten(xs, ys, on, steps: int = 4) -> np.ndarray:
        """One contour's (x, y, on-curve) points -> closed polyline.
        Implied on-curve midpoints between consecutive off-curve points;
        quadratics sampled at ``steps`` segments."""
        pts = []
        n = len(xs)
        # normalize to start at an on-curve point
        if not on.any():
            # all off-curve: start at implied midpoint
            start = [(xs[0] + xs[-1]) / 2.0, (ys[0] + ys[-1]) / 2.0]
        else:
            k = int(np.argmax(on))
            xs = np.roll(xs, -k)
            ys = np.roll(ys, -k)
            on = np.roll(on, -k)
            start = [float(xs[0]), float(ys[0])]
        pts.append(start)
        i = 1
        cur = start
        t = np.linspace(0.0, 1.0, steps + 1)[1:]
        while i <= n:
            j = i % n
            if on[j] if i < n else True:
                nxt = [float(xs[j]), float(ys[j])] if i < n else start
                pts.append(nxt)
                cur = nxt
                i += 1
            else:
                ctrl = [float(xs[j]), float(ys[j])]
                # following point: on-curve, or implied midpoint
                jj = (j + 1) % n
                if i + 1 <= n and (on[jj] if i + 1 < n else True):
                    nxt = [float(xs[jj]), float(ys[jj])] if i + 1 < n else start
                    skip = 2
                else:
                    nxt = [(xs[j] + xs[jj]) / 2.0, (ys[j] + ys[jj]) / 2.0]
                    skip = 1
                x = ((1 - t) ** 2 * cur[0] + 2 * (1 - t) * t * ctrl[0]
                     + t ** 2 * nxt[0])
                y = ((1 - t) ** 2 * cur[1] + 2 * (1 - t) * t * ctrl[1]
                     + t ** 2 * nxt[1])
                pts.extend(zip(x.tolist(), y.tolist()))
                cur = nxt
                i += skip
        return np.asarray(pts, np.float64)

    def _composite(self, g: bytes, depth: int) -> list[np.ndarray]:
        pos = 10
        out = []
        while True:
            flags, gi = struct.unpack(">HH", g[pos:pos + 4])
            pos += 4
            if flags & 1:                    # words
                a1, a2 = struct.unpack(">hh", g[pos:pos + 4])
                pos += 4
            else:
                a1, a2 = struct.unpack(">bb", g[pos:pos + 2])
                pos += 2
            sx = sy = 1.0
            s01 = s10 = 0.0
            if flags & 8:
                sx = sy = struct.unpack(">h", g[pos:pos + 2])[0] / 16384
                pos += 2
            elif flags & 0x40:
                sx = struct.unpack(">h", g[pos:pos + 2])[0] / 16384
                sy = struct.unpack(">h", g[pos + 2:pos + 4])[0] / 16384
                pos += 4
            elif flags & 0x80:
                sx, s01, s10, sy = [v / 16384 for v in
                                    struct.unpack(">hhhh", g[pos:pos + 8])]
                pos += 8
            dx, dy = (a1, a2) if flags & 2 else (0, 0)
            for c in self.glyph_contours(gi, depth + 1):
                x = c[:, 0] * sx + c[:, 1] * s10 + dx
                y = c[:, 0] * s01 + c[:, 1] * sy + dy
                out.append(np.stack([x, y], axis=1))
            if not flags & 0x20:             # MORE_COMPONENTS
                break
        return out

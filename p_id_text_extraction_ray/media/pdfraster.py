"""Pure-numpy PDF page rasterizer (content-stream subset).

Together with ``media/pdfdoc.py`` this makes the PDF ingestion stage
real: the reference shells out to pdftocairo at 600 DPI
(``PDF_to_image.py:8-91``); this renders each parsed page to the same
grayscale raster the CV path consumes, with no native renderer.

Supported operators: graphics state (q Q cm w g G rg RG k K gs cs CS
sc scn SC SCN), paths (m l c v y h re) with fill (f F f* b b* B B*),
stroke (S s), and no-paint (n); text (BT ET Tf Td TD Tm T* TL Tc Tw Tz
Ts Tj TJ ' ") with embedded TrueType (FontFile2), CFF/Type2
(FontFile3 — ``media/cff.py``), and classic Type1 (FontFile —
``media/type1.py``) fonts, or system TrueType fallback matched by
BaseFont family; a font program that fails to parse degrades to
placement-true metric boxes. XObjects: Form XObjects are
executed recursively; Image XObjects rasterize as their gray mean
(placement-true block). Clipping (W/W*) is tracked as a rectangular
approximation of the clip path's bbox.

Rendering: binary-coverage scanline fill (nonzero or even-odd winding)
on the flattened path in device space; strokes become per-segment
quads. Python loops run per path/row — fine for the ingestion stage's
actor pool (one page per task), not a per-record hot path.
"""

from __future__ import annotations

import struct

import numpy as np

from .cff import CffError, CffFont
from .pdfdoc import Name, PdfDocument, PdfError, parse_object, _skip_ws
from .ttf import TrueTypeFont, TtfError

_SYSTEM_FONTS = {
    "default": "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "bold": "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "mono": "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    "serif": "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
}


def _mat_mul(a, b):
    """2x3 affine compose: apply a, then b (PDF cm order: new = a x b)."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (a0 * b0 + a1 * b2, a0 * b1 + a1 * b3,
            a2 * b0 + a3 * b2, a2 * b1 + a3 * b3,
            a4 * b0 + a5 * b2 + b4, a4 * b1 + a5 * b3 + b5)


def _apply(m, x, y):
    return (m[0] * x + m[2] * y + m[4], m[1] * x + m[3] * y + m[5])


def _fill_polygons(canvas, polys, value, even_odd, clip):
    """Scanline fill of closed device-space polylines with winding."""
    if not polys:
        return
    edges = []
    for p in polys:
        if len(p) < 3:
            continue
        q = np.vstack([p, p[:1]])
        edges.append(np.stack([q[:-1, 0], q[:-1, 1], q[1:, 0], q[1:, 1]],
                              axis=1))
    if not edges:
        return
    e = np.concatenate(edges)
    e = e[e[:, 1] != e[:, 3]]                # drop horizontal edges
    if not len(e):
        return
    h, w = canvas.shape
    y0 = max(int(np.floor(e[:, [1, 3]].min())), clip[1])
    y1 = min(int(np.ceil(e[:, [1, 3]].max())) + 1, clip[3], h)
    x_lo, x_hi = max(0, clip[0]), min(w, clip[2])
    for yr in range(max(0, y0), y1):
        yc = yr + 0.5
        m = (np.minimum(e[:, 1], e[:, 3]) <= yc) & \
            (np.maximum(e[:, 1], e[:, 3]) > yc)
        if not m.any():
            continue
        seg = e[m]
        t = (yc - seg[:, 1]) / (seg[:, 3] - seg[:, 1])
        xs = seg[:, 0] + t * (seg[:, 2] - seg[:, 0])
        if even_odd:
            xs = np.sort(xs)
            for i in range(0, len(xs) - 1, 2):
                a = max(int(np.ceil(xs[i] - 0.5)), x_lo)
                b = min(int(np.ceil(xs[i + 1] - 0.5)), x_hi)
                if b > a:
                    canvas[yr, a:b] = np.minimum(canvas[yr, a:b], value)
        else:
            wind = np.where(seg[:, 3] > seg[:, 1], 1, -1)
            order = np.argsort(xs, kind="stable")
            xs = xs[order]
            acc = np.cumsum(wind[order])
            for i in range(len(xs) - 1):
                if acc[i] != 0:
                    a = max(int(np.ceil(xs[i] - 0.5)), x_lo)
                    b = min(int(np.ceil(xs[i + 1] - 0.5)), x_hi)
                    if b > a:
                        canvas[yr, a:b] = np.minimum(canvas[yr, a:b], value)


def _unwrap_cff(blob: bytes) -> bytes:
    """FontFile3 payload -> bare CFF: OpenType-wrapped CFF (OTTO sfnt,
    Subtype /OpenType) yields its ``CFF `` table; bare CFF passes
    through."""
    if blob[:4] == b"OTTO":
        n = struct.unpack(">H", blob[4:6])[0]
        for i in range(n):
            tag, _chk, off, ln = struct.unpack(
                ">4sIII", blob[12 + 16 * i:28 + 16 * i])
            if tag == b"CFF ":
                return blob[off:off + ln]
        raise CffError("OTTO wrapper without CFF table")
    return blob


class _Font:
    """Resolved PDF font: TrueType, CFF/Type2, or Type1 outlines, with
    a metric-box fallback when the embedded program fails to parse."""

    def __init__(self, doc: PdfDocument, fdict: dict):
        self.widths = None                   # code -> width/1000
        self.first_char = 0
        self.ttf = None
        fdict = doc.resolve(fdict) or {}
        sub = str(fdict.get("Subtype"))
        if sub == "Type0":
            raise PdfError("CID-keyed (Type0) fonts unsupported")
        w = doc.resolve(fdict.get("Widths"))
        if w:
            self.first_char = int(doc.resolve(fdict.get("FirstChar", 0)))
            self.widths = [float(doc.resolve(x)) for x in w]
        desc = doc.resolve(fdict.get("FontDescriptor")) or {}
        ff2 = doc.resolve(desc.get("FontFile2"))
        ff3 = doc.resolve(desc.get("FontFile3"))
        ff1 = doc.resolve(desc.get("FontFile"))
        base = str(fdict.get("BaseFont", ""))
        if isinstance(ff2, tuple):           # embedded TrueType
            try:
                self.ttf = TrueTypeFont(ff2[2])
            except TtfError:
                self.ttf = None              # box fallback
        elif isinstance(ff3, tuple):         # embedded CFF (Type1C /
            try:                             # CIDFontType0C / OpenType)
                self.ttf = CffFont(_unwrap_cff(ff3[2]))
            except (CffError, ValueError, IndexError, struct.error):
                self.ttf = None
        elif isinstance(ff1, tuple):         # classic Type1 (eexec)
            try:
                from .type1 import Type1Font
                self.ttf = Type1Font(ff1[2])
            except Exception:
                self.ttf = None
        else:                                # system TrueType by family
            lowered = base.lower()
            key = "default"
            if "mono" in lowered or "courier" in lowered:
                key = "mono"
            elif "bold" in lowered:
                key = "bold"
            elif "times" in lowered or "serif" in lowered or \
                    "roman" in lowered:
                key = "serif"
            try:
                self.ttf = TrueTypeFont(open(_SYSTEM_FONTS[key],
                                             "rb").read())
            except (OSError, TtfError):
                self.ttf = None

    def advance(self, code: int) -> float:
        """Advance in text-space units (1/1000 em)."""
        if self.widths and 0 <= code - self.first_char < len(self.widths):
            return self.widths[code - self.first_char]
        if self.ttf:
            gid = self.ttf.glyph_id(chr(code))
            return self.ttf.advance(gid) * 1000.0 / self.ttf.units_per_em
        return 500.0

    def contours(self, code: int):
        """Glyph outline in 1/1000-em units, or None for box fallback."""
        if self.ttf is None:
            return None
        gid = self.ttf.glyph_id(chr(code))
        if gid == 0 and code != 32:
            return None
        scale = 1000.0 / self.ttf.units_per_em
        return [c * scale for c in self.ttf.glyph_contours(gid)]


class PageRasterizer:
    def __init__(self, doc: PdfDocument, page: dict, dpi: int):
        self.doc = doc
        self.page = page
        s = dpi / 72.0
        x0, y0, x1, y1 = page["mediabox"]
        self.width = max(1, int(round((x1 - x0) * s)))
        self.height = max(1, int(round((y1 - y0) * s)))
        # device transform: PDF origin bottom-left -> raster top-left
        self.base = (s, 0.0, 0.0, -s, -x0 * s, y1 * s)
        self.canvas = np.full((self.height, self.width), 255, np.uint8)
        self._fonts: dict[int, _Font] = {}

    # ------------------------------------------------------------ helpers

    def _font(self, res: dict, name: str) -> _Font:
        fonts = self.doc.resolve(res.get("Font")) or {}
        fd = fonts.get(name)
        key = id(fd)
        if key not in self._fonts:
            self._fonts[key] = _Font(self.doc, fd)
        return self._fonts[key]

    @staticmethod
    def _gray(components):
        if len(components) == 1:
            g = components[0]
        elif len(components) == 3:
            r, gg, b = components
            g = 0.299 * r + 0.587 * gg + 0.114 * b
        elif len(components) == 4:
            c, m, y, k = components
            g = 1.0 - min(1.0, 0.3 * c + 0.59 * m + 0.11 * y + k)
        else:
            g = 0.0
        return int(np.clip(round(g * 255), 0, 255))

    # --------------------------------------------------------------- run

    def run(self) -> np.ndarray:
        self._exec(self.page["contents"], self.page["resources"],
                   self.base, depth=0)
        return self.canvas

    def _exec(self, content: bytes, res: dict, ctm0, depth: int):
        if depth > 8:
            raise PdfError("form XObject recursion too deep")
        full_clip = (0, 0, self.width, self.height)
        gs = {"ctm": ctm0, "fill": 0, "stroke": 0, "lw": 1.0,
              "clip": full_clip}
        stack: list[dict] = []
        path: list[np.ndarray] = []          # flattened subpaths (PDF space)
        cur: list = []
        start_pt = None
        pend_clip = None
        # text state
        tf: _Font | None = None
        tfs = 1.0
        tm = tlm = (1, 0, 0, 1, 0, 0)
        tl, tc, tw, tz, ts_rise = 0.0, 0.0, 0.0, 100.0, 0.0

        pos = 0
        n = len(content)

        def tokens():
            nonlocal pos
            while True:
                pos = _skip_ws(content, pos)
                if pos >= n:
                    return
                c = content[pos]
                if c in b"/<([" or c == 0x3C or \
                        (chr(c).isdigit() or c in b"+-."):
                    obj, pos2 = parse_object(content, pos)
                    pos = pos2
                    yield obj
                else:
                    end = pos
                    while end < n and content[end] not in b"\x00\t\n\x0c\r " \
                            and content[end] not in b"()<>[]{}/%":
                        end += 1
                    op = content[pos:end].decode("latin-1")
                    pos = end
                    yield ("OP", op)

        def flush_cur():
            nonlocal cur
            if len(cur) >= 2:
                path.append(np.asarray(cur, np.float64))
            cur = []

        def dev_polys():
            m = gs["ctm"]
            out = []
            for p in path:
                x, y = _apply(m, p[:, 0], p[:, 1])
                out.append(np.stack([x, y], axis=1))
            return out

        def do_fill(even_odd):
            _fill_polygons(self.canvas, dev_polys(), gs["fill"], even_odd,
                           gs["clip"])

        def do_stroke():
            m = gs["ctm"]
            scale = float(np.hypot(m[0], m[1]))
            lw_dev = max(1.0, gs["lw"] * scale)
            quads = []
            for p in dev_polys():
                for i in range(len(p) - 1):
                    x0, y0 = p[i]
                    x1, y1 = p[i + 1]
                    dx, dy = x1 - x0, y1 - y0
                    ln = float(np.hypot(dx, dy))
                    if ln == 0:
                        continue
                    ox, oy = -dy / ln * lw_dev / 2, dx / ln * lw_dev / 2
                    quads.append(np.array(
                        [[x0 + ox, y0 + oy], [x1 + ox, y1 + oy],
                         [x1 - ox, y1 - oy], [x0 - ox, y0 - oy]]))
            _fill_polygons(self.canvas, quads, gs["stroke"], False,
                           gs["clip"])

        def apply_pending_clip():
            nonlocal pend_clip
            if pend_clip is None:
                return
            polys = dev_polys()
            if polys:
                allpts = np.concatenate(polys)
                x0 = max(gs["clip"][0], int(np.floor(allpts[:, 0].min())))
                y0 = max(gs["clip"][1], int(np.floor(allpts[:, 1].min())))
                x1 = min(gs["clip"][2], int(np.ceil(allpts[:, 0].max())) + 1)
                y1 = min(gs["clip"][3], int(np.ceil(allpts[:, 1].max())) + 1)
                gs["clip"] = (x0, y0, max(x0, x1), max(y0, y1))
            pend_clip = None

        def show_text(sbytes: bytes):
            nonlocal tm
            if tf is None:
                return
            for code in sbytes:
                w0 = tf.advance(code) / 1000.0
                if code != 32:
                    contours = tf.contours(code)
                    # glyph-space (1/1000 em) -> text space -> device
                    gm = (tfs * tz / 100.0 / 1000.0, 0, 0, tfs / 1000.0,
                          0, ts_rise)
                    m = _mat_mul(_mat_mul(gm, tm), gs["ctm"])
                    if contours is None:
                        box = np.array([[0.0, 0.0], [w0 * 1000, 0.0],
                                        [w0 * 1000, 700.0], [0.0, 700.0]])
                        contours = [box]
                    dev = []
                    for c in contours:
                        x, y = _apply(m, c[:, 0], c[:, 1])
                        dev.append(np.stack([x, y], axis=1))
                    _fill_polygons(self.canvas, dev, gs["fill"], False,
                                   gs["clip"])
                adv = (w0 * tfs + tc + (tw if code == 32 else 0.0)) \
                    * tz / 100.0
                tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)

        operands: list = []
        for tok in tokens():
            if not (isinstance(tok, tuple) and len(tok) == 2
                    and tok[0] == "OP"):
                operands.append(tok)
                continue
            op = tok[1]
            o = operands
            try:
                if op == "q":
                    stack.append(dict(gs))
                elif op == "Q":
                    if stack:
                        gs = stack.pop()
                elif op == "cm":
                    gs["ctm"] = _mat_mul(tuple(float(v) for v in o[-6:]),
                                         gs["ctm"])
                elif op == "w":
                    gs["lw"] = float(o[-1])
                elif op in ("g", "G"):
                    v = self._gray([float(o[-1])])
                    gs["fill" if op == "g" else "stroke"] = v
                elif op in ("rg", "RG"):
                    v = self._gray([float(x) for x in o[-3:]])
                    gs["fill" if op == "rg" else "stroke"] = v
                elif op in ("k", "K"):
                    v = self._gray([float(x) for x in o[-4:]])
                    gs["fill" if op == "k" else "stroke"] = v
                elif op in ("sc", "scn", "SC", "SCN"):
                    nums = [float(x) for x in o if isinstance(x, (int, float))]
                    if nums:
                        v = self._gray(nums)
                        gs["fill" if op.islower() else "stroke"] = v
                elif op == "m":
                    flush_cur()
                    cur = [[float(o[-2]), float(o[-1])]]
                    start_pt = cur[0]
                elif op == "l":
                    cur.append([float(o[-2]), float(o[-1])])
                elif op in ("c", "v", "y"):
                    if cur:
                        p0 = cur[-1]
                        if op == "c":
                            c1 = [float(o[-6]), float(o[-5])]
                            c2 = [float(o[-4]), float(o[-3])]
                        elif op == "v":
                            c1 = p0
                            c2 = [float(o[-4]), float(o[-3])]
                        else:
                            c1 = [float(o[-4]), float(o[-3])]
                            c2 = None
                        p3 = [float(o[-2]), float(o[-1])]
                        if c2 is None:
                            c2 = p3
                        t = np.linspace(0, 1, 9)[1:]
                        x = ((1 - t) ** 3 * p0[0] + 3 * (1 - t) ** 2 * t * c1[0]
                             + 3 * (1 - t) * t ** 2 * c2[0] + t ** 3 * p3[0])
                        y = ((1 - t) ** 3 * p0[1] + 3 * (1 - t) ** 2 * t * c1[1]
                             + 3 * (1 - t) * t ** 2 * c2[1] + t ** 3 * p3[1])
                        cur.extend(np.stack([x, y], axis=1).tolist())
                elif op == "h":
                    if cur and start_pt is not None:
                        cur.append(list(start_pt))
                elif op == "re":
                    flush_cur()
                    x, y, rw, rh = [float(v) for v in o[-4:]]
                    path.append(np.array(
                        [[x, y], [x + rw, y], [x + rw, y + rh], [x, y + rh],
                         [x, y]]))
                elif op in ("f", "F", "f*"):
                    flush_cur()
                    do_fill(op == "f*")
                    apply_pending_clip()
                    path = []
                elif op in ("B", "B*", "b", "b*"):
                    if op in ("b", "b*") and cur and start_pt is not None:
                        cur.append(list(start_pt))
                    flush_cur()
                    do_fill(op in ("B*", "b*"))
                    do_stroke()
                    apply_pending_clip()
                    path = []
                elif op in ("S", "s"):
                    if op == "s" and cur and start_pt is not None:
                        cur.append(list(start_pt))
                    flush_cur()
                    do_stroke()
                    apply_pending_clip()
                    path = []
                elif op == "n":
                    flush_cur()
                    apply_pending_clip()
                    path = []
                elif op in ("W", "W*"):
                    pend_clip = op
                # ------------------------------------------------- text
                elif op == "BT":
                    tm = tlm = (1, 0, 0, 1, 0, 0)
                elif op == "ET":
                    pass
                elif op == "Tf":
                    tf = self._font(res, str(o[-2]))
                    tfs = float(o[-1])
                elif op == "Td":
                    tlm = _mat_mul((1, 0, 0, 1, float(o[-2]), float(o[-1])),
                                   tlm)
                    tm = tlm
                elif op == "TD":
                    tl = -float(o[-1])
                    tlm = _mat_mul((1, 0, 0, 1, float(o[-2]), float(o[-1])),
                                   tlm)
                    tm = tlm
                elif op == "Tm":
                    tm = tlm = tuple(float(v) for v in o[-6:])
                elif op == "T*":
                    tlm = _mat_mul((1, 0, 0, 1, 0, -tl), tlm)
                    tm = tlm
                elif op == "TL":
                    tl = float(o[-1])
                elif op == "Tc":
                    tc = float(o[-1])
                elif op == "Tw":
                    tw = float(o[-1])
                elif op == "Tz":
                    tz = float(o[-1])
                elif op == "Ts":
                    ts_rise = float(o[-1])
                elif op == "Tj":
                    show_text(o[-1] if isinstance(o[-1], bytes) else b"")
                elif op == "'":
                    tlm = _mat_mul((1, 0, 0, 1, 0, -tl), tlm)
                    tm = tlm
                    show_text(o[-1] if isinstance(o[-1], bytes) else b"")
                elif op == '"':
                    tw = float(o[-3])
                    tc = float(o[-2])
                    tlm = _mat_mul((1, 0, 0, 1, 0, -tl), tlm)
                    tm = tlm
                    show_text(o[-1] if isinstance(o[-1], bytes) else b"")
                elif op == "TJ":
                    for item in (o[-1] or []):
                        if isinstance(item, bytes):
                            show_text(item)
                        else:
                            adv = -float(item) / 1000.0 * tfs * tz / 100.0
                            tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)
                # --------------------------------------------- xobjects
                elif op == "Do":
                    xobjs = self.doc.resolve(res.get("XObject")) or {}
                    xo = self.doc.resolve(xobjs.get(str(o[-1])))
                    if isinstance(xo, tuple):
                        xd = xo[1]
                        sub = str(xd.get("Subtype"))
                        if sub == "Form":
                            inner = dict(gs)
                            mtx = [float(self.doc.resolve(v)) for v in
                                   self.doc.resolve(xd.get("Matrix",
                                                    [1, 0, 0, 1, 0, 0]))]
                            save_gs = gs
                            gs = inner
                            gs["ctm"] = _mat_mul(tuple(mtx), gs["ctm"])
                            xres = self.doc.resolve(xd.get("Resources", res))
                            self._exec(xo[2], xres or res, gs["ctm"],
                                       depth + 1)
                            gs = save_gs
                        elif sub == "Image":
                            # placement-true gray block (unit square)
                            sq = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
                            x, y = _apply(gs["ctm"], sq[:, 0], sq[:, 1])
                            _fill_polygons(self.canvas,
                                           [np.stack([x, y], axis=1)],
                                           128, False, gs["clip"])
                elif op == "BI":
                    # inline image: skip the binary payload to EI
                    ei = content.find(b"EI", pos)
                    pos = len(content) if ei < 0 else ei + 2
                # gs/cs/CS/BDC/EMC/MP/DP/ri/i/j/J/M/d: no visual effect here
            except (IndexError, ValueError, KeyError):
                pass                          # tolerate malformed operand runs
            operands = []


def render_pdf_pages(pdf_bytes: bytes, dpi: int = 150) -> list[np.ndarray]:
    """PDF bytes -> list of uint8 grayscale page rasters. The real
    ``rasterize`` hook for ``sources/pdf.PdfIngestStage``."""
    doc = PdfDocument(pdf_bytes)
    return [PageRasterizer(doc, page, dpi).run() for page in doc.pages()]

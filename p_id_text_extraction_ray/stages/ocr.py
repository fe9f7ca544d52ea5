"""Template-matching recognizer: real OCR for rendered glyph shapes.

``StubRecognizer`` reads the fixtures' value-coded pixels; this actor
reads ACTUAL glyph shapes — the text on pages produced by the engine's
PDF rasterizer (``media/pdfraster.py``) or any other binarizable
render. Classical template matching: glyph templates are rasterized
once per actor from a TrueType font (``media/ttf.py``), a crop is
binarized and segmented into glyphs at ink-free columns, and each
segment is scored by bitmap IoU against every template at the
segment's aspect class. On clean vector renders this resolves the
P&ID tag charset (A-Z 0-9 - . /) essentially exactly; it is the
engine's stand-in for TrOCR/EasyOCR (``text_recognition.py:37-51``)
that needs no ML runtime, behind the same actor interface + fallback
chain (rotate clockwise when orientation==90, re-recognize).
"""

from __future__ import annotations

import numpy as np

from ..config import ExtractConfig
from ..functions.rectdetect import detect_rects_words
from .cv import PixelDetector, StubRecognizer

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-./"
_T = 24                                      # template cell (pixels)


def _render_glyph(font, ch: str, size: int = 64):
    """(tight binary bitmap, bbox y-range in font units) of one glyph
    at ``size`` px per em. The y-range is relative to the BASELINE, so
    callers can distinguish marks by vertical position ('.' sits on the
    baseline, '-' floats mid-x-height, 'J' descends)."""
    from ..media.pdfraster import _fill_polygons

    gid = font.glyph_id(ch)
    contours = font.glyph_contours(gid)
    if not contours:
        return None, (0.0, 0.0)
    scale = size / font.units_per_em
    pts = np.concatenate(contours)
    fy0, fy1 = float(pts[:, 1].min()), float(pts[:, 1].max())
    x0, y0 = pts.min(axis=0) * scale
    x1, y1 = pts.max(axis=0) * scale
    w = max(1, int(np.ceil(x1 - x0)) + 2)
    h = max(1, int(np.ceil(y1 - y0)) + 2)
    canvas = np.full((h, w), 255, np.uint8)
    polys = []
    for c in contours:
        x = c[:, 0] * scale - x0 + 1
        y = (y1 - c[:, 1] * scale) + 1       # flip to raster rows
        polys.append(np.stack([x, y], axis=1))
    _fill_polygons(canvas, polys, 0, False, (0, 0, w, h))
    ink = canvas < 128
    rows = np.nonzero(ink.any(axis=1))[0]
    cols = np.nonzero(ink.any(axis=0))[0]
    if not len(rows):
        return None, (0.0, 0.0)
    return ink[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1], (fy0, fy1)


def _resize_mask(m: np.ndarray, h: int, w: int) -> np.ndarray:
    yi = (np.arange(h) * m.shape[0] // h).clip(0, m.shape[0] - 1)
    xi = (np.arange(w) * m.shape[1] // w).clip(0, m.shape[1] - 1)
    return m[yi][:, xi]


def _otsu(crop: np.ndarray) -> int:
    """Otsu threshold (clamped to [60, 200]) — adapts binarization to
    anti-aliased / low-contrast renders where the fixed 128 cut loses
    stroke cores or floods glyph counters."""
    hist = np.bincount(crop.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    w0 = np.cumsum(hist)
    m = np.cumsum(hist * np.arange(256))
    w1 = total - w0
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = m / w0
        mu1 = (m[-1] - m) / w1
        var = w0 * w1 * (mu0 - mu1) ** 2
    var[~np.isfinite(var)] = 0.0
    return int(np.clip(np.argmax(var), 60, 200))


def _despeckle(ink: np.ndarray) -> np.ndarray:
    """Drop connected components far smaller than the largest one
    (salt noise on photographed/scanned sheets segments as phantom
    glyphs otherwise). Run-based union-find, one pass."""
    if not ink.any():
        return ink
    parent: list[int] = []
    area: list[int] = []
    comp_runs: list[list[tuple[int, int, int]]] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    prev: list[tuple[int, int, int]] = []
    prev_row = -2
    for r in np.flatnonzero(ink.any(axis=1)).tolist():
        if r != prev_row + 1:
            prev = []
        prev_row = r
        d = np.diff(np.concatenate(([0], ink[r].view(np.int8), [0])))
        starts = np.flatnonzero(d == 1).tolist()
        ends = np.flatnonzero(d == -1).tolist()
        cur: list[tuple[int, int, int]] = []
        for s, e in zip(starts, ends):
            cid = -1
            for ps, pe, pid in prev:
                if ps < e and s < pe:
                    rid = find(pid)
                    if cid < 0:
                        cid = rid
                    elif rid != cid:
                        if rid < cid:
                            cid, rid = rid, cid
                        parent[rid] = cid
                        area[cid] += area[rid]
                        comp_runs[cid].extend(comp_runs[rid])
                        comp_runs[rid] = []
            if cid < 0:
                cid = len(parent)
                parent.append(cid)
                area.append(0)
                comp_runs.append([])
            area[cid] += e - s
            comp_runs[cid].append((r, s, e))
            cur.append((s, e, cid))
        prev = cur
    roots = {find(i) for i in range(len(parent))}
    amax = max(area[r] for r in roots)
    min_area = max(4.0, 0.02 * amax)
    out = np.zeros_like(ink)
    for r in roots:
        if area[r] >= min_area:
            for row, s, e in comp_runs[r]:
                out[row, s:e] = True
    return out if out.any() else ink


def _deskew(ink: np.ndarray, max_deg: float = 3.0) -> np.ndarray:
    """Correct a small line skew (the photographed-sheet regime) by a
    vertical column shear that maximizes the row-projection energy —
    equivalent to rotation for the +-3 degree range and exact on row
    alignment, which is what the baseline/cap estimates consume."""
    h, w = ink.shape
    if h < 4 or w < 8:
        return ink
    cols = np.arange(w) - (w - 1) / 2.0
    rows_idx = np.nonzero(ink)
    if len(rows_idx[0]) == 0:
        return ink
    best_s, best_shift = -1.0, None
    for deg in np.arange(-max_deg, max_deg + 0.25, 0.5):
        shift = np.round(cols * np.tan(np.deg2rad(deg))).astype(np.int64)
        span = int(shift.max() - shift.min())
        prof = np.zeros(h + span + 1, np.int64)
        y = rows_idx[0] + (shift - shift.min())[rows_idx[1]]
        np.add.at(prof, y, 1)
        s = float((prof.astype(np.float64) ** 2).sum())
        if s > best_s:
            best_s, best_shift = s, (deg, shift)
    deg, _shift = best_shift
    if abs(deg) < 0.5:
        return ink
    # correct with a TRUE rotation (a bare column shear fixes the
    # baseline but shears every glyph, trading 5<->S style confusions)
    th = np.deg2rad(deg)
    pad = int(np.ceil(abs(np.tan(th)) * max(h, w))) + 1
    hh, ww = h + 2 * pad, w + 2 * pad
    cy, cx = (hh - 1) / 2.0, (ww - 1) / 2.0
    yy, xx = np.nonzero(ink)
    # forward-map ink pixels through the inverse skew
    xs = np.cos(th) * (xx + pad - cx) - np.sin(th) * (yy + pad - cy) + cx
    ys = np.sin(th) * (xx + pad - cx) + np.cos(th) * (yy + pad - cy) + cy
    out = np.zeros((hh, ww), bool)
    xi = np.clip(np.round(xs).astype(np.int64), 0, ww - 1)
    yi = np.clip(np.round(ys).astype(np.int64), 0, hh - 1)
    out[yi, xi] = True
    # forward splat leaves pinholes; close them with a 1px dilate-AND
    filled = out.copy()
    filled[1:] |= out[:-1]
    filled[:-1] |= out[1:]
    filled[:, 1:] |= out[:, :-1]
    filled[:, :-1] |= out[:, 1:]
    hole = ~out & filled
    # a hole pixel surrounded left+right or up+down by ink is interior
    interior = np.zeros_like(out)
    interior[:, 1:-1] = out[:, :-2] & out[:, 2:]
    interior[1:-1] |= out[:-2] & out[2:]
    out |= hole & interior
    r = np.nonzero(out.any(axis=1))[0]
    c = np.nonzero(out.any(axis=0))[0]
    return out[r[0]:r[-1] + 1, c[0]:c[-1] + 1]


class WordDetector(PixelDetector):
    """Detection actor for glyph-shaped ink: the word-granularity kernel
    (``rectdetect.detect_rects_words``) replaces the exact-rectangle
    fixture kernel, emitting the word boxes CRAFT would — per-glyph
    boxes are taller than wide, which the reference's orientation+
    alignment connection rules (grouping_logic.py:324-436) read as
    vertical text and refuse to chain horizontally.

    The seven reference detect thresholds (``config.DetectionConfig``,
    from ``configs/base.yaml:33-41``) parameterize the kernel per actor:
    hysteresis ink cuts from ``text_threshold``/``low_text``, the
    glyph-linking dilation radius from ``link_threshold``
    (``round(80 * (1 - link))`` px — the shipped 0.9 default reproduces
    the tuned 8 px radius), and the EasyOCR-style same-line merge from
    ``height_ths``/``width_ths``/``slope_ths``/``ycenter_ths``."""

    def __init__(self, cfg: ExtractConfig | None = None):
        super().__init__(cfg)
        det = self.cfg.detection
        dilate = max(1, round(80 * (1 - det.link_threshold)))
        strong_max = int(round(255 * (1 - det.text_threshold)))
        weak_max = int(round(255 * (1 - det.low_text)))
        self._kernel = lambda img: detect_rects_words(
            img, dilate=dilate, strong_max=strong_max, weak_max=weak_max,
            height_ths=det.height_ths, width_ths=det.width_ths,
            slope_ths=det.slope_ths, ycenter_ths=det.ycenter_ths)


class TemplateRecognizer(StubRecognizer):
    """Drop-in for ``StubRecognizer`` (same ctor/actor/batch contract,
    same fallback chain) recognizing rendered glyph shapes."""

    INK_THRESHOLD = 128

    def __init__(self, cfg: ExtractConfig | None = None, counter=None,
                 font_path: str = DEJAVU):
        super().__init__(cfg, counter)
        from ..media.ttf import TrueTypeFont

        font = TrueTypeFont(open(font_path, "rb").read())
        raw = []
        cap = None
        for ch in CHARSET:
            bmp, (fy0, fy1) = _render_glyph(font, ch)
            if bmp is None:
                continue
            if ch == "0":
                cap = (fy0, fy1)
            raw.append((ch, bmp, fy0, fy1))
        if cap is None:
            cap = (0.0, max(r[3] for r in raw))
        cap_span = cap[1] - cap[0]
        # (char, TxT mask, rel height, rel top/bottom above baseline)
        self._templates = [
            (ch, _resize_mask(bmp, _T, _T), (fy1 - fy0) / cap_span,
             fy1 / cap_span, fy0 / cap_span)
            for ch, bmp, fy0, fy1 in raw]

    # --- recognition ---------------------------------------------------

    def _read(self, crop: np.ndarray) -> tuple[str, float]:
        """Best reading across binarization levels: the Otsu cut first;
        if the match is borderline (blurred downsampled strokes close
        glyph counters — 8 reads as B), retry at a tighter and a looser
        cut and keep the most confident reading.

        Two scanned-sheet preprocessing steps (VERDICT r4 item 5):
        min-max contrast stretch (a pure range expansion — identity on
        full-range crops — so low-contrast scans put their two modes
        where Otsu's clamp expects them), then polarity auto-detect
        (ink must be the minority class; a light-on-dark blueprint
        render binarizes to >50% 'ink', so invert and re-threshold)."""
        lo, hi = int(crop.min()), int(crop.max())
        if 0 < hi - lo < 250:
            crop = ((crop.astype(np.float64) - lo) * (255.0 / (hi - lo))) \
                .astype(np.uint8)
        if np.median(crop) < 128:            # blueprint polarity: the
            # median pixel is the background; ink is the minority class
            crop = (255 - crop.astype(np.int16)).astype(np.uint8)
        otsu_t = _otsu(crop)
        base = min(self.INK_THRESHOLD, otsu_t)
        text, conf = self._read_at(crop, base)
        if conf < 0.85:
            # noise tails can defeat the min-max stretch, leaving the true
            # ink mode above the INK_THRESHOLD cap — the uncapped Otsu cut
            # joins the retry candidates
            cands = [int(base * 0.8), int(base * 1.2)]
            if otsu_t > base:
                cands.append(otsu_t)
            for t2 in cands:
                tx2, c2 = self._read_at(crop, t2)
                if c2 > conf:
                    text, conf = tx2, c2
        return text, conf

    def _read_at(self, crop: np.ndarray,
                 threshold: int) -> tuple[str, float]:
        ink = crop < threshold
        if not ink.any():
            ink = crop < self.INK_THRESHOLD  # threshold overshot on flats
        if not ink.any():
            return "", 0.0
        ink = _deskew(_despeckle(ink))
        rows = np.nonzero(ink.any(axis=1))[0]
        cols = np.nonzero(ink.any(axis=0))[0]
        ink = ink[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1]
        line_h = ink.shape[0]
        # segment at ink-free columns
        col_has = ink.any(axis=0)
        segs = []
        start = None
        for x, has in enumerate(col_has.tolist() + [False]):
            if has and start is None:
                start = x
            elif not has and start is not None:
                segs.append((start, x))
                start = None
        # per-segment tight vertical extents
        exts = []
        for a, b in segs:
            seg = ink[:, a:b]
            srows = np.nonzero(seg.any(axis=1))[0]
            exts.append((int(srows[0]), int(srows[-1]) + 1))
        # baseline = typical segment bottom; cap top = typical top of
        # baseline-sitting segments (most of the charset is cap-height
        # on the baseline, so medians are robust)
        bottoms = np.array([e[1] for e in exts], dtype=np.float64)
        baseline = float(np.median(bottoms))
        on_base = [e for e in exts if abs(e[1] - baseline) <= 0.15 * line_h]
        cap_top = float(np.median([e[0] for e in on_base])) if on_base \
            else 0.0
        cap_px = max(1.0, baseline - cap_top)

        text = []
        scores = []
        prev_end = None
        for (a, b), (t0, t1) in zip(segs, exts):
            if prev_end is not None and (a - prev_end) > 0.45 * cap_px:
                text.append(" ")             # word gap inside a merged box
            prev_end = b
            seg = ink[t0:t1, a:b]
            # vertical position in cap units above the baseline
            s_top = (baseline - t0) / cap_px
            s_bot = (baseline - t1) / cap_px
            norm = _resize_mask(seg, _T, _T)

            def score_against(require_pos: bool):
                best, best_score = "?", 0.0
                for ch, tmpl, _t_rel, t_top, t_bot in self._templates:
                    if require_pos and (abs(t_top - s_top) > 0.25
                                        or abs(t_bot - s_bot) > 0.25):
                        continue
                    inter = (norm & tmpl).sum()
                    union = (norm | tmpl).sum()
                    s = inter / union if union else 0.0
                    if s > best_score:
                        best, best_score = ch, s
                return best, best_score

            best, best_score = score_against(True)
            if best == "?":
                best, best_score = score_against(False)
            text.append(best)
            scores.append(best_score)
        conf = float(np.mean(scores)) if scores else 0.0
        return "".join(text), conf

    # StubRecognizer.__call__ drives these:
    def _primary(self, crop: np.ndarray) -> tuple[str, float]:
        text, conf = self._read(crop)
        # horizontal reads of vertical text score poorly -> gate routes
        # to the rotation fallback, like low-confidence TrOCR
        return text, conf

    def _fallback(self, crop: np.ndarray, rot: int) -> tuple[str, float]:
        if rot == 90:
            crop = np.rot90(crop, k=-1)      # clockwise, reference behavior
        return self._read(crop)

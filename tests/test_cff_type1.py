"""CFF/Type2 and Type1 font readers + their PDF rasterizer wiring.

No font tooling exists in the sandbox, so CFF blobs are compiled by
``tests/cffbuild.py`` and the Type1 path is exercised against the real
Nimbus/CMR Type1 programs embedded in the system's
shared-mime-info-spec.pdf (classic FontFile eexec fonts). Closes the
round-3 gap where both formats degraded to metric boxes
(reference renders them via pdftocairo, ``PDF_to_image.py:8-91``).
"""

import os
import zlib

import numpy as np
import pytest

from p_id_text_extraction_ray.media.cff import CffError, CffFont
from p_id_text_extraction_ray.media.pdfdoc import PdfDocument
from p_id_text_extraction_ray.media.pdfraster import (_unwrap_cff,
                                                      render_pdf_pages)
from p_id_text_extraction_ray.media.ttf import TrueTypeFont

from cffbuild import build_cff, charstring, polyline_charstring

MIME_PDF = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

NOTDEF = charstring([("endchar",)])


# --------------------------------------------------------------- CFF core


def test_cff_square_glyph_exact_outline():
    sq = charstring([
        (600, 50, 0, "rmoveto"),
        (600, "hlineto"), (700, "vlineto"), (-600, "hlineto"),
        ("endchar",),
    ])
    f = CffFont(build_cff([(".notdef", NOTDEF), ("A", sq)]))
    gid = f.glyph_id("A")
    assert gid == 1
    assert f.advance(gid) == 600.0
    (c,) = f.glyph_contours(gid)
    assert c.tolist() == [[50, 0], [650, 0], [650, 700], [50, 700]]


def test_cff_curve_operators_match_manual_bezier():
    """rrcurveto endpoints land exactly; flattening is the same 6-step
    sampling as the TTF path."""
    blob = charstring([
        (500, 100, 100, "rmoveto"),
        (0, 200, 100, 300, 300, 300, "rrcurveto"),
        (200, 0, 300, -100, 300, -300, "rrcurveto"),
        (-100, -200, -500, -200, -600, 0, "rrcurveto"),
        ("endchar",),
    ])
    f = CffFont(build_cff([(".notdef", NOTDEF), ("B", blob)]))
    (c,) = f.glyph_contours(f.glyph_id("B"))
    # curve endpoints appear exactly (every 6th sample)
    for pt in ([100, 100], [500, 900], [1300, 500]):
        assert any(np.allclose(row, pt) for row in c)
    assert len(c) == 1 + 3 * 6              # start + 3 curves x 6 samples


def test_cff_hv_vh_vv_hh_and_lineto_families():
    g = charstring([
        (400, 0, 0, "rmoveto"),
        (100, 50, "rlineto"),
        (60, "hlineto"), (40, "vlineto"),
        (10, 20, 30, 40, "vvcurveto"),       # even form: dya dxb dyb dyc
        (5, 6, 7, 8, "hhcurveto"),
        (10, 10, 10, 10, "hvcurveto"),
        (10, 10, 10, 10, "vhcurveto"),
        ("endchar",),
    ])
    f = CffFont(build_cff([(".notdef", NOTDEF), ("C", g)]))
    (c,) = f.glyph_contours(f.glyph_id("C"))
    # spot-check the accumulated endpoint chain
    assert c[0].tolist() == [0, 0]
    assert c[1].tolist() == [100, 50]        # rlineto
    assert c[2].tolist() == [160, 50]        # hlineto
    assert c[3].tolist() == [160, 90]        # vlineto
    end_vv = c[3 + 6]
    assert end_vv.tolist() == [180.0, 170.0]  # x+=dxb, y+=dya+dyb+dyc


def test_cff_local_subrs_with_bias():
    # subr draws a 100x100 box leg; charstring calls it (bias 107)
    sub = charstring([(100, "hlineto"), (100, "vlineto"),
                      (-100, "hlineto"), ("return",)])
    g = charstring([(300, 10, 10, "rmoveto"),
                    (-107, "callsubr"),      # index 0
                    ("endchar",)])
    f = CffFont(build_cff([(".notdef", NOTDEF), ("D", g)],
                          local_subrs=[sub]))
    (c,) = f.glyph_contours(f.glyph_id("D"))
    assert c.tolist() == [[10, 10], [110, 10], [110, 110], [10, 110]]


def test_cff_hintmask_skips_mask_bytes_and_width():
    g = charstring([
        (420, 20, 30, 40, 50, "hstem"),      # width 420 + 2 stems
        (60, 70, "vstemhm"),                 # 1 more stem
        ("hintmask", ), ("endchar",),
    ])
    # hintmask data byte: charstring() writes the op; append mask manually
    raw = charstring([
        (420, 20, 30, 40, 50, "hstem"),
        (60, 70, "vstemhm"),
    ]) + b"\x13\xe0" + charstring([(5, 5, "rmoveto"),
                                   (10, "hlineto"), (10, "vlineto"),
                                   (-10, "hlineto"), ("endchar",)])
    f = CffFont(build_cff([(".notdef", NOTDEF), ("E", raw)]))
    gid = f.glyph_id("E")
    assert f.advance(gid) == 420.0
    (c,) = f.glyph_contours(gid)
    assert c.tolist() == [[5, 5], [15, 5], [15, 15], [5, 15]]
    assert g  # silence unused


def test_cff_width_default_and_leading_arg():
    g_def = charstring([(10, 10, "rmoveto"), (9, "hlineto"),
                        (9, "vlineto"), (-9, "hlineto"), ("endchar",)])
    g_w = charstring([(777, 10, 10, "rmoveto"), (9, "hlineto"),
                      (9, "vlineto"), (-9, "hlineto"), ("endchar",)])
    f = CffFont(build_cff([(".notdef", NOTDEF), ("F", g_def), ("G", g_w)],
                          default_width=333, nominal_width=100))
    assert f.advance(f.glyph_id("F")) == 333.0
    assert f.advance(f.glyph_id("G")) == 877.0    # nominal 100 + 777


def test_cff_flex_draws_two_curves():
    raw = charstring([
        (500, 0, 0, "rmoveto"),
        (10, 20, 30, 40, 50, 0, 50, -40, 30, -20, 10, 0, 50, "flex"),
        ("endchar",),
    ])
    f = CffFont(build_cff([(".notdef", NOTDEF), ("H", raw)]))
    (c,) = f.glyph_contours(f.glyph_id("H"))
    assert len(c) == 1 + 12                   # two cubics x 6 samples
    assert np.allclose(c[-1], [180.0, 0.0])   # sum of the dx chain


def test_cff_rejects_garbage():
    with pytest.raises(CffError):
        CffFont(b"\x02\x00\x04\x02 garbage")
    with pytest.raises(CffError):
        CffFont(b"OTTO not a font")


def test_unwrap_cff_otto():
    cff = build_cff([(".notdef", NOTDEF)])
    import struct
    hdr = b"OTTO" + struct.pack(">HHHH", 1, 0, 0, 0)
    rec = struct.pack(">4sIII", b"CFF ", 0, 28, len(cff))
    assert _unwrap_cff(hdr + rec + cff) == cff
    assert _unwrap_cff(cff) == cff


# ---------------------------------------------------- TTF parity bitmap


def _render_glyph(contours, size=64, upem=2048):
    """Scanline-fill contours (font units) onto a size x size bitmap."""
    img = np.zeros((size, size), bool)
    if not contours:
        return img
    s = size / upem
    ys = np.arange(size) + 0.5
    for yi, yv in enumerate(ys):
        xs = []
        for c in contours:
            p = np.asarray(c) * s
            p[:, 1] = size - p[:, 1]         # flip
            x0, y0 = p[:, 0], p[:, 1]
            x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
            hit = (y0 <= yv) != (y1 <= yv)
            if hit.any():
                t = (yv - y0[hit]) / (y1[hit] - y0[hit])
                xs.extend((x0[hit] + t * (x1[hit] - x0[hit])).tolist())
        xs.sort()
        for a, b in zip(xs[::2], xs[1::2]):
            img[yi, max(0, int(a)):min(size, int(b) + 1)] = True
    return img


@pytest.mark.parametrize("ch", ["R", "g", "8", "&"])
def test_cff_renders_dejavu_glyphs_like_ttf(ch):
    """Re-encode a real TTF glyph's flattened outline as a Type2
    charstring; the CFF reader must reproduce the same bitmap."""
    from p_id_text_extraction_ray.media.cff import _UNI_TO_NAME
    ttf = TrueTypeFont(open(DEJAVU, "rb").read())
    gid = ttf.glyph_id(ch)
    contours = ttf.glyph_contours(gid)
    cs = polyline_charstring([c.tolist() for c in contours],
                             ttf.advance(gid))
    f = CffFont(build_cff([(".notdef", NOTDEF),
                           (_UNI_TO_NAME[ord(ch)], cs)],
                          units_per_em=ttf.units_per_em))
    got = f.glyph_contours(f.glyph_id(ch))
    a = _render_glyph(contours, upem=ttf.units_per_em)
    b = _render_glyph([g.tolist() for g in got], upem=ttf.units_per_em)
    inter = (a & b).sum()
    union = (a | b).sum()
    assert union > 50
    assert inter / union > 0.98
    assert f.advance(f.glyph_id(ch)) == ttf.advance(gid)


# ------------------------------------------------------------- Type1 real


def _mime_fonts():
    if not os.path.exists(MIME_PDF):
        pytest.skip("system PDF not present")
    doc = PdfDocument(open(MIME_PDF, "rb").read())
    out = {}
    for pg in doc.pages():
        res = doc.resolve(pg.get("resources") or pg.get("Resources") or {})
        for fd in (doc.resolve(res.get("Font")) or {}).values():
            f = doc.resolve(fd)
            base = str(f.get("BaseFont"))
            desc = doc.resolve(f.get("FontDescriptor")) or {}
            ff = doc.resolve(desc.get("FontFile"))
            if base not in out and isinstance(ff, tuple):
                out[base] = ff[2]
    return out


def test_type1_parses_all_real_embedded_fonts():
    from p_id_text_extraction_ray.media.type1 import Type1Font
    fonts = _mime_fonts()
    assert len(fonts) >= 5
    parsed = 0
    for base, blob in fonts.items():
        t1 = Type1Font(blob)
        assert t1.charstrings
        parsed += 1
        # a lowercase 'e' (present in the text faces) has the classic
        # two contours (outline + counter) and the Nimbus advance
        gid = t1.glyph_id("e")
        if gid:
            cs = t1.glyph_contours(gid)
            assert len(cs) == 2
            assert t1.advance(gid) in (444.0, 556.0, 600.0)
            allp = np.vstack(cs)
            assert allp[:, 1].max() < 800 and allp[:, 1].min() > -100
    assert parsed == len(fonts)


def test_type1_real_pdf_page_renders_text_lines():
    """End-to-end: the system PDF (pure Type1 fonts) rasterizes to
    distinct text-line bands with glyph-shaped (not box) ink."""
    page = render_pdf_pages(open(MIME_PDF, "rb").read(), dpi=72)[0]
    ink = page < 200
    assert 0.01 < ink.mean() < 0.15          # glyphs, not solid boxes
    rows = np.nonzero(ink.any(axis=1))[0]
    bands = int(np.sum(np.diff(rows) > 3) + 1)
    assert bands >= 10                       # title + toc lines
    # box-fallback would fill line rectangles near-solid; real glyphs
    # leave intra-line gaps: per-inked-row fill stays moderate
    row_fill = ink[rows].mean(axis=1)
    assert np.median(row_fill) < 0.25


# --------------------------------------------------- PDF wiring for CFF


def test_pdf_fontfile3_renders_glyphs(tmp_path):
    """A PDF embedding our built CFF as FontFile3 /Type1C rasterizes
    the glyph outline (square), not a metric box of the advance."""
    sq = charstring([
        (1000, 100, 100, "rmoveto"),
        (800, "hlineto"), (800, "vlineto"), (-800, "hlineto"),
        ("endchar",),
    ])
    cff = build_cff([(".notdef", NOTDEF), ("X", sq)])

    objs = {}

    def add(body):
        n = len(objs) + 1
        objs[n] = body
        return n

    ff = add(b"<< /Length " + str(len(cff)).encode() +
             b" /Subtype /Type1C >>\nstream\n" + cff + b"\nendstream")
    fd = add((f"<< /Type /FontDescriptor /FontName /TestCFF /Flags 32 "
              f"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 900 "
              f"/Descent -100 /CapHeight 900 /StemV 80 "
              f"/FontFile3 {ff} 0 R >>").encode())
    fnt = add((f"<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF "
               f"/FirstChar 88 /LastChar 88 /Widths [1000] "
               f"/FontDescriptor {fd} 0 R >>").encode())
    content = b"BT /F1 100 Tf 50 50 Td (X) Tj ET\n"
    cz = zlib.compress(content)
    cn = add(b"<< /Length " + str(len(cz)).encode() +
             b" /Filter /FlateDecode >>\nstream\n" + cz + b"\nendstream")
    pg = add((f"<< /Type /Page /Parent 6 0 R /MediaBox [0 0 200 200] "
              f"/Resources << /Font << /F1 {fnt} 0 R >> >> "
              f"/Contents {cn} 0 R >>").encode())
    pgs = add(f"<< /Type /Pages /Kids [{pg} 0 R] /Count 1 >>".encode())
    cat = add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())

    out = b"%PDF-1.4\n"
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for n in sorted(objs):
        out += f"{offsets[n]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root {cat} 0 R >>\n"
            f"startxref\n{xref}\n%%EOF").encode()

    page = render_pdf_pages(out, dpi=72)[0]
    ink = page < 128
    # glyph square: em 100pt at (50,50), square covers 10..90 of the em
    # -> device approx x 60..140, y (flipped) 70..130 at 72dpi
    assert ink.any()
    ys, xs = np.nonzero(ink)
    assert 100 < (xs.max() - xs.min()) * (ys.max() - ys.min()) < 12000
    # interior filled (outline fill, not box edges only)
    cy, cx = int(ys.mean()), int(xs.mean())
    assert ink[cy, cx]


# ------------------------------------------------ CFF end-to-end OCR


def _dejavu_as_cff():
    """DejaVu's tag alphabet re-encoded as Type2 charstrings: identical
    outlines through the FontFile3 path, so template OCR must recover
    tags exactly (VERDICT r3 'Done' criterion for the CFF item)."""
    from p_id_text_extraction_ray.media.cff import _UNI_TO_NAME
    from cffbuild import build_cff, polyline_charstring
    ttf = TrueTypeFont(open(DEJAVU, "rb").read())
    scale = 1000.0 / ttf.units_per_em
    glyphs = [(".notdef", NOTDEF)]
    widths = []
    chars = [chr(c) for c in range(32, 127)]
    for ch in chars:
        gid = ttf.glyph_id(ch)
        adv = ttf.advance(gid) * scale
        widths.append(int(round(adv)))
        name = _UNI_TO_NAME.get(ord(ch))
        cs = polyline_charstring(
            [(np.asarray(c) * scale).tolist()
             for c in ttf.glyph_contours(gid)], adv)
        glyphs.append((name, cs))
    return build_cff(glyphs), widths


def test_pid_ocr_exact_on_cff_font_pdf():
    from p_id_text_extraction_ray.fixtures.pdfgen import make_pdf
    from p_id_text_extraction_ray.stages.ocr import TemplateRecognizer
    cff, widths = _dejavu_as_cff()
    rec = TemplateRecognizer()
    for tag in ["PV-2205", "FT-101", "LIC-5488"]:
        pdf = make_pdf([f"BT /F1 24 Tf 20 100 Td ({tag}) Tj ET\n".encode()],
                       cff=cff, cff_widths=widths)
        page = render_pdf_pages(pdf, dpi=150)[0]
        text, conf = rec._read(page)
        assert text == tag, (tag, text)
        assert conf > 0.7

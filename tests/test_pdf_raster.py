"""PDF parser + rasterizer tests (``media/pdfdoc.py``,
``media/pdfraster.py``) and the now-real S1 ingestion stage.

Validation is triangulated: two REAL PDF-1.5 files on the system
(xref streams + object streams + Flate/predictors, TeX and DocBook
producers) must parse and rasterize with plausible structure; a
synthetic classic-xref PDF written by the test (Flate content, embedded
DejaVuSans TrueType) must rasterize with EXACT vector placement and
detectable text; and the PdfIngestStage runs the real renderer
end-to-end into tile+detect.
"""

import zlib

import numpy as np
import pytest

from p_id_text_extraction_ray.media.pdfdoc import PdfDocument, PdfError
from p_id_text_extraction_ray.media.pdfraster import render_pdf_pages

REAL_PDFS = {
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf": 36,
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf": 17,
}
DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def make_pdf(pages_content: list[bytes], mediabox=(0, 0, 300, 200),
             embed_font: str | None = DEJAVU) -> bytes:
    """Minimal classic-xref PDF writer: Flate page contents, one
    embedded TrueType font as /F1."""
    objs: dict[int, bytes] = {}
    counter = [1]

    def add(body: bytes) -> int:
        n = counter[0]
        counter[0] += 1
        objs[n] = body
        return n

    font_ref = b""
    if embed_font:
        ttf = open(embed_font, "rb").read()
        ff = add(b"<< /Length " + str(len(ttf)).encode() +
                 b" >>\nstream\n" + ttf + b"\nendstream")
        fd = add((f"<< /Type /FontDescriptor /FontName /DejaVuSans "
                  f"/Flags 32 /FontBBox [-1021 -463 1793 1232] "
                  f"/ItalicAngle 0 /Ascent 928 /Descent -236 "
                  f"/CapHeight 1232 /StemV 80 /FontFile2 {ff} 0 R >>")
                 .encode())
        fnt = add((f"<< /Type /Font /Subtype /TrueType "
                   f"/BaseFont /DejaVuSans /FirstChar 32 /LastChar 126 "
                   f"/FontDescriptor {fd} 0 R >>").encode())
        font_ref = f"/F1 {fnt} 0 R".encode()

    content_nums = [
        add(b"<< /Length " + str(len(zlib.compress(c))).encode() +
            b" /Filter /FlateDecode >>\nstream\n" + zlib.compress(c) +
            b"\nendstream")
        for c in pages_content]
    pages_num = counter[0] + len(pages_content)
    box = " ".join(str(v) for v in mediabox).encode()
    page_nums = [
        add(b"<< /Type /Page /Parent " + str(pages_num).encode() +
            b" 0 R /MediaBox [" + box + b"] /Resources << /Font << " +
            font_ref + b" >> >> /Contents " + str(cn).encode() + b" 0 R >>")
        for cn in content_nums]
    kids = b"[" + b" ".join(str(p).encode() + b" 0 R"
                            for p in page_nums) + b"]"
    pgs = add(b"<< /Type /Pages /Kids " + kids + b" /Count " +
              str(len(page_nums)).encode() + b" >>")
    assert pgs == pages_num
    cat = add(b"<< /Type /Catalog /Pages " + str(pgs).encode() + b" 0 R >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(out)
        out += str(n).encode() + b" 0 obj\n" + objs[n] + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 " + str(counter[0]).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for n in sorted(objs):
        out += ("%010d 00000 n \n" % offsets[n]).encode()
    out += (b"trailer\n<< /Size " + str(counter[0]).encode() + b" /Root " +
            str(cat).encode() + b" 0 R >>\nstartxref\n" +
            str(xref_off).encode() + b"\n%%EOF\n")
    return bytes(out)


@pytest.mark.parametrize("path,n_pages", sorted(REAL_PDFS.items()))
def test_real_pdfs_parse(path, n_pages):
    """PDF 1.5 with cross-reference streams, object streams, Flate with
    PNG predictors — the modern layout pdfTeX/FOP write."""
    doc = PdfDocument(open(path, "rb").read())
    pages = doc.pages()
    assert len(pages) == n_pages
    for p in pages:
        assert len(p["mediabox"]) == 4
        assert len(p["contents"]) > 0


def test_real_pdf_rasterizes_with_text_lines():
    """Render a real page and check it LOOKS like a text page: ink in a
    plausible band, organized into >=10 distinct horizontal text lines
    (row-profile runs), not noise."""
    data = open("/usr/share/doc/libtasn1-doc/libtasn1.pdf", "rb").read()
    page = render_pdf_pages(data, dpi=72)[2]
    ink = page < 200
    frac = ink.mean()
    assert 0.01 < frac < 0.5, frac
    rows = ink.any(axis=1)
    starts = int(((~rows[:-1]) & rows[1:]).sum())
    assert starts >= 10, starts


def test_synthetic_pdf_exact_vector_placement():
    content = (b"0 g 50 120 100 40 re f\n"
               b"0 G 2 w 20 20 m 280 20 l S\n"
               b"BT /F1 24 Tf 60 60 Td (FT-101) Tj ET\n")
    pdf = make_pdf([content, b"0 g 10 10 50 50 re f\n"])
    pages = render_pdf_pages(pdf, dpi=72)
    assert len(pages) == 2
    pg = pages[0]
    assert pg.shape == (200, 300)
    # filled rect: PDF (50,120)-(150,160) -> rows 40..80, cols 50..150
    assert pg[41:79, 51:149].mean() == 0.0
    assert pg[41:79, 160:200].mean() == 255.0
    # 2pt stroked line at y=20 -> ~rows 179-180
    assert (pg[178:182, 30:270] < 128).any(axis=0).all()
    assert (pg[170:175] == 255).all()
    # text: 24pt at (60,60): ink above the baseline row 140, starting
    # near col 60, ending before col 160 (6 narrow glyphs)
    band = pg[115:141, :]
    cols = np.nonzero((band < 128).any(axis=0))[0]
    assert 58 <= cols.min() <= 66, cols.min()
    assert 120 <= cols.max() <= 160, cols.max()
    # second page independent
    assert pages[1][141:189, 11:59].mean() == 0.0


def test_synthetic_pdf_detected_by_cv_kernel():
    """The rendered text block is detectable by the engine's detector
    with the lossy-media tolerance (binary render -> tolerance no-op)."""
    from p_id_text_extraction_ray.functions.rectdetect import detect_rects

    pdf = make_pdf([b"BT /F1 24 Tf 60 60 Td (FT-101) Tj ET\n"])
    pg = render_pdf_pages(pdf, dpi=150)[0]
    boxes = detect_rects(pg)
    assert len(boxes) >= 1
    x1 = boxes[:, 0].min()
    x2 = boxes[:, 2].max()
    # 60pt -> 125px at 150dpi; text ~100px wide
    assert 115 <= x1 <= 135, x1
    assert 240 <= x2 <= 340, x2


def test_form_xobject_and_tj_array():
    inner = b"0 g 0 0 10 10 re f\n"
    comp = zlib.compress(inner)
    # hand-assemble: form XObject translated by /Matrix
    objs = []
    pdf = bytearray(b"%PDF-1.4\n")

    def add(body):
        objs.append((len(pdf), body))
        n = len(objs)
        pdf.extend(str(n).encode() + b" 0 obj\n" + body + b"\nendobj\n")
        return n

    form = add(b"<< /Type /XObject /Subtype /Form /BBox [0 0 10 10] "
               b"/Matrix [1 0 0 1 100 100] /Length " +
               str(len(comp)).encode() + b" /Filter /FlateDecode "
               b">>\nstream\n" + comp + b"\nendstream")
    content = b"q 1 0 0 1 20 30 cm /X1 Do Q\n" \
              b"BT /F1 10 Tf 10 180 Td [(A) -2000 (B)] TJ ET\n"
    ccomp = zlib.compress(content)
    cn = add(b"<< /Length " + str(len(ccomp)).encode() +
             b" /Filter /FlateDecode >>\nstream\n" + ccomp + b"\nendstream")
    pg = add(b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 300 200] "
             b"/Resources << /XObject << /X1 " + str(form).encode() +
             b" 0 R >> >> /Contents " + str(cn).encode() + b" 0 R >>")
    pgs = add(b"<< /Type /Pages /Kids [" + str(pg).encode() +
              b" 0 R] /Count 1 >>")
    cat = add(b"<< /Type /Catalog /Pages " + str(pgs).encode() + b" 0 R >>")
    xref_off = len(pdf)
    pdf.extend(b"xref\n0 " + str(len(objs) + 1).encode() + b"\n")
    pdf.extend(b"0000000000 65535 f \n")
    for off, _ in objs:
        pdf.extend(("%010d 00000 n \n" % off).encode())
    pdf.extend(b"trailer\n<< /Size " + str(len(objs) + 1).encode() +
               b" /Root " + str(cat).encode() +
               b" 0 R >>\nstartxref\n" + str(xref_off).encode() +
               b"\n%%EOF\n")

    page = render_pdf_pages(bytes(pdf), dpi=72)[0]
    # form: 10x10 rect at (20+100, 30+100) -> rows 60..70, cols 120..130
    assert page[61:69, 121:129].mean() == 0.0
    # TJ kerning: 'B' displaced right of 'A' by extra 20pt
    band = page[10:25, :]
    cols = np.nonzero((band < 128).any(axis=0))[0]
    assert cols.max() - cols.min() > 25   # A..gap..B wider than 'AB'


def test_type1_embedded_font_renders_ink_at_text():
    """A Type1-embedded font (FontFile) renders real glyph ink at the
    text positions (since round 4 via media/type1.py; see
    test_cff_type1.py for the glyph-shape assertions)."""
    data = open("/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
                "rb").read()
    page = render_pdf_pages(data, dpi=72)[0]
    ink = (page < 200)
    assert 0.02 < ink.mean() < 0.6
    # the title line: a solid band near the top third
    top = ink[:280]
    assert top.any()


def test_corrupt_pdf_raises():
    with pytest.raises(PdfError):
        PdfDocument(b"not a pdf at all")
    good = make_pdf([b"0 g 0 0 5 5 re f\n"], embed_font=None)
    with pytest.raises(Exception):
        PdfDocument(good[:100] + b"garbage").pages()


def test_pdf_ingest_stage_end_to_end(ray_session, tmp_path):
    """S1 made real: PDF bytes rows -> per-page media blobs -> the CV
    path detects the rendered text region."""
    import pyarrow as pa

    from p_id_text_extraction_ray.media.codec import decode_image
    from p_id_text_extraction_ray.media.store import FileMediaStore
    from p_id_text_extraction_ray.sources.pdf import PdfIngestStage
    from p_id_text_extraction_ray.functions.rectdetect import detect_rects

    pdf = make_pdf([b"BT /F1 24 Tf 60 100 Td (PV-2205) Tj ET\n",
                    b"0 g 30 30 80 20 re f\n"])
    stage = PdfIngestStage(str(tmp_path / "media"), dpi=150)
    out = stage(pa.table({"doc_id": pa.array(["DOC-7"], pa.string()),
                          "pdf_bytes": pa.array([pdf], pa.binary())}))
    assert out.column("page").to_pylist() == [0, 1]
    refs = out.column("media_ref").to_pylist()
    assert refs[0].endswith("DOC-7_page_00.pidr")
    store = FileMediaStore(str(tmp_path / "media"))
    img0 = decode_image(store.get(refs[0]))
    assert len(detect_rects(img0)) >= 1
    img1 = decode_image(store.get(refs[1]))
    assert len(detect_rects(img1)) == 1      # the filled rect

"""Deterministic synthetic PDF generator for the S1 ingestion path.

Writes minimal classic-xref PDFs (Flate page contents, one embedded
TrueType font) so the PDF parse->rasterize->detect chain can be
exercised without external data — the PDF-side analogue of
``fixtures/generate.py``. Also used by ``tests/test_pdf_raster.py``.
"""

from __future__ import annotations

import zlib

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def make_pdf(pages_content: list[bytes], mediabox=(0, 0, 300, 200),
             embed_font: str | None = DEJAVU,
             cff: bytes | None = None,
             cff_widths: list[int] | None = None,
             cff_first_char: int = 32) -> bytes:
    """Classic-xref PDF with Flate contents; ``/F1`` = embedded TTF,
    or a CFF program embedded as FontFile3 /Type1C when ``cff`` is
    given (exercises the PostScript-outline font path)."""
    objs: dict[int, bytes] = {}
    counter = [1]

    def add(body: bytes) -> int:
        n = counter[0]
        counter[0] += 1
        objs[n] = body
        return n

    font_ref = b""
    if cff is not None:
        ff = add(b"<< /Length " + str(len(cff)).encode() +
                 b" /Subtype /Type1C >>\nstream\n" + cff + b"\nendstream")
        fd = add((f"<< /Type /FontDescriptor /FontName /TestCFF "
                  f"/Flags 32 /FontBBox [-200 -300 1800 1300] "
                  f"/ItalicAngle 0 /Ascent 928 /Descent -236 "
                  f"/CapHeight 1232 /StemV 80 /FontFile3 {ff} 0 R >>")
                 .encode())
        w = b""
        if cff_widths:
            w = (f"/FirstChar {cff_first_char} /LastChar "
                 f"{cff_first_char + len(cff_widths) - 1} /Widths ["
                 + " ".join(str(v) for v in cff_widths) + "] ").encode()
        fnt = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF "
                  + w + f"/FontDescriptor {fd} 0 R >>".encode())
        font_ref = f"/F1 {fnt} 0 R".encode()
    elif embed_font:
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


def demo_pdf(doc_idx: int) -> bytes:
    """A deterministic 2-page PDF: one tag-text page, one vector page
    (the content mix a P&ID sheet ingest sees)."""
    tag = f"PV-{1000 + 7 * doc_idx}"
    page1 = (f"BT /F1 24 Tf 40 120 Td ({tag}) Tj ET\n"
             f"0 G 1 w 20 40 m 280 40 l S\n").encode()
    page2 = (b"0 g 30 30 80 20 re f\n"
             b"0 G 2 w 30 100 m 270 100 l 270 170 l S\n")
    return make_pdf([page1, page2])

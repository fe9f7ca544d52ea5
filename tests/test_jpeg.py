"""Baseline JPEG codec tests (``media/jpeg.py``) and the e2e .jpg
ingestion path the reference covers via PIL (``run_pipeline.py:75-77``).

Validation is triangulated, since neither PIL nor libjpeg is available:
* the IDCT basis is checked against a direct cosine double-sum;
* encoder->decoder round trips must land within JPEG's quantization
  error bound for several qualities, shapes and subsamplings;
* a real libjpeg-produced file that ships with IPython
  (``2x2.jpg``, baseline grayscale) must parse and decode;
* restart markers (DRI/RSTn) are exercised via a re-written stream;
* e2e: a value-coded fixture sheet re-encoded as JPEG runs through
  tile+detect and recovers every golden region (IoU match — exact
  equality is impossible under lossy ringing at the glyph edges).
"""

import os

import numpy as np
import pytest

from p_id_text_extraction_ray.media import codec
from p_id_text_extraction_ray.media.jpeg import (
    _DCT_C, JpegError, decode_jpeg, encode_jpeg, peek_jpeg_dimensions)

IPY_2X2 = ("/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/"
           "IPython/core/tests/2x2.jpg")


def test_idct_matches_direct_cosine_sum():
    rng = np.random.default_rng(0)
    F = rng.integers(-64, 64, (8, 8)).astype(np.float64)
    fast = _DCT_C.T @ F @ _DCT_C
    ref = np.zeros((8, 8))
    for n in range(8):
        for m in range(8):
            s = 0.0
            for k in range(8):
                for l in range(8):
                    ck = (1 / np.sqrt(2) if k == 0 else 1.0) * 0.5
                    cl = (1 / np.sqrt(2) if l == 0 else 1.0) * 0.5
                    s += (ck * cl * F[k, l]
                          * np.cos((2 * n + 1) * k * np.pi / 16)
                          * np.cos((2 * m + 1) * l * np.pi / 16))
            ref[n, m] = s
    assert np.abs(fast - ref).max() < 1e-10


@pytest.mark.parametrize("shape", [(8, 8), (50, 70), (64, 64), (33, 41)])
@pytest.mark.parametrize("quality", [75, 90, 95])
def test_gray_roundtrip_smooth(shape, quality):
    rng = np.random.default_rng(1)
    img = (rng.integers(0, 256, shape).astype(np.float64) * 0.15
           + 120).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == shape
    err = out.astype(float) - img.astype(float)
    # lossy bound scales with quality: the residual noise is pure high
    # frequency, which JPEG quantizes hardest (RMSE ~8 at q75 is what
    # libjpeg shows on noise too)
    rmse_bound = {75: 12.0, 90: 6.0, 95: 3.0}[quality]
    assert np.sqrt((err ** 2).mean()) <= rmse_bound
    assert np.abs(err).max() <= 4 * rmse_bound


def test_error_shrinks_with_quality():
    rng = np.random.default_rng(3)
    img = (rng.integers(0, 256, (48, 48)).astype(np.float64) * 0.3
           + 90).astype(np.uint8)

    def rmse(q):
        err = decode_jpeg(encode_jpeg(img, quality=q)).astype(float) - img
        return np.sqrt((err ** 2).mean())

    r = [rmse(q) for q in (50, 75, 90, 95)]
    assert r[0] > r[1] > r[2] > r[3]


def test_gray_roundtrip_text_like_is_tight():
    """Solid rectangles on uniform background (fixture-like content):
    flat block interiors reconstruct near-exactly at quality 90."""
    img = np.full((100, 160), 255, np.uint8)
    img[20:34, 40:104] = 65
    img[60:74, 16:48] = 80
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    assert np.abs(out[24:30, 50:90].astype(int) - 65).max() == 0


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_color_decodes_luma_plane(subsampling):
    """3-component YCbCr decodes to the luminance plane (chroma blocks
    are entropy-skipped); for a gray RGB input Y equals the gray values."""
    img = np.full((100, 160), 255, np.uint8)
    img[20:34, 40:104] = 65
    rgb = np.stack([img, img, img], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, quality=90, subsampling=subsampling))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_external_libjpeg_file_decodes():
    data = open(IPY_2X2, "rb").read()
    assert peek_jpeg_dimensions(data) == (2, 2)
    out = decode_jpeg(data)
    assert out.shape == (2, 2)
    assert out.dtype == np.uint8


def test_codec_branches_on_jpeg_magic():
    img = np.full((40, 56), 255, np.uint8)
    img[10:24, 8:40] = 70
    data = encode_jpeg(img, quality=95)
    assert codec.peek_dimensions(data) == (56, 40)
    out = codec.decode_image(data)
    assert out.shape == (40, 56)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def _progressive_stream(img: np.ndarray, quality: int,
                        scans) -> bytes:
    """Re-emit a grayscale image's quantized coefficients as a
    progressive (SOF2) stream with the given scan script — the encoder
    half of the progressive tests. ``scans`` is a list of
    (ss, se, ah, al); DC scans use the DC table, AC scans the AC table.
    Spectral-selection first scans only (ah=0): successive-approximation
    ENCODING needs the correction-bit protocol, which the external
    libjpeg files cover on the decode side."""
    import struct

    from p_id_text_extraction_ray.media.jpeg import (
        HUFF_AC_LUMA, HUFF_DC_LUMA, QTBL_LUMA, ZIGZAG, _BitWriter,
        _build_encode_table, _extend, _plane_coefficients, _quality_scale)

    h, w = img.shape
    q = _quality_scale(QTBL_LUMA, quality)
    coefs = _plane_coefficients(img, q)
    dcy = _build_encode_table(*HUFF_DC_LUMA)
    acy = _build_encode_table(*HUFF_AC_LUMA)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + \
        bytes(q[ZIGZAG].tolist())
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) + \
        b"\x01\x11\x00"                                       # SOF2
    bits, huffval = HUFF_DC_LUMA
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval)) + b"\x00" + \
        bytes(bits) + bytes(huffval)
    bits, huffval = HUFF_AC_LUMA
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval)) + b"\x10" + \
        bytes(bits) + bytes(huffval)

    def ac_scan_ops(ss, se, al):
        """(symbol, extra_bits_value, extra_bits_len) ops for one AC
        band scan — progressive AC needs EOBn symbols the baseline
        table lacks, so symbols are collected first and a custom
        uniform-length Huffman table is emitted per scan."""
        ops = []
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            while eobrun:
                r = min(14, eobrun.bit_length() - 1)
                ops.append((r << 4, eobrun - (1 << r), r))
                eobrun = 0

        for i in range(len(coefs)):
            # libjpeg point transform: sign x (abs >> Al), NOT an
            # arithmetic shift (they differ for negative odd values)
            band = [(1 if v > 0 else -1) * (abs(int(v)) >> al)
                    for v in coefs[i][ss:se + 1]]
            nz = [j for j, v in enumerate(band) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            k = 0
            for j in nz:
                run = j - k
                while run > 15:
                    ops.append((0xF0, 0, 0))
                    run -= 16
                v = band[j]
                s = abs(v).bit_length()
                ops.append(((run << 4) | s,
                            v if v > 0 else v + (1 << s) - 1, s))
                k = j + 1
            if k <= se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return ops

    def ac_refine_ops(ss, se, al):
        """Successive-approximation AC refinement (Ah=al+1 -> Al=al),
        emitted by simulating the decoder's advance exactly: a symbol's
        correction bits are those of the history coefficients CROSSED
        while it advances (ZRL consumes 16 zero-history positions, a
        new-coefficient symbol r of them plus the placement), and every
        block inside an EOB run contributes its remaining history bits
        after the shared EOBn symbol, in block order (T.81 G.1.2.3)."""
        ops = []
        eob_corr: list[tuple] = []
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = min(14, eobrun.bit_length() - 1)
                ops.append((r << 4, eobrun - (1 << r), r))
                ops.extend(eob_corr)
                eob_corr.clear()
                eobrun = 0

        for i in range(len(coefs)):
            band = [int(v) for v in coefs[i][ss:se + 1]]
            hist = [abs(v) >> (al + 1) != 0 for v in band]
            new = [j for j, v in enumerate(band)
                   if not hist[j] and (abs(v) >> al) & 1]
            corr = {j: (abs(band[j]) >> al) & 1
                    for j in range(len(band)) if hist[j]}
            if not new:
                eobrun += 1
                eob_corr.extend(("BIT", corr[j], 1) for j in sorted(corr))
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            k = 0
            for j in new:
                zh = sum(1 for jj in range(k, j) if not hist[jj])
                nzrl = 0
                while zh - 16 * nzrl > 15:
                    nzrl += 1
                sign = 1 if band[j] > 0 else 0
                for si in range(nzrl + 1):
                    final = si == nzrl
                    if final:
                        ops.append((((zh - 16 * nzrl) << 4) | 1, sign, 1))
                        quota = zh - 16 * nzrl    # zero-hist before place
                    else:
                        ops.append((0xF0, 0, 0))
                        quota = 15    # 15 consumed in-loop + break position
                    consumed = 0
                    while k < j:
                        if hist[k]:
                            ops.append(("BIT", corr[k], 1))
                            k += 1
                            continue
                        if consumed == quota:
                            break                 # placement / next symbol
                        consumed += 1
                        k += 1
                    if not final:
                        k += 1                    # ZRL's 16th zero-history
                k = j + 1                         # placement consumed
            if k <= se - ss:
                eobrun += 1
                eob_corr.extend(("BIT", corr[j], 1)
                                for j in sorted(corr) if j >= k)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return ops

    def custom_table(symbols):
        """Canonical uniform-length table over the used symbols."""
        syms = sorted(set(symbols))
        ln = max(2, (len(syms) + 1).bit_length())   # last code != all-ones
        bits = [0] * 16
        bits[ln - 1] = len(syms)
        table = {s: (i, ln) for i, s in enumerate(syms)}
        return bits, syms, table

    del acy
    for ss, se, ah, al in scans:
        bw = _BitWriter()
        if ss == 0 and ah == 0:                               # DC first
            out += b"\xff\xda" + struct.pack(">HB", 8, 1) + \
                bytes([1, 0x00, ss, se, (ah << 4) | al])
            pred = 0
            for i in range(len(coefs)):
                dc = int(coefs[i][0]) >> al
                diff = dc - pred
                pred = dc
                t = abs(diff).bit_length()
                code, ln = dcy[t]
                bw.write(code, ln)
                if t:
                    bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        elif ss == 0:                                         # DC refinement
            out += b"\xff\xda" + struct.pack(">HB", 8, 1) + \
                bytes([1, 0x00, ss, se, (ah << 4) | al])
            for i in range(len(coefs)):
                # arithmetic shift on the SIGNED value (libjpeg jcphuff)
                bw.write((int(coefs[i][0]) >> al) & 1, 1)
        else:                                                 # AC band
            ops = ac_scan_ops(ss, se, al) if ah == 0 \
                else ac_refine_ops(ss, se, al)
            bits, syms, table = custom_table(
                [s for s, _, _ in ops if s != "BIT"] or [0])
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(syms)) + \
                b"\x10" + bytes(bits) + bytes(syms)           # redefine AC 0
            out += b"\xff\xda" + struct.pack(">HB", 8, 1) + \
                bytes([1, 0x00, ss, se, (ah << 4) | al])
            for sym, ebits, eln in ops:
                if sym != "BIT":
                    code, ln = table[sym]
                    bw.write(code, ln)
                if eln:
                    bw.write(ebits, eln)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    del _extend
    return bytes(out)


def test_progressive_spectral_selection_equals_baseline():
    """A progressive stream carrying the SAME quantized coefficients as
    the baseline encoder (DC scan + two AC bands, no successive
    approximation) must decode to the identical plane."""
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 256, (45, 61)).astype(np.float64) * 0.3
           + 90).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(_progressive_stream(
        img, 85, [(0, 0, 0, 0), (1, 8, 0, 0), (9, 63, 0, 0)]))
    assert np.array_equal(base, prog)


def test_progressive_eobrun_across_blocks():
    """A mostly-flat image makes long EOB runs span many blocks — the
    EOBRUN bookkeeping must stay in sync."""
    img = np.full((64, 128), 200, np.uint8)
    img[30:34, 60:70] = 40                      # one feature, many empty bands
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(_progressive_stream(
        img, 90, [(0, 0, 0, 0), (1, 5, 0, 0), (6, 63, 0, 0)]))
    assert np.array_equal(base, prog)


def test_progressive_successive_approximation_equals_baseline():
    """The full libjpeg-style scan script: DC first at Al=1 + DC
    refinement, AC bands first at Al=1 + AC refinements to Al=0 —
    exercises the correction-bit and EOBRUN-with-correction paths.
    Same quantized coefficients, so the decode must equal baseline."""
    rng = np.random.default_rng(11)
    img = (rng.integers(0, 256, (40, 56)).astype(np.float64) * 0.4
           + 70).astype(np.uint8)
    img[5:15, 8:40] = 230                      # structure + noise
    base = decode_jpeg(encode_jpeg(img, quality=80))
    prog = decode_jpeg(_progressive_stream(img, 80, [
        (0, 0, 0, 1),      # DC first, Al=1
        (1, 5, 0, 2),      # AC low band first, Al=2
        (6, 63, 0, 2),     # AC high band first, Al=2
        (0, 0, 1, 0),      # DC refinement -> Al=0
        (1, 5, 2, 1),      # AC low refinement Al=2 -> 1
        (6, 63, 2, 1),     # AC high refinement
        (1, 5, 1, 0),      # AC low refinement Al=1 -> 0
        (6, 63, 1, 0),     # AC high refinement
    ]))
    assert np.array_equal(base, prog)


def test_progressive_external_libjpeg_files():
    """The nodejs doc images are real libjpeg progressive files
    (spectral selection, non-interleaved DC, chroma scans to skip).
    No PIL exists here for ground truth; assert structural sanity:
    correct shape, plausible luma for images named *white-stripe*."""
    for name in ("thin-white-stripe.jpg", "full-white-stripe.jpg"):
        data = open(f"/usr/share/doc/nodejs/{name}", "rb").read()
        w, h = peek_jpeg_dimensions(data)
        out = decode_jpeg(data)
        assert out.shape == (h, w)
        assert out.dtype == np.uint8
        # a "white stripe" asset: most pixels near-white, nontrivial std
        assert (out > 200).mean() > 0.5, out.mean()


def test_truncated_rejected():
    img = np.full((16, 16), 128, np.uint8)
    data = encode_jpeg(img)
    with pytest.raises((JpegError, IndexError, Exception)):
        decode_jpeg(data[:20])


def test_single_scan_is_non_interleaved():
    """A grayscale frame may legally DECLARE any sampling factor; per
    T.81 A.2 a single-component scan is non-interleaved (MCU = one data
    unit on the component's own ceil(dim/8) grid, NOT the hmax-aligned
    MCU grid). Patch the SOF sampling byte from 1x1 to 2x2 — pixel data
    is unchanged, so a grid-aware decoder must still decode exactly."""
    img = np.full((50, 100), 255, np.uint8)
    img[10:24, 8:72] = 65
    data = bytearray(encode_jpeg(img, quality=95))
    i = data.find(b"\xff\xc0")
    hv_off = i + 11                         # first component's HV byte
    assert data[hv_off] == 0x11
    data[hv_off] = 0x22
    out = decode_jpeg(bytes(data))
    assert out.shape == (50, 100)
    assert np.abs(out.astype(int) -
                  decode_jpeg(encode_jpeg(img, quality=95)).astype(int)).max() == 0


def test_restart_markers():
    """Insert a DRI segment and restart markers by re-encoding per
    8-row stripe, then verify the decoder resyncs DC prediction."""
    import struct

    from p_id_text_extraction_ray.media.jpeg import (
        HUFF_AC_LUMA, HUFF_DC_LUMA, _BitWriter, _build_encode_table,
        _encode_block, _plane_coefficients, _quality_scale, QTBL_LUMA,
        UNZIGZAG, ZIGZAG)

    img = np.zeros((16, 24), np.uint8)
    img[:8] = 200
    img[8:] = 40
    q = _quality_scale(QTBL_LUMA, 90)
    coefs = _plane_coefficients(img, q)
    dcy = _build_encode_table(*HUFF_DC_LUMA)
    acy = _build_encode_table(*HUFF_AC_LUMA)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + \
        bytes(q[ZIGZAG].tolist())
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 16, 24, 1) + b"\x01\x11\x00"
    bits, huffval = HUFF_DC_LUMA
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval)) + b"\x00" + \
        bytes(bits) + bytes(huffval)
    bits, huffval = HUFF_AC_LUMA
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval)) + b"\x10" + \
        bytes(bits) + bytes(huffval)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 3)            # DRI: every 3 MCUs
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"

    rst = 0
    for start in range(0, 6, 3):                             # 6 blocks, 2 intervals
        bw = _BitWriter()
        pred = 0                                             # reset per interval
        for i in range(start, start + 3):
            pred = _encode_block(bw, coefs[i], pred, dcy, acy)
        bw.flush()
        out += bw.out
        if start + 3 < 6:
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
    out += b"\xff\xd9"

    dec = decode_jpeg(bytes(out))
    assert dec.shape == (16, 24)
    assert np.abs(dec[:8].astype(int) - 200).max() <= 3
    assert np.abs(dec[8:].astype(int) - 40).max() <= 3
    del UNZIGZAG


def _iou(a, b):
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua else 0.0


def test_e2e_tile_detect_on_jpeg(ray_session, tmp_path):
    """A fixture sheet re-encoded as .jpg runs through the real pipeline
    up to detection+grouping and recovers every golden region: one group
    per value-coded string, IoU >= 0.6 against the lossless groups
    (lossy ringing bloats boxes by a few px, so exact equality is not
    the reference contract here — PIL-decoded JPEG pixels differ from
    the PNG source in the reference too)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from p_id_text_extraction_ray.fixtures.generate import generate_fixture
    from p_id_text_extraction_ray.pipelines.extract import extract_spans
    from p_id_text_extraction_ray.media.store import FileMediaStore

    fp = generate_fixture(str(tmp_path / "fix"), n_docs=4, seed=11)
    store = FileMediaStore(fp.media_root)

    # re-encode every media file as JPEG under a parallel root
    jpg_root = tmp_path / "media_jpg"
    docs = pq.read_table(fp.docs).to_pandas()
    refs = sorted({s["media_ref"] for spans in docs["spans"]
                   for s in spans if s["media_ref"]})
    for ref in refs:
        img = codec.decode_image(store.get(ref))
        p = jpg_root / ref
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(encode_jpeg(img, quality=97))

    # lossy media needs the detector's binarization tolerance (the CRAFT
    # text_threshold analogue) to absorb JPEG ringing around glyph edges;
    # it is a no-op on the lossless run (glyph values are >=129 from
    # background)
    from p_id_text_extraction_ray.config import ExtractConfig
    cfg = ExtractConfig(detect_bg_tolerance=48)

    def grouped(root):
        return extract_spans(rd.read_parquet(fp.docs), str(root),
                             cfg=cfg, stop_after="group").to_pandas()

    lossless = grouped(fp.media_root)
    lossy = grouped(jpg_root)

    # same number of detected groups per media, every lossless box
    # matched by IoU
    for ref, g in lossless.groupby("media_ref"):
        lj = lossy[lossy.media_ref == ref]
        assert len(lj) == len(g), f"{ref}: {len(lj)} vs {len(g)} groups"
        jb = lj[["x_min", "y_min", "x_max", "y_max"]].to_numpy()
        for box in g[["x_min", "y_min", "x_max", "y_max"]].to_numpy():
            best = max(_iou(box, b) for b in jb)
            assert best >= 0.6, f"{ref}: box {box} best IoU {best:.2f}"


# ------------------------------------------------------------ RGB decode


RUST_ASSETS = ("/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu"
               "/share/doc/rust/html/embedded-book/assets")


def _color_gradient(h=120, w=200):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 / w), (yy * 255 / h),
                    ((xx + yy) * 255 / (w + h))], axis=-1).astype(np.uint8)
    img[30:60, 40:80] = [255, 0, 0]
    img[70:100, 120:180] = [0, 128, 255]
    return img


@pytest.mark.parametrize("sub", ["444", "420"])
def test_rgb_roundtrip_vs_encoder(sub):
    img = _color_gradient()
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub),
                      rgb=True)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < (0.6 if sub == "444" else 1.2), err


def test_rgb_of_grayscale_stream_replicates_plane():
    g = (np.mgrid[0:64, 0:80][1] * 3).astype(np.uint8)
    data = encode_jpeg(g, quality=95)
    out = decode_jpeg(data, rgb=True)
    assert out.shape == (64, 80, 3)
    assert (out[..., 0] == out[..., 1]).all()
    assert (out[..., 0] == decode_jpeg(data)).all()


def test_rgb_luma_consistent_with_luminance_path():
    """decode_jpeg(rgb=True) and the default luminance decode agree on
    BT.601 luma to rounding error — chroma decode must not perturb Y."""
    data = encode_jpeg(_color_gradient(), quality=90, subsampling="420")
    rgb = decode_jpeg(data, rgb=True).astype(np.float64)
    y = decode_jpeg(data).astype(np.float64)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert np.abs(luma - y).mean() < 0.7


@pytest.mark.parametrize("name,progressive", [
    ("verify.jpeg", False),   # baseline color, external encoder
    ("f3.jpg", True),         # progressive color, external encoder
])
def test_rgb_decode_real_external_color_files(name, progressive):
    path = os.path.join(RUST_ASSETS, name)
    if not os.path.exists(path):
        pytest.skip("external color JPEG not present")
    data = open(path, "rb").read()
    rgb = decode_jpeg(data, rgb=True)
    y = decode_jpeg(data)
    assert rgb.shape == (*y.shape, 3)
    luma = (0.299 * rgb[..., 0].astype(np.float64)
            + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    assert np.abs(luma - y).mean() < 0.5      # chroma didn't corrupt Y
    # real photographic color content (not a gray replication)
    assert np.abs(rgb[..., 0].astype(int)
                  - rgb[..., 2].astype(int)).mean() > 5


def test_color_fixture_through_tile_and_detect():
    """decode_image_rgb feeds the tile+detect path: tiles slice the
    (h, w, 3) array, and detection on its luminance equals detection
    on the default grayscale decode of the same stream."""
    from p_id_text_extraction_ray.functions.rectdetect import (
        detect_rects_words)

    g = np.full((160, 240), 255, np.uint8)
    g[40:60, 30:110] = 0                      # a word-shaped bar
    g[100:118, 140:200] = 0
    rgbsrc = np.stack([g, np.full_like(g, 200), np.full_like(g, 90)],
                      axis=-1)                # colored page, dark marks
    rgbsrc[g == 0] = [20, 10, 40]
    data = encode_jpeg(rgbsrc, quality=97, subsampling="444")

    rgb = codec.decode_image_rgb(data)
    assert rgb.shape == (160, 240, 3)
    tile = rgb[0:80, 0:120]                   # ndarray tiling slices fine
    assert tile.shape == (80, 120, 3)

    luma = np.clip(np.round(0.299 * rgb[..., 0].astype(np.float64)
                            + 0.587 * rgb[..., 1]
                            + 0.114 * rgb[..., 2]), 0, 255).astype(np.uint8)
    gray = decode_jpeg(data)
    boxes_rgb = detect_rects_words(luma, strong_max=128, weak_max=160)
    boxes_gray = detect_rects_words(gray, strong_max=128, weak_max=160)
    assert len(boxes_rgb) == len(boxes_gray) == 2
    for a, b in zip(boxes_rgb.tolist(), boxes_gray.tolist()):
        assert all(abs(x - y) <= 1 for x, y in zip(a, b))

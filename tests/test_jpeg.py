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


def test_progressive_rejected():
    data = open("/usr/share/doc/nodejs/thin-white-stripe.jpg", "rb").read()
    with pytest.raises(JpegError, match="progressive"):
        decode_jpeg(data)


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

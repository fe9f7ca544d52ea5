"""Pure-numpy PNG codec: filter coverage, luma conversion, header peek,
and the extraction pipeline end-to-end over a PNG-encoded corpus.

Mirrors the reference's real-image ingestion boundary
(``sahi_slicer.py:79-89`` slices PIL-decoded PNG/TIFF): here the same
pixels arrive as real PNG bytes and must produce byte-identical spans to
the PIDR-container path."""

import os
import shutil

import numpy as np
import pytest

from p_id_text_extraction_ray.media import codec as C


@pytest.fixture
def rng():
    return np.random.default_rng(123)


def test_png_roundtrip_gray(rng):
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    assert (C.decode_image(C.encode_png(img)) == img).all()


def test_png_roundtrip_every_filter(rng):
    img = rng.integers(0, 256, size=(25, 40), dtype=np.uint8)
    filters = [(y % 5) for y in range(25)]          # exercise 0..4
    assert (C.decode_png(C.encode_png(img, row_filters=filters)) == img).all()


def test_png_rgb_every_filter_luma(rng):
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    filters = [(4 - y % 5) for y in range(20)]
    got = C.decode_png(C.encode_png(img, row_filters=filters))
    f = img.astype(np.float64)
    want = np.rint(f[:, :, 0] * .299 + f[:, :, 1] * .587 + f[:, :, 2] * .114) \
        .astype(np.uint8)
    assert (got == want).all()


def test_png_gray_rgb_same_luma_for_gray_content(rng):
    gray = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    # r*.299+g*.587+b*.114 == v for r=g=b=v (weights sum to 1.0)
    assert (C.decode_png(C.encode_png(rgb)) == gray).all()


def test_png_peek_dimensions_prefix_only(rng):
    img = rng.integers(0, 256, size=(48, 96), dtype=np.uint8)
    data = C.encode_png(img)
    assert C.peek_dimensions(data[:64]) == (96, 48)


def test_png_unsupported_features_raise():
    img = np.zeros((4, 4), np.uint8)
    data = bytearray(C.encode_png(img))
    data[24] = 16                                   # bit_depth byte in IHDR
    # CRC now wrong but IHDR parse precedes any CRC check
    with pytest.raises(NotImplementedError):
        C.decode_png(bytes(data))
    with pytest.raises(NotImplementedError):
        C.decode_image(b"GIF89a" + b"0" * 32)             # unsupported magic
    from p_id_text_extraction_ray.media.jpeg import JpegError
    with pytest.raises(JpegError):                        # JPEG is supported
        C.decode_image(b"\xff\xd8\xff\xe0" + b"0" * 32)   # ...but malformed


def test_extract_pipeline_on_png_corpus(ray_session, tmp_path):
    """Re-encode every fixture blob as real PNG; the pipeline output must
    equal the PIDR-path golden spans exactly (identical pixels in)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from p_id_text_extraction_ray.fixtures.generate import generate_fixture
    from p_id_text_extraction_ray.pipelines.extract import extract_spans

    fp = generate_fixture(str(tmp_path / "fix"), n_docs=10, seed=77)
    png_root = str(tmp_path / "png_media")
    for dirpath, _dirs, files in os.walk(fp.media_root):
        for name in files:
            src = os.path.join(dirpath, name)
            rel = os.path.relpath(src, fp.media_root)
            with open(src, "rb") as f:
                arr = C.decode_image(f.read())
            dst = os.path.join(png_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "wb") as f:
                f.write(C.encode_png(arr))

    out_dir = str(tmp_path / "out")
    shutil.rmtree(out_dir, ignore_errors=True)
    extract_spans(rd.read_parquet(fp.docs), png_root).write_parquet(out_dir)
    out = pq.read_table(out_dir).to_pandas()
    gold = pq.read_table(fp.golden).to_pandas()
    cols = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]

    def norm(d):
        return d[cols].astype({"seq": "int64", "offset": "int64"}) \
            .sort_values(["doc_id", "seq"]).reset_index(drop=True)

    assert norm(out).equals(norm(gold))

"""TIFF codec tests (``media/tiff.py``) and the e2e .tiff ingestion path.

The reference glob-loads ``*.tiff`` sheets (``sahi_slicer.py:240``) and
its PDF rasterizer writes LZW TIFF (``PDF_to_image.py:73``). TIFF is
lossless, so unlike the JPEG path the e2e test asserts FULL golden span
equality: a fixture corpus re-encoded as LZW TIFF must extract byte-
identical spans through detection, grouping, cropping and recognition.
"""

import numpy as np
import pytest

from p_id_text_extraction_ray.media import codec
from p_id_text_extraction_ray.media.tiff import (
    TiffError, _lzw_decode, _lzw_encode, decode_tiff, encode_tiff,
    peek_tiff_dimensions)

CPY_TIFF = ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
            "test_email/data/python.tiff")


def _sample_image(shape=(60, 90), seed=5):
    rng = np.random.default_rng(seed)
    img = np.full(shape, 255, np.uint8)
    img[10:24, 8:72] = 65
    img[30:44, 20:52] = 80
    noise = rng.integers(0, 256, shape).astype(np.uint8)
    img[50:, :] = noise[50:, :]          # some incompressible rows too
    return img


def test_lzw_roundtrip_bytes():
    rng = np.random.default_rng(0)
    for payload in [b"", b"\x00" * 1000, bytes(rng.integers(0, 256, 5000)),
                    b"TOBEORNOTTOBEORTOBEORNOT" * 40,
                    bytes(rng.integers(0, 4, 20000))]:  # low-entropy: grows table
        enc = _lzw_encode(payload)
        assert _lzw_decode(enc, len(payload)) == payload


@pytest.mark.parametrize("compression,predictor", [
    ("none", False), ("lzw", False), ("lzw", True)])
def test_tiff_roundtrip_exact(compression, predictor):
    img = _sample_image()
    data = encode_tiff(img, compression=compression, predictor=predictor)
    out = decode_tiff(data)
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)          # lossless
    assert peek_tiff_dimensions(data) == (90, 60)


def test_lzw_smaller_on_flat_content():
    img = np.full((200, 300), 255, np.uint8)
    img[50:80, 40:200] = 65
    assert len(encode_tiff(img, compression="lzw")) < \
        len(encode_tiff(img, compression="none")) / 10


def test_external_cpython_tiff_decodes():
    """A real libtiff-produced RGBA file from the CPython test suite:
    uncompressed, 4 samples/pixel, big strip."""
    data = open(CPY_TIFF, "rb").read()
    assert peek_tiff_dimensions(data) == (16, 16)
    out = decode_tiff(data)
    assert out.shape == (16, 16)
    assert out.dtype == np.uint8


def test_codec_branches_on_tiff_magic():
    img = _sample_image((40, 56), seed=9)
    data = encode_tiff(img, compression="lzw")
    assert codec.peek_dimensions(data) == (56, 40)
    assert np.array_equal(codec.decode_image(data), img)


def test_unsupported_rejected():
    img = np.full((16, 16), 128, np.uint8)
    good = encode_tiff(img, compression="none")
    with pytest.raises(TiffError):
        decode_tiff(b"II+\x00" + good[4:])   # bad magic
    with pytest.raises(ValueError):
        encode_tiff(img, compression="deflate")


def test_e2e_full_golden_on_lzw_tiff(ray_session, tmp_path):
    """Fixture media re-encoded as LZW TIFF -> FULL pipeline -> golden
    span equality (lossless codec, so recognition is exact)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from p_id_text_extraction_ray.fixtures.generate import generate_fixture
    from p_id_text_extraction_ray.media.store import FileMediaStore
    from p_id_text_extraction_ray.pipelines.extract import extract_spans

    fp = generate_fixture(str(tmp_path / "fix"), n_docs=6, seed=23)
    store = FileMediaStore(fp.media_root)

    tif_root = tmp_path / "media_tif"
    docs = pq.read_table(fp.docs).to_pandas()
    refs = sorted({s["media_ref"] for spans in docs["spans"]
                   for s in spans if s["media_ref"]})
    for ref in refs:
        img = codec.decode_image(store.get(ref))
        p = tif_root / ref
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(encode_tiff(img, compression="lzw"))

    out_dir = str(tmp_path / "out")
    extract_spans(rd.read_parquet(fp.docs),
                  str(tif_root)).write_parquet(out_dir)
    out = pq.read_table(out_dir).to_pandas()
    gold = pq.read_table(fp.golden).to_pandas()
    cols = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]

    def norm(d):
        return d[cols].astype({"seq": "int64", "offset": "int64"}) \
            .sort_values(["doc_id", "seq"]).reset_index(drop=True)

    assert norm(out).equals(norm(gold))

"""End-to-end golden correctness: span-sequence equality per doc_id
(BASELINE.json: (kind, text, media_ref, order) vs golden fixtures)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

GOLDEN_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]


def _run(fp, docs=None, **kw):
    import ray.data as rd
    from p_id_text_extraction_ray.pipelines.extract import extract_spans

    docs = docs if docs is not None else rd.read_parquet(fp.docs)
    return extract_spans(docs, fp.media_root, **kw).to_pandas()


def _norm(df):
    df = df[GOLDEN_COLS].copy()
    for c in ("seq", "offset"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["doc_id", "seq"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def tiny_out(ray_session, tiny_fixture):
    return _run(tiny_fixture)


def test_golden_span_equality(tiny_out, tiny_fixture):
    out = _norm(tiny_out)
    golden = _norm(pq.read_table(tiny_fixture.golden).to_pandas())
    pd.testing.assert_frame_equal(out, golden)


def test_output_schema_stable(tiny_out):
    assert list(tiny_out.columns) == [
        "doc_id", "seq", "kind", "text", "media_ref", "offset",
        "x_min", "y_min", "x_max", "y_max", "rot", "confidence", "method"]


def test_kinds_and_methods(tiny_out):
    assert set(tiny_out["kind"]) <= {"text", "tag", "image_text"}
    img = tiny_out[tiny_out["kind"] != "text"]
    assert set(img["method"]) <= {"TrOCR", "EasyOCR"}
    # vertical strings must have come through the fallback chain
    vert = img[img["rot"] == 90]
    if len(vert):
        assert (vert["method"] == "EasyOCR").all()
    horiz = img[img["rot"] == 0]
    if len(horiz):
        assert (horiz["method"] == "TrOCR").all()


def test_permutation_invariance(ray_session, tiny_fixture, tiny_out):
    # shuffling input docs must not change any per-doc span sequence
    import ray.data as rd

    docs = rd.read_parquet(tiny_fixture.docs).random_shuffle(seed=3)
    out2 = _run(tiny_fixture, docs=docs)
    pd.testing.assert_frame_equal(_norm(tiny_out), _norm(out2))


def test_oracle_detector_agrees_with_pixel_detector(ray_session, tiny_fixture, tiny_out):
    # FIXTURES.md §3 stub detector path: same final spans as pixel detection
    import ray
    import pyarrow.parquet as pq2
    from p_id_text_extraction_ray.stages.cv import OracleDetector

    oracle = pq2.read_table(tiny_fixture.oracle).to_pandas()
    by_ref = {}
    for ref, grp in oracle.groupby("media_ref"):
        by_ref[ref] = (grp[["x_min", "y_min", "x_max", "y_max"]].to_numpy(np.int64),
                       grp["rot"].to_numpy())
    ref_handle = ray.put(by_ref)
    out = _run(tiny_fixture, detector_cls=OracleDetector,
               detector_args=(ref_handle,))
    pd.testing.assert_frame_equal(_norm(tiny_out), _norm(out))


def test_golden_small_fixture(ray_session, small_fixture):
    out = _norm(_run(small_fixture))
    golden = _norm(pq.read_table(small_fixture.golden).to_pandas())
    pd.testing.assert_frame_equal(out, golden)

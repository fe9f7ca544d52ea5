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
        "x_min", "y_min", "x_max", "y_max", "img_w", "img_h", "rot",
        "confidence", "method"]


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


def test_forced_dense_grouping_path_golden(ray_session, tiny_fixture, tiny_out):
    """salted_grouping_threshold=0 forces every image through the spatial-
    decomposition grouping path — output must still be golden-identical
    (pipeline-level salt/no-salt equality, SURVEY.md §5.2)."""
    from dataclasses import replace
    from p_id_text_extraction_ray.config import ExtractConfig

    cfg = replace(ExtractConfig(), salted_grouping_threshold=0)
    out = _run(tiny_fixture, cfg=cfg)
    pd.testing.assert_frame_equal(_norm(tiny_out), _norm(out))


def test_stop_after_slicing(ray_session, tiny_fixture):
    import ray.data as rd
    from p_id_text_extraction_ray.pipelines.extract import extract_spans

    docs = rd.read_parquet(tiny_fixture.docs)
    det = extract_spans(docs, tiny_fixture.media_root,
                        stop_after="detect").to_pandas()
    assert {"media_ref", "tile_ord", "x_min", "rot"} <= set(det.columns)
    grp = extract_spans(docs, tiny_fixture.media_root,
                        stop_after="group").to_pandas()
    assert {"media_ref", "rank", "is_grouped", "n_src_tiles"} <= set(grp.columns)
    assert len(grp) <= len(det)   # grouping merges fragments
    uniq = extract_spans(docs, tiny_fixture.media_root,
                         stop_after="unique_media").to_pandas()
    assert uniq["media_ref"].is_unique


def test_derived_bbox_projections(tiny_out):
    import pyarrow as pa
    from p_id_text_extraction_ray.stages.assemble import (bbox_corners,
                                                          bbox_normalized,
                                                          to_pdf_points)
    img = tiny_out[tiny_out["kind"] != "text"]
    t = pa.Table.from_pandas(img, preserve_index=False)
    c = bbox_corners(t)
    row = c.slice(0, 1).to_pylist()[0]
    assert row["bbox"] == [[row["x_min"], row["y_min"]],
                           [row["x_max"], row["y_min"]],
                           [row["x_max"], row["y_max"]],
                           [row["x_min"], row["y_max"]]]
    n = bbox_normalized(t).to_pylist()[0]
    assert 0 <= n["x_min_norm"] <= 1 and n["x_max_norm"] <= 1
    p = to_pdf_points(t).to_pylist()[0]
    assert p["x_min_pdf"] == round(p["x_min"] * 72 / 600, 4)


def test_drop_counters(ray_session, tiny_fixture):
    import ray
    import ray.data as rd
    from p_id_text_extraction_ray.pipelines.extract import extract_spans
    from p_id_text_extraction_ray.state.counters import (counter_totals,
                                                         make_drop_counter)

    # a doc whose text span cleans to empty -> counted drop
    import pyarrow as pa
    span_t = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                 ("media_ref", pa.string()), ("offset", pa.int32())]))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(["D1"], pa.string()),
        "spans": pa.array([[{"kind": "text", "text": "COPYRIGHT FOOTER 2024",
                             "media_ref": "", "offset": 0},
                            {"kind": "text", "text": "keep me",
                             "media_ref": "", "offset": 1}]], span_t)}))
    counter = make_drop_counter()
    out = extract_spans(docs, tiny_fixture.media_root, counter=counter).to_pandas()
    assert len(out) == 1 and out["text"].iloc[0] == "keep me"
    totals = counter_totals(counter)
    assert totals.get("text_clean_empty") == 1


def test_split_media_pipeline_equals_whole(ray_session, tmp_path):
    """A giant image split across tile-range work units must produce the
    exact same spans as the same image processed whole — the e2e check of
    the split-media groupby branch (whole-image media group batch-locally
    with no shuffle; split media take the groupby path)."""
    from dataclasses import replace

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from p_id_text_extraction_ray.config import ExtractConfig
    from p_id_text_extraction_ray.media.codec import (BACKGROUND,
                                                      encode_image,
                                                      render_string)
    from p_id_text_extraction_ray.media.store import FileMediaStore
    from p_id_text_extraction_ray.pipelines.extract import extract_spans
    from p_id_text_extraction_ray.stages.cv import TilePlanStage

    canvas = np.full((1600, 2200), BACKGROUND, np.uint8)
    for text, x, y, rot in [("PIC-101", 100, 120, 0), ("DRAIN", 400, 300, 0),
                            ("VALVE-7", 1500, 900, 0), ("PUMP", 2000, 1400, 90),
                            ("FT-9", 900, 1200, 0)]:
        render_string(canvas, text, x, y, rot)
    store = FileMediaStore(str(tmp_path))
    store.put("media/big.pidr", encode_image(canvas))

    span_t = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                 ("media_ref", pa.string()),
                                 ("offset", pa.int32())]))
    docs = pa.table({
        "doc_id": pa.array(["DOC-A", "DOC-B"], pa.string()),
        "spans": pa.array(
            [[{"kind": "text", "text": "intro words", "media_ref": "",
               "offset": 0},
              {"kind": "image", "text": "", "media_ref": "media/big.pidr",
               "offset": 1}],
             [{"kind": "image", "text": "", "media_ref": "media/big.pidr",
               "offset": 0}]], span_t)})

    split_cfg = replace(ExtractConfig(), max_tiles_per_task=4,
                        tile_plan_size_threshold=0)
    # precondition: the planner really splits this blob at this setting
    plan = TilePlanStage(str(tmp_path), split_cfg, 4,
                         size_threshold=0)(
        pa.table({"media_ref": pa.array(["media/big.pidr"])}))
    assert len(plan) > 1

    def run(cfg):
        return _norm(extract_spans(rd.from_arrow(docs), str(tmp_path),
                                   cfg=cfg).to_pandas())

    pd.testing.assert_frame_equal(run(split_cfg), run(ExtractConfig()))

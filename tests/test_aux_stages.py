"""PDF ingest plumbing, multimodal stages, viz + dimension validator."""

import numpy as np
import pyarrow as pa
import pytest

from p_id_text_extraction_ray.media.codec import (BACKGROUND, decode_image,
                                                  encode_image, render_string)
from p_id_text_extraction_ray.media.store import FileMediaStore
from p_id_text_extraction_ray.sources.pdf import PdfIngestStage
from p_id_text_extraction_ray.stages.multimodal import (AudioFeatureStage,
                                                        ImageResizeStage,
                                                        VideoFrameSampleStage,
                                                        resize_nearest)
from p_id_text_extraction_ray.stages.viz import (AnnotationRenderStage,
                                                 check_dimension_compatibility,
                                                 validate_dimensions_batch)


def test_pdf_ingest_with_fake_rasterizer(tmp_path):
    def fake(blob, dpi):
        n_pages = blob[0]
        return [np.full((40, 30), 200 + p, np.uint8) for p in range(n_pages)]

    stage = PdfIngestStage(str(tmp_path), rasterize=fake)
    out = stage(pa.table({"doc_id": pa.array(["D1", "D2"]),
                          "pdf_bytes": pa.array([b"\x02xx", b"\x01yy"], pa.binary())}))
    assert out.column("media_ref").to_pylist() == [
        "media/D1_page_00.pidr", "media/D1_page_01.pidr", "media/D2_page_00.pidr"]
    store = FileMediaStore(str(tmp_path))
    img = decode_image(store.get("media/D1_page_01.pidr"))
    assert img.shape == (40, 30) and img[0, 0] == 201


def test_pdf_ingest_default_renderer_rejects_garbage(tmp_path):
    """The default rasterizer is now the real in-engine renderer
    (media/pdfraster.py); malformed PDF bytes fail fast with PdfError
    instead of the old NotImplementedError gate."""
    from p_id_text_extraction_ray.media.pdfdoc import PdfError

    stage = PdfIngestStage(str(tmp_path))
    with pytest.raises(PdfError):
        stage(pa.table({"doc_id": pa.array(["D"]),
                        "pdf_bytes": pa.array([b"x"], pa.binary())}))


def test_resize_nearest_and_stage(tmp_path):
    img = np.arange(100 * 60, dtype=np.uint8).reshape(100, 60) % 250
    assert resize_nearest(img, 50, 30).shape == (50, 30)
    store = FileMediaStore(str(tmp_path))
    store.put("media/a.pidr", encode_image(img))
    out = ImageResizeStage(str(tmp_path), target=50)(
        pa.table({"media_ref": pa.array(["media/a.pidr"])}))
    assert out.column("height").to_pylist() == [50]
    assert out.column("width").to_pylist() == [30]
    resized = decode_image(out.column("resized")[0].as_py())
    assert resized.shape == (50, 30)


def test_audio_feature_stage_fake_decoder():
    def fake_pcm(blob):
        rng = np.random.default_rng(len(blob))
        return rng.standard_normal(1600).astype(np.float32)

    stage = AudioFeatureStage(decode=fake_pcm)
    out = stage(pa.table({"ref": pa.array(["a", "b"]),
                          "audio": pa.array([b"12345", b""], pa.binary())}))
    feats = out.column("features").to_pylist()
    assert len(feats[0]) == AudioFeatureStage.N_FRAMES + 3
    assert feats[0] == AudioFeatureStage(decode=fake_pcm)(
        pa.table({"ref": ["a"], "audio": pa.array([b"12345"], pa.binary())})
    ).column("features").to_pylist()[0]  # deterministic


def test_audio_stage_gated_without_decoder():
    with pytest.raises(NotImplementedError):
        AudioFeatureStage()(pa.table({"ref": ["a"],
                                      "audio": pa.array([b"x"], pa.binary())}))


def test_video_frame_sample_stage():
    def fake_frames(blob, indices):
        return [np.full((8, 8), 10 + i, np.uint8) for i in indices]

    stage = VideoFrameSampleStage(k=3, decode_frames=fake_frames)
    out = stage(pa.table({"ref": pa.array(["v"]),
                          "video": pa.array([b"zz"], pa.binary()),
                          "n_frames": pa.array([30], pa.int32())}))
    assert out.column("frame_index").to_pylist() == [0, 10, 20]
    f0 = decode_image(out.column("frame")[0].as_py())
    assert f0[0, 0] == 10


def test_dimension_validator():
    # 600 dpi: 8.5x11in PDF = 612x792 pts -> 5100x6600 px
    ok = check_dimension_compatibility([5100, 5100, 9000], [6600, 6900, 6600],
                                       [612, 612, 612], [792, 792, 792])
    assert ok.tolist() == [True, True, False]   # 6900 is within 5% of 6600
    t = validate_dimensions_batch(pa.table({
        "img_w": pa.array([5100]), "img_h": pa.array([6600]),
        "pdf_w_pts": pa.array([612.0]), "pdf_h_pts": pa.array([792.0])}))
    assert t.column("dims_valid").to_pylist() == [True]


def test_annotation_render_stage(tmp_path):
    canvas = np.full((100, 150), BACKGROUND, np.uint8)
    render_string(canvas, "PUMP", 30, 40, 0)
    store = FileMediaStore(str(tmp_path))
    store.put("media/x.pidr", encode_image(canvas))
    out = AnnotationRenderStage(str(tmp_path))(pa.table({
        "media_ref": pa.array(["media/x.pidr", ""]),
        "x_min": pa.array([30, -1]), "y_min": pa.array([40, -1]),
        "x_max": pa.array([62, -1]), "y_max": pa.array([54, -1])}))
    assert out.column("n_boxes").to_pylist() == [1]
    img = decode_image(out.column("annotated")[0].as_py())
    assert img[40, 30] == 0 and img[53, 61] == 0       # border drawn
    assert img[0, 0] == BACKGROUND                      # background untouched


def test_grouping_stats_totals_match_direct(ray_session):
    """pid_grouping_stats' bucketed per-image dedup must equal a direct
    pandas recomputation from the grouped output."""
    from p_id_text_extraction_ray.pipelines.flagship import (pid_extract,
                                                             pid_grouping_stats)

    sf = "/root/testdata/sf0.001"
    st = pid_grouping_stats(sf).iloc[0]
    g = pid_extract(sf, stop_after="group").to_pandas()
    d = g.drop_duplicates("media_ref")
    assert st["images"] == len(d)
    assert st["boxes_before"] == d["n_boxes_before"].sum()
    assert st["boxes_after"] == len(g)
    assert st["suppressed"] == d["n_suppressed"].sum()
    assert st["merges"] == d["n_merges"].sum()

"""Metamorphic properties of the CV path (SURVEY.md §5.2 item 3), driven
through the actual stage callables locally (no Ray session needed — the
stages are plain callables over Arrow tables)."""

import numpy as np
import pyarrow as pa

from p_id_text_extraction_ray.config import ExtractConfig
from p_id_text_extraction_ray.media.codec import BACKGROUND, encode_image, render_string
from p_id_text_extraction_ray.media.store import FileMediaStore
from p_id_text_extraction_ray.stages.cv import DetectStage, make_group_fn

# DISCHARGE-99 is 12 chars = 96 px wide starting at x=640: it spans
# [640, 736), crossing the first tile edge (720) while wider than the 72 px
# tile overlap — so neither tile's fragment contains the other and grouping
# must genuinely merge the two fragments. (Shorter straddlers are fully
# contained in the overlapping neighbor tile and correctly deduped by
# Step-0 suppression instead.)
STRINGS = [("PIC-101", 100, 120, 0), ("DRAIN", 400, 300, 0),
           ("DISCHARGE-99", 640, 115, 0),
           ("PUMP", 900, 500, 90)]


def _render(shift_x: int, shift_y: int, w: int, h: int) -> bytes:
    canvas = np.full((h, w), BACKGROUND, np.uint8)
    for text, x, y, rot in STRINGS:
        render_string(canvas, text, x + shift_x, y + shift_y, rot)
    return encode_image(canvas)


def _detect_and_group(tmp_path, ref: str, blob: bytes):
    cfg = ExtractConfig()
    store = FileMediaStore(str(tmp_path))
    store.put(ref, blob)
    det = DetectStage(str(tmp_path), cfg)(
        pa.table({"media_ref": pa.array([ref])}))
    det = det.append_column("img_key", det.column("media_ref"))
    grouped = make_group_fn(cfg)(det)
    df = grouped.to_pandas().sort_values(["rank"]).reset_index(drop=True)
    return df


def test_translation_invariance(tmp_path):
    """Shifting all content by the tile stride shifts every grouped box by
    exactly the same amount; count, rotation, reading order unchanged."""
    stride = 648  # 720 * (1 - 0.1)
    a = _detect_and_group(tmp_path, "media/a.pidr", _render(0, 0, 1400, 1000))
    b = _detect_and_group(tmp_path, "media/b.pidr",
                          _render(stride, stride, 1400 + stride, 1000 + stride))
    assert len(a) == len(b) == len(STRINGS)
    assert a["rot"].tolist() == b["rot"].tolist()
    for c in ("x_min", "x_max"):
        assert (b[c].to_numpy() - a[c].to_numpy() == stride).all()
    for c in ("y_min", "y_max"):
        assert (b[c].to_numpy() - a[c].to_numpy() == stride).all()


def test_tile_range_splitting_exact(tmp_path):
    """Splitting a big image into tile-range work units (TilePlanStage)
    yields exactly the same detections as processing it whole."""
    import pandas as pd
    from dataclasses import replace
    from p_id_text_extraction_ray.stages.cv import TilePlanStage

    cfg = replace(ExtractConfig(), max_tiles_per_task=4)
    store = FileMediaStore(str(tmp_path))
    canvas = np.full((1600, 2200), BACKGROUND, np.uint8)
    for text, x, y, rot in STRINGS:
        render_string(canvas, text, x, y, rot)
    render_string(canvas, "FT-9", 1900, 1400, 0)
    store.put("media/big.pidr", encode_image(canvas))
    refs = pa.table({"media_ref": pa.array(["media/big.pidr"])})

    # size_threshold=0 forces header-read planning even for small blobs
    plan = TilePlanStage(str(tmp_path), cfg, cfg.max_tiles_per_task,
                         size_threshold=0)(refs)
    assert len(plan) > 1                       # image actually split
    # adaptive default: small blob passes through as one whole-image unit
    lazy = TilePlanStage(str(tmp_path), cfg, cfg.max_tiles_per_task)(refs)
    assert len(lazy) == 1 and lazy.column("tile_hi").to_pylist() == [-1]
    det_stage = DetectStage(str(tmp_path), cfg)
    chunked = det_stage(plan).to_pandas()
    whole = det_stage(refs).to_pandas()
    cols = ["tile_ord", "x_min", "y_min", "x_max", "y_max", "rot"]
    pd.testing.assert_frame_equal(
        chunked[cols].sort_values(cols).reset_index(drop=True),
        whole[cols].sort_values(cols).reset_index(drop=True))


def test_cross_tile_recovery_exact(tmp_path):
    """Grouping recovers exactly the rendered string boxes, including the
    one straddling a tile boundary (is_grouped=True for it)."""
    df = _detect_and_group(tmp_path, "media/c.pidr", _render(0, 0, 1400, 1000))
    from p_id_text_extraction_ray.media.codec import string_box_size
    want = sorted((x, y, x + string_box_size(t, r)[0], y + string_box_size(t, r)[1])
                  for t, x, y, r in STRINGS)
    got = sorted(zip(df["x_min"], df["y_min"], df["x_max"], df["y_max"]))
    assert [tuple(map(int, g)) for g in got] == want
    straddler = df[(df["x_min"] == 640)]
    assert bool(straddler["is_grouped"].iloc[0])
    assert int(straddler["n_src_tiles"].iloc[0]) == 2
    # reference-format source-tile metadata (sahi_slicer.py:106 ids,
    # metadata_manager grid positions), sorted-ordinal order
    tiles = list(straddler["src_tiles"].iloc[0])
    assert tiles == ["c_T0000", "c_T0001"]
    gpos = [list(p) for p in straddler["grid_positions"].iloc[0]]
    assert gpos == [[0, 0], [0, 1]]
    single = df[(df["x_min"] == 100)]
    assert list(single["src_tiles"].iloc[0]) == ["c_T0000"]
    assert not bool(single["is_grouped"].iloc[0])


def test_hot_ref_salted_join_equals_unsalted(ray_session, tmp_path):
    """Salt/no-salt equality for the span fan-out join (SURVEY.md §5.2):
    forcing every media_ref hot (threshold 1, salt 4) must produce exactly
    the spans of the default unsalted run — and both must match golden."""
    import dataclasses

    import pyarrow.parquet as pq
    import ray.data as rd

    from p_id_text_extraction_ray.fixtures.generate import generate_fixture
    from p_id_text_extraction_ray.pipelines.extract import extract_spans

    # media_pool=3 -> many docs share 3 refs: genuine fan-out skew
    fp = generate_fixture(str(tmp_path / "fix"), n_docs=20, seed=31,
                          media_pool=3)
    docs = rd.read_parquet(fp.docs)
    cols = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]

    def run(cfg):
        out_dir = str(tmp_path / f"out_{cfg.join_salt}_{cfg.hot_ref_span_threshold}")
        extract_spans(rd.read_parquet(fp.docs), fp.media_root, cfg) \
            .write_parquet(out_dir)
        d = pq.read_table(out_dir).to_pandas()
        return d[cols].astype({"seq": "int64", "offset": "int64"}) \
            .sort_values(["doc_id", "seq"]).reset_index(drop=True)

    base = run(ExtractConfig())                       # nothing crosses threshold
    salted = run(dataclasses.replace(ExtractConfig(),
                                     hot_ref_span_threshold=1, join_salt=4))
    assert base.equals(salted)
    gold = pq.read_table(fp.golden).to_pandas()[cols] \
        .astype({"seq": "int64", "offset": "int64"}) \
        .sort_values(["doc_id", "seq"]).reset_index(drop=True)
    assert base.equals(gold)

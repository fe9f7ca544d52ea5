"""Detector extension surface: the pipeline must produce identical golden
spans under any detector_cls that finds the same regions — the engine's
version of the reference's (unused) ``detector: craft|dbnet18`` config
selector (``configs/base.yaml:34``)."""

import numpy as np
import pytest

from p_id_text_extraction_ray.functions.rectdetect import (detect_rects,
                                                           detect_rects_dbnet)
from p_id_text_extraction_ray.media.codec import BACKGROUND, render_string


def test_dbnet_kernel_matches_runmerge_on_fixture_content():
    canvas = np.full((400, 600), BACKGROUND, np.uint8)
    render_string(canvas, "PIC-101", 30, 40, 0)
    render_string(canvas, "REFLUX", 300, 200, 0)
    render_string(canvas, "PUMP", 500, 60, 90)
    assert detect_rects_dbnet(canvas).tolist() == detect_rects(canvas).tolist()
    empty = np.full((50, 50), BACKGROUND, np.uint8)
    assert detect_rects_dbnet(empty).shape == (0, 4)


def test_dbnet_kernel_merges_close_regions():
    """Regions with gap <= 2*dilate merge (the unclip semantics) — the one
    intended behavioral difference from the exact run-merge detector."""
    canvas = np.full((60, 120), BACKGROUND, np.uint8)
    canvas[10:20, 10:40] = 65
    canvas[10:20, 43:70] = 66      # 3 px gap < 2*dilate=4 -> merged
    canvas[40:50, 10:40] = 67      # far away -> separate
    got = detect_rects_dbnet(canvas, dilate=2)
    assert got.tolist() == [[10, 10, 70, 20], [10, 40, 40, 50]]
    assert len(detect_rects(canvas)) == 3


def test_pipeline_golden_under_swapped_detector(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from p_id_text_extraction_ray.fixtures.generate import generate_fixture
    from p_id_text_extraction_ray.pipelines.extract import extract_spans
    from p_id_text_extraction_ray.stages.cv import DBNetDetector

    fp = generate_fixture(str(tmp_path / "fix"), n_docs=8, seed=55)
    out_dir = str(tmp_path / "out")
    extract_spans(rd.read_parquet(fp.docs), fp.media_root,
                  detector_cls=DBNetDetector).write_parquet(out_dir)
    out = pq.read_table(out_dir).to_pandas()
    gold = pq.read_table(fp.golden).to_pandas()
    cols = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]

    def norm(d):
        return d[cols].astype({"seq": "int64", "offset": "int64"}) \
            .sort_values(["doc_id", "seq"]).reset_index(drop=True)

    assert norm(out).equals(norm(gold))

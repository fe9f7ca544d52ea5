"""Adversarial-detector contract: a real user's model (CRAFT/DBNet) does
not emit oracle-shaped boxes — it duplicates, over-segments, and produces
out-of-bounds rectangles. The pipeline contract is the reference's
skip-and-drop semantics, and the noise model here is exactly the noise
the REFERENCE pipeline absorbs:

* exact duplicates and strictly-contained fragments are suppressed by the
  IoL>=0.9 containment rule before cropping (``grouping_logic.py``
  suppression step);
* boxes entirely outside the image clamp to an empty padded crop window
  and are skipped with a counter (``cropping_Images.py:50-52``
  ``if cropped_img.size == 0: continue``);
* boxes over blank background crop fine but recognize as empty text,
  which is dropped (``text_recognition.py:174``).

Noise the reference does NOT absorb (zero-area boxes at a glyph corner,
1-px specks inside text) is deliberately excluded: the reference pads
crops before the zero-size check (``cropping_Images.py:44-47``), so such
boxes produce real fragment recognitions there too — asserting they
vanish would demand semantics stricter than the reference's.

The noisy detector class is defined INSIDE each test: pytest imports
this file as a top-level module that Ray workers cannot import, so a
module-level subclass would make actor deserialization fail on every
restart (observed as an infinite hang). A function-local class is
serialized by value by cloudpickle and ships cleanly.
"""

import numpy as np

# Far beyond any fixture image width: after local->global translation the
# box stays fully outside the image, so the clamped padded crop window is
# empty -> the zero-size-crop drop path fires (cropping_Images.py:50-52).
FAR = 10**6


def _make_noisy_detector():
    from p_id_text_extraction_ray.functions.rectdetect import detect_rects
    from p_id_text_extraction_ray.stages.cv import PixelDetector

    def _noisy_kernel(tile):
        """The real kernel's boxes plus deterministic adversarial noise:
        exact duplicates, strictly-contained fragments, a fully
        out-of-bounds box, and (when the tile corner is provably blank)
        a background box no text lives under."""
        boxes = detect_rects(tile)
        noise = [[FAR, 2, FAR + 40, 12]]                    # out-of-bounds
        for x1, y1, x2, y2 in boxes:
            noise.append([x1, y1, x2, y2])                  # duplicate
            if x2 - x1 > 4 and y2 - y1 > 4:                 # contained
                noise.append([x1 + 1, y1 + 1, x2 - 1, y2 - 1])
        h, w = tile.shape[:2]
        if h > 16 and w > 16:
            corner = tile[h - 12:h - 2, w - 12:w - 2]
            if corner.size and np.all(corner == corner.flat[0]) \
                    and corner.flat[0] == tile.flat[0]:      # blank corner
                noise.append([w - 10, h - 10, w - 4, h - 4])  # background
        if not len(boxes):
            return np.asarray(noise, dtype=np.int64)
        return np.concatenate([np.asarray(boxes, dtype=np.int64),
                               np.asarray(noise, dtype=np.int64)])

    class NoisyDetector(PixelDetector):
        _kernel = staticmethod(_noisy_kernel)

    return NoisyDetector


def test_noise_absorbed_by_suppression_and_drop_paths(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from p_id_text_extraction_ray.fixtures.generate import generate_fixture
    from p_id_text_extraction_ray.pipelines.extract import extract_spans

    fp = generate_fixture(str(tmp_path / "fix"), n_docs=8, seed=77)
    out_dir = str(tmp_path / "out")
    extract_spans(rd.read_parquet(fp.docs), fp.media_root,
                  detector_cls=_make_noisy_detector()).write_parquet(out_dir)
    out = pq.read_table(out_dir).to_pandas()
    gold = pq.read_table(fp.golden).to_pandas()

    # every golden text span is still recovered, and nothing extra
    # survives: duplicates and contained fragments are absorbed by
    # suppression, out-of-bounds boxes fall out via the zero-size-crop
    # drop, blank-background boxes via the empty-text drop — none of
    # them crash the pipeline or corrupt spans
    cols = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]

    def norm(d):
        return d[cols].astype({"seq": "int64", "offset": "int64"}) \
            .sort_values(["doc_id", "seq"]).reset_index(drop=True)

    assert norm(out).equals(norm(gold))


def test_noisy_grouping_suppresses_and_keeps_envelopes(ray_session, tmp_path):
    """The grouped boxes under the noisy detector are exactly the clean
    detector's envelopes plus the (clamp-dropped / empty-text-dropped)
    noise boxes — suppression removed every duplicate and fragment."""
    import ray.data as rd

    from p_id_text_extraction_ray.fixtures.generate import generate_fixture
    from p_id_text_extraction_ray.pipelines.extract import extract_spans

    fp = generate_fixture(str(tmp_path / "fix"), n_docs=4, seed=31)

    def grouped(det_cls):
        kw = {"detector_cls": det_cls} if det_cls else {}
        return extract_spans(rd.read_parquet(fp.docs), fp.media_root,
                             stop_after="group", **kw).to_pandas()

    clean = grouped(None)
    noisy = grouped(_make_noisy_detector())
    key = ["media_ref", "x_min", "y_min", "x_max", "y_max"]

    # suppression fired
    assert int(noisy["n_suppressed"].sum()) > int(clean["n_suppressed"].sum())

    # every clean envelope survives identically in the noisy run
    c = set(map(tuple, clean[key].itertuples(index=False)))
    n = set(map(tuple, noisy[key].itertuples(index=False)))
    assert c <= n

    # and every extra noisy group is droppable noise: fully out-of-bounds
    # (x_min >= img_w) or a blank-background box (strictly smaller than
    # any real glyph box, i.e. <= 10px a side)
    extra = noisy[~noisy[key].apply(tuple, axis=1).isin(c)]
    oob = extra["x_min"] >= extra["img_w"]
    tiny = ((extra["x_max"] - extra["x_min"]) <= 10) & \
           ((extra["y_max"] - extra["y_min"]) <= 10)
    assert bool((oob | tiny).all())

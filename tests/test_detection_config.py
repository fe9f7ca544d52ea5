"""The reference's seven CRAFT/EasyOCR detect thresholds
(``configs/base.yaml:33-41`` -> ``text_detection.py:64-81``) as engine
behavior: hysteresis binarization from text_threshold/low_text, the
glyph-linking radius from link_threshold, and the EasyOCR-style
same-line merge from height/width/slope/ycenter_ths — all through
``config.DetectionConfig`` and ``stages/ocr.WordDetector``."""

import numpy as np
import pytest

from p_id_text_extraction_ray.config import DetectionConfig, ExtractConfig
from p_id_text_extraction_ray.functions.rectdetect import (detect_rects_words,
                                                           merge_line_boxes)
from p_id_text_extraction_ray.stages.ocr import WordDetector


def blank(h=80, w=200):
    return np.full((h, w), 255, np.uint8)


# --- hysteresis binarization (text_threshold / low_text) -----------------

def test_weak_only_component_dropped():
    """A blob entirely of mid-gray (above the text_threshold cut, below
    the low_text cut) is candidate ink but never confirms -> dropped."""
    img = blank()
    img[20:40, 30:60] = 150          # weak: 150 <= 204, not <= 76
    out = detect_rects_words(img, strong_max=76, weak_max=204)
    assert len(out) == 0


def test_weak_component_with_strong_pixel_kept_whole():
    """One strong pixel confirms the WHOLE component at its weak-ink
    extent — CRAFT's region-growing semantics."""
    img = blank()
    img[20:40, 30:60] = 150
    img[30, 45] = 0                  # strong seed
    out = detect_rects_words(img, strong_max=76, weak_max=204)
    assert out.tolist() == [[30, 20, 60, 40]]


def test_light_speckle_ignored():
    """Pixels lighter than the low_text cut are background."""
    img = blank()
    img[20:40, 30:60] = 230          # 230 > 204
    img[50:60, 100:120] = 0          # real ink elsewhere
    out = detect_rects_words(img, strong_max=76, weak_max=204)
    assert out.tolist() == [[100, 50, 120, 60]]


def test_no_thresholds_is_exact_nonbackground():
    """Without the keyword thresholds the kernel keeps its original
    exact ``!= bg`` semantics (regression guard for existing callers)."""
    img = blank()
    img[20:40, 30:60] = 230
    out = detect_rects_words(img)
    assert out.tolist() == [[30, 20, 60, 40]]


# --- link_threshold -> dilation radius ------------------------------------

def test_link_threshold_controls_word_linking():
    img = blank()
    img[20:40, 30:40] = 0
    img[20:40, 50:60] = 0            # 10 px gap
    # default link 0.9 -> dilate 8 -> gaps <= 16 px merge
    d_loose = WordDetector(ExtractConfig())
    assert d_loose._kernel(img).tolist() == [[30, 20, 60, 40]]
    # link 0.97 -> dilate 2 -> only gaps <= 4 px merge
    d_tight = WordDetector(ExtractConfig(
        detection=DetectionConfig(link_threshold=0.97)))
    assert d_tight._kernel(img).tolist() == [[30, 20, 40, 40],
                                             [50, 20, 60, 40]]


def test_default_config_matches_bare_kernel_on_binary_ink():
    """With the shipped defaults and hard (0/255) ink, the configured
    WordDetector kernel agrees with the bare kernel call — the
    threshold wiring does not perturb the tuned behavior."""
    rng = np.random.default_rng(7)
    img = blank(120, 300)
    for _ in range(12):
        y, x = rng.integers(5, 90), rng.integers(5, 260)
        img[y:y + rng.integers(8, 25), x:x + rng.integers(8, 30)] = 0
    got = WordDetector(ExtractConfig())._kernel(img)
    want = detect_rects_words(img)
    assert got.tolist() == want.tolist()


# --- same-line merge (height/width/slope/ycenter_ths) ---------------------

def test_merge_nearly_touching_same_line():
    boxes = np.array([[10, 20, 40, 50], [42, 20, 80, 50]])  # 2 px gap, h=30
    out = merge_line_boxes(boxes, 0.1, 0.1, 0.04, 0.5)
    assert out.tolist() == [[10, 20, 80, 50]]


def test_no_merge_across_lines():
    boxes = np.array([[10, 20, 40, 50], [10, 60, 40, 90]])  # stacked
    out = merge_line_boxes(boxes, 0.1, 0.1, 0.04, 0.5)
    assert len(out) == 2


def test_no_merge_wide_gap_at_default_width_ths():
    boxes = np.array([[10, 20, 40, 50], [60, 20, 90, 50]])  # 20 px gap > 3
    out = merge_line_boxes(boxes, 0.1, 0.1, 0.04, 0.5)
    assert len(out) == 2
    # a permissive width_ths merges them (gap 20 <= 1.0 * 30)
    out = merge_line_boxes(boxes, 0.1, 1.0, 0.04, 0.5)
    assert out.tolist() == [[10, 20, 90, 50]]


def test_no_merge_mismatched_heights():
    boxes = np.array([[10, 20, 40, 50], [42, 10, 80, 60]])  # h 30 vs 50
    out = merge_line_boxes(boxes, 0.1, 0.1, 0.04, 0.5)
    assert len(out) == 2


def test_merge_is_transitive():
    boxes = np.array([[10, 20, 40, 50], [42, 20, 70, 50], [72, 20, 100, 50]])
    out = merge_line_boxes(boxes, 0.1, 0.1, 0.04, 0.5)
    assert out.tolist() == [[10, 20, 100, 50]]


# --- config validation -----------------------------------------------------

def test_config_validation():
    with pytest.raises(ValueError):
        DetectionConfig(text_threshold=0.0)
    with pytest.raises(ValueError):
        DetectionConfig(low_text=0.8)    # above text_threshold 0.7
    with pytest.raises(ValueError):
        DetectionConfig(link_threshold=1.5)


# --- end-to-end: thresholds reach the actor on rendered glyphs -------------

def test_rendered_page_with_faint_watermark():
    """A rendered tag plus a faint gray watermark block: the watermark
    is weak-only ink and must not become a detection."""
    from p_id_text_extraction_ray.fixtures.pdfgen import make_pdf
    from p_id_text_extraction_ray.media.pdfraster import render_pdf_pages

    pdf = make_pdf([b"BT /F1 24 Tf 20 100 Td (FT-101) Tj ET\n"])
    page = render_pdf_pages(pdf, dpi=150)[0].copy()
    page[5:25, 5:120] = 170          # faint watermark stripe
    det = WordDetector(ExtractConfig())
    boxes = det._kernel(page)
    assert len(boxes) == 1           # the tag only
    x1, y1, x2, y2 = boxes[0]
    assert y1 > 25                   # not the watermark region

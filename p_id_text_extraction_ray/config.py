"""Engine configuration.

Mirrors the reference's tuning surface (``/root/reference/configs/base.yaml``)
as a plain frozen dataclass passed explicitly into stages — no global config
singleton (the reference uses one: ``configs/config_manager.py:15-22``).
Defaults are the reference's shipped values.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class GroupingConfig:
    """Thresholds of the 5-step graph grouping.

    Reference: ``/root/reference/configs/base.yaml:48-55`` and
    ``src/grouping/grouping_logic.py:24-31``.
    """

    high_overlap_threshold: float = 0.1      # IoU for "high_overlap" connect rule
    high_iou_threshold: float = 0.95         # IoU for keep-larger-instead-of-merge
    contained_box_threshold: float = 0.9     # IoL for Step-0 containment suppression
    vertical_alignment_factor: float = 0.2   # horizontal text: max |cy1-cy2| = min_h * f
    horizontal_alignment_factor: float = 0.2 # vertical text: max |cx1-cx2| = min_w * f
    proximity_factor: float = 1.0            # max gap = max_dimension * f
    neighborhood_expansion_factor: float = 1.0


@dataclass(frozen=True)
class TilingConfig:
    """Sliding-window tiling parameters.

    Reference: ``/root/reference/configs/base.yaml:12-16`` and
    ``src/data_loader/sahi_slicer.py:40-51`` (validation: overlap in (0,1),
    tile_size >= 64).
    """

    tile_size: int = 720
    overlap_ratio: float = 0.1

    def __post_init__(self) -> None:
        if not 0 < self.overlap_ratio < 1:
            raise ValueError("Overlap ratio must be between 0 and 1")
        if self.tile_size < 64:
            raise ValueError("Tile size too small (min 64px)")


@dataclass(frozen=True)
class DetectionConfig:
    """The reference's seven CRAFT/EasyOCR ``detect()`` thresholds
    (``/root/reference/configs/base.yaml:33-41``, passed through at
    ``src/text_detection/text_detection.py:64-81``), mapped onto the
    engine's glyph-ink word detector (``stages/ocr.WordDetector`` ->
    ``functions/rectdetect.detect_rects_words``). Defaults are the
    reference's shipped values; each mapping is documented where it is
    applied:

    - ``text_threshold`` / ``low_text`` -> hysteresis binarization: a
      pixel with luminance <= 255*(1-low_text) is *candidate* ink (the
      region-growing low cut of CRAFT's score map); a component is kept
      only if it contains at least one *strong* pixel with luminance
      <= 255*(1-text_threshold) (the confidence cut).
    - ``link_threshold`` -> the glyph-linking dilation radius: adjacent
      glyphs whose gap is <= 2*dilate merge into one word, where
      ``dilate = round(80 * (1 - link_threshold))`` px — calibrated so
      the shipped default (0.9) reproduces the kernel's tuned 8 px link
      radius for 150 dpi / 24 pt renders; a higher link threshold
      demands stronger affinity, i.e. a smaller linking radius.
    - ``height_ths`` / ``width_ths`` / ``slope_ths`` / ``ycenter_ths``
      -> the post-detection same-line box merge (EasyOCR's
      ``group_text_box`` step): two word boxes merge when their heights
      differ by <= height_ths * max(h), their vertical centers by
      <= ycenter_ths * max(h), their horizontal gap is
      <= width_ths * max(h), and the center-to-center slope is
      <= slope_ths.
    """

    text_threshold: float = 0.7   # base.yaml:35
    link_threshold: float = 0.9   # base.yaml:36
    low_text: float = 0.2         # base.yaml:37
    height_ths: float = 0.1       # base.yaml:38
    width_ths: float = 0.1        # base.yaml:39
    slope_ths: float = 0.04       # base.yaml:40
    ycenter_ths: float = 0.5      # base.yaml:41

    def __post_init__(self) -> None:
        if not 0 < self.text_threshold <= 1:
            raise ValueError("text_threshold must be in (0, 1]")
        if not 0 <= self.low_text <= self.text_threshold:
            raise ValueError("low_text must be in [0, text_threshold]")
        if not 0 < self.link_threshold <= 1:
            raise ValueError("link_threshold must be in (0, 1]")


@dataclass(frozen=True)
class RecognitionConfig:
    """Recognition fallback-chain parameters.

    Reference: ``/root/reference/configs/base.yaml:43`` (confidence gate) and
    ``src/text_detection/text_recognition.py:111-131`` (primary OCR, then if
    confidence < gate: rotate-if-vertical and run fallback OCR; keep fallback
    result only when it produced non-empty text).
    """

    confidence_threshold: float = 0.95


@dataclass(frozen=True)
class ReadingOrderConfig:
    """Deterministic reading-order sort (north-star addition; the reference's
    output order is incidental filesystem-glob order, SURVEY.md §2.6).

    Boxes are clustered into lines when their y-anchors differ by less than
    ``line_tolerance_factor`` x the smaller box height; lines sort by y, boxes
    within a line by x. Vertical (rot=90) boxes anchor at their top edge.
    """

    line_tolerance_factor: float = 0.5


@dataclass(frozen=True)
class ExtractConfig:
    """Top-level engine configuration for the extraction pipeline."""

    tiling: TilingConfig = field(default_factory=TilingConfig)
    detection: DetectionConfig = field(default_factory=DetectionConfig)
    grouping: GroupingConfig = field(default_factory=GroupingConfig)
    recognition: RecognitionConfig = field(default_factory=RecognitionConfig)
    reading_order: ReadingOrderConfig = field(default_factory=ReadingOrderConfig)

    crop_padding: int = 10           # base.yaml:74, cropping_Images.py:44-47
    image_dpi: int = 600             # base.yaml:59; pixel->PDF-point scale 72/dpi

    # Detector binarization tolerance: pixels within this distance of the
    # background value are snapped to background before the detection
    # kernel runs — the engine-side analogue of CRAFT's detection
    # thresholds (reference ``configs/base.yaml:35-37`` text_threshold /
    # low_text), needed for lossy-decoded media (JPEG ringing leaves
    # near-background speckle around glyph edges). 0 = exact matching
    # (lossless PIDR/PNG fixtures).
    detect_bg_tolerance: int = 0

    # Text path: route markup-bearing text spans through HTML
    # main-content extraction (functions/htmlextract) before the
    # byte-stream clean — the north star's "HTML boilerplate strip"
    # for crawl-shaped corpora. Off by default: the P&ID fixture
    # corpus carries plain text and the goldens pin that behavior.
    html_strip: bool = False

    # Ray execution knobs. Actor pools AUTOSCALE between (1, max); max=None
    # derives from the cluster CPU count at pipeline build so the two pools
    # plus the stateless task stages can never deadlock a small cluster
    # (each pool gets ~1/3 of the CPUs, min 1).
    detect_batch_size: int = 64      # tiles per detector-actor call
    recognize_batch_size: int = 256  # crops per recognizer-actor call
    detect_concurrency: int | None = None    # max detector actors (None = auto)
    recognize_concurrency: int | None = None  # max recognizer actors (None = auto)
    tile_rows_per_block: int = 128   # cap tile rows per block (a 720^2 tile ~0.5 MB)

    # Skew: images whose detection count exceeds this take the two-phase
    # (spatial-cell salted) grouping path instead of the direct O(n^2) one.
    salted_grouping_threshold: int = 3000
    # Skew: a media_ref referenced by at least this many document spans has
    # its span-fanout join group salted by doc-hash into join_salt
    # sub-groups (media rows replicated per salt), so one boilerplate
    # diagram referenced by millions of docs can't funnel into one group.
    hot_ref_span_threshold: int = 10_000
    join_salt: int = 16
    # Giant images split into tile-range work units of at most this many
    # tiles (header-only planning; see stages/cv.TilePlanStage).
    max_tiles_per_task: int = 64
    # Blobs under this many compressed bytes skip header planning and pass
    # through as one whole-image unit; None = TilePlanStage's default
    # (1 MiB). Lower it for corpora of raw/uncompressed media.
    tile_plan_size_threshold: int | None = None

"""CV-path stages: tile, detect, group, crop, recognize, span-join.

Execution shapes (SURVEY.md §7.0):

* The CV path is keyed by **media_ref** and processes each distinct image
  exactly once: image spans reduce to unique refs
  (``groupby(media_ref).aggregate(Count)``), the CV stages run per unique
  image, and a final co-partitioned join on ``media_ref`` re-attaches
  (doc_id, offset) to every span that referenced the image. Shared media
  (boilerplate diagrams, repeated attachments — FIXTURES.md §5 bench shape)
  costs one decode+detect+recognize, not one per referencing span.
* ``TileStage`` / ``CropStage`` — stateless ``map_batches`` callables that
  resolve media bytes from the store at the last moment; only coordinates
  enter shuffles, pixels flow forward through the object store
  (SURVEY.md §7.3 "never shuffle pixel payloads").
* ``PixelDetector`` / ``StubRecognizer`` — callable classes for
  ``map_batches(Cls, concurrency=(1, n))`` actor pools: model-shaped state
  is constructed once per actor in ``__init__`` (the reference constructs
  its EasyOCR/TrOCR models once per run: ``run_pipeline.py:154``,
  ``text_recognition.py:37-51``).
* ``group_image_boxes`` — the per-image ``map_groups`` function behind the
  ``groupby(media_ref)`` shuffle, reproducing the reference's 5-step
  grouping (``src/grouping/grouping_logic.py:653-799``) via the vectorized
  kernels in ``functions/geometry.py``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ExtractConfig
from ..functions.geometry import ConnectParams, group_boxes, group_boxes_large
from ..functions.rectdetect import detect_rects, detect_rects_dbnet
from ..functions.reading_order import reading_order_ranks
from ..functions.textops import classify_kinds
from ..functions.tiling import tile_windows
from ..media.codec import BACKGROUND, CELL_W, decode_image
from ..media.store import FileMediaStore
from .spans import SPAN_ROW_FIELDS, SPAN_ROW_SCHEMA

DETECTION_SCHEMA = pa.schema([
    ("media_ref", pa.string()),        # the shuffle key
    ("tile_ord", pa.int32()),
    ("img_w", pa.int32()), ("img_h", pa.int32()),
    ("x_min", pa.int32()), ("y_min", pa.int32()),   # GLOBAL image coords
    ("x_max", pa.int32()), ("y_max", pa.int32()),
    ("rot", pa.int8()),
])

GROUPED_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("rank", pa.int32()),              # reading-order rank within the image
    ("x_min", pa.int32()), ("y_min", pa.int32()),
    ("x_max", pa.int32()), ("y_max", pa.int32()),
    ("rot", pa.int8()),
    ("img_w", pa.int32()), ("img_h", pa.int32()),
    ("n_src_tiles", pa.int32()),
    # reference-format source-tile metadata (grouping_logic.py:896-905
    # 'grouped_from_tiles' tile-id strings; metadata_manager.py:81
    # grid_position): ids are "{media_basename}_T{ord:04d}"
    # (sahi_slicer.py:106), listed in sorted-tile-ordinal order — the
    # engine's deterministic D4 set-union replacing the reference's
    # unordered list(set(...)).
    ("src_tiles", pa.list_(pa.string())),
    ("grid_positions", pa.list_(pa.list_(pa.int32()))),
    ("is_grouped", pa.bool_()),
    # per-image grouping metrics, repeated on each of the image's rows
    # (G5 parity: boxes before/after, suppression, merges —
    # grouping_logic.py:966-989)
    ("n_boxes_before", pa.int32()),
    ("n_suppressed", pa.int32()),
    ("n_merges", pa.int32()),
])

# Recognized rows per unique media: SPAN_ROW fields minus doc identity.
MEDIA_ROW_SCHEMA = pa.schema([(n, t) for n, t in SPAN_ROW_FIELDS
                              if n not in ("doc_id", "offset")])


def _np_tile(buf, h: int, w: int) -> np.ndarray:
    """Zero-copy uint8 view over an Arrow binary cell."""
    return np.frombuffer(buf.as_buffer(), dtype=np.uint8).reshape(h, w)


class TilePlanStage:
    """Split each image into tile-range work units using only its header.

    The skew valve for giant images (north star: "skewed docs (many tiles)
    are salted and split across partitions"): a ranged header read gives the
    tile count without decoding pixels, and images whose tile count exceeds
    ``max_tiles_per_task`` become several (media_ref, tile_lo, tile_hi)
    rows, so one 30k-px sheet spreads across many detector tasks instead of
    serializing inside one.

    Adaptive: blobs smaller than ``size_threshold`` bytes skip even the
    header read (a stat/HEAD is enough) and pass through as one whole-image
    unit (tile_hi = -1 sentinel) — the planner costs ~nothing on corpora of
    ordinary images. A giant-but-hyper-compressible image below the
    threshold degrades gracefully to single-task processing.
    """

    HEADER_BYTES = 64   # covers the PIDR header (13 B) and PNG IHDR (~33 B)
    SIZE_THRESHOLD = 1 << 20   # 1 MiB compressed ≈ well under max tiles

    def __init__(self, media_root: str, cfg: ExtractConfig,
                 max_tiles_per_task: int = 64,
                 size_threshold: int | None = None):
        self.store = FileMediaStore(media_root)
        self.cfg = cfg
        self.max_tiles = max_tiles_per_task
        self.size_threshold = (self.SIZE_THRESHOLD if size_threshold is None
                               else size_threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..media.codec import peek_dimensions
        t = self.cfg.tiling
        refs: list[str] = []
        los: list[int] = []
        his: list[int] = []
        for ref in batch.column("media_ref").to_pylist():
            if self.store.size(ref) < self.size_threshold:
                refs.append(ref)
                los.append(0)
                his.append(-1)   # sentinel: all tiles
                continue
            w, h = peek_dimensions(self.store.get_prefix(ref, self.HEADER_BYTES))
            n = len(tile_windows(w, h, t.tile_size, t.overlap_ratio))
            for lo in range(0, n, self.max_tiles):
                refs.append(ref)
                los.append(lo)
                his.append(min(n, lo + self.max_tiles))
        return pa.table({"media_ref": pa.array(refs, pa.string()),
                         "tile_lo": pa.array(los, pa.int32()),
                         "tile_hi": pa.array(his, pa.int32())})


class TileStage:
    """Decode media and slice into overlapping tiles (1 row -> N tile rows).

    Mirrors the reference slicer's placement exactly
    (``src/data_loader/sahi_slicer.py:79-138`` via ``functions/tiling.py``)
    but keeps tiles in-flight as Arrow binary rows instead of PNG files
    (eliminating S3/S4 of SURVEY.md §2.1). Input rows: unique media_refs,
    optionally with (tile_lo, tile_hi) range columns from ``TilePlanStage``
    restricting which windows this task emits.
    """

    def __init__(self, media_root: str, cfg: ExtractConfig):
        self.store = FileMediaStore(media_root)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.cfg.tiling
        has_range = "tile_lo" in batch.schema.names
        n_rows = len(batch)
        lo_col = batch.column("tile_lo").to_pylist() if has_range else [0] * n_rows
        hi_col = batch.column("tile_hi").to_pylist() if has_range else [None] * n_rows
        refs_out: list[str] = []
        ords: list[int] = []
        dims: list[tuple[int, int, int, int, int, int]] = []
        payloads: list[bytes] = []
        for ref, lo, hi in zip(batch.column("media_ref").to_pylist(),
                               lo_col, hi_col):
            img = decode_image(self.store.get(ref))
            h, w = img.shape
            windows = tile_windows(w, h, t.tile_size, t.overlap_ratio)
            if hi is None or hi < 0:
                hi = len(windows)
            else:
                hi = min(hi, len(windows))
            for ord_ in range(lo, hi):
                x1, y1, x2, y2 = windows[ord_].tolist()
                refs_out.append(ref)
                ords.append(ord_)
                dims.append((w, h, x1, y1, x2, y2))
                payloads.append(np.ascontiguousarray(img[y1:y2, x1:x2]).tobytes())
        d = np.array(dims, dtype=np.int32).reshape(-1, 6)
        return pa.table({
            "media_ref": pa.array(refs_out, pa.string()),
            "tile_ord": pa.array(ords, pa.int32()),
            "img_w": pa.array(d[:, 0]), "img_h": pa.array(d[:, 1]),
            "tx1": pa.array(d[:, 2]), "ty1": pa.array(d[:, 3]),
            "tx2": pa.array(d[:, 4]), "ty2": pa.array(d[:, 5]),
            "tile": pa.array(payloads, pa.binary()),
        })


class PixelDetector:
    """Text-region detection actor: tile pixels -> detection rows in GLOBAL
    image coordinates.

    Replaces the reference's per-tile EasyOCR CRAFT ``detect``
    (``text_detection.py:49-104``) with the pixel rect detector; the
    orientation heuristic is the reference's (90 iff taller than wide,
    ``text_detection.py:106-115``) applied per detected fragment. The
    local->global translation the reference defers to grouping
    (``grouping_logic.py:94-116``) is fused here (SURVEY.md M6), so the
    shuffle carries final coordinates. Detections within a tile are emitted
    sorted by (y, x) — the canonical order replacing the reference's glob
    order.
    """

    _kernel = staticmethod(detect_rects)   # swap point for other detectors

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tile_col = batch.column("tile").combine_chunks()
        tx1 = batch.column("tx1").to_numpy()
        ty1 = batch.column("ty1").to_numpy()
        tx2 = batch.column("tx2").to_numpy()
        ty2 = batch.column("ty2").to_numpy()
        refs = batch.column("media_ref").to_pylist()
        ords = batch.column("tile_ord").to_numpy()
        img_w = batch.column("img_w").to_numpy()
        img_h = batch.column("img_h").to_numpy()

        out_boxes: list[np.ndarray] = []
        out_meta: list[tuple[int, int]] = []   # (row index, n boxes)
        tol = self.cfg.detect_bg_tolerance
        for i in range(len(batch)):
            tile = _np_tile(tile_col[i], int(ty2[i] - ty1[i]), int(tx2[i] - tx1[i]))
            if tol:
                # binarize toward background before the kernel — the
                # engine analogue of CRAFT's text/low_text thresholds
                # (configs/base.yaml:35-37); absorbs lossy-codec ringing
                tile = tile.copy()
                tile[np.abs(tile.astype(np.int16) - BACKGROUND) <= tol] = BACKGROUND
            boxes = self._kernel(tile)
            if len(boxes):
                boxes = boxes + np.array([tx1[i], ty1[i], tx1[i], ty1[i]])
                out_boxes.append(boxes)
                out_meta.append((i, len(boxes)))
        if not out_boxes:
            return pa.table({f.name: pa.array([], f.type) for f in DETECTION_SCHEMA},
                            schema=DETECTION_SCHEMA)
        all_boxes = np.concatenate(out_boxes)
        idx = np.concatenate([np.full(n, i) for i, n in out_meta])
        rot = np.where((all_boxes[:, 3] - all_boxes[:, 1]) >
                       (all_boxes[:, 2] - all_boxes[:, 0]), 90, 0).astype(np.int8)
        return pa.table({
            "media_ref": pa.array([refs[i] for i in idx], pa.string()),
            "tile_ord": pa.array(ords[idx].astype(np.int32)),
            "img_w": pa.array(img_w[idx].astype(np.int32)),
            "img_h": pa.array(img_h[idx].astype(np.int32)),
            "x_min": pa.array(all_boxes[:, 0].astype(np.int32)),
            "y_min": pa.array(all_boxes[:, 1].astype(np.int32)),
            "x_max": pa.array(all_boxes[:, 2].astype(np.int32)),
            "y_max": pa.array(all_boxes[:, 3].astype(np.int32)),
            "rot": pa.array(rot),
        }, schema=DETECTION_SCHEMA)


class DBNetDetector(PixelDetector):
    """Alternative detector actor exercising the ``detector_cls`` swap
    surface (the reference's unused ``detector: craft|dbnet18`` selector,
    ``configs/base.yaml:34``): identical actor plumbing, DBNet-style
    segmentation kernel (``functions/rectdetect.detect_rects_dbnet``).
    The swap test runs the full pipeline under both detectors and asserts
    golden equality."""

    _kernel = staticmethod(detect_rects_dbnet)


class DetectStage:
    """Fused decode+tile+detect actor stage: unique media rows -> detection
    rows.

    Tiling and detection are deliberately one actor stage: tile pixel
    payloads stream decode->detect inside the actor process and never enter
    the object store (they are ~2.2x the source bytes; shipping them is
    pure memory-bandwidth tax — SURVEY.md §7.3). The tiling math and the
    detector remain separate, individually-tested components
    (``TileStage``/``PixelDetector``); this class is their composition. A
    GPU detector would keep the same shape with ``num_gpus`` on the pool.
    """

    def __init__(self, media_root: str, cfg: ExtractConfig,
                 detector_cls=None, detector_args: tuple = ()):
        self.tile = TileStage(media_root, cfg)
        cls = detector_cls or PixelDetector
        self.det = cls(*(detector_args or (cfg,)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.det(self.tile(batch))


class OracleDetector:
    """Oracle-backed stub detector (FIXTURES.md §3): intersects ground-truth
    boxes with each tile window. Used in tests to cross-check PixelDetector;
    holds the broadcast oracle (``ray.put`` once, ``ray.get`` per actor in
    ``__init__`` — the small-side broadcast pattern)."""

    def __init__(self, oracle_ref, cfg: ExtractConfig | None = None):
        import ray
        self.oracle: dict[str, tuple[np.ndarray, np.ndarray]] = ray.get(oracle_ref)
        self.cfg = cfg or ExtractConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in
                                 ("media_ref", "tile_ord", "img_w", "img_h",
                                  "x_min", "y_min", "x_max", "y_max", "rot")}
        meta = {k: batch.column(k).to_pylist()
                for k in ("media_ref", "tile_ord", "img_w", "img_h",
                          "tx1", "ty1", "tx2", "ty2")}
        for i in range(len(batch)):
            entry = self.oracle.get(meta["media_ref"][i])
            if entry is None:
                continue
            boxes, _rot = entry
            ix1 = np.maximum(boxes[:, 0], meta["tx1"][i])
            iy1 = np.maximum(boxes[:, 1], meta["ty1"][i])
            ix2 = np.minimum(boxes[:, 2], meta["tx2"][i])
            iy2 = np.minimum(boxes[:, 3], meta["ty2"][i])
            keep = (ix2 > ix1) & (iy2 > iy1)
            frag = np.stack([ix1, iy1, ix2, iy2], axis=1)[keep]
            order = np.lexsort((frag[:, 0], frag[:, 1]))
            frag = frag[order]
            rot = np.where((frag[:, 3] - frag[:, 1]) > (frag[:, 2] - frag[:, 0]),
                           90, 0).astype(np.int8)
            for k in ("media_ref", "tile_ord", "img_w", "img_h"):
                cols[k].extend([meta[k][i]] * len(frag))
            cols["x_min"].extend(frag[:, 0].tolist())
            cols["y_min"].extend(frag[:, 1].tolist())
            cols["x_max"].extend(frag[:, 2].tolist())
            cols["y_max"].extend(frag[:, 3].tolist())
            cols["rot"].extend(rot.tolist())
        return pa.table({
            "media_ref": pa.array(cols["media_ref"], pa.string()),
            "tile_ord": pa.array(cols["tile_ord"], pa.int32()),
            "img_w": pa.array(cols["img_w"], pa.int32()),
            "img_h": pa.array(cols["img_h"], pa.int32()),
            "x_min": pa.array(cols["x_min"], pa.int32()),
            "y_min": pa.array(cols["y_min"], pa.int32()),
            "x_max": pa.array(cols["x_max"], pa.int32()),
            "y_max": pa.array(cols["y_max"], pa.int32()),
            "rot": pa.array(cols["rot"], pa.int8()),
        }, schema=DETECTION_SCHEMA)


def make_group_fn(cfg: ExtractConfig):
    """Per-image grouping ``map_groups`` fn: detections of ONE image ->
    grouped crop-spec rows with reading-order ranks."""
    p = ConnectParams(
        high_overlap_threshold=cfg.grouping.high_overlap_threshold,
        high_iou_threshold=cfg.grouping.high_iou_threshold,
        vertical_alignment_factor=cfg.grouping.vertical_alignment_factor,
        horizontal_alignment_factor=cfg.grouping.horizontal_alignment_factor,
        proximity_factor=cfg.grouping.proximity_factor,
        neighborhood_expansion_factor=cfg.grouping.neighborhood_expansion_factor,
    )
    contained = cfg.grouping.contained_box_threshold
    tol = cfg.reading_order.line_tolerance_factor

    def group_image_boxes(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({f.name: pa.array([], f.type) for f in GROUPED_SCHEMA},
                            schema=GROUPED_SCHEMA)
        boxes = np.stack([t.column(c).to_numpy() for c in
                          ("x_min", "y_min", "x_max", "y_max")], axis=1)
        rot = t.column("rot").to_numpy()
        tord = t.column("tile_ord").to_numpy()
        # Canonical input order (replaces the reference's glob order):
        # tile ordinal asc, then y, then x.
        order = np.lexsort((boxes[:, 0], boxes[:, 1], tord))
        # Dense images take the exact spatial-decomposition path: O(n x
        # local density) instead of O(n^2) pair checks (SURVEY.md §4.2).
        fn = group_boxes_large if len(order) > cfg.salted_grouping_threshold \
            else group_boxes
        g = fn(boxes[order], rot[order], tord[order], p, contained)
        ranks = reading_order_ranks(g.boxes, g.rot, tol)
        ng = len(g.boxes)
        ref = t.column("media_ref")[0].as_py()
        img_w = int(t.column("img_w")[0].as_py())
        img_h = int(t.column("img_h")[0].as_py())
        # reference-format tile ids + grid positions from the ordinals
        # (one grid computation per image, shared by all its groups)
        from ..functions.tiling import grid_positions as _grid_pos
        base = os.path.splitext(os.path.basename(ref))[0]
        tcfg = cfg.tiling
        wins = tile_windows(img_w, img_h, tcfg.tile_size, tcfg.overlap_ratio)
        gp = _grid_pos(wins, tcfg.tile_size, tcfg.overlap_ratio)
        src_tiles = [[f"{base}_T{int(o):04d}" for o in ords]
                     for ords in g.tile_ords]
        gpos = [[[int(gp[o, 0]), int(gp[o, 1])] for o in ords]
                for ords in g.tile_ords]
        return pa.table({
            "media_ref": pa.array([ref] * ng, pa.string()),
            "rank": pa.array(ranks, pa.int32()),
            "x_min": pa.array(g.boxes[:, 0], pa.int32()),
            "y_min": pa.array(g.boxes[:, 1], pa.int32()),
            "x_max": pa.array(g.boxes[:, 2], pa.int32()),
            "y_max": pa.array(g.boxes[:, 3], pa.int32()),
            "rot": pa.array(g.rot, pa.int8()),
            "img_w": pa.array([img_w] * ng, pa.int32()),
            "img_h": pa.array([img_h] * ng, pa.int32()),
            "n_src_tiles": pa.array([len(x) for x in g.tile_ords], pa.int32()),
            "src_tiles": pa.array(src_tiles, pa.list_(pa.string())),
            "grid_positions": pa.array(gpos, pa.list_(pa.list_(pa.int32()))),
            "is_grouped": pa.array(g.is_grouped, pa.bool_()),
            "n_boxes_before": pa.array([g.n_before] * ng, pa.int32()),
            "n_suppressed": pa.array([g.n_suppressed] * ng, pa.int32()),
            "n_merges": pa.array([g.n_merges] * ng, pa.int32()),
        }, schema=GROUPED_SCHEMA)

    return group_image_boxes


class CropStage:
    """Crop grouped boxes from the re-decoded source image.

    Reference semantics (``src/cropping/cropping_Images.py:35-68``): pad by
    ``crop_padding``, clamp to the image, skip zero-size crops. Crop bytes
    ride in-row to the recognizer (S7 of SURVEY.md §2.1 eliminated). Rows
    arrive clustered by media_ref (the grouping shuffle's output order), so
    the per-batch decode cache hits.
    """

    def __init__(self, media_root: str, cfg: ExtractConfig, counter=None):
        self.store = FileMediaStore(media_root)
        self.pad = cfg.crop_padding
        self.counter = counter

    def __call__(self, batch: pa.Table) -> pa.Table:
        cache: dict[str, np.ndarray] = {}
        crops: list[bytes] = []
        cw: list[int] = []
        ch: list[int] = []
        keep: list[bool] = []
        refs = batch.column("media_ref").to_pylist()
        x1 = batch.column("x_min").to_numpy()
        y1 = batch.column("y_min").to_numpy()
        x2 = batch.column("x_max").to_numpy()
        y2 = batch.column("y_max").to_numpy()
        for i in range(len(batch)):
            img = cache.get(refs[i])
            if img is None:
                img = decode_image(self.store.get(refs[i]))
                cache[refs[i]] = img
            h, w = img.shape
            a = max(0, int(x1[i]) - self.pad)
            b = max(0, int(y1[i]) - self.pad)
            c = min(w, int(x2[i]) + self.pad)
            d = min(h, int(y2[i]) + self.pad)
            crop = img[b:d, a:c]
            if crop.size == 0:
                keep.append(False)
                continue
            keep.append(True)
            crops.append(np.ascontiguousarray(crop).tobytes())
            ch.append(crop.shape[0])
            cw.append(crop.shape[1])
        from ..state.counters import record_drop
        record_drop(self.counter, "crop_zero_size", len(batch) - sum(keep))
        t = batch.filter(pa.array(keep))
        return t.append_column("crop_h", pa.array(ch, pa.int32())) \
                .append_column("crop_w", pa.array(cw, pa.int32())) \
                .append_column("crop", pa.array(crops, pa.binary()))


class StubRecognizer:
    """Recognition actor with the reference's fallback chain
    (``text_recognition.py:111-131``): primary recognizer on the raw crop;
    if confidence < gate, rotate clockwise when orientation==90 and run the
    fallback recognizer; keep the fallback result only when it read
    non-empty text. Rows whose final text is empty are dropped
    (``text_recognition.py:174``).

    The "models" decode the value-coded pixels (``media/codec.py``): the
    primary reads horizontally and scores confidence by cell homogeneity
    (vertical text scores low and exercises the fallback, like
    low-confidence TrOCR); the fallback reads after rotation. Real
    TrOCR/EasyOCR would load here in ``__init__`` behind the same
    interface. Output rows are per unique media (MEDIA_ROW_SCHEMA).
    """

    def __init__(self, cfg: ExtractConfig | None = None, counter=None):
        self.cfg = cfg or ExtractConfig()
        self.gate = self.cfg.recognition.confidence_threshold
        self.counter = counter

    @staticmethod
    def _primary(crop: np.ndarray) -> tuple[str, float]:
        fg = crop != BACKGROUND
        if not fg.any():
            return "", 0.0
        rows = np.nonzero(fg.any(axis=1))[0]
        cols = np.nonzero(fg.any(axis=0))[0]
        region = crop[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1]
        h, w = region.shape
        n_chars = max(1, round(w / CELL_W))
        ys = [max(0, min(h - 1, int(h * f))) for f in (0.15, 0.4, 0.6, 0.85)]
        text = []
        good = 0
        for k in range(n_chars):
            cx = min(w - 1, int((k + 0.5) * w / n_chars))
            xs = [max(0, cx - 2), cx, min(w - 1, cx + 2)]
            samples = {int(region[y, x]) for y in ys for x in xs}
            v = int(region[h // 2, cx])
            if len(samples) == 1 and 33 <= v < BACKGROUND:
                good += 1
                text.append(chr(v))
            else:
                text.append("?")
        # All cells homogeneous -> confident read; any bad cell -> low
        # confidence so the gate (0.95) always routes to the fallback.
        conf = 1.0 if good == n_chars else 0.3
        return "".join(text).strip(), conf

    @staticmethod
    def _fallback(crop: np.ndarray, rot: int) -> tuple[str, float]:
        from ..media.codec import decode_text_from_crop
        text = decode_text_from_crop(crop, rot)
        return text, (1.0 if text else 0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        crop_col = batch.column("crop").combine_chunks()
        chs = batch.column("crop_h").to_numpy()
        cws = batch.column("crop_w").to_numpy()
        rots = batch.column("rot").to_numpy()
        texts: list[str] = []
        confs: list[float] = []
        methods: list[str] = []
        keep: list[bool] = []
        for i in range(len(batch)):
            crop = _np_tile(crop_col[i], int(chs[i]), int(cws[i]))
            text, conf = self._primary(crop)
            method = "TrOCR"
            if conf < self.gate:
                fb_text, fb_conf = self._fallback(crop, int(rots[i]))
                if fb_text:
                    text, conf, method = fb_text, fb_conf, "EasyOCR"
            if not text:
                keep.append(False)
                continue
            keep.append(True)
            texts.append(text)
            confs.append(conf)
            methods.append(method)
        from ..state.counters import record_drop
        record_drop(self.counter, "recognize_empty_text", len(batch) - sum(keep))
        t = batch.filter(pa.array(keep))
        text_arr = pa.array(texts, pa.string())
        return pa.table({
            "rank": t.column("rank"),
            "kind": classify_kinds(text_arr),
            "text": text_arr,
            "media_ref": t.column("media_ref"),
            "x_min": t.column("x_min"), "y_min": t.column("y_min"),
            "x_max": t.column("x_max"), "y_max": t.column("y_max"),
            "img_w": t.column("img_w"), "img_h": t.column("img_h"),
            "rot": t.column("rot"),
            "confidence": pa.array(confs, pa.float64()),
            "method": pa.array(methods, pa.string()),
        }, schema=MEDIA_ROW_SCHEMA)


# ---------------------------------------------------------------- span join

_JOIN_SCHEMA = pa.schema([("media_ref", pa.string()), ("salt", pa.int32()),
                          ("is_span", pa.bool_())] +
                         [(n, t) for n, t in SPAN_ROW_FIELDS if n != "media_ref"])


def make_tag_media_fn(hot_refs: frozenset = frozenset(), salt: int = 1):
    """Recognized per-media rows -> join-side rows (is_span=False).

    Rows of a HOT media_ref (one referenced by very many documents —
    ``ExtractConfig.hot_ref_span_threshold``) are replicated once per salt
    value so every salted sub-group of the fan-out join sees the full
    recognized payload; cold refs carry salt 0 only (no replication)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {"media_ref": batch.column("media_ref"),
                "salt": pa.array(np.zeros(n, np.int32)),
                "is_span": pa.array([False] * n, pa.bool_()),
                "doc_id": pa.array([""] * n, pa.string()),
                "offset": pa.array([-1] * n, pa.int32())}
        for name, _t in SPAN_ROW_FIELDS:
            if name not in ("doc_id", "offset", "media_ref"):
                cols[name] = batch.column(name)
        base = pa.table(cols, schema=_JOIN_SCHEMA)
        if salt <= 1 or not hot_refs:
            return base
        refs = np.array(batch.column("media_ref").to_pylist(), dtype=object)
        hot_idx = np.nonzero(np.isin(refs, list(hot_refs)))[0]
        if not len(hot_idx):
            return base
        salt_i = _JOIN_SCHEMA.get_field_index("salt")
        parts = [base]
        for s in range(1, salt):
            rep = base.take(pa.array(hot_idx))
            parts.append(rep.set_column(
                salt_i, "salt", pa.array(np.full(len(hot_idx), s, np.int32))))
        return pa.concat_tables(parts)

    return fn


def make_tag_span_fn(hot_refs: frozenset = frozenset(), salt: int = 1):
    """Image-span rows (doc_id, offset, media_ref) -> join-side rows
    (is_span=True, payload columns dummy). Spans of a hot ref are salted
    by doc-hash so the fan-out spreads over ``salt`` join groups."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        salts = np.zeros(n, np.int32)
        if salt > 1 and hot_refs:
            refs = batch.column("media_ref").to_pylist()
            docs = batch.column("doc_id").to_pylist()
            for i, r in enumerate(refs):
                if r in hot_refs:
                    salts[i] = zlib.crc32(docs[i].encode()) % salt
        cols = {"media_ref": batch.column("media_ref"),
                "salt": pa.array(salts),
                "is_span": pa.array([True] * n, pa.bool_()),
                "doc_id": batch.column("doc_id"),
                "offset": pc.cast(batch.column("offset"), pa.int32()),
                "rank": pa.array([0] * n, pa.int32()),
                "kind": pa.array([""] * n, pa.string()),
                "text": pa.array([""] * n, pa.string()),
                "x_min": pa.array([-1] * n, pa.int32()),
                "y_min": pa.array([-1] * n, pa.int32()),
                "x_max": pa.array([-1] * n, pa.int32()),
                "y_max": pa.array([-1] * n, pa.int32()),
                "img_w": pa.array([-1] * n, pa.int32()),
                "img_h": pa.array([-1] * n, pa.int32()),
                "rot": pa.array([0] * n, pa.int8()),
                "confidence": pa.array([0.0] * n, pa.float64()),
                "method": pa.array([""] * n, pa.string())}
        return pa.table(cols, schema=_JOIN_SCHEMA)

    return fn


def join_spans_to_media(t: pa.Table) -> pa.Table:
    """map_groups fn over groupby(media_ref) of the tagged union: emit one
    span row per (referencing span x recognized row) — the co-partitioned
    hash join that fans media results back out to documents."""
    is_span = t.column("is_span").to_numpy(zero_copy_only=False)
    spans = t.filter(pa.array(is_span))
    media = t.filter(pa.array(~is_span))
    n_s, n_m = len(spans), len(media)
    if n_s == 0 or n_m == 0:
        return pa.table({f.name: pa.array([], f.type) for f in SPAN_ROW_SCHEMA},
                        schema=SPAN_ROW_SCHEMA)
    # repeat media rows for each span (media index varies fastest)
    m_idx = pa.array(np.tile(np.arange(n_m), n_s))
    s_idx = pa.array(np.repeat(np.arange(n_s), n_m))
    media_rep = media.take(m_idx)
    spans_rep = spans.take(s_idx)
    cols = {"doc_id": spans_rep.column("doc_id"),
            "offset": spans_rep.column("offset")}
    for name, _t in SPAN_ROW_FIELDS:
        if name not in ("doc_id", "offset"):
            cols[name] = media_rep.column(name)
    return pa.table(cols, schema=SPAN_ROW_SCHEMA)

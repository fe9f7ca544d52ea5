"""CV-path stages: tile, detect, group, crop, recognize.

Execution shapes (SURVEY.md §7.0):

* ``TileStage`` / ``CropStage`` — stateless ``map_batches`` callables that
  resolve ``media_ref`` bytes from the media store at the last moment; only
  coordinates ever enter a shuffle, pixels flow forward through the object
  store (SURVEY.md §7.3 "never shuffle pixel payloads").
* ``PixelDetector`` / ``StubRecognizer`` — callable classes for
  ``map_batches(Cls, concurrency=N)`` actor pools: model-shaped state is
  constructed once per actor in ``__init__`` (the reference constructs its
  EasyOCR/TrOCR models once per run: ``run_pipeline.py:154``,
  ``text_recognition.py:37-51``), batches stream through ``__call__``.
* ``group_image_boxes`` — the per-image ``map_groups`` function behind THE
  shuffle (``groupby(img_key)``), reproducing the reference's 5-step
  grouping (``src/grouping/grouping_logic.py:653-799``) via the vectorized
  kernels in ``functions/geometry.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ExtractConfig
from ..functions.geometry import ConnectParams, group_boxes
from ..functions.rectdetect import detect_rects
from ..functions.reading_order import reading_order_ranks
from ..functions.textops import classify_kinds
from ..functions.tiling import tile_windows
from ..media.codec import BACKGROUND, CELL_W, decode_image
from ..media.store import FileMediaStore
from .spans import SPAN_ROW_SCHEMA

DETECTION_SCHEMA = pa.schema([
    ("img_key", pa.string()),          # doc_id \x1f offset — the shuffle key
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("media_ref", pa.string()),
    ("tile_ord", pa.int32()),
    ("img_w", pa.int32()), ("img_h", pa.int32()),
    ("x_min", pa.int32()), ("y_min", pa.int32()),   # GLOBAL image coords
    ("x_max", pa.int32()), ("y_max", pa.int32()),
    ("rot", pa.int8()),
])

GROUPED_SCHEMA = pa.schema([
    ("img_key", pa.string()),
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("media_ref", pa.string()),
    ("rank", pa.int32()),              # reading-order rank within the image
    ("x_min", pa.int32()), ("y_min", pa.int32()),
    ("x_max", pa.int32()), ("y_max", pa.int32()),
    ("rot", pa.int8()),
    ("img_w", pa.int32()), ("img_h", pa.int32()),
    ("n_src_tiles", pa.int32()),
    ("is_grouped", pa.bool_()),
])


def make_img_key(doc_id: pa.Array, offset: pa.Array) -> pa.Array:
    return pc.binary_join_element_wise(
        doc_id, pc.cast(offset, pa.string()), "\x1f")


class TileStage:
    """Decode media and slice into overlapping tiles (1 row -> N tile rows).

    Mirrors the reference slicer's placement exactly
    (``src/data_loader/sahi_slicer.py:79-138`` via ``functions/tiling.py``)
    but keeps tiles in-flight as Arrow binary rows instead of PNG files
    (eliminating S3/S4 of SURVEY.md §2.1).
    """

    def __init__(self, media_root: str, cfg: ExtractConfig):
        self.store = FileMediaStore(media_root)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.cfg.tiling
        out: dict[str, list] = {k: [] for k in
                                ("doc_id", "offset", "media_ref", "tile_ord",
                                 "img_w", "img_h", "tx1", "ty1", "tx2", "ty2", "tile")}
        cache: dict[str, np.ndarray] = {}
        for doc_id, offset, ref in zip(batch.column("doc_id").to_pylist(),
                                       batch.column("offset").to_pylist(),
                                       batch.column("media_ref").to_pylist()):
            img = cache.get(ref)
            if img is None:
                img = decode_image(self.store.get(ref))
                cache[ref] = img
            h, w = img.shape
            windows = tile_windows(w, h, t.tile_size, t.overlap_ratio)
            for ord_, (x1, y1, x2, y2) in enumerate(windows.tolist()):
                out["doc_id"].append(doc_id)
                out["offset"].append(offset)
                out["media_ref"].append(ref)
                out["tile_ord"].append(ord_)
                out["img_w"].append(w)
                out["img_h"].append(h)
                out["tx1"].append(x1)
                out["ty1"].append(y1)
                out["tx2"].append(x2)
                out["ty2"].append(y2)
                out["tile"].append(np.ascontiguousarray(img[y1:y2, x1:x2]).tobytes())
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "offset": pa.array(out["offset"], pa.int32()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "tile_ord": pa.array(out["tile_ord"], pa.int32()),
            "img_w": pa.array(out["img_w"], pa.int32()),
            "img_h": pa.array(out["img_h"], pa.int32()),
            "tx1": pa.array(out["tx1"], pa.int32()),
            "ty1": pa.array(out["ty1"], pa.int32()),
            "tx2": pa.array(out["tx2"], pa.int32()),
            "ty2": pa.array(out["ty2"], pa.int32()),
            "tile": pa.array(out["tile"], pa.binary()),
        })


class PixelDetector:
    """Text-region detection actor: tile pixels -> detection rows in GLOBAL
    image coordinates.

    Replaces the reference's per-tile EasyOCR CRAFT ``detect``
    (``text_detection.py:49-104``) with the pixel rect detector; the
    orientation heuristic is the reference's (90 iff taller than wide,
    ``text_detection.py:106-115``) applied to each detected fragment. The
    local->global translation the reference defers to the grouping step
    (``grouping_logic.py:94-116``) is fused here (SURVEY.md M6: do it
    eagerly), so the shuffle carries final coordinates.

    Detections within a tile are emitted sorted by (y, x) — the canonical
    order that replaces the reference's glob-order nondeterminism.
    """

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols: dict[str, list] = {k: [] for k in
                                 ("doc_id", "offset", "media_ref", "tile_ord",
                                  "img_w", "img_h", "x_min", "y_min", "x_max",
                                  "y_max", "rot")}
        tiles = batch.column("tile").to_pylist()
        tx1 = batch.column("tx1").to_pylist()
        ty1 = batch.column("ty1").to_pylist()
        tx2 = batch.column("tx2").to_pylist()
        ty2 = batch.column("ty2").to_pylist()
        meta = {k: batch.column(k).to_pylist()
                for k in ("doc_id", "offset", "media_ref", "tile_ord", "img_w", "img_h")}
        for i in range(n):
            th, tw = ty2[i] - ty1[i], tx2[i] - tx1[i]
            tile = np.frombuffer(tiles[i], dtype=np.uint8).reshape(th, tw)
            boxes = detect_rects(tile)
            if not len(boxes):
                continue
            gx1 = boxes[:, 0] + tx1[i]
            gy1 = boxes[:, 1] + ty1[i]
            gx2 = boxes[:, 2] + tx1[i]
            gy2 = boxes[:, 3] + ty1[i]
            rot = np.where((boxes[:, 3] - boxes[:, 1]) > (boxes[:, 2] - boxes[:, 0]),
                           90, 0).astype(np.int8)
            for k in ("doc_id", "offset", "media_ref", "tile_ord", "img_w", "img_h"):
                cols[k].extend([meta[k][i]] * len(boxes))
            cols["x_min"].extend(gx1.tolist())
            cols["y_min"].extend(gy1.tolist())
            cols["x_max"].extend(gx2.tolist())
            cols["y_max"].extend(gy2.tolist())
            cols["rot"].extend(rot.tolist())
        doc = pa.array(cols["doc_id"], pa.string())
        off = pa.array(cols["offset"], pa.int32())
        return pa.table({
            "img_key": make_img_key(doc, off),
            "doc_id": doc,
            "offset": off,
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
                                 ("doc_id", "offset", "media_ref", "tile_ord",
                                  "img_w", "img_h", "x_min", "y_min", "x_max",
                                  "y_max", "rot")}
        meta = {k: batch.column(k).to_pylist()
                for k in ("doc_id", "offset", "media_ref", "tile_ord",
                          "img_w", "img_h", "tx1", "ty1", "tx2", "ty2")}
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
            for k in ("doc_id", "offset", "media_ref", "tile_ord", "img_w", "img_h"):
                cols[k].extend([meta[k][i]] * len(frag))
            cols["x_min"].extend(frag[:, 0].tolist())
            cols["y_min"].extend(frag[:, 1].tolist())
            cols["x_max"].extend(frag[:, 2].tolist())
            cols["y_max"].extend(frag[:, 3].tolist())
            cols["rot"].extend(rot.tolist())
        doc = pa.array(cols["doc_id"], pa.string())
        off = pa.array(cols["offset"], pa.int32())
        return pa.table({
            "img_key": make_img_key(doc, off),
            "doc_id": doc, "offset": off,
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
        g = group_boxes(boxes[order], rot[order], tord[order], p, contained)
        ranks = reading_order_ranks(g.boxes, g.rot, tol)
        ng = len(g.boxes)
        doc_id = t.column("doc_id").to_pylist()[0]
        offset = int(t.column("offset").to_pylist()[0])
        return pa.table({
            "img_key": pa.array([t.column("img_key").to_pylist()[0]] * ng),
            "doc_id": pa.array([doc_id] * ng, pa.string()),
            "offset": pa.array([offset] * ng, pa.int32()),
            "media_ref": pa.array([t.column("media_ref").to_pylist()[0]] * ng, pa.string()),
            "rank": pa.array(ranks, pa.int32()),
            "x_min": pa.array(g.boxes[:, 0], pa.int32()),
            "y_min": pa.array(g.boxes[:, 1], pa.int32()),
            "x_max": pa.array(g.boxes[:, 2], pa.int32()),
            "y_max": pa.array(g.boxes[:, 3], pa.int32()),
            "rot": pa.array(g.rot, pa.int8()),
            "img_w": pa.array([int(t.column("img_w").to_pylist()[0])] * ng, pa.int32()),
            "img_h": pa.array([int(t.column("img_h").to_pylist()[0])] * ng, pa.int32()),
            "n_src_tiles": pa.array([len(x) for x in g.tile_ords], pa.int32()),
            "is_grouped": pa.array(g.is_grouped, pa.bool_()),
        }, schema=GROUPED_SCHEMA)

    return group_image_boxes


class CropStage:
    """Crop grouped boxes from the re-decoded source image.

    Reference semantics (``src/cropping/cropping_Images.py:35-68``): pad by
    ``crop_padding``, clamp to the image, skip zero-size crops. Crop bytes
    ride in-row to the recognizer (S7 of SURVEY.md §2.1 eliminated).
    """

    def __init__(self, media_root: str, cfg: ExtractConfig):
        self.store = FileMediaStore(media_root)
        self.pad = cfg.crop_padding

    def __call__(self, batch: pa.Table) -> pa.Table:
        cache: dict[str, np.ndarray] = {}
        crops: list[bytes] = []
        cw: list[int] = []
        ch: list[int] = []
        keep: list[bool] = []
        refs = batch.column("media_ref").to_pylist()
        x1 = batch.column("x_min").to_pylist()
        y1 = batch.column("y_min").to_pylist()
        x2 = batch.column("x_max").to_pylist()
        y2 = batch.column("y_max").to_pylist()
        for i in range(len(batch)):
            img = cache.get(refs[i])
            if img is None:
                img = decode_image(self.store.get(refs[i]))
                cache[refs[i]] = img
            h, w = img.shape
            a = max(0, x1[i] - self.pad)
            b = max(0, y1[i] - self.pad)
            c = min(w, x2[i] + self.pad)
            d = min(h, y2[i] + self.pad)
            crop = img[b:d, a:c]
            if crop.size == 0:
                keep.append(False)
                continue
            keep.append(True)
            crops.append(np.ascontiguousarray(crop).tobytes())
            ch.append(crop.shape[0])
            cw.append(crop.shape[1])
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

    The "models" decode the value-coded pixels (``media/codec.py``):
    the primary reads horizontally and scores confidence by cell
    homogeneity (vertical text therefore scores low and exercises the
    fallback, like low-confidence TrOCR), the fallback reads after rotation.
    Real TrOCR/EasyOCR would load here in ``__init__`` behind the same
    interface.
    """

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()
        self.gate = self.cfg.recognition.confidence_threshold

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
        crops = batch.column("crop").to_pylist()
        chs = batch.column("crop_h").to_pylist()
        cws = batch.column("crop_w").to_pylist()
        rots = batch.column("rot").to_pylist()
        texts: list[str] = []
        confs: list[float] = []
        methods: list[str] = []
        keep: list[bool] = []
        for i in range(len(batch)):
            crop = np.frombuffer(crops[i], dtype=np.uint8).reshape(chs[i], cws[i])
            text, conf = self._primary(crop)
            method = "TrOCR"
            if conf < self.gate:
                fb_text, fb_conf = self._fallback(crop, rots[i])
                if fb_text:
                    text, conf, method = fb_text, fb_conf, "EasyOCR"
            if not text:
                keep.append(False)
                continue
            keep.append(True)
            texts.append(text)
            confs.append(conf)
            methods.append(method)
        t = batch.filter(pa.array(keep))
        text_arr = pa.array(texts, pa.string())
        n = len(t)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "offset": t.column("offset"),
            "rank": t.column("rank"),
            "kind": classify_kinds(text_arr),
            "text": text_arr,
            "media_ref": t.column("media_ref"),
            "x_min": t.column("x_min"), "y_min": t.column("y_min"),
            "x_max": t.column("x_max"), "y_max": t.column("y_max"),
            "rot": t.column("rot"),
            "confidence": pa.array(confs, pa.float64()),
            "method": pa.array(methods, pa.string()),
        }, schema=SPAN_ROW_SCHEMA)

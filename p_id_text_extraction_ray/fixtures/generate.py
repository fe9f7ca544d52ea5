"""Deterministic synthetic fixture generator (FIXTURES.md).

Produces, under an output directory:

* ``docs.parquet``   — the engine input table ``(doc_id, spans[])`` with the
  exact ``BASELINE.json.input_hint`` schema,
* ``media/``         — one value-coded raster blob per ``media_ref``
  (see ``media/codec.py``),
* ``oracle.parquet`` — per media_ref ground-truth strings + boxes + rot (the
  stub detector's source),
* ``golden.parquet`` — expected output spans ``(doc_id, seq, kind, text,
  media_ref, offset)`` that the pipeline must reproduce under span-sequence
  equality.

Golden derivation is independent of the engine's tiling/grouping code: it
orders each image's *original* oracle boxes by the reading-order rule and
asserts the pipeline recovers exactly those strings through the
tile -> detect -> group -> crop -> recognize path. String placement is
rejection-sampled so that distinct strings can never merge under the
reference grouping thresholds (``/root/reference/configs/base.yaml:48-55``):
expanded boxes are pairwise disjoint and same-orientation pairs violate the
alignment rule or exceed the proximity gap. Tile-boundary *fragments* of one
string are excluded from these constraints on purpose — recovering them via
grouping is the point. String pixel length is capped below the tile overlap
stride so every boundary sliver is contained in the adjacent tile's fragment
(and therefore Step-0-suppressed, never orphaned).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import ExtractConfig
from ..functions.reading_order import reading_order_ranks
from ..functions.textops import ISA_TAG_FULL_RE, strip_boilerplate
from ..media.codec import BACKGROUND, encode_image, render_string, string_box_size
from ..media.store import FileMediaStore

_EXPAND = 12          # pairwise expanded-disjointness margin (> crop padding)
_EDGE_MARGIN = 16     # min distance of a box from the image edge
_ALIGN_SEP = 4        # > 0.2 * CELL_H: breaks the alignment connection rule
_GAP_SEP = 16         # > CELL_H * proximity_factor: breaks the gap rule
_MAX_CHARS = 40       # 40*8=320 px < tile overlap safety bound (see module doc)

_TAG_PREFIXES = ["PIC", "FT", "PT", "TT", "LIC", "FIC", "PSV", "HV", "TI", "PI", "LT", "FV"]
_LABEL_WORDS = ["PUMP", "VALVE", "DRAIN", "VENT", "STEAM", "COND", "FEED", "SUCTION",
                "DISCHARGE", "HEADER", "NOZZLE", "SPARE", "UTILITY", "FLARE", "SEAL",
                "COOLER", "HEATER", "DRUM", "TOWER", "REFLUX"]
_TEXT_WORDS = ["the", "flow", "line", "from", "unit", "to", "vessel", "via", "control",
               "loop", "signal", "process", "stream", "header", "return", "supply",
               "drain", "system", "pressure", "level", "service", "note", "detail"]
_BOILER_LINES = ["COPYRIGHT FOOTER 2024", "ALL RIGHTS RESERVED", "NAV: HOME | ABOUT",
                 "COOKIE NOTICE", "SUBSCRIBE NOW"]
_IMAGE_SIZES = [(600, 400), (980, 760), (1400, 1000), (2200, 1600)]
_HOT_IMAGE_SIZE = (2920, 2200)


@dataclass(frozen=True)
class FixturePaths:
    root: str
    docs: str
    oracle: str
    golden: str
    media_root: str


def _make_string(rng: np.random.Generator) -> str:
    if rng.random() < 0.4:
        prefix = _TAG_PREFIXES[rng.integers(len(_TAG_PREFIXES))]
        num = int(rng.integers(1, 9999))
        suffix = chr(ord("A") + int(rng.integers(26))) if rng.random() < 0.3 else ""
        s = f"{prefix}-{num}{suffix}"
    else:
        s = _LABEL_WORDS[rng.integers(len(_LABEL_WORDS))]
        if rng.random() < 0.3:
            s = f"{s}-{int(rng.integers(1, 99))}"
    return s[:_MAX_CHARS]


def _rects_disjoint(a: tuple, b: tuple, margin: int) -> bool:
    return (a[2] + margin <= b[0] or b[2] + margin <= a[0] or
            a[3] + margin <= b[1] or b[3] + margin <= a[1])


def _placement_ok(new: tuple, new_rot: int, placed: list[tuple]) -> bool:
    """new/placed entries are (x1, y1, x2, y2, rot)."""
    for p in placed:
        pb = p[:4]
        if not _rects_disjoint(new, pb, 2 * _EXPAND):
            return False
        if p[4] == new_rot:
            if new_rot == 0:
                cy_n = (new[1] + new[3]) / 2
                cy_p = (pb[1] + pb[3]) / 2
                xgap = max(pb[0] - new[2], new[0] - pb[2])
                if abs(cy_n - cy_p) < _ALIGN_SEP and xgap < _GAP_SEP:
                    return False
            else:
                cx_n = (new[0] + new[2]) / 2
                cx_p = (pb[0] + pb[2]) / 2
                ygap = max(pb[1] - new[3], new[1] - pb[3])
                if abs(cx_n - cx_p) < _ALIGN_SEP and ygap < _GAP_SEP:
                    return False
    return True


def _render_media(rng: np.random.Generator, width: int, height: int,
                  n_strings: int) -> tuple[bytes, list[dict]]:
    """Render one image; returns (blob, oracle rows [{text,x_min,..,rot}])."""
    canvas = np.full((height, width), BACKGROUND, dtype=np.uint8)
    placed: list[tuple] = []
    rows: list[dict] = []
    for _ in range(n_strings):
        text = _make_string(rng)
        rot = 90 if rng.random() < 0.2 else 0
        if len(text) < 3:
            rot = 0
        w, h = string_box_size(text, rot)
        if width - w - 2 * _EDGE_MARGIN <= 0 or height - h - 2 * _EDGE_MARGIN <= 0:
            continue
        for _attempt in range(60):
            x = int(rng.integers(_EDGE_MARGIN, width - w - _EDGE_MARGIN))
            y = int(rng.integers(_EDGE_MARGIN, height - h - _EDGE_MARGIN))
            cand = (x, y, x + w, y + h)
            if _placement_ok(cand, rot, placed):
                render_string(canvas, text, x, y, rot)
                placed.append((*cand, rot))
                rows.append({"text": text, "x_min": x, "y_min": y,
                             "x_max": x + w, "y_max": y + h, "rot": rot})
                break
    return encode_image(canvas), rows


def _make_text_span(rng: np.random.Generator) -> str:
    lines = []
    for _ in range(int(rng.integers(1, 4))):
        n = int(rng.integers(6, 16))
        words = [_TEXT_WORDS[rng.integers(len(_TEXT_WORDS))] for _ in range(n)]
        lines.append(" ".join(words))
        if rng.random() < 0.4:
            lines.append(_BOILER_LINES[rng.integers(len(_BOILER_LINES))])
    return "\n".join(lines)


def _golden_rows_for_media(media_ref: str, oracle_rows: list[dict],
                           cfg: ExtractConfig) -> list[dict]:
    """Reading-ordered (kind, text) rows for one image, from the oracle."""
    if not oracle_rows:
        return []
    boxes = np.array([[r["x_min"], r["y_min"], r["x_max"], r["y_max"]]
                      for r in oracle_rows], dtype=np.float64)
    rot = np.array([r["rot"] for r in oracle_rows])
    ranks = reading_order_ranks(boxes, rot, cfg.reading_order.line_tolerance_factor)
    order = np.argsort(ranks)
    out = []
    for i in order:
        text = oracle_rows[int(i)]["text"]
        kind = "tag" if ISA_TAG_FULL_RE.match(text) else "image_text"
        out.append({"kind": kind, "text": text, "media_ref": media_ref})
    return out


def generate_fixture(out_dir: str, n_docs: int = 200, seed: int = 42,
                     media_pool: int = 0, hot_frac: float = 0.02,
                     cfg: ExtractConfig | None = None) -> FixturePaths:
    """Generate the full fixture set under ``out_dir`` (see module doc).

    ``media_pool > 0`` pre-renders that many shared images and lets docs
    reference them (bench mode, FIXTURES.md §5: images reused via shared
    media_refs); otherwise each image span gets a fresh image.
    """
    cfg = cfg or ExtractConfig()
    rng = np.random.default_rng(seed)
    store = FileMediaStore(os.path.join(out_dir, "media"))
    os.makedirs(out_dir, exist_ok=True)

    oracle_by_ref: dict[str, list[dict]] = {}
    golden_media_cache: dict[str, list[dict]] = {}

    def _new_media(ref: str, hot: bool) -> None:
        if hot:
            wpx, hpx = _HOT_IMAGE_SIZE
            n_strings = 60
        else:
            wpx, hpx = _IMAGE_SIZES[rng.integers(len(_IMAGE_SIZES))]
            n_strings = int(rng.integers(3, 11))
        blob, rows = _render_media(rng, wpx, hpx, n_strings)
        store.put(ref, blob)
        oracle_by_ref[ref] = rows
        golden_media_cache[ref] = _golden_rows_for_media(ref, rows, cfg)

    pool_refs: list[str] = []
    if media_pool > 0:
        for k in range(media_pool):
            ref = f"media/pool/{k:06d}.pidr"
            _new_media(ref, hot=(k < max(1, int(media_pool * hot_frac))))
            pool_refs.append(ref)

    doc_ids: list[str] = []
    doc_spans: list[list[dict]] = []
    golden_rows: list[dict] = []

    for i in range(n_docs):
        doc_id = f"DOC-{i:06d}"
        hot = rng.random() < hot_frac
        r = rng.random()
        if r < 0.60:
            kinds = ["text"] + ["image"] * int(rng.integers(1, 4)) + ["text"]
            kinds = list(rng.permutation(kinds))
        elif r < 0.85:
            kinds = ["text"] * int(rng.integers(1, 4))
        else:
            kinds = ["image"] * int(rng.integers(1, 3))

        spans: list[dict] = []
        doc_golden: list[dict] = []
        for offset, kind in enumerate(kinds):
            if kind == "text":
                text = _make_text_span(rng)
                spans.append({"kind": "text", "text": text, "media_ref": "",
                              "offset": offset})
                cleaned = strip_boilerplate(text)
                if cleaned:
                    doc_golden.append({"doc_id": doc_id, "kind": "text",
                                       "text": cleaned, "media_ref": "",
                                       "offset": offset})
            else:
                if pool_refs:
                    ref = pool_refs[int(rng.integers(len(pool_refs)))]
                else:
                    ref = f"media/{doc_id}/{offset}.pidr"
                    _new_media(ref, hot)
                spans.append({"kind": "image", "text": "", "media_ref": ref,
                              "offset": offset})
                for row in golden_media_cache[ref]:
                    doc_golden.append({"doc_id": doc_id, "offset": offset, **row})
        doc_ids.append(doc_id)
        doc_spans.append(spans)
        for seq, row in enumerate(doc_golden):
            golden_rows.append({**row, "seq": seq})

    span_type = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                    ("media_ref", pa.string()), ("offset", pa.int32())]))
    docs_path = os.path.join(out_dir, "docs.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                             "spans": pa.array(doc_spans, span_type)}), docs_path)

    oracle_path = os.path.join(out_dir, "oracle.parquet")
    o_refs, o_rows = [], []
    for ref, rows in sorted(oracle_by_ref.items()):
        for row in rows:
            o_refs.append(ref)
            o_rows.append(row)
    pq.write_table(pa.table({
        "media_ref": pa.array(o_refs, pa.string()),
        "text": pa.array([r["text"] for r in o_rows], pa.string()),
        "x_min": pa.array([r["x_min"] for r in o_rows], pa.int32()),
        "y_min": pa.array([r["y_min"] for r in o_rows], pa.int32()),
        "x_max": pa.array([r["x_max"] for r in o_rows], pa.int32()),
        "y_max": pa.array([r["y_max"] for r in o_rows], pa.int32()),
        "rot": pa.array([r["rot"] for r in o_rows], pa.int8()),
    }), oracle_path)

    golden_path = os.path.join(out_dir, "golden.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in golden_rows], pa.string()),
        "seq": pa.array([r["seq"] for r in golden_rows], pa.int32()),
        "kind": pa.array([r["kind"] for r in golden_rows], pa.string()),
        "text": pa.array([r["text"] for r in golden_rows], pa.string()),
        "media_ref": pa.array([r["media_ref"] for r in golden_rows], pa.string()),
        "offset": pa.array([r["offset"] for r in golden_rows], pa.int32()),
    }), golden_path)

    return FixturePaths(root=out_dir, docs=docs_path, oracle=oracle_path,
                        golden=golden_path, media_root=os.path.join(out_dir, "media"))

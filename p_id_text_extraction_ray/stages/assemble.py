"""Final span reassembly: per-document ordered span sequence.

The second (and last) shuffle: ``groupby(doc_id).map_groups`` over the
union of text-path and CV-path span rows. Within a document, spans order by
``(offset, rank)`` — source span position first (the interleaving order of
the input doc), then reading-order rank within an image span — and ``seq``
is the resulting 0-based position (FIXTURES.md §4; SURVEY.md §7.3 "ordering
through union").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FINAL_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("seq", pa.int32()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
    ("x_min", pa.int32()), ("y_min", pa.int32()),
    ("x_max", pa.int32()), ("y_max", pa.int32()),
    ("img_w", pa.int32()), ("img_h", pa.int32()),
    ("rot", pa.int8()),
    ("confidence", pa.float64()),
    ("method", pa.string()),
])


def reassemble_doc(t: pa.Table) -> pa.Table:
    """map_groups fn: span rows of ONE doc -> ordered final rows."""
    n = len(t)
    if n == 0:
        return pa.table({f.name: pa.array([], f.type) for f in FINAL_SCHEMA},
                        schema=FINAL_SCHEMA)
    offset = t.column("offset").to_numpy()
    rank = t.column("rank").to_numpy()
    order = np.lexsort((rank, offset))
    t = t.take(pa.array(order))
    seq = pa.array(np.arange(n, dtype=np.int32), pa.int32())
    return pa.table({
        "doc_id": t.column("doc_id"),
        "seq": seq,
        "kind": t.column("kind"),
        "text": t.column("text"),
        "media_ref": t.column("media_ref"),
        "offset": t.column("offset"),
        "x_min": t.column("x_min"), "y_min": t.column("y_min"),
        "x_max": t.column("x_max"), "y_max": t.column("y_max"),
        "img_w": t.column("img_w"), "img_h": t.column("img_h"),
        "rot": t.column("rot"),
        "confidence": t.column("confidence"),
        "method": t.column("method"),
    }, schema=FINAL_SCHEMA)


def bbox_corners(batch: pa.Table) -> pa.Table:
    """Sink-side 4-corner expansion (M4: the reference's clockwise-from-
    top-left corner lists, ``text_detection.py:117-131``). The engine keeps
    axis-aligned 4-int boxes in flight and expands only at the sink."""
    x1 = batch.column("x_min").to_numpy()
    y1 = batch.column("y_min").to_numpy()
    x2 = batch.column("x_max").to_numpy()
    y2 = batch.column("y_max").to_numpy()
    corners = np.stack([x1, y1, x2, y1, x2, y2, x1, y2], axis=1) \
        .reshape(-1, 4, 2).tolist()
    typ = pa.list_(pa.list_(pa.int64(), 2), 4)
    return batch.append_column("bbox", pa.array(corners, typ))


def bbox_normalized(batch: pa.Table) -> pa.Table:
    """0-1 normalized bbox columns vs the original image size (M5:
    ``grouping_logic.py:886-893``; zero dims fall back to 1)."""
    import pyarrow.compute as pc
    w = pc.max_element_wise(pc.cast(batch.column("img_w"), pa.float64()), 1.0)
    h = pc.max_element_wise(pc.cast(batch.column("img_h"), pa.float64()), 1.0)
    out = batch
    for c, d in (("x_min", w), ("x_max", w), ("y_min", h), ("y_max", h)):
        out = out.append_column(
            f"{c}_norm", pc.divide(pc.cast(batch.column(c), pa.float64()), d))
    return out


def to_pdf_points(batch: pa.Table, dpi: int = 600) -> pa.Table:
    """Derived pixel->PDF-point bbox columns: multiply by 72/dpi, round to
    4 dp (reference ``src/convert_coord.py:17-23``; the engine's version of
    the pdf-perspective output tree S9)."""
    import pyarrow.compute as pc
    scale = 72.0 / dpi
    out = batch
    for c in ("x_min", "y_min", "x_max", "y_max"):
        pts = pc.round(pc.multiply(pc.cast(batch.column(c), pa.float64()), scale),
                       ndigits=4)
        out = out.append_column(f"{c}_pdf", pts)
    return out

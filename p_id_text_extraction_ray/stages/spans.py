"""Span explode + text-path stages (vectorized Arrow batch fns).

The input table is one row per document with a ``spans`` list column
(``BASELINE.json.input_hint``). ``explode_spans`` is the 1->N expansion that
turns it into one row per span; the text path then cleans pure-text spans
without ever touching the CV stages (north star: pure-text spans pass
through a batched byte-stream tokenize + boilerplate-strip path).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textops import clean_text_column

# Unified span-row schema produced by both the text path and the CV path, so
# the two branches union cleanly before reassembly.
SPAN_ROW_FIELDS = [
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("rank", pa.int32()),       # reading-order rank within an image span; 0 for text
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("x_min", pa.int32()), ("y_min", pa.int32()),
    ("x_max", pa.int32()), ("y_max", pa.int32()),
    ("img_w", pa.int32()), ("img_h", pa.int32()),   # original image size
    ("rot", pa.int8()),
    ("confidence", pa.float64()),
    ("method", pa.string()),
]
SPAN_ROW_SCHEMA = pa.schema(SPAN_ROW_FIELDS)


def explode_spans(batch: pa.Table) -> pa.Table:
    """(doc_id, spans[]) rows -> one row per span: (doc_id, kind, text,
    media_ref, offset). Pure Arrow list-flatten; no Python per-row loop."""
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0) if spans.num_chunks else pa.array([], spans.type)
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans)
    doc_id = pc.take(batch.column("doc_id"), parent)
    return pa.table({
        "doc_id": doc_id,
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    })


def route_text(batch: pa.Table) -> pa.Table:
    """Keep text spans only (vectorized mask inside map_batches — cheaper
    than a per-row ``ds.filter``)."""
    return batch.filter(pc.equal(batch.column("kind"), "text"))


def route_image(batch: pa.Table) -> pa.Table:
    """Keep image spans only, projected to what the CV path needs."""
    t = batch.filter(pc.equal(batch.column("kind"), "image"))
    return t.select(["doc_id", "offset", "media_ref"])


def make_clean_text_fn(counter=None, html_strip: bool = False):
    """Factory for the text-clean batch fn with optional drop counting.

    ``html_strip`` (``ExtractConfig.html_strip``): markup-bearing text
    spans are routed through the main-content extractor
    (``functions/htmlextract.extract_main_text`` — chrome prune,
    link-density cut) before the byte-stream clean; plain-text spans
    never pay for it (a vectorized regex picks the HTML subset, and
    only those rows take the per-span Python extraction)."""

    def fn(batch: pa.Table) -> pa.Table:
        if html_strip and len(batch):
            batch = strip_html_spans(batch)
        out = clean_text_spans(batch)
        if counter is not None:
            from ..state.counters import record_drop
            record_drop(counter, "text_clean_empty", len(batch) - len(out))
        return out

    return fn


def strip_html_spans(batch: pa.Table) -> pa.Table:
    """Replace the text of markup-bearing spans with their extracted
    main content (boilerplate stripped); plain spans pass untouched."""
    from ..functions.htmlextract import extract_main_text

    text = batch.column("text").combine_chunks()
    is_html = pc.match_substring_regex(text, r"<[a-zA-Z!/]")
    if not pc.any(is_html).as_py():
        return batch
    py = text.to_pylist()
    mask = is_html.to_pylist()
    new = [extract_main_text(t)["main_text"] if m else t
           for t, m in zip(py, mask)]
    return batch.set_column(batch.schema.get_field_index("text"),
                            "text", pa.array(new, pa.string()))


def clean_text_spans(batch: pa.Table) -> pa.Table:
    """Text path: boilerplate-strip + whitespace-normalize, drop spans that
    clean to empty (the reference's empty-text drop semantics,
    ``text_recognition.py:174``), emit unified span rows."""
    cleaned = clean_text_column(batch.column("text").combine_chunks())
    keep = pc.greater(pc.utf8_length(cleaned), 0)
    t = batch.append_column("cleaned", cleaned).filter(keep)
    n = len(t)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "offset": pc.cast(t.column("offset"), pa.int32()),
        "rank": pa.array([0] * n, pa.int32()),
        "kind": pa.array(["text"] * n, pa.string()),
        "text": t.column("cleaned"),
        "media_ref": pa.array([""] * n, pa.string()),
        "x_min": pa.array([-1] * n, pa.int32()),
        "y_min": pa.array([-1] * n, pa.int32()),
        "x_max": pa.array([-1] * n, pa.int32()),
        "y_max": pa.array([-1] * n, pa.int32()),
        "img_w": pa.array([-1] * n, pa.int32()),
        "img_h": pa.array([-1] * n, pa.int32()),
        "rot": pa.array([0] * n, pa.int8()),
        "confidence": pa.array([1.0] * n, pa.float64()),
        "method": pa.array(["text"] * n, pa.string()),
    }, schema=SPAN_ROW_SCHEMA)

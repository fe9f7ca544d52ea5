"""PDF rasterization source (S1 of SURVEY.md §2.1).

The reference converts PDFs to 600-DPI page images up front
(``/root/reference/PDF_to_image.py:8-91``, pdftocairo backend, multi-page
naming ``{name}_page_NN``). In the table-native engine this is a media
*ingestion* job, not a hot-path stage: a batch transform over rows of PDF
bytes that writes one raster blob per page into the media store and emits
``(doc_id, media_ref, page)`` rows for the document table.

The default rasterizer is the engine's own pure-numpy renderer
(``media/pdfdoc.py`` object-graph parser + ``media/pdfraster.py``
content-stream rasterizer: vector paths, TrueType text, form XObjects).
``rasterize`` stays injectable so a native renderer (pdftocairo/pdfium)
can be swapped in for full-fidelity coverage of PDF features outside
the subset (Type1/CFF glyph shapes render as metric boxes, images as
gray blocks — see the pdfraster module docstring).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

from ..media.codec import encode_image
from ..media.store import FileMediaStore


def _default_rasterizer(pdf_bytes: bytes, dpi: int) -> list[np.ndarray]:
    from ..media.pdfraster import render_pdf_pages
    return render_pdf_pages(pdf_bytes, dpi=dpi)


class PdfIngestStage:
    """map_batches callable: (doc_id, pdf_bytes) rows -> one row per page
    (doc_id, media_ref, page), with the rendered page stored as a media
    blob. ``rasterize(pdf_bytes, dpi) -> [gray uint8 arrays]`` defaults
    to the engine's pure-numpy renderer and stays injectable (tests can
    pass a fake; a native renderer can be swapped in)."""

    def __init__(self, media_root: str, dpi: int = 600,
                 rasterize: Callable[[bytes, int], list[np.ndarray]] | None = None):
        self.store = FileMediaStore(media_root)
        self.dpi = dpi
        self.rasterize = rasterize or _default_rasterizer

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[str] = []
        refs: list[str] = []
        pages: list[int] = []
        for doc_id, blob in zip(batch.column("doc_id").to_pylist(),
                                batch.column("pdf_bytes").to_pylist()):
            for page_no, img in enumerate(self.rasterize(blob, self.dpi)):
                # multi-page naming parity: {name}_page_NN (PDF_to_image.py:48-75)
                ref = f"media/{doc_id}_page_{page_no:02d}.pidr"
                self.store.put(ref, encode_image(img))
                doc_ids.append(doc_id)
                refs.append(ref)
                pages.append(page_no)
        return pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                         "media_ref": pa.array(refs, pa.string()),
                         "page": pa.array(pages, pa.int32())})

"""Debug visualization + coordinate validation stages (S9/S10, M12, M14 of
SURVEY.md §2).

Not in the correctness path (the reference's viz step is debug output too,
``run_pipeline.py:310-323``); kept as real batch stages so a user of the
reference can still produce annotated renders and run the px-vs-PDF
dimension validator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..media.codec import decode_image, encode_image
from ..media.store import FileMediaStore


def check_dimension_compatibility(img_w, img_h, pdf_w_pts, pdf_h_pts,
                                  dpi: int = 600,
                                  tolerance_percent: float = 5.0) -> np.ndarray:
    """Vectorized parity of the reference's validator
    (``/root/reference/src/convert_coord.py:91-149``): the image pixel size
    must match the PDF point size scaled by dpi/72 within a percentage
    tolerance on both axes."""
    img_w = np.asarray(img_w, dtype=np.float64)
    img_h = np.asarray(img_h, dtype=np.float64)
    exp_w = np.asarray(pdf_w_pts, dtype=np.float64) * dpi / 72.0
    exp_h = np.asarray(pdf_h_pts, dtype=np.float64) * dpi / 72.0
    tol = tolerance_percent / 100.0
    with np.errstate(divide="ignore", invalid="ignore"):
        dw = np.abs(img_w - exp_w) / np.where(exp_w > 0, exp_w, 1.0)
        dh = np.abs(img_h - exp_h) / np.where(exp_h > 0, exp_h, 1.0)
    return (dw <= tol) & (dh <= tol)


def validate_dimensions_batch(batch: pa.Table, dpi: int = 600,
                              tolerance_percent: float = 5.0) -> pa.Table:
    """Append a ``dims_valid`` column (per-row validation filter emitting a
    bool column — the skip-and-log shape of the reference's M12)."""
    ok = check_dimension_compatibility(
        batch.column("img_w").to_numpy(), batch.column("img_h").to_numpy(),
        batch.column("pdf_w_pts").to_numpy(), batch.column("pdf_h_pts").to_numpy(),
        dpi, tolerance_percent)
    return batch.append_column("dims_valid", pa.array(ok))


class AnnotationRenderStage:
    """Draw extraction boxes onto the source image -> annotated blob rows.

    Parity with ``src/visualization/visualizer.py:8-125`` (rectangle
    outlines per annotation; label placement is a text overlay there, a
    2-px border here since the debug codec has no font rendering). Input:
    span rows with (media_ref, x_min..y_max); output one row per media_ref
    with the annotated raster.
    """

    BORDER = 0  # black outline

    def __init__(self, media_root: str):
        self.store = FileMediaStore(media_root)

    def __call__(self, batch: pa.Table) -> pa.Table:
        by_ref: dict[str, list[tuple[int, int, int, int]]] = {}
        for ref, a, b, c, d in zip(batch.column("media_ref").to_pylist(),
                                   batch.column("x_min").to_pylist(),
                                   batch.column("y_min").to_pylist(),
                                   batch.column("x_max").to_pylist(),
                                   batch.column("y_max").to_pylist()):
            if ref:
                by_ref.setdefault(ref, []).append((a, b, c, d))
        refs: list[str] = []
        blobs: list[bytes] = []
        n_boxes: list[int] = []
        for ref, boxes in sorted(by_ref.items()):
            img = decode_image(self.store.get(ref)).copy()
            h, w = img.shape
            for (a, b, c, d) in boxes:
                a = max(0, a); b = max(0, b); c = min(w, c); d = min(h, d)
                if c <= a or d <= b:
                    continue
                img[b:min(h, b + 2), a:c] = self.BORDER
                img[max(0, d - 2):d, a:c] = self.BORDER
                img[b:d, a:min(w, a + 2)] = self.BORDER
                img[b:d, max(0, c - 2):c] = self.BORDER
            refs.append(ref)
            blobs.append(encode_image(img))
            n_boxes.append(len(boxes))
        return pa.table({"media_ref": pa.array(refs, pa.string()),
                         "annotated": pa.array(blobs, pa.binary()),
                         "n_boxes": pa.array(n_boxes, pa.int32())})

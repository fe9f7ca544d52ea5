"""Flagship wiring: derive an interleaved text+media doc table from the
``documents`` testdata table and run the extraction pipeline on it.

The driver's tables are text-only, so the interleaved table of
``BASELINE.json.input_hint`` shape is synthesized deterministically from
them (per round-1 instructions): every document becomes a text span, and
every 5th document also carries an image span whose rendered strings are a
pure function of its doc_id. Media + docs are cached per (sf_dir) under
/tmp so repeated driver calls reuse them.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import ExtractConfig
from ..fixtures.generate import _render_media  # deterministic renderer
from ..media.store import FileMediaStore

_SPAN_TYPE = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                 ("media_ref", pa.string()), ("offset", pa.int32())]))


def build_interleaved_docs(sf_dir: str, cache_root: str = "/tmp/pid_docs_cache"
                           ) -> tuple[str, str]:
    """Returns (docs_parquet_path, media_root); cached per sf_dir.

    Also derives ``golden.parquet`` next to the docs: the expected
    extraction span table, computed INDEPENDENTLY of the pipeline from
    the media oracle rows (the rendered strings are a pure function of
    doc_id) + the text-path clean rule — the same derivation
    ``fixtures.generate`` uses for its golden. This is what
    ``pid_extract_spans_check``'s DuckDB oracle hashes against
    (VERDICT r4 item 8)."""
    from ..config import ExtractConfig
    from ..fixtures.generate import _golden_rows_for_media
    from ..functions.textops import strip_boilerplate

    # ":v2" invalidates pre-golden caches (golden.parquet added round 5)
    key = hashlib.md5((os.path.abspath(sf_dir) + ":v2").encode()) \
        .hexdigest()[:12]
    root = os.path.join(cache_root, key)
    docs_path = os.path.join(root, "docs.parquet")
    media_root = os.path.join(root, "media")
    marker = os.path.join(root, ".done")
    if os.path.exists(marker):
        return docs_path, media_root

    os.makedirs(root, exist_ok=True)
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    store = FileMediaStore(media_root)
    cfg = ExtractConfig()

    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    golden_rows: list[dict] = []
    for did, text in zip(src.column("doc_id").to_pylist(),
                         src.column("text").to_pylist()):
        name = f"DOC-{did:06d}"
        spans = [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
        doc_golden: list[dict] = []
        cleaned = strip_boilerplate(text)
        if cleaned:
            doc_golden.append({"doc_id": name, "kind": "text",
                               "text": cleaned, "media_ref": "",
                               "offset": 0})
        if did % 5 == 0:
            ref = f"media/{name}.pidr"
            rng = np.random.default_rng(did + 1)
            blob, rows = _render_media(rng, 980, 700, n_strings=6)
            store.put(ref, blob)
            spans.append({"kind": "image", "text": "", "media_ref": ref,
                          "offset": 1})
            for row in _golden_rows_for_media(ref, rows, cfg):
                doc_golden.append({"doc_id": name, "offset": 1, **row})
        doc_ids.append(name)
        spans_col.append(spans)
        for seq, row in enumerate(doc_golden):
            golden_rows.append({**row, "seq": seq})

    pq.write_table(pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                             "spans": pa.array(spans_col, _SPAN_TYPE)}), docs_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in golden_rows], pa.string()),
        "seq": pa.array([r["seq"] for r in golden_rows], pa.int32()),
        "kind": pa.array([r["kind"] for r in golden_rows], pa.string()),
        "text": pa.array([r["text"] for r in golden_rows], pa.string()),
        "media_ref": pa.array([r["media_ref"] for r in golden_rows],
                              pa.string()),
        "offset": pa.array([r["offset"] for r in golden_rows], pa.int32()),
    }), os.path.join(root, "golden.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return docs_path, media_root


def pid_extract(sf_dir: str, cfg: ExtractConfig | None = None,
                stop_after: str | None = None):
    """The full extraction pipeline over the derived interleaved table."""
    import ray.data as rd
    from .extract import extract_spans

    docs_path, media_root = build_interleaved_docs(sf_dir)
    return extract_spans(rd.read_parquet(docs_path), media_root, cfg,
                         stop_after=stop_after)


GOLDEN_SPANS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "golden_spans.parquet")

# The committed golden holds the expected span table for every testdata
# corpus, keyed by (documents row count, total text length) — both
# computable from the ``documents`` view, so ONE static SQL string works
# at any sf the driver picks, and the oracle never depends on
# query-before-oracle execution order or on /tmp state.
PID_EXTRACT_SPANS_SQL = f"""
SELECT doc_id, seq, kind, text, media_ref, "offset"
FROM read_parquet('{GOLDEN_SPANS_PATH}')
WHERE corpus_n = (SELECT count(*) FROM documents)
  AND corpus_len = (SELECT sum(length(text)) FROM documents)
"""


def _ensure_committed_golden(sf_dir: str) -> None:
    """Self-heal the committed golden table: if the current corpus's
    (corpus_n, corpus_len) key is absent (e.g. regenerated testdata),
    append its freshly derived golden rows atomically."""
    docs_path, _ = build_interleaved_docs(sf_dir)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    n, tl = t.num_rows, sum(len(x) for x in t["text"].to_pylist())
    try:
        cur = pq.read_table(GOLDEN_SPANS_PATH)
        keys = set(zip(cur["corpus_n"].to_pylist(),
                       cur["corpus_len"].to_pylist()))
    except (OSError, pa.ArrowInvalid):
        cur, keys = None, set()
    if (n, tl) in keys:
        return
    g = pq.read_table(os.path.join(os.path.dirname(docs_path),
                                   "golden.parquet"))
    g = g.append_column("corpus_n", pa.array([n] * len(g), pa.int64()))
    g = g.append_column("corpus_len", pa.array([tl] * len(g), pa.int64()))
    out = pa.concat_tables([cur, g]) if cur is not None else g
    tmp = GOLDEN_SPANS_PATH + ".tmp"
    pq.write_table(out, tmp, compression="zstd")
    os.replace(tmp, GOLDEN_SPANS_PATH)


def pid_extract_spans_check(sf_dir: str):
    """The flagship extraction output projected to the span-identity
    columns — the driver-hashable form of ``pid_extract`` (VERDICT r4
    item 8). The DuckDB oracle reads the COMMITTED golden span table
    (``fixtures/golden_spans.parquet``, derived independently of the
    pipeline from the media oracle rows + text clean rule and pinned by
    ``tests/test_flagship_golden.py``), so the driver's value-hash
    compares the whole distributed pipeline against golden spans, not
    just row counts."""
    _ensure_committed_golden(sf_dir)
    return pid_extract(sf_dir).select_columns(
        ["doc_id", "seq", "kind", "text", "media_ref", "offset"])


PID_TRAINING_TEXT_SQL = f"""
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       string_agg(CASE WHEN kind = 'text' THEN text
                       ELSE '<' || kind || '>' || text END,
                  ' ' ORDER BY seq) AS train_text
FROM read_parquet('{GOLDEN_SPANS_PATH}')
WHERE corpus_n = (SELECT count(*) FROM documents)
  AND corpus_len = (SELECT sum(length(text)) FROM documents)
GROUP BY doc_id ORDER BY doc_id
"""


def pid_training_text(sf_dir: str):
    """(doc_id, n_spans, train_text) — the extraction output flattened
    into one LLM-training string per document: spans joined in seq
    order, non-text spans (tags / recognized image text) wrapped in
    '<kind>' markers. This is the END USE of the whole engine — the
    interleaved-document corpus rendered into trainable text — and it
    is value-hash-checked against the committed golden span table
    (same oracle mechanism as ``pid_extract_spans_check``).

    Scale shape: one extraction run plus a doc-keyed groupby whose
    groups are span-sequence-sized; the concat is per-group local."""
    _ensure_committed_golden(sf_dir)

    def to_text(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("seq")
        parts = [t if k == "text" else f"<{k}>{t}"
                 for k, t in zip(df["kind"], df["text"])]
        return pd.DataFrame({
            "doc_id": [df["doc_id"].iloc[0]],
            "n_spans": np.array([len(df)], np.int64),
            "train_text": [" ".join(parts)]})

    return pid_extract(sf_dir) \
        .select_columns(["doc_id", "seq", "kind", "text"]) \
        .groupby("doc_id").map_groups(to_text, batch_format="pandas")


def pid_extract_pdf_points(sf_dir: str):
    """Extraction output with pixel->PDF-point bbox columns (M11/S9 parity:
    ``/root/reference/src/convert_coord.py:17-23``, 72/dpi scale, 4 dp)."""
    from ..stages.assemble import to_pdf_points

    return pid_extract(sf_dir).map_batches(to_pdf_points, batch_format="pyarrow")


def pid_grouping_stats(sf_dir: str):
    """Run-level grouping metrics (G5 parity with the reference's printed
    summary, ``grouping_logic.py:966-989``): totals of boxes before/after
    grouping, suppressions, merges across all images. Rows-only."""
    import pandas as pd

    grouped = pid_extract(sf_dir, stop_after="group")
    n_after = grouped.count()
    # one metrics row per image without a per-image Python frame: batch-
    # local dedup, a bucketed shuffle (bounded group count) that dedups
    # images split across blocks, per-bucket partial sums, and a tiny
    # (num-buckets-row) driver-side total
    cols = ["media_ref", "n_boxes_before", "n_suppressed", "n_merges"]

    def batch_dedup(df: pd.DataFrame) -> pd.DataFrame:
        from .joins import _bucket_of
        d = df.drop_duplicates("media_ref")[cols]
        return d.assign(bucket=_bucket_of(d["media_ref"], 64))

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates("media_ref")
        return pd.DataFrame([{
            "images": len(d),
            "boxes_before": int(d["n_boxes_before"].sum()),
            "suppressed": int(d["n_suppressed"].sum()),
            "merges": int(d["n_merges"].sum())}])

    parts = (grouped.map_batches(batch_dedup, batch_format="pandas")
             .groupby("bucket", num_partitions=16)
             .map_groups(bucket_sums, batch_format="pandas").to_pandas())
    return pd.DataFrame([{
        "images": int(parts["images"].sum()),
        "boxes_before": int(parts["boxes_before"].sum()),
        "boxes_after": int(n_after),
        "suppressed": int(parts["suppressed"].sum()),
        "merges": int(parts["merges"].sum()),
    }]).astype("int64")


def media_resize(sf_dir: str, target: int = 256):
    """Multimodal resize op over the flagship media store: every unique
    media_ref decoded and resized in an actor-pool stage; returns
    (media_ref, width, height) rows (blobs dropped for the driver check)."""
    import os

    import ray.data as rd
    from ..stages.multimodal import ImageResizeStage

    docs_path, media_root = build_interleaved_docs(sf_dir)
    refs = sorted(
        os.path.join("media", f) for f in os.listdir(os.path.join(media_root, "media")))
    ds = rd.from_arrow(pa.table({"media_ref": pa.array(refs, pa.string())}))
    out = ds.map_batches(ImageResizeStage, fn_constructor_args=(media_root, target),
                         batch_format="pyarrow", batch_size=32,
                         concurrency=(1, 4), num_cpus=1)
    return out.select_columns(["media_ref", "width", "height"])


def pid_pdf_ingest(sf_dir: str):
    """S1 end-to-end as a driver-visible query: deterministic synthetic
    PDFs (``fixtures/pdfgen.demo_pdf``) -> distributed
    ``PdfIngestStage`` (parse + pure-numpy rasterize, 1->N page rows)
    -> per-page detection counts. Rows-only (the PDF object graph is
    not SQL-expressible); deterministic, so the driver's repeat-run
    check holds. ``sf_dir`` scales the document count.
    """
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..fixtures.pdfgen import demo_pdf
    from ..media.codec import decode_image
    from ..media.store import FileMediaStore
    from ..sources.pdf import PdfIngestStage
    from ..functions.rectdetect import detect_rects

    n_docs = max(4, min(32, pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows // 100))
    key = os.path.abspath(sf_dir).replace(os.sep, "_")
    media_root = f"/tmp/pid_pdf_ingest_{key}/media"

    docs = rd.from_items(
        [{"doc_id": f"PDF-{i:03d}", "pdf_bytes": demo_pdf(i)}
         for i in range(n_docs)],
        override_num_blocks=max(2, n_docs // 2))
    pages = docs.map_batches(
        PdfIngestStage(media_root, dpi=150), batch_format="pyarrow",
        batch_size=4)

    store_root = media_root

    def count_detections(df: pd.DataFrame) -> pd.DataFrame:
        store = FileMediaStore(store_root)
        n_boxes = [len(detect_rects(decode_image(store.get(r))))
                   for r in df["media_ref"]]
        return df.assign(n_boxes=pd.Series(n_boxes, index=df.index,
                                           dtype="int64"))

    return pages.map_batches(count_detections, batch_format="pandas") \
        .sort(["doc_id", "page"])


def pid_pdf_ocr(sf_dir: str):
    """The zero-external-model OCR chain as a driver-visible query:
    deterministic synthetic PDFs -> in-engine rasterizer (real TrueType
    glyph shapes, NOT value-coded pixels) -> the full distributed
    extract pipeline with the word-granularity detector and the
    template-matching recognizer -> per-doc span text. Rows-only;
    deterministic. The recovered text equals the tag written into each
    PDF, which the query exposes as a verifiable ``match`` column.
    """
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..fixtures.pdfgen import make_pdf
    from ..sources.pdf import PdfIngestStage
    from ..stages.ocr import TemplateRecognizer, WordDetector
    from .extract import extract_spans

    n_docs = max(4, min(24, pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows // 100))
    key = os.path.abspath(sf_dir).replace(os.sep, "_")
    root = f"/tmp/pid_pdf_ocr_{key}"
    media_root = os.path.join(root, "media")
    docs_path = os.path.join(root, "docs.parquet")
    tags = [f"PV-{1000 + 7 * i}" for i in range(n_docs)]

    if not os.path.exists(docs_path):
        stage = PdfIngestStage(media_root, dpi=150)
        pages = stage(pa.table({
            "doc_id": pa.array([f"DOC-{i:03d}" for i in range(n_docs)]),
            "pdf_bytes": pa.array(
                [make_pdf([f"BT /F1 24 Tf 40 120 Td ({t}) Tj ET\n".encode()])
                 for t in tags], pa.binary())}))
        refs = pages.column("media_ref").to_pylist()
        span_type = pa.list_(pa.struct([
            ("kind", pa.string()), ("text", pa.string()),
            ("media_ref", pa.string()), ("offset", pa.int32())]))
        pq.write_table(pa.table({
            "doc_id": pa.array([f"DOC-{i:03d}" for i in range(n_docs)]),
            "spans": pa.array(
                [[{"kind": "image", "text": "", "media_ref": refs[i],
                   "offset": 0}] for i in range(n_docs)], span_type)}),
            docs_path)

    spans = extract_spans(rd.read_parquet(docs_path), media_root,
                          detector_cls=WordDetector,
                          recognizer_cls=TemplateRecognizer).to_pandas()
    expect = pd.DataFrame({"doc_id": [f"DOC-{i:03d}" for i in range(n_docs)],
                           "expected": tags})
    got = spans[spans["kind"].isin(["tag", "image_text"])] \
        .groupby("doc_id", as_index=False).agg(text=("text", " ".join))
    out = expect.merge(got, on="doc_id", how="left")
    out["text"] = out["text"].fillna("")
    out["match"] = out["text"] == out["expected"]
    return out.sort_values("doc_id").reset_index(drop=True)

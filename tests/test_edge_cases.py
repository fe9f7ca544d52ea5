"""Edge cases through the public pipeline surface."""

import pandas as pd
import pyarrow as pa
import pytest

SPAN_T = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                             ("media_ref", pa.string()), ("offset", pa.int32())]))


def _docs_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "spans": pa.array([r[1] for r in rows], SPAN_T)}))


def _extract(ds, media_root):
    from p_id_text_extraction_ray.pipelines.extract import extract_spans
    return extract_spans(ds, media_root).to_pandas()


def test_doc_with_empty_span_list(ray_session, tiny_fixture):
    out = _extract(_docs_ds([("D-EMPTY", [])]), tiny_fixture.media_root)
    assert len(out) == 0


def test_unicode_text_span(ray_session, tiny_fixture):
    text = "mesure de débit — café  流量"
    out = _extract(_docs_ds([("D-U", [{"kind": "text", "text": text,
                                       "media_ref": "", "offset": 0}])]),
                   tiny_fixture.media_root)
    assert out["text"].iloc[0] == "mesure de débit — café 流量"


def test_image_without_text(ray_session, tiny_fixture, tmp_path):
    import numpy as np
    from p_id_text_extraction_ray.media.codec import BACKGROUND, encode_image
    from p_id_text_extraction_ray.media.store import FileMediaStore

    store = FileMediaStore(str(tmp_path))
    store.put("media/blank.pidr",
              encode_image(np.full((300, 400), BACKGROUND, np.uint8)))
    rows = [("D-BLANK", [{"kind": "image", "text": "",
                          "media_ref": "media/blank.pidr", "offset": 0},
                         {"kind": "text", "text": "after the image",
                          "media_ref": "", "offset": 1}])]
    out = _extract(_docs_ds(rows), str(tmp_path))
    # blank image contributes nothing; the text span survives with seq 0
    assert out["text"].tolist() == ["after the image"]
    assert out["seq"].tolist() == [0]


def test_same_media_referenced_twice_in_one_doc(ray_session, tiny_fixture):
    import pyarrow.parquet as pq
    docs = pq.read_table(tiny_fixture.docs).to_pandas()
    # find a doc with an image span, reference its media twice
    ref = None
    for spans in docs["spans"]:
        for s in spans:
            if s["kind"] == "image":
                ref = s["media_ref"]
                break
        if ref:
            break
    rows = [("D-TWICE", [{"kind": "image", "text": "", "media_ref": ref, "offset": 0},
                         {"kind": "image", "text": "", "media_ref": ref, "offset": 1}])]
    out = _extract(_docs_ds(rows), tiny_fixture.media_root)
    first = out[out["offset"] == 0].reset_index(drop=True)
    second = out[out["offset"] == 1].reset_index(drop=True)
    assert len(first) == len(second) > 0
    pd.testing.assert_series_equal(first["text"], second["text"],
                                   check_names=False)
    # seq continues across the two copies
    assert out["seq"].tolist() == list(range(len(out)))

"""Empty-input behavior of the session-8 web/curation operators: every
query must return a zero-row result (not raise) on an empty documents
table, mirroring the SQL oracle's empty-table semantics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import audiovideo as AV
from p_id_text_extraction_ray.pipelines import corpusstats as CS
from p_id_text_extraction_ray.pipelines import curation as C
from p_id_text_extraction_ray.pipelines import textstats as T
from p_id_text_extraction_ray.pipelines import webextract as W
from p_id_text_extraction_ray.pipelines import webfilter as WF


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("empty_docs"))
    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64())}),
        os.path.join(root, "documents.parquet"))
    return root


@pytest.mark.parametrize("op", [
    C.dedup_paragraphs, T.gopher_quality_flags, T.bpe_token_counts,
    T.ccnet_perplexity_buckets, W.html_main_content, W.fix_text_encoding,
    W.curate_web_corpus, WF.pii_redact, WF.c4_quality_flags,
    WF.quality_model_score, CS.resample_to_lang_mix,
    CS.dsir_importance_weights, AV.audio_features,
    AV.video_frame_sample])
def test_empty_documents(ray_session, empty_dir, op):
    res = op(empty_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) == 0


def test_empty_vocab_growth(ray_session, empty_dir):
    from p_id_text_extraction_ray.pipelines.corpusstats import vocab_growth_curve
    out = vocab_growth_curve(empty_dir)
    assert len(out) == 10 and out[["n_docs", "vocab_size",
                                   "n_tokens"]].to_numpy().sum() == 0
    # oracle parity: min/max over zero rows is NULL, so cutoffs are null
    assert out["cutoff_doc_id"].isna().all()

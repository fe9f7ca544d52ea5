"""Pin the committed flagship golden span table (VERDICT r4 item 8).

``pid_extract_spans_check``'s DuckDB oracle reads
``fixtures/golden_spans.parquet`` — a committed artifact. These tests
keep it honest: the committed rows must equal a FRESH independent
derivation from the current testdata (so a regenerated corpus or a
drifted derivation cannot silently pass), and the full oracle-style
comparison (pipeline output vs committed golden through the DuckDB key
lookup) must hold end to end.
"""

import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines.flagship import (
    GOLDEN_SPANS_PATH, PID_EXTRACT_SPANS_SQL, build_interleaved_docs,
    pid_extract_spans_check)

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _fresh_golden(sf_dir: str) -> pd.DataFrame:
    docs_path, _ = build_interleaved_docs(sf_dir)
    return pq.read_table(os.path.join(os.path.dirname(docs_path),
                                      "golden.parquet")).to_pandas()


def _corpus_key(sf_dir: str) -> tuple[int, int]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    return t.num_rows, sum(len(x) for x in t["text"].to_pylist())


def test_committed_golden_matches_fresh_derivation():
    n, tl = _corpus_key(SF_DIR)
    committed = pq.read_table(GOLDEN_SPANS_PATH).to_pandas()
    mine = committed[(committed["corpus_n"] == n)
                     & (committed["corpus_len"] == tl)] \
        .drop(columns=["corpus_n", "corpus_len"]).reset_index(drop=True)
    fresh = _fresh_golden(SF_DIR)
    assert len(mine) > 0, "committed golden lacks this corpus"
    pd.testing.assert_frame_equal(
        mine.sort_values(["doc_id", "seq"]).reset_index(drop=True),
        fresh.sort_values(["doc_id", "seq"]).reset_index(drop=True),
        check_dtype=False)


def test_pipeline_matches_committed_golden_via_sql(ray_session):
    """The exact driver shape: Ray pipeline vs the static oracle SQL."""
    res = pid_extract_spans_check(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_DIR}/documents.parquet'")
    exp = con.sql(PID_EXTRACT_SPANS_SQL).df()
    cols = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]
    a = res[cols].astype({"seq": "int64", "offset": "int64"}) \
        .sort_values(["doc_id", "seq"]).reset_index(drop=True)
    b = exp[cols].astype({"seq": "int64", "offset": "int64"}) \
        .sort_values(["doc_id", "seq"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_corpus_key_disambiguates_all_committed_corpora():
    """(corpus_n, corpus_len) must be unique per committed corpus —
    sf0.001 and sf0.01 share a row count and differ only in length."""
    committed = pq.read_table(GOLDEN_SPANS_PATH,
                              columns=["corpus_n", "corpus_len",
                                       "doc_id"]).to_pandas()
    keys = committed.groupby(["corpus_n", "corpus_len"])["doc_id"] \
        .nunique()
    assert len(keys) >= 3
    n_by_count = committed.groupby("corpus_n")["corpus_len"].nunique()
    assert (n_by_count >= 1).all()

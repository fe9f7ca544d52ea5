"""Corpus-level exact paragraph dedup (``curation.dedup_paragraphs``):
planted duplicate paragraphs across documents, verified against a
DuckDB re-derivation of the same first-occurrence semantics (the
testdata corpus has no paragraph breaks, so the driver's oracle row is
a pass-through there — this test plants the interesting cases)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines.curation import (
    DEDUP_PARAGRAPHS_SQL, dedup_paragraphs)

FOOTER = "contact us at example dot com"
NAV = "home products about"


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pardedup")
    texts = [
        f"alpha beta gamma\n\n{FOOTER}",             # footer first seen
        f"delta epsilon\n\n{FOOTER}\n\n{NAV}",       # footer dup, nav first
        f"{NAV}\n\nzeta eta theta",                  # nav dup
        f"{FOOTER}\n\n{FOOTER}",                     # dup within one doc too
        "unique paragraph only",
        "",                                          # empty doc: one '' par
        "\n\niota",                # ['', 'iota']: leading '' dups doc 5's
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))
    return str(d)


def oracle(corpus_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{corpus_dir}/documents.parquet')")
    return con.execute(DEDUP_PARAGRAPHS_SQL).fetchdf()


def test_planted_duplicates_match_oracle(ray_session, corpus_dir):
    got = dedup_paragraphs(corpus_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = oracle(corpus_dir).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_dropped": "int64"}),
        want.astype({"n_dropped": "int64"}))


def test_semantics_directly(ray_session, corpus_dir):
    got = dedup_paragraphs(corpus_dir).to_pandas() \
        .set_index("doc_id").sort_index()
    # footer survives only in doc 0; nav only in doc 1
    assert got.loc[0, "text_dedup"] == f"alpha beta gamma\n\n{FOOTER}"
    assert got.loc[0, "n_dropped"] == 0
    assert got.loc[1, "text_dedup"] == f"delta epsilon\n\n{NAV}"
    assert got.loc[1, "n_dropped"] == 1
    assert got.loc[2, "text_dedup"] == "zeta eta theta"
    assert got.loc[2, "n_dropped"] == 1
    # within-doc repetition: both copies are dups of doc 0's footer
    assert got.loc[3, "text_dedup"] == ""
    assert got.loc[3, "n_dropped"] == 2
    assert got.loc[4, "n_dropped"] == 0
    # the empty doc owns the '' paragraph; doc 6 loses its leading ''
    assert got.loc[5, "text_dedup"] == ""
    assert got.loc[5, "n_dropped"] == 0
    assert got.loc[6, "text_dedup"] == "iota"
    assert got.loc[6, "n_dropped"] == 1

"""Gopher composite quality rules (``textstats.gopher_quality_flags``):
planted documents exercising every rule (bullets, ellipses, symbols,
non-alpha tokens, stopword counts), cross-checked against the DuckDB
oracle SQL — the testdata corpus never trips the line-based rules, so
this plants the interesting cases."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines.textstats import (
    GOPHER_QUALITY_FLAGS_SQL, gopher_quality_flags)

GOOD = ("the quick brown fox jumps over the lazy dog and then " * 5).strip()


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gopher")
    texts = [
        GOOD,                                      # passes every rule
        "short of the text",                       # too few words
        "\n".join(["- item one of the list"] * 20),  # 100% bullet lines
        "\n".join(["the story continues..."] * 10),  # 100% ellipsis lines
        ("the " + "#tag " * 60).strip(),           # symbol ratio > 0.1
        ("the " + "12345 " * 60).strip(),          # alpha fraction < 0.8
        ("zq " * 60).strip(),                      # mwl < 3, no stopwords
        "",                                        # empty doc
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))
    return str(d)


def test_matches_oracle_on_planted_cases(ray_session, corpus_dir):
    got = gopher_quality_flags(corpus_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{corpus_dir}/documents.parquet')")
    want = con.execute(GOPHER_QUALITY_FLAGS_SQL).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, want.astype(
        {c: got[c].dtype for c in got.columns}))


def test_rule_decisions(ray_session, corpus_dir):
    got = gopher_quality_flags(corpus_dir).to_pandas() \
        .set_index("doc_id").sort_index()
    assert got.loc[0, "keep"] == 1
    assert got.loc[1, "keep"] == 0 and got.loc[1, "n_words"] == 4
    assert got.loc[2, "keep"] == 0
    assert got.loc[2, "bullet_line_frac"] == 1.0
    assert got.loc[3, "keep"] == 0
    assert got.loc[3, "ellipsis_line_frac"] == 1.0
    assert got.loc[4, "keep"] == 0
    assert got.loc[4, "symbol_ratio"] > 0.1
    assert got.loc[5, "keep"] == 0
    assert got.loc[5, "alpha_word_frac"] < 0.8
    assert got.loc[6, "keep"] == 0 and got.loc[6, "n_stopwords"] == 0
    assert got.loc[7, "keep"] == 0 and got.loc[7, "n_words"] == 0

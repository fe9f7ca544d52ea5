"""Driver-style correctness gate: every ``queries()`` entry with an
``oracle_sql()`` entry must match DuckDB on the same parquet tables —
row count, column names, and order-insensitive values."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _entry_module():
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __ray_entry__ as E
    return E


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        E = _entry_module()
        metafunc.parametrize("query_name", sorted(E.oracle_sql().keys()))


def test_query_matches_oracle(ray_session, query_name):
    E = _entry_module()
    res = _to_pandas(E.queries()[query_name](SF_DIR))
    exp = _oracle(E.oracle_sql()[query_name])
    assert sorted(res.columns) == sorted(exp.columns), \
        f"{query_name}: columns {sorted(res.columns)} != {sorted(exp.columns)}"
    a, b = _canon(res), _canon(exp)
    assert len(a) == len(b), f"{query_name}: {len(a)} rows vs oracle {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)


def test_rows_only_queries_run(ray_session):
    E = _entry_module()
    rows_only = set(E.queries()) - set(E.oracle_sql())
    for name in sorted(rows_only - {"pid_extract"}):
        res = _to_pandas(E.queries()[name](SF_DIR))
        assert isinstance(res, pd.DataFrame)


def test_entry_smoke(ray_session):
    E = _entry_module()
    out = E.entry()
    df = _to_pandas(out)
    assert len(df) > 0
    assert {"doc_id", "seq", "kind", "text", "media_ref", "offset"} <= set(df.columns)
    # every 5th source doc carries an image span -> tags/image_text present
    assert (df["kind"] != "text").any()

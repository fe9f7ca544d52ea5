"""Empty-input behavior of the retrieval / profiling / scan operators:
schema-stable empty (or zero-count) results matching the SQL oracle's
empty-table semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import profiling as PF
from p_id_text_extraction_ray.pipelines import retrieval as RT
from p_id_text_extraction_ray.pipelines import scanops as SC


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("empty_tables"))
    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64())}),
        os.path.join(root, "documents.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64())}),
        os.path.join(root, "events.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([], type=pa.int64()),
        "l_quantity": pa.array([], type=pa.float64()),
        "l_extendedprice": pa.array([], type=pa.float64()),
        "l_discount": pa.array([], type=pa.float64()),
        "l_tax": pa.array([], type=pa.float64()),
        "l_returnflag": pa.array([], type=pa.string()),
        "l_shipdate": pa.array([], type=pa.timestamp("us"))}),
        os.path.join(root, "lineitem.parquet"))
    pq.write_table(pa.table({"o_orderkey": pa.array([], type=pa.int64())}),
                   os.path.join(root, "orders.parquet"))
    return root


def test_empty_documents_ops(ray_session, empty_dir):
    assert list(RT.inverted_index(empty_dir).columns) == \
        ["term", "doc_freq", "total_tf"]
    assert len(RT.inverted_index(empty_dir)) == 0
    assert len(RT.bm25_search(empty_dir)) == 0
    assert len(RT.token_cooccurrence(empty_dir)) == 0
    assert len(PF.chi2_term_source(empty_dir)) == 0


def test_empty_events_scan(ray_session, empty_dir):
    out = SC.events_running_records(empty_dir)
    assert list(out.columns) == ["event_id", "event_type", "value"]
    assert len(out) == 0


def test_empty_lineitem_profile_audit(ray_session, empty_dir):
    """SQL aggregates still emit one row per column/rule on an empty
    table — the Ray side must match."""
    import duckdb
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT *"
                    f" FROM '{empty_dir}/{t}.parquet'")
    prof = PF.profile_lineitem(empty_dir)
    orc = con.execute(PF.PROFILE_LINEITEM_SQL).df()
    assert prof["column"].tolist() == orc["column"].tolist()
    assert (prof["n_rows"] == 0).all() and (prof["n_distinct"] == 0).all()
    assert prof["min_v"].isna().all() and orc["min_v"].isna().all()

    audit = PF.audit_lineitem(empty_dir)
    orc_a = con.execute(PF.AUDIT_LINEITEM_SQL).df()
    assert audit["rule"].tolist() == orc_a["rule"].tolist()
    assert (audit["n_violations"].to_numpy()
            == orc_a["n_violations"].to_numpy()).all()

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


def test_empty_weighted_sample(ray_session, empty_dir):
    from p_id_text_extraction_ray.pipelines import sampling as SP
    out = SP.weighted_sample_docs(empty_dir)
    assert list(out.columns) == ["rank", "doc_id", "source", "weight",
                                 "priority"]
    assert len(out) == 0


def test_bm25_no_hit_corpus(ray_session, tmp_path):
    """Non-empty corpus containing none of the panel terms: zero groups
    ever reach the reducer — result must still carry the rank column."""
    root = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["zz yy xx", "yy zz"])}),
        os.path.join(root, "documents.parquet"))
    out = RT.bm25_search(root)
    assert list(out.columns) == ["query_id", "rank", "doc_id", "score"]
    assert len(out) == 0


def test_orphan_key_straddling_shards(ray_session, tmp_path):
    """An orphan l_orderkey whose rows live in TWO parquet shards must
    count once (global key dedup), matching COUNT(DISTINCT ...)."""
    root = str(tmp_path)
    li_dir = os.path.join(root, "lineitem.parquet")
    os.makedirs(li_dir)

    def li_shard(keys):
        n = len(keys)
        return pa.table({
            "l_orderkey": pa.array(keys, type=pa.int64()),
            "l_quantity": pa.array([5.0] * n),
            "l_extendedprice": pa.array([10.0] * n),
            "l_discount": pa.array([0.02] * n),
            "l_tax": pa.array([0.01] * n),
            "l_returnflag": pa.array(["A"] * n),
            "l_shipdate": pa.array([pd.Timestamp("1995-01-01")] * n,
                                   type=pa.timestamp("us"))})

    pq.write_table(li_shard([1, 2, 777]), os.path.join(li_dir, "a.parquet"))
    pq.write_table(li_shard([777, 3]), os.path.join(li_dir, "b.parquet"))
    pq.write_table(pa.table({"o_orderkey": pa.array([1, 2, 3],
                                                    type=pa.int64())}),
                   os.path.join(root, "orders.parquet"))
    out = PF.audit_lineitem(root)
    got = dict(zip(out["rule"], out["n_violations"]))
    assert got["orphan_orderkey"] == 1          # 777 counted once


def test_profile_all_null_column(ray_session, tmp_path):
    root = str(tmp_path)
    n = 5
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(n), type=pa.int64()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([10.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([None] * n, type=pa.float64())}),
        os.path.join(root, "lineitem.parquet"))
    out = PF.profile_lineitem(root)
    row = out[out["column"] == "l_tax"].iloc[0]
    assert row["n_null"] == n and row["n_distinct"] == 0
    assert np.isnan(row["min_v"]) and np.isnan(row["max_v"])


def test_scan_skips_null_values(ray_session, tmp_path):
    """NULL values never contribute a running max (SQL window parity),
    and a NULL-value row is a 'record' only while prev_max IS NULL."""
    import duckdb
    root = str(tmp_path)
    pq.write_table(pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "event_type": pa.array(["a"] * 6),
        "value": pa.array([None, 5.0, None, 7.0, 6.0, 8.0],
                          type=pa.float64())}),
        os.path.join(root, "events.parquet"))
    out = SC.events_running_records(root)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT *"
                f" FROM '{root}/events.parquet'")
    orc = con.execute(SC.EVENTS_RUNNING_RECORDS_SQL).df()
    assert out["event_id"].tolist() == orc["event_id"].tolist()
    assert out["event_id"].tolist() == [0, 1, 3, 5]


def test_events_trimmed_mean_empty(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines import analytics_ext as AX
    pq.write_table(pa.table({
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64())}),
        tmp_path / "events.parquet")
    out = AX.events_trimmed_mean(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "lo", "hi", "n_kept",
                                 "trimmed_mean"]


@pytest.fixture(scope="module")
def empty_dir2(tmp_path_factory):
    """Empty documents + embeddings (for the continuation-session ops)."""
    root = str(tmp_path_factory.mktemp("empty_tables2"))
    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64())}),
        os.path.join(root, "documents.parquet"))
    pq.write_table(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float64())),
        "label": pa.array([], type=pa.int32())}),
        os.path.join(root, "embeddings.parquet"))
    return root


def test_empty_continuation_ops(ray_session, empty_dir2):
    import pandas as pd
    from p_id_text_extraction_ray.pipelines.corpusstats import \
        resample_temperature_mix
    from p_id_text_extraction_ray.pipelines.curation import decontaminate_fuzzy
    from p_id_text_extraction_ray.pipelines.textstats import quality_rank_fusion

    t = resample_temperature_mix(empty_dir2)
    t = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
    assert len(t) == 0 and list(t.columns) == ["doc_id", "lang"]

    f = decontaminate_fuzzy(empty_dir2)
    f = f.to_pandas() if not isinstance(f, pd.DataFrame) else f
    assert len(f) == 0
    assert list(f.columns) == ["doc_id", "holdout_id", "jaccard"]

    q = quality_rank_fusion(empty_dir2)
    q = q.to_pandas() if not isinstance(q, pd.DataFrame) else q
    assert len(q) == 0

    from p_id_text_extraction_ray.pipelines.similarity import (
        ann_pq_topk, embedding_pq_codes)
    c = embedding_pq_codes(empty_dir2)
    c = c.to_pandas() if not isinstance(c, pd.DataFrame) else c
    assert len(c) == 0
    k = ann_pq_topk(empty_dir2)
    k = k.to_pandas() if not isinstance(k, pd.DataFrame) else k
    assert len(k) == 0
    assert list(k.columns) == ["query_id", "rank", "vec_id", "adc_score"]

"""Planted-data semantics for the profiling/audit/feature-selection
operators (exactness vs DuckDB is covered by the oracle gate)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.pipelines import profiling as P


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """lineitem with a null, a domain violation, and two orphan keys;
    documents where term 'alpha' lives only in source sA."""
    root = tmp_path_factory.mktemp("profiling")
    n = 40
    li = pa.table({
        "l_orderkey": pa.array([900, 901] + list(range(n - 2)),
                               type=pa.int64()),
        "l_partkey": pa.array([1] * n, type=pa.int64()),
        "l_suppkey": pa.array([1] * n, type=pa.int64()),
        "l_linenumber": pa.array([1] * n, type=pa.int32()),
        "l_quantity": pa.array([99.0] + [5.0] * (n - 1)),   # 1 range hit
        "l_extendedprice": pa.array([100.0] * n),
        "l_discount": pa.array([None] + [0.04] * (n - 1),
                               type=pa.float64()),          # 1 null
        "l_tax": pa.array([0.0] * 10 + [0.05] * (n - 10)),
        "l_returnflag": pa.array(["X"] + ["A"] * (n - 1)),  # 1 domain hit
        "l_shipdate": pa.array([pd.Timestamp("1995-06-01")] * n,
                               type=pa.timestamp("us")),
    })
    pq.write_table(li, str(root / "lineitem.parquet"))
    orders = pa.table({"o_orderkey": pa.array(range(n - 2),
                                              type=pa.int64())})
    pq.write_table(orders, str(root / "orders.parquet"))
    docs = pa.table({
        "doc_id": pa.array(range(20), type=pa.int64()),
        "text": pa.array(["alpha beta"] * 10 + ["beta gamma"] * 10),
        "source": pa.array(["sA"] * 10 + ["sB"] * 10),
    })
    pq.write_table(docs, str(root / "documents.parquet"))
    return str(root)


def test_profile_counts(ray_session, planted_dir):
    out = P.profile_lineitem(planted_dir)
    row = out[out["column"] == "l_discount"].iloc[0]
    assert row["n_rows"] == 40 and row["n_null"] == 1
    assert row["n_distinct"] == 1          # nulls excluded from distinct
    assert row["min_v"] == 0.04 and row["max_v"] == 0.04
    qty = out[out["column"] == "l_quantity"].iloc[0]
    assert qty["n_distinct"] == 2 and qty["max_v"] == 99.0


def test_audit_rules(ray_session, planted_dir):
    out = P.audit_lineitem(planted_dir)
    got = dict(zip(out["rule"], out["n_violations"]))
    assert got["quantity_range"] == 1
    assert got["returnflag_domain"] == 1
    assert got["orphan_orderkey"] == 2      # 900, 901 missing from orders
    assert got["zero_tax_warn"] == 10
    assert got["price_positive"] == 0
    assert got["shipdate_window"] == 0
    # null discount is neither >=0 nor <=0.1 -> counted as a violation
    assert got["discount_range"] == 1


def test_audit_oracle_on_nulls(ray_session, planted_dir):
    """The sf tables carry no NULLs, so the driver's oracle gate never
    exercises the NULL arms — cross-check them here."""
    import duckdb
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT *"
                    f" FROM '{planted_dir}/{t}.parquet'")
    orc = con.execute(P.AUDIT_LINEITEM_SQL).df()
    mine = P.audit_lineitem(planted_dir)
    assert mine["rule"].tolist() == orc["rule"].tolist()
    assert (mine["n_violations"].to_numpy()
            == orc["n_violations"].to_numpy()).all()


def test_chi2_planted_association(ray_session, planted_dir):
    out = P.chi2_term_source(planted_dir)
    # 'alpha' occurs in all 10 sA docs and no sB doc: perfect association,
    # chi2 = N = 20 for both cells of the alpha row
    a_sa = out[(out["term"] == "alpha") & (out["source"] == "sA")].iloc[0]
    assert a_sa["n11"] == 10 and a_sa["chi2"] == 20.0
    a_sb = out[(out["term"] == "alpha") & (out["source"] == "sB")].iloc[0]
    assert a_sb["n11"] == 0 and a_sb["chi2"] == 20.0
    # 'beta' occurs everywhere -> degenerate marginal (c0 = 0): excluded
    assert out[out["term"] == "beta"].empty
    # full grid for the non-degenerate terms
    assert len(out[out["term"] == "gamma"]) == 2


def test_chi2_matches_scipy_formula(ray_session, planted_dir):
    out = P.chi2_term_source(planted_dir)
    row = out[(out["term"] == "gamma") & (out["source"] == "sB")].iloc[0]
    n11, n10, n01, n00 = 10, 0, 0, 10
    n = 20
    det = n11 * n00 - n10 * n01
    expect = (n * det * det) / ((n11 + n10) * (n01 + n00)
                                * (n11 + n01) * (n10 + n00))
    assert row["chi2"] == pytest.approx(expect, rel=1e-12)

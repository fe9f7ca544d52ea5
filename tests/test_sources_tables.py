"""Routing tests for the document-table source (``sources/tables.py``).

``BASELINE.json.input_hint`` names a Lance table; the package is not
installable in this sandbox (no network — recorded in BASELINE.md), so
these tests pin the BRANCH contract: ``.lance`` paths (and directories
with a Lance ``_versions`` marker) route to ``ray.data.read_lance`` with
the caller's column pruning intact when the package imports, raise the
documented error when it does not, and everything else routes to the
Parquet reader.
"""

import os

import pytest

from p_id_text_extraction_ray.sources import tables


def test_parquet_path_routes_to_read_parquet(monkeypatch):
    calls = {}

    import ray.data as rd

    def fake_read_parquet(path, columns=None):
        calls["path"], calls["columns"] = path, columns
        return "PARQUET_DS"

    monkeypatch.setattr(rd, "read_parquet", fake_read_parquet)
    out = tables.read_docs("/data/docs.parquet", columns=["doc_id"])
    assert out == "PARQUET_DS"
    assert calls == {"path": "/data/docs.parquet", "columns": ["doc_id"]}


def test_lance_path_routes_to_read_lance_when_available(monkeypatch):
    calls = {}

    import ray.data as rd

    def fake_read_lance(path, columns=None):
        calls["path"], calls["columns"] = path, columns
        return "LANCE_DS"

    monkeypatch.setattr(tables, "lance_available", lambda: True)
    monkeypatch.setattr(rd, "read_lance", fake_read_lance)
    out = tables.read_docs("/data/docs.lance", columns=["doc_id", "spans"])
    assert out == "LANCE_DS"
    assert calls == {"path": "/data/docs.lance",
                     "columns": ["doc_id", "spans"]}


def test_lance_dir_marker_detected(monkeypatch, tmp_path):
    """A directory holding a Lance ``_versions`` marker routes to the
    Lance reader even without the .lance suffix."""
    root = tmp_path / "docs_table"
    (root / "_versions").mkdir(parents=True)

    import ray.data as rd
    monkeypatch.setattr(tables, "lance_available", lambda: True)
    monkeypatch.setattr(rd, "read_lance",
                        lambda path, columns=None: ("LANCE", path))
    out = tables.read_docs(str(root))
    assert out == ("LANCE", str(root))


def test_lance_unavailable_raises_documented_error(monkeypatch):
    monkeypatch.setattr(tables, "lance_available", lambda: False)
    with pytest.raises(NotImplementedError, match="lance"):
        tables.read_docs("/data/docs.lance")


def test_lance_available_reflects_import():
    # in this sandbox the package is absent (pip install impossible:
    # no network); if it ever appears, the probe must flip to True
    try:
        import lance  # noqa: F401
        assert tables.lance_available()
    except ImportError:
        assert not tables.lance_available()


def test_write_spans_parquet_fallback(monkeypatch, tmp_path):
    class FakeDS:
        def write_parquet(self, path, partition_cols=None):
            self.args = (path, partition_cols)
            return "WROTE_PARQUET"

        def write_lance(self, path):
            raise AssertionError("must not write lance without package")

    monkeypatch.setattr(tables, "lance_available", lambda: False)
    ds = FakeDS()
    assert tables.write_spans(ds, str(tmp_path / "out.lance")) == "WROTE_PARQUET"
    assert ds.args[0].endswith("out.lance")

"""Document-table source: Lance when available, Parquet fallback.

``BASELINE.json.input_hint`` specifies a Lance table of interleaved
documents; this environment ships no ``lance``/``pylance`` package, so the
reader probes for it at call time (``ray.data.read_lance`` exists but
imports lance lazily) and falls back to Parquet with the identical schema.
The rest of the engine is format-agnostic — it sees a ``ray.data.Dataset``
of ``(doc_id, spans[])`` rows either way.
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_docs(path: str, columns: list[str] | None = None):
    """Read the interleaved document table from a Lance dataset directory
    or a Parquet file/directory."""
    import ray.data as rd

    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        if not lance_available():
            raise NotImplementedError(
                "Lance input requires the `lance` package, absent in this "
                "environment; provide Parquet instead")
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_spans(ds, path: str, partition_cols: list[str] | None = None):
    """Write output spans as Lance when available, else partitioned
    Parquet (the resumable layout of state/manifest.py)."""
    if lance_available() and path.endswith(".lance"):
        return ds.write_lance(path)
    return ds.write_parquet(path, partition_cols=partition_cols)

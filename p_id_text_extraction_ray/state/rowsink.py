"""Generic resumable partitioned-parquet sink for row-local pipelines.

``run_resumable`` (state/manifest.py) is the flagship extraction's
checkpointed runner; this module generalizes the same manifest contract
to ANY query pipeline whose rows are a pure function of the input rows
they derive from (every curation/scoring map in this repo): the output
is hash-partitioned on a key column into ``rows/part=N`` directories,
waves of partitions run at a time, and each partition's manifest record
commits only after its wave's parquet sink completes. A re-run anti-joins
the manifest and processes only missing partitions — kill it anywhere
and call again (same semantics as ``test_resume.py`` proves for the
flagship).

The caller provides ``make_wave_ds(wave)`` returning the pipeline
restricted to input rows whose ``partition_of(str(key))`` falls in the
wave — restriction happens at the READ (a batch filter), so a wave never
recomputes the rest of the corpus.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
import zlib
from collections.abc import Callable

import pyarrow as pa

from .manifest import Manifest, PartitionRecord, partition_of


def key_partition_filter(key_col: str, wave: frozenset[int],
                         num_partitions: int):
    """Batch filter keeping rows whose key hashes into the wave."""
    def fn(batch: pa.Table) -> pa.Table:
        keep = [partition_of(str(k), num_partitions) in wave
                for k in batch.column(key_col).to_pylist()]
        return batch.filter(pa.array(keep))
    return fn


def write_resumable_rows(make_wave_ds: Callable[[frozenset[int]], object],
                         out_dir: str, *, key_col: str = "doc_id",
                         num_partitions: int = 16,
                         wave_partitions: int = 8) -> dict:
    """Run ``make_wave_ds`` wave by wave into ``out_dir/rows/part=N``
    with per-partition manifest commits; returns a run summary."""
    import pyarrow.parquet as pq

    manifest = Manifest(out_dir)
    rows_root = os.path.join(out_dir, "rows")
    run_id = uuid.uuid4().hex[:12]

    done = manifest.completed()
    pending = [p for p in range(num_partitions) if p not in done]
    summary = {"run_id": run_id, "partitions": num_partitions,
               "skipped": len(done), "processed": 0, "rows_out": 0}

    for wi in range(0, len(pending), wave_partitions):
        wave = frozenset(pending[wi:wi + wave_partitions])
        # uncommitted leftovers of a killed attempt are re-written fresh
        for pid in wave:
            shutil.rmtree(os.path.join(rows_root, f"part={pid}"),
                          ignore_errors=True)
        t0 = time.perf_counter()

        def add_part(batch: pa.Table, wave=wave) -> pa.Table:
            part = pa.array([partition_of(str(k), num_partitions)
                             for k in batch.column(key_col).to_pylist()],
                            pa.int32())
            return batch.append_column("part", part)

        ds = make_wave_ds(wave).map_batches(add_part, batch_format="pyarrow")
        ds.write_parquet(rows_root, partition_cols=["part"])
        wall_ms = int((time.perf_counter() - t0) * 1000)

        for pid in sorted(wave):
            part_dir = os.path.join(rows_root, f"part={pid}")
            rows_out = 0
            if os.path.isdir(part_dir):
                for f in os.listdir(part_dir):
                    if f.endswith(".parquet"):
                        rows_out += pq.read_metadata(
                            os.path.join(part_dir, f)).num_rows
            manifest.commit(PartitionRecord(
                partition_id=pid, docs_in=-1, spans_out=rows_out,
                wall_ms=wall_ms,
                input_fingerprint=format(zlib.crc32(b""), "08x"),
                output_uri=part_dir, run_id=run_id))
            summary["processed"] += 1
            summary["rows_out"] += rows_out
    return summary

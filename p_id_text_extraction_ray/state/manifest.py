"""Checkpoint manifest + resumable partitioned extraction runs.

The reference resumes at whole-step granularity (every step fully
materializes to disk, ``run_pipeline.py:336-383``); this engine's resume
unit is a **partition of documents** (SURVEY.md §4.3):

* partition id = crc32(doc_id) % P — stable across runs and machines;
* a run processes partitions in waves; each wave is one streaming pipeline
  over only the pending partitions, sinking to
  ``out/spans/part={pid}/*.parquet`` via ``write_parquet(partition_cols)``;
* after a wave commits, one manifest JSON per partition is written
  atomically (tmp + rename) with lineage + counters mirroring the
  reference's run-level metrics (``grouping_logic.py:966-989``,
  ``run_pipeline.py:162,219``);
* resuming re-lists the manifest dir and anti-joins: only partitions
  without a manifest record run again. Output re-writes are idempotent
  because each partition's rows land under its own directory and the
  pipeline is deterministic.
"""

from __future__ import annotations

import json
import os
import time
import uuid
import zlib
from dataclasses import asdict, dataclass

import pyarrow as pa

from ..config import ExtractConfig


def partition_of(doc_id: str, num_partitions: int) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


def add_partition_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    part = pa.array([partition_of(d, num_partitions)
                     for d in batch.column("doc_id").to_pylist()], pa.int32())
    return batch.append_column("part", part)


@dataclass
class PartitionRecord:
    partition_id: int
    docs_in: int
    spans_out: int
    wall_ms: int
    input_fingerprint: str     # crc32 over the partition's sorted doc_ids
    output_uri: str
    run_id: str
    # stage -> dropped-row totals for the WAVE this partition ran in (the
    # reference's skip-and-log filter counts, SURVEY.md §2.2; wave
    # granularity because counters aggregate per pipeline execution)
    rows_dropped: dict | None = None


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    def completed(self) -> set[int]:
        done = set()
        for name in os.listdir(self.dir):
            if name.endswith(".json"):
                done.add(int(name[:-5]))
        return done

    def read(self, pid: int) -> dict:
        with open(os.path.join(self.dir, f"{pid}.json")) as f:
            return json.load(f)

    def commit(self, rec: PartitionRecord) -> None:
        path = os.path.join(self.dir, f"{rec.partition_id}.json")
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(asdict(rec), f)
        os.replace(tmp, path)


def _partition_stats(docs_path: str, num_partitions: int) -> dict[int, dict]:
    """One distributed doc_id-only scan -> per-partition {docs_in, fp}.

    The fingerprint (crc32 over the partition's sorted doc_ids) is computed
    INSIDE the partition's group, so the driver only ever holds P stat
    rows — never the doc_id list (the round-1 version re-scanned the docs
    table once per wave and collected every wave doc_id to the driver).
    """
    import pandas as pd
    import ray.data as rd

    def add_part(batch: pa.Table) -> pa.Table:
        return add_partition_column(batch, num_partitions)

    def stats(df: "pd.DataFrame") -> "pd.DataFrame":
        ids = sorted(df["doc_id"])
        return pd.DataFrame({
            "part": [int(df["part"].iloc[0])],
            "docs_in": [len(ids)],
            "fp": [format(zlib.crc32("\n".join(ids).encode()), "08x")]})

    rows = (rd.read_parquet(docs_path, columns=["doc_id"])
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(stats, batch_format="pandas")
            .take_all())
    return {r["part"]: {"docs_in": r["docs_in"], "fp": r["fp"]} for r in rows}


def _settle_fsspec_http_import() -> None:
    """Make Ray's per-call ``from fsspec.implementations.http import
    HTTPFileSystem`` probe succeed once and stay cached.

    With ``aiohttp`` absent, that probe fails on EVERY read/write path
    resolution; two driver threads (concurrent waves) attempting the
    failing import at the same moment can observe a partially-initialized
    module and crash with ``ImportError: cannot import name
    'HTTPFileSystem'``. Installing inert placeholder modules for the
    missing transitive deps lets the probe import complete once, after
    which every later probe is a sys.modules hit — no import machinery,
    no race. http:// URLs are not a supported input scheme for this
    engine, so the placeholders are never exercised — and they are
    REMOVED from ``sys.modules`` again once the probe settles (the
    cached ``fsspec.implementations.http`` module keeps its own
    references), so a later genuine ``import aiohttp`` by user code or
    Ray still raises a clean ImportError instead of handing back an
    empty module.
    """
    import importlib
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except Exception:
        pass
    installed = []
    try:
        for name in ("aiohttp", "yarl"):
            if name not in sys.modules:
                try:
                    importlib.import_module(name)
                except Exception:
                    sys.modules[name] = types.ModuleType(name)
                    installed.append(name)
        try:
            import fsspec.implementations.http  # noqa: F401
        except Exception:
            pass
    finally:
        for name in installed:
            if sys.modules.get(name) is not None and \
                    not getattr(sys.modules[name], "__file__", None):
                del sys.modules[name]


def run_resumable(docs_path: str, media_root: str, out_dir: str,
                  num_partitions: int = 16, wave_partitions: int = 8,
                  cfg: ExtractConfig | None = None,
                  concurrent_waves: int = 1) -> dict:
    """Run the extraction pipeline resumably; returns a run summary.

    Safe to call repeatedly: completed partitions are skipped via the
    manifest anti-join. Kill it mid-run and call again — the second call
    finishes only the remainder (pytest-verified in test_resume.py).

    ``wave_partitions`` is the checkpoint-granularity knob (smaller waves
    = finer resume, more fixed pipeline latency). ``concurrent_waves > 1``
    executes that many waves at once from driver threads — partitions are
    disjoint and sinks partition-keyed, so overlap is correct, and wave
    N+1's read/tile phase hides under wave N's recognize tail. Each wave's
    manifests commit only when that wave's sink completes. Per-wave actor
    pool caps are automatically divided by ``concurrent_waves`` (unless
    explicitly configured) so the combined warm minimums always fit the
    cluster — without that, N waves would demand N x min CPUs at once and
    deadlock the scheduler.
    """
    import concurrent.futures as cf
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    cfg = cfg or ExtractConfig()
    from ..pipelines.extract import extract_spans
    from .counters import counter_totals, make_drop_counter

    if concurrent_waves > 1:
        _settle_fsspec_http_import()
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        # Every in-flight wave permanently holds >= 2 actor CPUs (detector
        # + recognizer pool minimums) and still needs free CPUs for its
        # task stages and shuffles; below ~6 CPUs per wave the actors
        # squeeze the task stages out entirely and the run deadlocks.
        # Clamp rather than hang — a tiny cluster just runs sequentially.
        concurrent_waves = min(concurrent_waves, max(1, cpus // 6))
    if concurrent_waves > 1 and cfg.detect_concurrency is None \
            and cfg.recognize_concurrency is None:
        # Each in-flight wave spawns its own actor pools with warm
        # MINIMUMS sized for the whole cluster; N waves would then demand
        # N x min CPUs at once and deadlock the scheduler. Split the
        # per-wave caps so the combined minimums fit.
        import dataclasses
        cfg = dataclasses.replace(
            cfg,
            detect_concurrency=max(1, int(cpus * 0.6) // concurrent_waves),
            recognize_concurrency=max(1, (cpus // 4) // concurrent_waves))

    manifest = Manifest(out_dir)
    spans_root = os.path.join(out_dir, "spans")
    run_id = uuid.uuid4().hex[:12]

    done = manifest.completed()
    pending = [p for p in range(num_partitions) if p not in done]
    summary = {"run_id": run_id, "partitions": num_partitions,
               "skipped": len(done), "processed": 0, "spans_out": 0}
    if not pending:
        return summary

    stats = _partition_stats(docs_path, num_partitions)

    def run_wave(wave: frozenset[int]) -> list[PartitionRecord]:
        # Clear any uncommitted leftovers from a previously killed attempt —
        # partition dirs are only trusted once their manifest record exists,
        # so re-writing them from scratch keeps the run idempotent.
        for pid in wave:
            shutil.rmtree(os.path.join(spans_root, f"part={pid}"),
                          ignore_errors=True)
        t0 = time.perf_counter()

        def in_wave(batch: pa.Table, wave=wave) -> pa.Table:
            keep = [partition_of(d, num_partitions) in wave
                    for d in batch.column("doc_id").to_pylist()]
            return batch.filter(pa.array(keep))

        counter = make_drop_counter()
        wave_docs = rd.read_parquet(docs_path).map_batches(
            in_wave, batch_format="pyarrow")
        out = extract_spans(wave_docs, media_root, cfg,
                            counter=counter).map_batches(
            lambda t: add_partition_column(t, num_partitions),
            batch_format="pyarrow")
        out.write_parquet(spans_root, partition_cols=["part"])

        wall_ms = int((time.perf_counter() - t0) * 1000)
        dropped = counter_totals(counter)

        recs = []
        for pid in sorted(wave):
            part_dir = os.path.join(spans_root, f"part={pid}")
            spans_out = 0
            if os.path.isdir(part_dir):
                for f in os.listdir(part_dir):
                    if f.endswith(".parquet"):
                        spans_out += pq.read_metadata(
                            os.path.join(part_dir, f)).num_rows
            st = stats.get(pid, {"docs_in": 0, "fp": format(zlib.crc32(b""), "08x")})
            recs.append(PartitionRecord(
                partition_id=pid, docs_in=st["docs_in"], spans_out=spans_out,
                wall_ms=wall_ms, input_fingerprint=st["fp"],
                output_uri=part_dir, run_id=run_id, rows_dropped=dropped))
        return recs

    waves = [frozenset(pending[wi:wi + wave_partitions])
             for wi in range(0, len(pending), wave_partitions)]
    workers = max(1, min(concurrent_waves, len(waves)))
    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(run_wave, w) for w in waves]
        for fut in cf.as_completed(futures):     # commit each wave when done
            for rec in fut.result():
                manifest.commit(rec)
                summary["processed"] += 1
                summary["spans_out"] += rec.spans_out
    return summary

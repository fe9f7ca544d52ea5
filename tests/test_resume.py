"""Checkpoint manifest + resumable-run semantics (SURVEY.md §4.3)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from p_id_text_extraction_ray.state.manifest import (Manifest, PartitionRecord,
                                                     partition_of, run_resumable)

GOLDEN_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]


def _norm(df):
    df = df[GOLDEN_COLS].copy()
    for c in ("seq", "offset"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["doc_id", "seq"]).reset_index(drop=True)


def test_partition_of_stable():
    assert partition_of("DOC-000001", 16) == partition_of("DOC-000001", 16)
    assert 0 <= partition_of("anything", 7) < 7


def test_manifest_commit_atomic(tmp_path):
    m = Manifest(str(tmp_path))
    assert m.completed() == set()
    m.commit(PartitionRecord(3, 10, 50, 1200, "abcd1234", "/x", "r1"))
    assert m.completed() == {3}
    assert m.read(3)["docs_in"] == 10


def test_resumable_run_and_skip(ray_session, tiny_fixture, tmp_path):
    out = str(tmp_path / "out")
    s1 = run_resumable(tiny_fixture.docs, tiny_fixture.media_root, out,
                       num_partitions=4, wave_partitions=2)
    assert s1["processed"] == 4 and s1["skipped"] == 0

    # full output equals golden
    got = _norm(pq.read_table(os.path.join(out, "spans")).to_pandas())
    golden = _norm(pq.read_table(tiny_fixture.golden).to_pandas())
    pd.testing.assert_frame_equal(got, golden)

    # second run: everything skipped, output unchanged
    s2 = run_resumable(tiny_fixture.docs, tiny_fixture.media_root, out,
                       num_partitions=4, wave_partitions=2)
    assert s2["processed"] == 0 and s2["skipped"] == 4
    got2 = _norm(pq.read_table(os.path.join(out, "spans")).to_pandas())
    pd.testing.assert_frame_equal(got2, golden)


def test_resume_after_partial_run(ray_session, tiny_fixture, tmp_path):
    """Simulate a mid-table kill: complete 2 of 4 partitions, delete one
    partition's manifest (as if the run died before committing it), then
    resume — the result must be byte-identical to a clean full run."""
    out = str(tmp_path / "out")
    run_resumable(tiny_fixture.docs, tiny_fixture.media_root, out,
                  num_partitions=4, wave_partitions=4)
    m = Manifest(out)
    assert m.completed() == {0, 1, 2, 3}

    # kill: drop manifests 2,3 and corrupt partition 3's data dir
    for pid in (2, 3):
        os.remove(os.path.join(out, "manifest", f"{pid}.json"))
    import shutil
    shutil.rmtree(os.path.join(out, "spans", "part=3"), ignore_errors=True)

    s = run_resumable(tiny_fixture.docs, tiny_fixture.media_root, out,
                      num_partitions=4, wave_partitions=4)
    assert s["skipped"] == 2 and s["processed"] == 2

    got = _norm(pq.read_table(os.path.join(out, "spans")).to_pandas())
    golden = _norm(pq.read_table(tiny_fixture.golden).to_pandas())
    pd.testing.assert_frame_equal(got, golden)


def test_manifest_counters(ray_session, tiny_fixture, tmp_path):
    out = str(tmp_path / "out")
    run_resumable(tiny_fixture.docs, tiny_fixture.media_root, out,
                  num_partitions=2, wave_partitions=2)
    m = Manifest(out)
    recs = [m.read(p) for p in sorted(m.completed())]
    golden = pq.read_table(tiny_fixture.golden).to_pandas()
    assert sum(r["spans_out"] for r in recs) == len(golden)
    docs = pq.read_table(tiny_fixture.docs).to_pandas()
    assert sum(r["docs_in"] for r in recs) == len(docs)
    assert all(r["input_fingerprint"] for r in recs)


def test_resumable_concurrent_waves(ray_session, tiny_fixture, tmp_path):
    """concurrent_waves=2 on the 4-CPU test cluster must clamp to a
    sequential run (two waves' actor-pool minimums cannot fit alongside
    task stages) instead of deadlocking — and produce golden-equal
    output. The >1-wave overlap itself is exercised at 32 CPUs by the
    bench-scale measurement recorded in BASELINE.md."""
    out = str(tmp_path / "out_cw")
    s = run_resumable(tiny_fixture.docs, tiny_fixture.media_root, out,
                      num_partitions=4, wave_partitions=2,
                      concurrent_waves=2)
    assert s["processed"] == 4
    got = _norm(pq.read_table(os.path.join(out, "spans")).to_pandas())
    golden = _norm(pq.read_table(tiny_fixture.golden).to_pandas())
    pd.testing.assert_frame_equal(got, golden)


def test_curate_web_resumable_matches_oneshot_and_resumes(ray_session, tmp_path):
    """The generic row sink: full run == the one-shot query; killing two
    partitions and re-running rewrites only those, byte-identically."""
    import glob
    import json
    import shutil

    import pandas as pd
    import pyarrow.parquet as pq

    from p_id_text_extraction_ray.pipelines.webfilter import (
        curate_web_pipeline, curate_web_resumable)

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "curate_out")

    def read_all():
        frames = [pq.read_table(p).to_pandas() for p in sorted(
            glob.glob(os.path.join(out, "rows", "part=*", "*.parquet")))]
        df = pd.concat(frames, ignore_index=True)
        return df[sorted(df.columns)].sort_values("doc_id") \
            .reset_index(drop=True)

    s1 = curate_web_resumable(sf, out, num_partitions=8, wave_partitions=3)
    assert s1["skipped"] == 0 and s1["processed"] == 8
    want = curate_web_pipeline(sf).to_pandas()
    want = want[sorted(want.columns)].sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(read_all(), want, check_dtype=False)
    assert s1["rows_out"] == len(want)

    # kill: two manifests gone, one of their data dirs corrupted
    os.remove(os.path.join(out, "manifest", "2.json"))
    os.remove(os.path.join(out, "manifest", "5.json"))
    shutil.rmtree(os.path.join(out, "rows", "part=5"))
    # cached mix counts survive the kill
    with open(os.path.join(out, "mix.json")) as f:
        assert json.load(f)["m"] > 0

    # the expensive chain's checkpoint (stage-1 survivors) must NOT be
    # re-run by the resume: record its files + mtimes
    surv_files = {p: os.path.getmtime(p) for p in glob.glob(
        os.path.join(out, "surv", "rows", "part=*", "*.parquet"))}
    assert surv_files, "stage-1 survivor checkpoint missing"

    s2 = curate_web_resumable(sf, out, num_partitions=8, wave_partitions=3)
    assert s2["skipped"] == 6 and s2["processed"] == 2
    pd.testing.assert_frame_equal(read_all(), want, check_dtype=False)
    assert {p: os.path.getmtime(p) for p in glob.glob(
        os.path.join(out, "surv", "rows", "part=*", "*.parquet"))} \
        == surv_files, "resume re-ran the scoring chain"


def test_curate_web_checkpointed_is_lazy_and_equal(ray_session):
    """The driver-visible wrapper returns a LAZY Dataset over the output
    partitions (never a driver-side concat) with the one-shot rows."""
    import ray

    from p_id_text_extraction_ray.pipelines.webfilter import (
        curate_web_checkpointed, curate_web_pipeline)

    sf = "/root/testdata/sf0.001"
    got = curate_web_checkpointed(sf)
    assert isinstance(got, ray.data.Dataset)
    got = got.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = curate_web_pipeline(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)

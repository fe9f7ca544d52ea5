"""The ``ray job submit`` entrypoint (`python -m p_id_text_extraction_ray.run`)
drives a resumable run end-to-end in its own process and is idempotent on
re-invocation — the operational contract of the north rule's job-submit
path."""

import json
import os
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq


def _run_cli(args: list[str]) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "p_id_text_extraction_ray.run", *args],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_job_runs_and_resumes(tmp_path):
    from p_id_text_extraction_ray.fixtures.generate import generate_fixture
    fp = generate_fixture(str(tmp_path / "fix"), n_docs=10, seed=5)
    out_dir = str(tmp_path / "out")

    args = ["--docs", fp.docs, "--media", fp.media_root, "--out", out_dir,
            "--partitions", "4", "--wave", "2", "--num-cpus", "4",
            "--concurrent-waves", "2"]
    s1 = _run_cli(args)
    assert s1["processed"] == 4 and s1["skipped"] == 0

    # output matches the golden span sequences
    spans = pq.read_table(os.path.join(out_dir, "spans")).to_pandas()
    gold = pq.read_table(fp.golden).to_pandas()
    cols = ["doc_id", "seq", "kind", "text", "media_ref", "offset"]
    norm = lambda d: d[cols].astype({"seq": "int64", "offset": "int64"}) \
        .sort_values(["doc_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(norm(spans), norm(gold))

    # manifest carries per-partition lineage
    mdir = os.path.join(out_dir, "manifest")
    recs = [json.load(open(os.path.join(mdir, f)))
            for f in sorted(os.listdir(mdir)) if f.endswith(".json")]
    assert len(recs) == 4
    assert sum(r["docs_in"] for r in recs) == 10
    assert all(r["input_fingerprint"] for r in recs)

    # second invocation: everything skipped, nothing reprocessed
    s2 = _run_cli(args)
    assert s2["skipped"] == 4 and s2["processed"] == 0

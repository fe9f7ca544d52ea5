"""Audio / video feature queries over the real RIFF codecs.

The sandbox corpus has no audio/video tables, so these queries derive a
deterministic media blob per document row *inside* the pipeline (a seeded
synth keyed on ``doc_id`` — no driver-side materialization, no files) and
run the multimodal actor-pool stages on it end-to-end through the REAL
WAV / AVI decoders (``media/riff.py``):

* ``audio_features``    — per-doc WAV synth -> ``AudioFeatureStage``
  (frame-RMS energy vector + summary stats over decoded PCM).
* ``video_frame_sample``— per-doc uncompressed-DIB AVI synth ->
  ``VideoFrameSampleStage`` (uniform k-frame sampling; only sampled
  frames' bytes are decoded) -> per-frame mean luma.

At 100 TB the synth stage is replaced by a binary column read straight
from the table; everything downstream is unchanged. Rows-only driver
check (binary pipelines, not SQL-expressible); decode exactness is
pytest-carried (``tests/test_riff.py``: round trips + an independent
stdlib-``wave`` cross-check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SR = 8000            # synth sample rate
N_SAMPLES = 2048     # ~0.26 s per doc
FRAME_H, FRAME_W = 24, 32


def _docs(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])


def _synth_pcm(doc_id: int) -> np.ndarray:
    """Deterministic per-doc PCM: two sines whose frequencies and
    amplitude ramp are functions of doc_id only."""
    t = np.arange(N_SAMPLES, dtype=np.float64) / SR
    f1 = 100.0 + (doc_id % 32) * 25.0
    f2 = 300.0 + (doc_id % 7) * 110.0
    env = np.linspace(0.2, 1.0, N_SAMPLES)
    return (0.55 * np.sin(2 * np.pi * f1 * t)
            + 0.25 * np.sin(2 * np.pi * f2 * t)) * env


def _synth_frames(doc_id: int, n: int) -> list[np.ndarray]:
    """Deterministic per-doc frames: a gradient whose phase advances per
    frame, plus a doc-keyed constant block."""
    base = (np.add.outer(np.arange(FRAME_H), np.arange(FRAME_W)) * 3) % 251
    out = []
    for k in range(n):
        f = (base + 17 * k + (doc_id % 89)) % 251
        f[2:6, 2:6] = doc_id % 251
        out.append(f.astype(np.uint8))
    return out


def audio_features(sf_dir: str):
    """(ref, features:list<double>) per document via the real WAV path."""
    from ..media.riff import encode_wav
    from ..stages.multimodal import AudioFeatureStage

    import pyarrow as pa

    def synth(df: pd.DataFrame) -> pa.Table:
        ids = df["doc_id"].to_numpy(np.int64)
        return pa.table({
            "ref": pa.array([f"d{i}" for i in ids], pa.string()),
            "audio": pa.array([encode_wav(_synth_pcm(int(i)), SR)
                               for i in ids], pa.binary())})

    return (_docs(sf_dir)
            .map_batches(synth, batch_format="pandas")
            .map_batches(AudioFeatureStage, batch_format="pyarrow",
                         concurrency=(1, 8), num_cpus=1, batch_size=256)
            .sort("ref"))


def video_frame_sample(sf_dir: str):
    """(ref, frame_index, mean_luma) per sampled frame via the real AVI
    path — k uniformly spaced frames per clip, clip length keyed on
    doc_id."""
    from ..media.riff import encode_avi
    from ..stages.multimodal import VideoFrameSampleStage

    import pyarrow as pa

    def synth(df: pd.DataFrame) -> pa.Table:
        ids = df["doc_id"].to_numpy(np.int64)
        n_frames = (ids % 7 + 2).astype(np.int32)
        return pa.table({
            "ref": pa.array([f"d{i}" for i in ids], pa.string()),
            "video": pa.array([encode_avi(_synth_frames(int(i), int(n)))
                               for i, n in zip(ids, n_frames)], pa.binary()),
            "n_frames": pa.array(n_frames, pa.int32())})

    def luma(batch: pa.Table) -> pa.Table:
        from ..media.codec import decode_image
        vals = [round(float(decode_image(b).mean()), 4)
                for b in batch.column("frame").to_pylist()]
        return pa.table({"ref": batch.column("ref"),
                         "frame_index": batch.column("frame_index"),
                         "mean_luma": pa.array(vals, pa.float64())})

    return (_docs(sf_dir)
            .map_batches(synth, batch_format="pandas")
            .map_batches(VideoFrameSampleStage, batch_format="pyarrow",
                         concurrency=(1, 8), num_cpus=1, batch_size=128)
            .map_batches(luma, batch_format="pyarrow")
            .sort(["ref", "frame_index"]))

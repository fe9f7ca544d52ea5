"""Multimodal media stages: resize / feature-extract / frame-sample.

Media payloads are opaque binary columns addressed by ``media_ref`` with
typed metadata columns; each operation is an actor-pool ``map_batches``
stage (decode state, e.g. codec contexts, lives in ``__init__``). The image
path is fully real on the PIDR raster codec; audio and video decode are
real for the RIFF containers (WAV PCM/float and uncompressed-DIB AVI via
``media/riff.py``) and gated behind an injectable hook (default raises
``NotImplementedError``) for compressed containers, while the Ray-side
plumbing — schemas, batching, actor signature, output layout — is the same
either way and tested on both the real codecs and deterministic fakes.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

from ..media.codec import decode_image, encode_image
from ..media.store import FileMediaStore


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index mapping)."""
    h, w = img.shape
    rows = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return img[rows[:, None], cols[None, :]]


class ImageResizeStage:
    """(media_ref) rows -> (media_ref, width, height, resized:binary).

    Real on the PIDR codec: decode, aspect-preserving resize so the longer
    edge equals ``target``, re-encode. The output blob stays in-row (it can
    be written back to a store by a sink stage)."""

    def __init__(self, media_root: str, target: int = 256):
        self.store = FileMediaStore(media_root)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        widths: list[int] = []
        heights: list[int] = []
        blobs: list[bytes] = []
        for ref in refs:
            img = decode_image(self.store.get(ref))
            h, w = img.shape
            scale = self.target / max(h, w)
            oh, ow = max(1, round(h * scale)), max(1, round(w * scale))
            out = resize_nearest(img, oh, ow)
            widths.append(ow)
            heights.append(oh)
            blobs.append(encode_image(out))
        return pa.table({"media_ref": pa.array(refs, pa.string()),
                         "width": pa.array(widths, pa.int32()),
                         "height": pa.array(heights, pa.int32()),
                         "resized": pa.array(blobs, pa.binary())})


def _default_audio_decoder(blob: bytes) -> np.ndarray:
    """Real for RIFF/WAVE (PCM + IEEE-float, ``media/riff.py``); other
    containers keep the injectable boundary."""
    from ..media.riff import decode_wav, is_wav
    if is_wav(blob):
        return decode_wav(blob)[0]
    raise NotImplementedError(
        "only WAV decodes natively here; inject `decode` (bytes -> "
        "float32 PCM) for other audio containers")


class AudioFeatureStage:
    """(ref, audio:binary) rows -> fixed-size feature vectors.

    Feature math (frame RMS energy over a hop grid, mean/std/max summary)
    is real numpy over PCM samples; the container decode is the injectable
    boundary. Tests inject a fake decoder producing deterministic PCM."""

    N_FRAMES = 16

    def __init__(self, decode: Callable[[bytes], np.ndarray] | None = None):
        self.decode = decode or _default_audio_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("ref").to_pylist()
        feats: list[list[float]] = []
        for blob in batch.column("audio").to_pylist():
            pcm = np.asarray(self.decode(blob), dtype=np.float32)
            if pcm.size == 0:
                feats.append([0.0] * (self.N_FRAMES + 3))
                continue
            frames = np.array_split(pcm, self.N_FRAMES)
            rms = np.array([float(np.sqrt(np.mean(f * f))) if len(f) else 0.0
                            for f in frames])
            feats.append(rms.tolist() +
                         [float(rms.mean()), float(rms.std()), float(rms.max())])
        return pa.table({"ref": pa.array(refs, pa.string()),
                         "features": pa.array(feats, pa.list_(pa.float64()))})


def _default_video_decoder(blob: bytes, frame_indices: list[int]) -> list[np.ndarray]:
    """Real for RIFF/AVI with uncompressed DIB frames (``media/riff.py``,
    only the requested frames' bytes are touched); compressed streams
    keep the injectable boundary."""
    from ..media.riff import decode_avi_frames, is_avi
    if is_avi(blob):
        return decode_avi_frames(blob, frame_indices)
    raise NotImplementedError(
        "only uncompressed-DIB AVI decodes natively here; inject "
        "`decode_frames` for other video containers")


class VideoFrameSampleStage:
    """(ref, video:binary, n_frames:int32) rows -> one row per sampled
    frame (ref, frame_index, frame:binary as PIDR raster).

    Uniform frame sampling: ``k`` evenly spaced indices over the declared
    frame count. Decode is the injectable boundary; the 1->N expansion,
    index math and raster re-encode are real."""

    def __init__(self, k: int = 4,
                 decode_frames: Callable[[bytes, list[int]], list[np.ndarray]] | None = None):
        self.k = k
        self.decode_frames = decode_frames or _default_video_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs_out: list[str] = []
        idx_out: list[int] = []
        frames_out: list[bytes] = []
        for ref, blob, n in zip(batch.column("ref").to_pylist(),
                                batch.column("video").to_pylist(),
                                batch.column("n_frames").to_pylist()):
            if n <= 0:
                continue
            take = min(self.k, n)
            indices = np.unique((np.arange(take) * (n / take)).astype(np.int64)).tolist()
            for i, frame in zip(indices, self.decode_frames(blob, indices)):
                refs_out.append(ref)
                idx_out.append(int(i))
                frames_out.append(encode_image(np.asarray(frame, dtype=np.uint8)))
        return pa.table({"ref": pa.array(refs_out, pa.string()),
                         "frame_index": pa.array(idx_out, pa.int32()),
                         "frame": pa.array(frames_out, pa.binary())})

"""Pure-numpy RIFF container codecs: WAV audio and uncompressed-DIB AVI.

These make the multimodal decode boundary REAL for the two RIFF formats
a codec-less environment can still parse exactly:

* **WAV** — integer PCM (8/16/24/32-bit) and IEEE-float (32/64-bit)
  samples, any channel count (averaged to mono), including
  WAVE_FORMAT_EXTENSIBLE headers. ``decode_wav`` returns float32 mono in
  [-1, 1] plus the sample rate; ``encode_wav`` writes canonical 16-bit
  PCM (or float32) so tests and fixture generators can round-trip.
* **AVI** — the 'vids'/DIB variant: uncompressed 24-bit BGR frames in
  ``00db`` chunks (BI_RGB, bottom-up rows padded to 4 bytes).
  ``decode_avi_frames`` materializes only the requested frame indices
  (a frame-sampling stage never touches the other frames' bytes) and
  collapses BGR to the same BT.601 luma as the image codecs
  (``media/codec.py:142-144``). ``encode_avi`` writes grayscale frames
  as replicated-channel BGR, so a gray round-trip is bit-exact.

Everything here is public container layout (Microsoft RIFF/WAVE/AVI
specs). Compressed streams (MP3/AAC inside WAV, MJPEG/H.264 inside AVI)
raise ``NotImplementedError`` — the stages keep their injectable-decoder
escape hatch for those.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav", "decode_avi_frames", "avi_dims",
           "encode_avi", "is_wav", "is_avi"]


def is_wav(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"


def is_avi(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"AVI "


def _iter_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for a RIFF chunk run;
    payloads are word-aligned (odd sizes pad one byte)."""
    pos = start
    while pos + 8 <= end:
        fcc = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        yield fcc, pos + 8, size
        pos += 8 + size + (size & 1)


# --------------------------------------------------------------- WAV

def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono PCM in [-1, 1], sample_rate)."""
    if not is_wav(blob):
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    data = None
    for fcc, off, size in _iter_chunks(blob, 12, len(blob)):
        if fcc == b"fmt ":
            fmt = blob[off:off + size]
        elif fcc == b"data":
            data = blob[off:off + size]
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag leads SubFormat
        if len(fmt) < 26:
            raise ValueError("truncated extensible fmt chunk")
        tag = struct.unpack_from("<H", fmt, 24)[0]
    if channels < 1:
        raise ValueError("WAV with zero channels")

    def aligned(width: int) -> bytes:
        # a truncated final sample (damaged stream) is dropped, not fatal
        return data[:len(data) - len(data) % width]

    if tag == 1:  # integer PCM
        if bits == 8:
            pcm = (np.frombuffer(data, np.uint8).astype(np.float32)
                   - 128.0) / 128.0
        elif bits == 16:
            pcm = np.frombuffer(aligned(2), "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
            val = (raw[:, 0].astype(np.int32)
                   | (raw[:, 1].astype(np.int32) << 8)
                   | (raw[:, 2].astype(np.int32) << 16))
            val -= (val & 0x800000) << 1  # sign-extend 24 -> 32
            pcm = val.astype(np.float32) / 8388608.0
        elif bits == 32:
            pcm = np.frombuffer(aligned(4), "<i4").astype(np.float32) \
                / 2147483648.0
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
    elif tag == 3:  # IEEE float
        if bits == 32:
            pcm = np.frombuffer(aligned(4), "<f4").astype(np.float32)
        elif bits == 64:
            pcm = np.frombuffer(aligned(8), "<f8").astype(np.float32)
        else:
            raise NotImplementedError(f"{bits}-bit float PCM")
    else:
        raise NotImplementedError(
            f"WAV compression tag 0x{tag:04x} (only PCM/IEEE-float)")

    if channels > 1:
        pcm = pcm[:len(pcm) - len(pcm) % channels]
        pcm = pcm.reshape(-1, channels).mean(axis=1).astype(np.float32)
    return pcm, int(rate)


def encode_wav(pcm: np.ndarray, sample_rate: int = 16000,
               float32: bool = False) -> bytes:
    """Float mono PCM in [-1, 1] -> canonical WAV (16-bit PCM, or IEEE
    float32 when ``float32``)."""
    pcm = np.asarray(pcm, np.float32)
    if float32:
        data = pcm.astype("<f4").tobytes()
        tag, bits = 3, 32
    else:
        data = np.clip(np.rint(pcm * 32767.0),
                       -32768, 32767).astype("<i2").tobytes()
        tag, bits = 1, 16
    block = bits // 8
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------- AVI

def _avi_scan(blob: bytes):
    """Parse headers + index the ``00db`` frame chunks.

    Returns (width, height, bit_count, [(offset, size), ...])."""
    if not is_avi(blob):
        raise ValueError("not a RIFF/AVI stream")
    width = height = bits = None
    compression = None
    frames: list[tuple[int, int]] = []
    for fcc, off, size in _iter_chunks(blob, 12, len(blob)):
        if fcc != b"LIST":
            continue
        ltype = blob[off:off + 4]
        if ltype == b"hdrl":
            for f2, o2, s2 in _iter_chunks(blob, off + 4, off + size):
                if f2 == b"LIST" and blob[o2:o2 + 4] == b"strl":
                    for f3, o3, s3 in _iter_chunks(blob, o2 + 4, o2 + s2):
                        if f3 == b"strf" and s3 >= 40:
                            (_, width, height, _, bits,
                             compression) = struct.unpack_from(
                                "<IiiHHI", blob, o3)
        elif ltype == b"movi":
            for f2, o2, s2 in _iter_chunks(blob, off + 4, off + size):
                if f2 in (b"00db", b"00dc"):
                    if f2 == b"00dc" and compression not in (None, 0):
                        raise NotImplementedError(
                            f"compressed AVI stream (biCompression="
                            f"{compression})")
                    frames.append((o2, s2))
    if width is None:
        raise ValueError("AVI missing stream format header")
    if compression not in (None, 0):
        raise NotImplementedError(
            f"compressed AVI stream (biCompression={compression})")
    if bits != 24:
        raise NotImplementedError(f"{bits}-bit DIB frames (only 24-bit BGR)")
    return int(width), int(height), int(bits), frames


def avi_dims(blob: bytes) -> tuple[int, int, int]:
    """(n_frames, width, height) without decoding any frame pixels."""
    width, height, _, frames = _avi_scan(blob)
    return len(frames), width, abs(height)


def decode_avi_frames(blob: bytes, frame_indices: list[int]) -> list[np.ndarray]:
    """Decode only the requested frames -> list of uint8 grayscale (h, w)
    arrays (BT.601 luma, matching ``media/codec.py``)."""
    width, height, _, frames = _avi_scan(blob)
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    out: list[np.ndarray] = []
    for i in frame_indices:
        if not 0 <= i < len(frames):
            raise IndexError(f"frame {i} of {len(frames)}")
        off, size = frames[i]
        if size < stride * height:
            raise ValueError("truncated AVI frame chunk")
        rows = np.frombuffer(blob, np.uint8, stride * height, off)
        bgr = rows.reshape(height, stride)[:, :width * 3].reshape(
            height, width, 3)
        if not top_down:
            bgr = bgr[::-1]
        f = bgr.astype(np.float64)
        gray = np.rint(f[:, :, 2] * 0.299 + f[:, :, 1] * 0.587
                       + f[:, :, 0] * 0.114).astype(np.uint8)
        out.append(gray)
    return out


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Grayscale uint8 frames (h, w) -> uncompressed 24-bit DIB AVI.

    Gray goes in as replicated-channel BGR; BT.601 of equal channels is
    the identity, so ``decode_avi_frames(encode_avi(fs)) == fs``."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = np.asarray(frames[0]).shape
    stride = (w * 3 + 3) & ~3

    chunks = []
    for fr in frames:
        fr = np.asarray(fr, np.uint8)
        if fr.shape != (h, w):
            raise ValueError("all frames must share one shape")
        row = np.zeros((h, stride), np.uint8)
        bgr = np.repeat(fr[::-1, :, None], 3, axis=2)  # bottom-up BGR
        row[:, :w * 3] = bgr.reshape(h, w * 3)
        data = row.tobytes()
        chunks.append(b"00db" + struct.pack("<I", len(data)) + data
                      + (b"\x00" if len(data) & 1 else b""))
    movi = b"movi" + b"".join(chunks)

    frame_bytes = stride * h
    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,
                       len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames),
                                            frame_bytes, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       frame_bytes, 0, 0, 0, 0)
    strl = (b"strl"
            + b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf)
    hdrl = (b"hdrl"
            + b"avih" + struct.pack("<I", len(avih)) + avih
            + b"LIST" + struct.pack("<I", len(strl)) + strl)
    body = (b"AVI "
            + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
            + b"LIST" + struct.pack("<I", len(movi)) + movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body

"""RIFF codecs (media/riff.py): WAV + uncompressed-DIB AVI, their default
wiring into the multimodal stages, and the audio/video queries e2e."""

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pytest

from p_id_text_extraction_ray.media.riff import (avi_dims, decode_avi_frames,
                                                 decode_wav, encode_avi,
                                                 encode_wav, is_avi, is_wav)


def _pcm(n=4801, seed=7):
    rng = np.random.default_rng(seed)
    return ((rng.random(n) * 2 - 1) * 0.9).astype(np.float32)


def test_wav_roundtrip_16bit():
    pcm = _pcm()
    blob = encode_wav(pcm, 8000)
    assert is_wav(blob) and not is_avi(blob)
    out, rate = decode_wav(blob)
    assert rate == 8000 and len(out) == len(pcm)
    assert np.max(np.abs(out - pcm)) < 1.5 / 32768  # one quantization step


def test_wav_roundtrip_float32_exact():
    pcm = _pcm(333)
    out, rate = decode_wav(encode_wav(pcm, 44100, float32=True))
    assert rate == 44100 and np.array_equal(out, pcm)


def test_wav_stdlib_reads_our_writer():
    pcm = _pcm(1000)
    wv = wave.open(io.BytesIO(encode_wav(pcm, 16000)), "rb")
    assert (wv.getnchannels(), wv.getsampwidth(),
            wv.getframerate(), wv.getnframes()) == (1, 2, 16000, 1000)
    raw = np.frombuffer(wv.readframes(1000), "<i2")
    assert np.array_equal(raw, np.clip(np.rint(pcm * 32767.0),
                                       -32768, 32767).astype(np.int16))


def test_wav_stereo_stdlib_writer_downmixes():
    pcm = _pcm(800)
    buf = io.BytesIO()
    wv = wave.open(buf, "wb")
    wv.setnchannels(2)
    wv.setsampwidth(2)
    wv.setframerate(22050)
    inter = np.stack([(pcm * 32767).astype("<i2"),
                      (-pcm * 32767).astype("<i2")], axis=1)
    wv.writeframes(inter.tobytes())
    wv.close()
    out, rate = decode_wav(buf.getvalue())
    assert rate == 22050 and len(out) == 800
    assert np.max(np.abs(out)) < 1e-4  # L and R cancel


def test_wav_24bit_sign_extension():
    vals = np.array([-8388608, -1, 0, 1, 8388607], np.int32)
    raw = np.zeros((5, 3), np.uint8)
    raw[:, 0] = vals & 0xFF
    raw[:, 1] = (vals >> 8) & 0xFF
    raw[:, 2] = (vals >> 16) & 0xFF
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 15) + raw.tobytes() + b"\x00")
    out, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.allclose(out, vals / 8388608.0)


def test_wav_compressed_tag_raises():
    blob = bytearray(encode_wav(_pcm(64), 8000))
    blob[20:22] = struct.pack("<H", 0x0055)  # MP3 tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(blob))


def test_avi_roundtrip_and_subset_decode():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (31, 47), np.uint8) for _ in range(6)]
    blob = encode_avi(frames, fps=5)
    assert is_avi(blob) and not is_wav(blob)
    assert avi_dims(blob) == (6, 47, 31)
    got = decode_avi_frames(blob, [5, 0, 3])
    for g, want in zip(got, [frames[5], frames[0], frames[3]]):
        assert np.array_equal(g, want)  # gray->BGR->luma is the identity
    with pytest.raises(IndexError):
        decode_avi_frames(blob, [6])


def test_avi_compressed_raises():
    blob = bytearray(encode_avi([np.zeros((8, 8), np.uint8)]))
    i = bytes(blob).index(b"strf") + 8 + 16  # biCompression field
    blob[i:i + 4] = struct.pack("<I", 0x47504A4D)  # 'MJPG'
    with pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(blob), [0])


def test_audio_stage_decodes_real_wav_by_default():
    from p_id_text_extraction_ray.stages.multimodal import AudioFeatureStage
    pcm = _pcm(1600)
    out = AudioFeatureStage()(pa.table({
        "ref": pa.array(["a"]),
        "audio": pa.array([encode_wav(pcm, 16000)], pa.binary())}))
    feats = out.column("features").to_pylist()[0]
    assert len(feats) == AudioFeatureStage.N_FRAMES + 3
    dec, _ = decode_wav(encode_wav(pcm, 16000))
    want_rms0 = float(np.sqrt(np.mean(np.square(
        np.array_split(dec, AudioFeatureStage.N_FRAMES)[0]))))
    assert feats[0] == pytest.approx(want_rms0)
    # non-RIFF blobs still hit the injectable boundary
    with pytest.raises(NotImplementedError):
        AudioFeatureStage()(pa.table({
            "ref": ["x"], "audio": pa.array([b"mp3!"], pa.binary())}))


def test_video_stage_decodes_real_avi_by_default():
    from p_id_text_extraction_ray.media.codec import decode_image
    from p_id_text_extraction_ray.stages.multimodal import VideoFrameSampleStage
    frames = [np.full((9, 12), 40 + 7 * i, np.uint8) for i in range(8)]
    out = VideoFrameSampleStage(k=4)(pa.table({
        "ref": pa.array(["v"]),
        "video": pa.array([encode_avi(frames)], pa.binary()),
        "n_frames": pa.array([8], pa.int32())}))
    assert out.column("frame_index").to_pylist() == [0, 2, 4, 6]
    for row, idx in enumerate([0, 2, 4, 6]):
        got = decode_image(out.column("frame")[row].as_py())
        assert np.array_equal(got, frames[idx])


SF = "/root/testdata/sf0.001"


def test_audio_features_query_e2e(ray_session):
    from p_id_text_extraction_ray.pipelines.audiovideo import (
        SR, _synth_pcm, audio_features)
    from p_id_text_extraction_ray.stages.multimodal import AudioFeatureStage
    df = audio_features(SF).to_pandas()
    assert len(df) == 500 and df["ref"].is_unique
    # spot-check one doc against an independent recomputation
    feats = df.loc[df["ref"] == "d3", "features"].iloc[0]
    dec, _ = decode_wav(encode_wav(_synth_pcm(3), SR))
    rms = [float(np.sqrt(np.mean(np.square(f))))
           for f in np.array_split(dec, AudioFeatureStage.N_FRAMES)]
    assert list(feats)[:16] == pytest.approx(rms)


def test_video_frame_sample_query_e2e(ray_session):
    import pyarrow.parquet as pq
    from p_id_text_extraction_ray.pipelines.audiovideo import (
        _synth_frames, video_frame_sample)
    df = video_frame_sample(SF).to_pandas()
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    want_rows = int(np.minimum(4, ids % 7 + 2).sum())
    assert len(df) == want_rows
    # doc 10: n_frames = 5, sampled indices 0..3 mapped over 5 frames
    sub = df[df["ref"] == "d10"].sort_values("frame_index")
    frames = _synth_frames(10, 5)
    assert sub["mean_luma"].tolist() == [
        round(float(frames[i].mean()), 4)
        for i in sub["frame_index"].tolist()]


def test_wav_truncated_final_sample_dropped():
    pcm = _pcm(100)
    blob = encode_wav(pcm, 8000)
    # chop one byte off the data chunk (and fix the declared size)
    cut = bytearray(blob[:-1])
    cut[4:8] = struct.pack("<I", len(cut) - 8)
    i = bytes(cut).index(b"data") + 4
    cut[i:i + 4] = struct.pack("<I", struct.unpack_from("<I", cut, i)[0] - 1)
    out, _ = decode_wav(bytes(cut))
    assert len(out) == 99
    assert np.max(np.abs(out - pcm[:99])) < 1.5 / 32768

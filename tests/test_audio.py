"""WAV (RIFF PCM) codec + audio_features operator: the audio member
of the multimodal family, decoded natively (stdlib struct + numpy)."""

import struct

import numpy as np
import pytest

from vtshaver_spark.functions.codecs import synth_wave, wav_decode, wav_encode


def test_wav_roundtrip_mono():
    w = synth_wave(7, 16000)
    arr, rate = wav_decode(wav_encode(w, 16000))
    assert rate == 16000 and arr.shape == (16000, 1)
    assert np.array_equal(arr[:, 0], w)


def test_wav_roundtrip_stereo_and_chunk_walk():
    """Extra RIFF chunks (LIST metadata, odd-length with pad byte)
    between fmt and data must be skipped by the chunk walk."""
    w = synth_wave(3, 100)
    st = np.stack([w, (-w).astype(np.int16)], axis=1)
    b = wav_encode(st, 8000)
    hdr_end = 12 + 8 + 16
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = b[:hdr_end] + lst + b[hdr_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    arr, rate = wav_decode(spliced)
    assert rate == 8000 and arr.shape == (100, 2)
    assert np.array_equal(arr, st)


def test_wav_rejects():
    with pytest.raises(ValueError):
        wav_decode(b"RIFF\x00\x00\x00\x00JUNK")
    # non-PCM format tag named in the error
    w = wav_encode(synth_wave(1, 10))
    bad = bytearray(w)
    bad[20] = 3  # fmt tag float=3
    with pytest.raises(NotImplementedError, match="tag"):
        wav_decode(bytes(bad))


def test_generate_audio_bytes_closed_form(spark):
    """The synthetic WAV generator must reproduce the documented
    integer closed-form exactly (that formula is what the driver
    oracle replays in SQL), including hard clipping at scale 4."""
    from vtshaver_spark.operators.multimodal import generate_audio_bytes

    df = spark.createDataFrame(
        [("c1", 300, 8000, 2, 17, 4)],
        "clip_id string, n_samples int, sample_rate int, "
        "n_channels int, seed int, scale int",
    )
    blob = generate_audio_bytes(df).collect()[0]["audio_bytes"]
    arr, rate = wav_decode(bytes(blob))
    assert rate == 8000 and arr.shape == (300, 2)
    t = np.arange(300, dtype=np.int64)
    for c in range(2):
        want = np.clip(
            ((t * 48271 + 17 + c * 1013) % 19997 - 9998) * 4, -32768, 32767
        )
        assert np.array_equal(arr[:, c], want.astype(np.int16))
    # scale 4 pushes past full scale -> clipping present
    assert (np.abs(arr.astype(np.int32)) >= 32767).any()


def test_audio_features_operator(spark):
    from vtshaver_spark.operators.multimodal import audio_features

    rows = []
    for i, n in [(1, 16000), (2, 8000), (3, 4000)]:
        rows.append((f"clip{i}", wav_encode(synth_wave(i, n), 16000)))
    # a clipping clip: constant full-scale
    rows.append(("clipmax", wav_encode(np.full(1000, 32767, np.int16), 16000)))
    df = spark.createDataFrame(rows, "audio_id string, audio_bytes binary")

    got = {r["audio_id"]: r for r in audio_features(df).collect()}
    assert set(got) == {"clip1", "clip2", "clip3", "clipmax"}
    r = got["clip1"]
    w = synth_wave(1, 16000).astype(np.float64)
    assert r["sample_rate"] == 16000 and r["n_channels"] == 1
    assert r["n_samples"] == 16000 and r["duration_s"] == 1.0
    assert abs(r["rms"] - float(np.sqrt(np.mean(w ** 2)))) < 1e-9
    zc = float(np.mean(np.signbit(w[1:]) != np.signbit(w[:-1])))
    assert abs(r["zero_cross_rate"] - zc) < 1e-12
    assert got["clipmax"]["clip_ratio"] == 1.0
    assert got["clip1"]["clip_ratio"] == 0.0
    # bytes column dropped, id preserved
    assert "audio_bytes" not in audio_features(df).columns

"""Malformed-input robustness across every native codec: a pipeline
ingesting web-scale blobs feeds decoders arbitrary garbage, so every
decode must terminate promptly with a clean exception family
(ValueError / NotImplementedError / struct.error / zlib.error /
OverflowError / Index-ish errors from truncation) — never hang, never
return a wrong-shape array silently.

Strategy: take one small valid stream per format, then (a) truncate at
every prefix length, (b) flip bytes at deterministic positions, and
assert each decode either reproduces a valid image contract (correct
dtype/up-to-3-dim shape) or raises from the allowed family within the
per-test alarm budget (conftest arms SIGALRM)."""

import struct
import zlib

import numpy as np
import pytest

from vtshaver_spark.functions.codecs import (
    decode_image,
    png_encode,
    rawi_encode,
    synth_image,
    wav_decode,
    wav_encode,
)
from vtshaver_spark.functions.gif_tiff import gif_encode, tiff_encode
from vtshaver_spark.functions.jpeg import jpeg_encode
from vtshaver_spark.functions.webp import webp_encode

# every exception a decoder may legitimately raise on garbage: the
# explicit validation family plus the unavoidable low-level errors of
# parsing truncated/corrupt buffers with stdlib/numpy primitives
ALLOWED = (
    ValueError,
    NotImplementedError,
    struct.error,
    zlib.error,
    OverflowError,
    IndexError,
    KeyError,
    EOFError,
)


def _streams():
    img = synth_image("fuzz", 16, 12)
    pal = (np.arange(16 * 12) % 5 * 50).astype(np.uint8).reshape(12, 16)
    pal3 = np.stack([pal, pal, pal], axis=2)
    return {
        "rawi": rawi_encode(img),
        "png": png_encode(img),
        "jpeg": jpeg_encode(img, quality=90),
        "gif": gif_encode(pal3),
        "tiff": tiff_encode(img),
        "webp": webp_encode(pal3, palette=True),
        "webp_pred": webp_encode(img, predictor=2, cache_bits=4),
    }


def _check(blob):
    try:
        out = decode_image(blob)
    except ALLOWED:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8
    assert out.ndim == 3 and out.shape[2] == 3


@pytest.mark.parametrize("fmt", sorted(_streams()))
def test_truncation_every_prefix(fmt):
    blob = _streams()[fmt]
    step = max(1, len(blob) // 160)  # ~160 prefixes per format
    for n in range(0, len(blob), step):
        _check(blob[:n])


@pytest.mark.parametrize("fmt", sorted(_streams()))
def test_byte_flips(fmt):
    blob = bytearray(_streams()[fmt])
    rng = np.random.default_rng(hash(fmt) & 0xFFFF)
    positions = rng.integers(0, len(blob), 220)
    xors = rng.integers(1, 256, 220)
    for pos, x in zip(positions, xors):
        mut = bytearray(blob)
        mut[int(pos)] ^= int(x)
        _check(bytes(mut))


def test_wav_truncation_and_flips():
    pcm = (np.sin(np.arange(800) / 10) * 12000).astype(np.int16)
    blob = wav_encode(pcm, sample_rate=8000)
    for n in range(0, len(blob), max(1, len(blob) // 120)):
        try:
            out = wav_decode(blob[:n])
        except ALLOWED:
            continue
        assert isinstance(out[0], np.ndarray)
    rng = np.random.default_rng(99)
    for pos in rng.integers(0, len(blob), 120):
        mut = bytearray(blob)
        mut[int(pos)] ^= 0x55
        try:
            wav_decode(bytes(mut))
        except ALLOWED:
            pass


def test_mvt_truncation_and_flips():
    """Fuzz the real SF fixture tile through tile_to_rows: every
    truncation/flip either decodes to a row list or raises MVTError
    (a ValueError) — the single-exception contract decode_tiles'
    on_error='skip' relies on."""
    from vtshaver_spark.sources.mvt import tile_to_rows

    with open(
        "/root/reference/test/fixtures/tiles/sf_16_10465_25329.vector.pbf",
        "rb",
    ) as f:
        blob = f.read()
    for n in range(0, len(blob), max(1, len(blob) // 120)):
        try:
            rows = tile_to_rows(blob[:n])
        except ALLOWED:
            continue
        assert isinstance(rows, list)
    rng = np.random.default_rng(7)
    for pos in rng.integers(0, len(blob), 200):
        mut = bytearray(blob)
        mut[int(pos)] ^= 0xFF
        try:
            rows = tile_to_rows(bytes(mut))
        except ALLOWED:
            continue
        assert isinstance(rows, list)

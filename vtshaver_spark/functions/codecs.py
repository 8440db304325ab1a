"""Byte-edge codecs: gzip, and a deterministic raw image codec.

The reference touches bytes only at the edges (gzip sniff on input,
optional gzip on output — /root/reference/src/shave.cpp:242-247,
289-295); same discipline here: every codec is an Arrow-batched pandas
UDF applied after all relational pruning.

Image handling: PIL/libjpeg are not available in this container, so
real-format decode is gated behind an import-try and raises
NotImplementedError; the engine's own interchange format ``RAWI`` (a
12-byte header + uint8 RGB payload) is fully implemented so the whole
Spark-side pipeline — schema, batching, decode, resize, PSNR — is real
and tested end-to-end.
"""

from __future__ import annotations

import gzip as _gzip
import struct
import zlib
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

GZIP_MAGIC = b"\x1f\x8b"
RAWI_MAGIC = b"RAWI"

try:  # optional real-format codecs (absent in this container)
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


# ---------------------------------------------------------------------------
# gzip (O9 / O20)
# ---------------------------------------------------------------------------

@pandas_udf(T.BinaryType())
def gzip_udf(data: pd.Series) -> pd.Series:
    return data.map(
        lambda b: None if b is None else _gzip.compress(bytes(b), mtime=0)
    )


@pandas_udf(T.BinaryType())
def gunzip_udf(data: pd.Series) -> pd.Series:
    """Gzip sniff + decompress: non-gzip bytes pass through unchanged
    (the reference's magic-byte check, src/shave.cpp:242-247)."""
    def _un(b):
        if b is None:
            return None
        b = bytes(b)
        return _gzip.decompress(b) if b[:2] == GZIP_MAGIC else b

    return data.map(_un)


def is_gzip(col: Column) -> Column:
    """Column-level gzip sniff (no UDF)."""
    return F.startswith(col, F.lit(GZIP_MAGIC))


# ---------------------------------------------------------------------------
# RAWI image codec (deterministic; stands in for PNG/JPEG in-container)
# ---------------------------------------------------------------------------

def rawi_encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> RAWI bytes."""
    h, w, c = arr.shape
    assert c == 3
    return RAWI_MAGIC + struct.pack("<II", w, h) + arr.astype(np.uint8).tobytes()


def rawi_decode(b: bytes) -> np.ndarray:
    if bytes(b[:4]) != RAWI_MAGIC:
        if HAS_PIL:
            raise NotImplementedError("PIL decode path not wired yet")
        raise NotImplementedError(
            "real image formats need PIL (unavailable); expected RAWI bytes"
        )
    w, h = struct.unpack("<II", bytes(b[4:12]))
    return np.frombuffer(bytes(b[12:]), dtype=np.uint8).reshape(h, w, 3)


def synth_image(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic pixels for an image id (seeded gradient +
    hash-noise; no RNG state)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    grad = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    noise = ((xx * 31 + yy * 17 + seed) % 251).astype(np.uint8)
    return np.stack([base, grad, noise], axis=-1)


def synth_gradient_image(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic gradient+noise pixels from an INTEGER seed — the
    oracle-replayable sibling of :func:`synth_image` (whose crc32 seed
    has no SQL twin). Every channel is integer arithmetic on
    (x, y, seed), so a closed-form SQL expression can reproduce any
    pixel — and hence the average-hash — exactly (the phash_near_dups
    oracle does)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    grad = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    noise = ((xx * 131 + yy * 197 + int(seed)) % 251).astype(np.uint8)
    return np.stack([base, grad, noise], axis=-1)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    return arr[yi][:, xi]

"""Pure stdlib+numpy PNG codec (functions/codecs.py): wire format,
all five scanline filters, the non-RGB color-type decode paths, CRC
verification, and the sniffing router feeding the multimodal
operators — the 'real image formats' capability without PIL."""

import struct
import zlib

import numpy as np
import pytest

from vtshaver_spark.functions.codecs import (
    PNG_MAGIC,
    _png_chunk,
    decode_image,
    png_decode,
    png_encode,
    synth_image,
)


def _chunks(b):
    pos, out = 8, []
    while pos < len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        out.append((b[pos + 4:pos + 8], b[pos + 8:pos + 8 + ln]))
        pos += 12 + ln
    return out


def _make(color, rows, w, h, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + extra
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(ft):
    # encoder forward filters and decoder inverse filters are
    # independent implementations; a roundtrip pins both
    arr = synth_image("png_t", 23, 17)
    out = png_decode(png_encode(arr, filter_type=ft))
    assert np.array_equal(out, arr)


def test_wire_format_filter0_scanlines():
    """Filter-0 IDAT must decompress to exactly the raw scanlines with
    a 0 filter byte each — the RFC 2083 layout, so third-party readers
    can consume our output."""
    arr = synth_image("png_w", 9, 5)
    b = png_encode(arr, filter_type=0)
    idat = b"".join(d for t, d in _chunks(b) if t == b"IDAT")
    want = b"".join(b"\x00" + arr[y].tobytes() for y in range(5))
    assert zlib.decompress(idat) == want
    assert [t for t, _ in _chunks(b)] == [b"IHDR", b"IDAT", b"IEND"]


def test_gray_graya_rgba_palette_decode():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    want_g = np.repeat(g[:, :, None], 3, axis=2)
    assert np.array_equal(png_decode(_make(0, g[:, :, None], 4, 3)), want_g)

    ga = np.dstack([g, np.full((3, 4), 7, np.uint8)])
    assert np.array_equal(png_decode(_make(4, ga, 4, 3)), want_g)

    rgb = synth_image("png_c", 4, 3)
    rgba = np.dstack([rgb, np.full((3, 4), 9, np.uint8)])
    assert np.array_equal(png_decode(_make(6, rgba, 4, 3)), rgb)

    pal = np.arange(30, dtype=np.uint8).reshape(10, 3)
    idx = (np.arange(12, dtype=np.uint8) % 10).reshape(3, 4)
    got = png_decode(
        _make(3, idx[:, :, None], 4, 3, extra=_png_chunk(b"PLTE", pal.tobytes()))
    )
    assert np.array_equal(got, pal[idx])


def test_crc_corruption_detected():
    b = bytearray(png_encode(synth_image("png_crc", 8, 8)))
    b[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(b))


def test_unsupported_variants_named():
    arr = synth_image("png_u", 4, 3)
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 4, 3, 16, 2, 0, 0, 0)
    b = PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_decode(b)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 1)
    b = PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="interlaced"):
        png_decode(b)
    del arr


def test_router_and_spark_pipeline_png(spark):
    """PNG blobs must flow through the SAME multimodal operators as
    RAWI: identical phash (it is computed on decoded pixels), and
    resize_images stays format-preserving (PNG in -> PNG out)."""
    from vtshaver_spark.functions.codecs import rawi_encode
    from vtshaver_spark.operators.multimodal import (
        phash_fingerprints,
        resize_images,
    )

    arrs = {f"i{i}": synth_image(f"i{i}", 24 + i, 18 + i) for i in range(4)}
    rows = [(k, png_encode(a)) for k, a in arrs.items()] + [
        (k + "_rawi", rawi_encode(a)) for k, a in arrs.items()
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")

    fps = {r["image_id"]: r["phash"] for r in phash_fingerprints(df).collect()}
    for k in arrs:
        assert fps[k] == fps[k + "_rawi"], k

    out = {r["image_id"]: bytes(r["bytes"])
           for r in resize_images(df, 8, 8).select("image_id", "bytes").collect()}
    for k in arrs:
        assert out[k][:8] == PNG_MAGIC
        assert out[k + "_rawi"][:4] == b"RAWI"
        assert np.array_equal(decode_image(out[k]), decode_image(out[k + "_rawi"]))
        assert decode_image(out[k]).shape == (8, 8, 3)

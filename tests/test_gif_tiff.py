"""Native GIF/TIFF codecs: LZW round-trips, interlace, transparency,
multi-frame compositing, TIFF byte orders + PackBits, router sniffing,
and honest capability gates (functions/gif_tiff.py)."""

import struct

import numpy as np
import pytest

from vtshaver_spark.functions.codecs import decode_image
from vtshaver_spark.functions.gif_tiff import (
    _INTERLACE_PASSES,
    gif_decode,
    gif_encode,
    gif_frames,
    tiff_decode,
    tiff_encode,
)


def _grad(w, h, colors=13):
    yy, xx = np.mgrid[0:h, 0:w]
    idx = (xx * 7 + yy * 3) % colors
    pal = np.stack(
        [(np.arange(colors) * 19) % 256,
         (np.arange(colors) * 36) % 256,
         (np.arange(colors) * 51) % 256],
        axis=-1,
    ).astype(np.uint8)
    return pal[idx]


def test_gif_roundtrip_shapes_and_palettes():
    for w, h, colors in [(17, 13, 2), (20, 10, 13), (33, 7, 200)]:
        arr = _grad(w, h, colors)
        out = gif_decode(gif_encode(arr))
        assert out.shape == arr.shape and (out == arr).all(), (w, h, colors)


def test_gif_lzw_dictionary_reset():
    # >4096 dictionary entries force a mid-stream CLEAR + re-grow
    arr = _grad(256, 96, 251)
    assert (gif_decode(gif_encode(arr)) == arr).all()


def test_gif_multiframe_compositing():
    a = _grad(16, 12, 5)
    b = a.copy()
    b[2:5, 3:9] = [250, 1, 7]
    frames = gif_frames(gif_encode([a, b]))
    assert len(frames) == 2
    assert (frames[0] == a).all() and (frames[1] == b).all()


def test_gif_interlaced_decode():
    """Set the interlace flag on a stream whose rows were pre-permuted
    into interlace order: decode must undo the 4-pass permutation."""
    arr = _grad(12, 16, 7)
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, arr.shape[0], step))
    b = bytearray(gif_encode(arr[order]))
    desc = b.index(b"\x2c")
    assert b[desc + 9] & 0x40 == 0
    b[desc + 9] |= 0x40  # interlace flag in the image descriptor
    assert (gif_decode(bytes(b)) == arr).all()


def test_gif_transparency_composites_previous_frame():
    a = _grad(10, 8, 4)
    b = a.copy()
    b[0, 0] = [9, 9, 9]
    target = a[3, 3]
    # the DISCRIMINATING pixel: frame 2 paints the transparent color
    # where frame 1 holds a different color — composited output must
    # show frame 1 there, a naive non-transparent decode would not
    assert not (a[5, 4] == target).all()
    b[5, 4] = target
    raw = bytearray(gif_encode([a, b]))
    # frame 2's graphic control: set transparency on that color's
    # palette index so those pixels show frame 1 underneath
    stack = np.concatenate([a.reshape(-1, 3), b.reshape(-1, 3)])
    palette = np.unique(stack, axis=0)
    (tidx,) = np.nonzero((palette == target).all(axis=1))
    gces = []
    i = 0
    while True:
        i = raw.find(b"\x21\xf9\x04", i)
        if i < 0:
            break
        gces.append(i)
        i += 1
    assert len(gces) == 2
    g = gces[1]
    raw[g + 3] |= 0x01          # transparency flag
    raw[g + 6] = int(tidx[0])   # transparent index
    frames = gif_frames(bytes(raw))
    mask = (b == target).all(axis=-1)
    # transparent pixels keep frame 1 (identical here), others update
    assert (frames[1][~mask] == b[~mask]).all()
    assert (frames[1][mask] == a[mask]).all()


def test_gif_too_many_colors_raises():
    rng = np.arange(20 * 20, dtype=np.uint32)
    arr = np.stack([rng % 256, (rng // 256) * 40 % 256, rng % 251], -1)
    arr = arr.astype(np.uint8).reshape(20, 20, 3)
    with pytest.raises(ValueError, match="256 unique colors"):
        gif_encode(arr)


def test_tiff_roundtrip_rgb():
    arr = _grad(23, 11, 50)
    out = tiff_decode(tiff_encode(arr))
    assert out.shape == arr.shape and (out == arr).all()


def _tiff_gray_be(gray: np.ndarray, photo: int = 1) -> bytes:
    """Hand-built BIG-endian single-strip 8-bit grayscale TIFF."""
    h, w = gray.shape
    payload = gray.astype(np.uint8).tobytes()
    n_tags = 8
    data_off = 8 + 2 + n_tags * 12 + 4
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8))

    def tag(t, typ, cnt, val):
        if typ == 3:
            return struct.pack(">HHIHH", t, typ, cnt, val, 0)
        return struct.pack(">HHII", t, typ, cnt, val)

    out += struct.pack(">H", n_tags)
    out += tag(256, 3, 1, w) + tag(257, 3, 1, h) + tag(258, 3, 1, 8)
    out += tag(259, 3, 1, 1) + tag(262, 3, 1, photo)
    out += tag(273, 4, 1, data_off) + tag(278, 3, 1, h)
    out += tag(279, 4, 1, len(payload))
    out += struct.pack(">I", 0) + payload
    return bytes(out)


def test_tiff_big_endian_gray_and_white_is_zero():
    g = (np.arange(6 * 9, dtype=np.uint8) * 4).reshape(6, 9)
    out = tiff_decode(_tiff_gray_be(g, photo=1))
    assert (out == np.repeat(g[..., None], 3, axis=2)).all()
    inv = tiff_decode(_tiff_gray_be(g, photo=0))
    assert (inv == np.repeat((255 - g)[..., None], 3, axis=2)).all()


def test_tiff_packbits_strip():
    """Patch the LE encoder's output to compression=32773 with a
    PackBits-packed strip (runs + literals)."""
    arr = np.zeros((4, 8, 3), np.uint8)
    arr[:2] = [200, 10, 30]
    arr[2:, :, 1] = np.arange(8, dtype=np.uint8) * 9  # literal-ish rows
    raw = arr.tobytes()

    def packbits(data):
        out = bytearray()
        i = 0
        while i < len(data):
            run = 1
            while i + run < len(data) and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 2:
                out += bytes([257 - run, data[i]])
                i += run
            else:
                j = i + 1
                while (
                    j < len(data) and j - i < 128
                    and not (j + 1 < len(data) and data[j] == data[j + 1])
                ):
                    j += 1
                out += bytes([j - i - 1]) + data[i:j]
                i = j
        return bytes(out)

    packed = packbits(raw)
    plain = bytearray(tiff_encode(arr))
    strip_off = plain.index(raw)
    head = bytes(plain[:strip_off]) + packed
    # rewrite Compression (259) value and StripByteCounts (279)
    head = bytearray(head)
    ifd_off = 8
    (n_tags,) = struct.unpack("<H", head[ifd_off:ifd_off + 2])
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        (t,) = struct.unpack("<H", head[off:off + 2])
        if t == 259:
            head[off + 8:off + 10] = struct.pack("<H", 32773)
        if t == 279:
            head[off + 8:off + 12] = struct.pack("<I", len(packed))
    assert (tiff_decode(bytes(head)) == arr).all()


def test_tiff_unsupported_named():
    arr = _grad(8, 8, 4)
    b = bytearray(tiff_encode(arr))
    ifd_off = 8
    (n_tags,) = struct.unpack("<H", b[ifd_off:ifd_off + 2])
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        (t,) = struct.unpack("<H", b[off:off + 2])
        if t == 259:
            b[off + 8:off + 10] = struct.pack("<H", 5)  # LZW: unsupported
    with pytest.raises(NotImplementedError, match="compression 5"):
        tiff_decode(bytes(b))


def test_router_sniffs_gif_and_tiff():
    arr = _grad(14, 9, 8)
    assert (decode_image(gif_encode(arr)) == arr).all()
    assert (decode_image(tiff_encode(arr)) == arr).all()


def test_frame_sample_demuxes_animated_gif(spark):
    """frame_sample now demuxes a REAL container: an animated GIF goes
    through our native LZW decoder, and every sampled frame re-encodes
    as RAWI for the uniform downstream pipeline."""
    from vtshaver_spark.operators.multimodal import frame_sample

    frames = [_grad(12, 10, 5 + i) for i in range(4)]
    gif = gif_encode(frames)
    df = spark.createDataFrame(
        [("g1", bytearray(gif))], "video_id string, video_bytes binary"
    )
    rows = sorted(
        frame_sample(df, every_n=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in rows] == [0, 2]
    for r, want in zip(rows, (frames[0], frames[2])):
        assert (decode_image(bytes(r["bytes"])) == want).all()

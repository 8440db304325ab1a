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


def test_gif_mixed_frame_shapes_rejected():
    # np.split divides the concatenated index stream equally — a
    # mixed-shape list must fail loudly, not scramble frames
    a = _grad(16, 16, 5)
    b = _grad(8, 32, 5)
    with pytest.raises(ValueError, match="frame 1 shape"):
        gif_encode([a, b])


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
            b[off + 8:off + 10] = struct.pack("<H", 7)  # JPEG-in-TIFF
    with pytest.raises(NotImplementedError, match="compression 7"):
        tiff_decode(bytes(b))


# --- hand-built fixtures: LZW / predictor / non-8-bit depths -------------


def _tiff_build(w, h, bps, photo, payload, comp=1, predictor=None,
                spp=1, endian="<", colormap=None):
    """Minimal single-strip TIFF with arbitrary tag values; payload is
    the raw (possibly compressed) strip bytes."""
    e = endian
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (259, 3, 1, comp),
        (262, 3, 1, photo), (277, 3, 1, spp), (278, 3, 1, h),
        (279, 4, 1, len(payload)),
    ]
    if predictor is not None:
        tags.append((317, 3, 1, predictor))
    extra = b""
    n_tags = len(tags) + 1 + (1 if spp > 1 or bps != 8 else 0) \
        + (1 if colormap is not None else 0)
    # recompute layout: header(8) + IFD + next-IFD(4), then out-of-line
    # values, then the strip
    ifd_bytes = 2 + n_tags * 12 + 4
    extra_off = 8 + ifd_bytes
    if spp > 1 or bps != 8:
        if spp > 1:
            bps_val = extra_off
            extra += struct.pack(e + f"{spp}H", *([bps] * spp))
        else:
            bps_val = bps  # count 1 fits inline
        tags.append((258, 3, spp, bps_val if spp > 1 else bps))
    cmap_off = extra_off + len(extra)
    if colormap is not None:
        tags.append((320, 3, len(colormap), cmap_off))
        extra += struct.pack(e + f"{len(colormap)}H", *colormap)
    data_off = extra_off + len(extra)
    tags.append((273, 4, 1, data_off))
    tags.sort()
    out = bytearray((b"II*\x00" if e == "<" else b"MM\x00*"))
    out += struct.pack(e + "I", 8)
    out += struct.pack(e + "H", len(tags))
    for t, typ, cnt, val in tags:
        if typ == 3 and cnt == 1:
            out += struct.pack(e + "HHIHH", t, typ, cnt, val, 0)
        else:
            out += struct.pack(e + "HHII", t, typ, cnt, val)
    out += struct.pack(e + "I", 0) + extra + payload
    return bytes(out)


def _lzw_tiff_encode(data: bytes) -> bytes:
    """Test-side TIFF LZW compressor (MSB-first, 9-bit start, early
    change at 2^width - 1) — independent of the decoder under test."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc, nbits = 0, 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    put(CLEAR, width)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # Aldus/libtiff early change: switch AFTER adding entry
        # 2^W - 1 (one later than the r5 convention, which drifted in
        # lockstep with the decoder's matching off-by-one and was only
        # caught by the libtiff cross-decode fixture — ADVICE r5)
        if next_code == (1 << width):
            if width < 12:
                width += 1
            else:  # table full: clear and restart
                put(CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code, width = 258, 9
        cur = bytes([byte])
    if cur:
        put(table[cur], width)
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_tiff_lzw_decodes_libtiff_fixture():
    """Cross-decode gate (ADVICE r5): tests/data/lzw_libtiff.tif was
    written by the system libtiff.so.6 (LZW, RGB, one strip) over the
    deterministic pattern below, whose dictionary crosses the 9->10
    bit early-change boundary. The r5 decoder failed on it with
    'code 618 beyond table' (its width bump sat one entry early, and
    the in-repo test encoder shared the same shifted convention, so
    roundtrips could not catch the drift). The fixture pins the
    Aldus/libtiff convention independently of our encoder."""
    import os

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx // 8) * 16 + (yy // 8) * 32) % 256
    arr = np.stack(
        [base, (base + 85) % 256, (xx * 3 + yy * 7) % 256], axis=2
    ).astype(np.uint8)
    path = os.path.join(os.path.dirname(__file__), "data", "lzw_libtiff.tif")
    out = tiff_decode(open(path, "rb").read())
    assert out.shape == (h, w, 3)
    assert (out == arr).all()


def test_tiff_lzw_rgb_roundtrip():
    rng = np.random.default_rng(5)
    # runny data (exercises KwKwK + dictionary growth) + noise tail
    arr = np.concatenate(
        [np.repeat(_grad(16, 9, 5), 2, axis=1),
         rng.integers(0, 256, (9, 8, 3)).astype(np.uint8)], axis=1)
    h, w = arr.shape[:2]
    payload = _lzw_tiff_encode(arr.tobytes())
    out = tiff_decode(_tiff_build(w, h, 8, 2, payload, comp=5, spp=3))
    assert (out == arr).all()


def test_tiff_lzw_dictionary_reset():
    # >4094 dictionary entries force a mid-stream CLEAR in the test
    # encoder; the decoder must re-grow from 9 bits
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (40, 200, 3)).astype(np.uint8)
    payload = _lzw_tiff_encode(arr.tobytes())
    out = tiff_decode(_tiff_build(200, 40, 8, 2, payload, comp=5, spp=3))
    assert (out == arr).all()


def test_tiff_lzw_predictor2():
    """LZW + horizontal differencing (the libtiff default pairing):
    forward-difference per row per channel in the test, decoder must
    integrate back."""
    arr = _grad(21, 13, 40)
    h, w = arr.shape[:2]
    diff = arr.astype(np.int32)
    diff[:, 1:] = (diff[:, 1:] - diff[:, :-1]) & 0xFF
    payload = _lzw_tiff_encode(diff.astype(np.uint8).tobytes())
    out = tiff_decode(
        _tiff_build(w, h, 8, 2, payload, comp=5, predictor=2, spp=3))
    assert (out == arr).all()


@pytest.mark.parametrize("bps,scale", [(1, 255), (2, 85), (4, 17)])
def test_tiff_subbyte_gray(bps, scale):
    rng = np.random.default_rng(bps)
    h, w = 7, 13
    sam = rng.integers(0, 1 << bps, (h, w))
    rows = bytearray()
    for y in range(h):
        bits = []
        for v in sam[y]:
            bits += [int(v) >> (bps - 1 - i) & 1 for i in range(bps)]
        while len(bits) % 8:
            bits.append(0)
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i:i + 8]:
                byte = (byte << 1) | bit
            rows.append(byte)
    out = tiff_decode(_tiff_build(w, h, bps, 1, bytes(rows)))
    assert (out[..., 0] == sam * scale).all()
    # white-is-zero bilevel (the fax-scan convention)
    inv = tiff_decode(_tiff_build(w, h, bps, 0, bytes(rows)))
    assert (inv[..., 0] == 255 - sam * scale).all()


def test_tiff_4bit_palette():
    rng = np.random.default_rng(44)
    h, w = 6, 9
    idx = rng.integers(0, 16, (h, w))
    rows = bytearray()
    for y in range(h):
        row = bytearray()
        for x in range(0, w, 2):
            hi = int(idx[y, x]) << 4
            lo = int(idx[y, x + 1]) if x + 1 < w else 0
            row.append(hi | lo)
        rows += row
    cmap16 = rng.integers(0, 65536, 3 * 16)
    out = tiff_decode(
        _tiff_build(w, h, 4, 3, bytes(rows), colormap=[int(v) for v in cmap16]))
    table = (cmap16.reshape(3, 16).T // 257).astype(np.uint8)
    assert (out == table[idx]).all()


@pytest.mark.parametrize("endian", ["<", ">"])
def test_tiff_16bit_rgb_honors_byte_order(endian):
    rng = np.random.default_rng(16)
    h, w = 5, 7
    sam = rng.integers(0, 65536, (h, w, 3))
    payload = sam.astype("<u2" if endian == "<" else ">u2").tobytes()
    out = tiff_decode(
        _tiff_build(w, h, 16, 2, payload, spp=3, endian=endian))
    assert (out == (sam >> 8)).all()


def test_tiff_16bit_predictor2():
    """Differencing happens at native 16-bit width (mod 65536) BEFORE
    the high-byte reduction."""
    rng = np.random.default_rng(61)
    h, w = 5, 11
    sam = rng.integers(0, 65536, (h, w, 3))
    diff = sam.copy()
    diff[:, 1:] = (diff[:, 1:] - diff[:, :-1]) & 0xFFFF
    payload = diff.astype("<u2").tobytes()
    out = tiff_decode(
        _tiff_build(w, h, 16, 2, payload, spp=3, predictor=2))
    assert (out == (sam >> 8)).all()


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

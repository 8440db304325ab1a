"""Baseline JPEG codec (functions/jpeg.py): wire format, 4:4:4 and
4:2:0 roundtrips, restart intervals, unsupported-mode errors, router
integration, and (when PIL is importable) cross-decoder parity with
libjpeg."""

import struct

import numpy as np
import pytest

from vtshaver_spark.functions.codecs import decode_image, psnr, synth_image
from vtshaver_spark.functions.jpeg import jpeg_decode, jpeg_encode

try:
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _smooth(w, h):
    g = np.zeros((h, w, 3), np.uint8)
    g[:, :, 0] = np.linspace(10, 245, w, dtype=np.uint8)[None, :]
    g[:, :, 1] = np.linspace(245, 10, h, dtype=np.uint8)[:, None]
    g[:, :, 2] = 128
    return g


def _markers(b):
    """Walk the marker structure (skipping entropy data)."""
    out, pos = [], 2
    while pos < len(b):
        assert b[pos] == 0xFF
        m = b[pos + 1]
        out.append(m)
        pos += 2
        if m == 0xD9:
            break
        (ln,) = struct.unpack(">H", b[pos:pos + 2])
        pos += ln
        if m == 0xDA:  # skip entropy bytes to next real marker
            while pos < len(b):
                if b[pos] == 0xFF and b[pos + 1] not in (0x00,) and not (
                    0xD0 <= b[pos + 1] <= 0xD7
                ):
                    break
                pos += 1
    return out


@pytest.mark.parametrize("w,h", [(64, 48), (37, 29), (8, 8), (17, 3)])
def test_roundtrip_444_dims(w, h):
    arr = _smooth(w, h)
    out = jpeg_decode(jpeg_encode(arr, quality=95))
    assert out.shape == arr.shape
    assert psnr(arr, out) > 35.0


def test_roundtrip_420_and_restart():
    arr = _smooth(50, 42)  # non-multiple-of-16 -> padded MCU grid
    for ri in (0, 2):
        out = jpeg_decode(jpeg_encode(arr, 95, "420", restart_interval=ri))
        assert out.shape == arr.shape
        assert psnr(arr, out) > 33.0
    # restart markers actually present in the entropy stream
    import re

    b = jpeg_encode(arr, 95, "420", restart_interval=2)
    assert re.search(b"\xff[\xd0-\xd7]", b)
    assert 0xDD in _markers(b)  # DRI


def test_wire_structure_and_determinism():
    arr = synth_image("jw", 24, 16)
    b = jpeg_encode(arr, quality=85)
    ms = _markers(b)
    assert ms[0] == 0xE0 and ms[-1] == 0xD9  # JFIF APP0 ... EOI
    assert ms.count(0xDB) == 2 and ms.count(0xC4) == 4
    assert 0xC0 in ms and 0xDA in ms
    assert jpeg_encode(arr, quality=85) == b
    # quality lowers size
    assert len(jpeg_encode(arr, 30)) < len(jpeg_encode(arr, 90))


def test_quality_extremes_and_flat():
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(flat, 95)), flat)
    noisy = synth_image("jq", 32, 32)
    assert psnr(noisy, jpeg_decode(jpeg_encode(noisy, 100))) > \
        psnr(noisy, jpeg_decode(jpeg_encode(noisy, 10)))


def test_unsupported_modes_named():
    arr = _smooth(16, 16)
    b = bytearray(jpeg_encode(arr))
    # rewrite SOF0 -> SOF9 (arithmetic sequential — genuinely out of
    # scope; SOF2 progressive is decodable as of r5)
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF9"):
        jpeg_decode(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x11junk")
    # a baseline-shaped SOS grafted onto a progressive frame is
    # malformed per T.81 G.1 and must be named, not garbled
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        jpeg_decode(bytes(b))


def test_grayscale_single_component():
    """1-component scan: build a gray JPEG by editing a 3-component
    stream's headers down to luma only and re-encoding the scan."""
    from vtshaver_spark.functions.jpeg import (
        _BitWriter,
        _build_codes,
        _quality_scale,
        _quantize_component,
        _encode_one_block,
        AC_LUMA_BITS, AC_LUMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS,
        QUANT_LUMA, ZIGZAG,
    )

    h = w = 16
    gray = np.linspace(40, 200, h * w).reshape(h, w)
    qy = _quality_scale(QUANT_LUMA, 95)
    blocks = _quantize_component(gray.astype(np.float64), qy)
    out = bytearray(b"\xff\xd8")
    zz = qy.reshape(64)[ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + zz.tobytes()
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    wtr = _BitWriter()
    dc = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    pred = 0
    for by in range(blocks.shape[0]):
        for bx in range(blocks.shape[1]):
            pred = _encode_one_block(wtr, blocks[by, bx], pred, dc, ac)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"

    rgb = jpeg_decode(bytes(out))
    assert rgb.shape == (h, w, 3)
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])
    want = np.clip(gray.round(), 0, 255)
    assert np.abs(rgb[:, :, 0].astype(float) - want).mean() < 3.0


def test_router_sniffs_jpeg():
    arr = _smooth(32, 24)
    out = decode_image(jpeg_encode(arr, 95))
    assert out.shape == arr.shape and psnr(arr, out) > 35.0


def test_optimal_huffman_deep_tree_symbols_survive():
    """A skewed geometric histogram drives raw Huffman depths past 16;
    the K.3 BITS adjustment shortens the COUNTS, but HUFFVAL must still
    enumerate symbols by pre-adjustment depth up to 32 (libjpeg
    jpeg_gen_optimal_table) — truncating at 16 drops symbols and emits
    sum(BITS) > len(HUFFVAL), an undecodable DHT."""
    from vtshaver_spark.functions.jpeg import _optimal_huffman

    bits, vals = _optimal_huffman({i: 2 ** i for i in range(22)})
    assert sum(bits) == len(vals) == 22
    assert sorted(vals) == list(range(22))
    # random histograms: counts/symbols stay consistent, depth <= 16
    import numpy as np

    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(1, 200))
        freq = {int(s): int(f) for s, f in zip(
            rng.choice(256, n, replace=False), rng.integers(1, 1 << 20, n))}
        bits, vals = _optimal_huffman(freq)
        assert sum(bits) == len(vals) == len(freq)
        assert sorted(vals) == sorted(freq)


def _three_scan_sequential(arr, quality, subsampling):
    """Spec-valid T.81 A.2.2 sequential file: same headers as the
    interleaved encoder, but THREE Ns=1 scans, each walking its
    component's actual (non-MCU-padded) block grid in raster order."""
    import struct

    from vtshaver_spark.functions import jpeg as J

    base = J.jpeg_encode(arr, quality, subsampling=subsampling)
    head = base[: base.index(b"\xff\xda")]
    h, w = arr.shape[:2]
    comp_q, _qy, _qc, hs, vs = J._quantize_image(arr, quality, subsampling)
    dc_y = J._build_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_y = J._build_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    dc_c = J._build_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
    ac_c = J._build_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)
    tabs = [(dc_y, ac_y, 0x00), (dc_c, ac_c, 0x11), (dc_c, ac_c, 0x11)]
    dims = [(h, w), (-(-h // vs), -(-w // hs)), (-(-h // vs), -(-w // hs))]
    out = bytearray(head)
    for ci in range(3):
        dcc, acc, tdta = tabs[ci]
        out += b"\xff\xda" + struct.pack(">H", 8)
        out += bytes([1, ci + 1, tdta, 0, 63, 0])
        ch, cw = dims[ci]
        bh_act, bw_act = -(-ch // 8), -(-cw // 8)
        wr = J._BitWriter()
        pred = 0
        for by in range(bh_act):
            for bx in range(bw_act):
                pred = J._encode_one_block(
                    wr, comp_q[ci][by, bx], pred, dcc, acc)
        wr.flush()
        out += wr.out
    out += b"\xff\xd9"
    return base, bytes(out)


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_non_interleaved_sequential_scans(subsampling):
    """Ns=1 baseline scans are NON-interleaved: data units traverse the
    component's own ceil(dim/8) grid (no MCU padding — discriminating
    at 4:2:0 with an odd luma block count, where the old MCU walk
    desyncs), and a file splitting components across scans must
    accumulate all three, not keep only the last."""
    arr = _smooth(24, 24)  # 3 luma blocks/side: odd, not MCU-padded 4
    base, split = _three_scan_sequential(arr, 90, subsampling)
    assert np.array_equal(jpeg_decode(split), jpeg_decode(base))


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
    fill bytes — cameras legally pad with them."""
    arr = _smooth(32, 24)
    enc = jpeg_encode(arr, 90)
    i = enc.index(b"\xff\xc0")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    assert np.array_equal(jpeg_decode(padded), jpeg_decode(enc))


def test_bitwriter_drains_accumulator():
    """The writer must drop drained bits: keeping the whole bit history
    in acc re-shifts it on every write, turning encode quadratic in
    output size (measured 9.4 s for a 256px square)."""
    from vtshaver_spark.functions.jpeg import _BitWriter

    wr = _BitWriter()
    for i in range(10000):
        wr.write(i & 0x3F, 7)
    assert wr.acc.bit_length() <= 8


def test_resize_preserves_jpeg(spark):
    from vtshaver_spark.operators.multimodal import resize_images

    arr = _smooth(32, 24)
    df = spark.createDataFrame(
        [("a", jpeg_encode(arr, 95))], "image_id string, bytes binary"
    )
    out = bytes(resize_images(df, 12, 10).collect()[0]["bytes"])
    assert out[:2] == b"\xff\xd8"
    assert jpeg_decode(out).shape == (10, 12, 3)


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed")
def test_pil_cross_decoder_parity():
    """Our encoder's bytes must decode in libjpeg (PIL) to nearly the
    same pixels our decoder produces, and vice versa — wire-level
    interop evidence, not just self-consistency."""
    import io

    from PIL import Image

    arr = _smooth(48, 40)
    b = jpeg_encode(arr, quality=95)
    theirs = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    ours = jpeg_decode(b)
    assert psnr(theirs, ours) > 35.0

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95,
                              subsampling=0)
    assert psnr(arr, jpeg_decode(buf.getvalue())) > 33.0


def test_psnr_40db_invariant_fixture_corpus():
    """BASELINE.json per-row invariant: lossy round-trips must hold
    PSNR >= 40 dB. Pin it at the pipeline's default re-encode quality
    over the synthetic fixture corpus (the content the driver queries
    actually flow), across sizes and both subsampling modes at 4:4:4
    default."""
    for image_id in ("img-00000", "img-00417", "img-09999"):
        for w, h in ((64, 48), (40, 56)):
            arr = synth_image(image_id, w, h)
            out = jpeg_decode(jpeg_encode(arr, quality=98))
            assert psnr(arr, out) >= 40.0, (image_id, w, h)


def test_resize_images_default_quality_meets_gate(spark):
    """End-to-end through Spark: a JPEG that transits the
    resize_images transcode branch at the DEFAULT quality must stay
    >= 40 dB vs its pre-transcode pixels (identity-size resize so only
    the codec contributes error), verified row-wise by the
    verify_roundtrip_psnr operator the BASELINE invariant names."""
    from vtshaver_spark.operators.multimodal import (
        resize_images,
        verify_roundtrip_psnr,
    )

    rows = []
    pixels = {}
    for image_id in ("img-00001", "img-00002", "img-00003"):
        arr = synth_image(image_id, 48, 32)
        pixels[image_id] = arr
        rows.append((image_id, jpeg_encode(arr, quality=100)))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = resize_images(df, 48, 32).withColumnRenamed("bytes", "bytes2")
    joined = df.join(out, "image_id")
    checked = verify_roundtrip_psnr(joined).select("image_id", "psnr_db").collect()
    assert len(checked) == 3
    for r in checked:
        assert r["psnr_db"] >= 40.0, (r["image_id"], r["psnr_db"])
    # and the re-encoded bytes really decode to >= 40 dB vs the
    # ORIGINAL synth pixels too (q100 source + q98 transit)
    for r in out.collect():
        p = psnr(pixels[r["image_id"]], jpeg_decode(bytes(r["bytes2"])))
        assert p >= 40.0, (r["image_id"], p)


def test_roundtrip_422_and_restart():
    """4:2:2 encode (r5): horizontal-only chroma subsampling round-
    trips through our own 4:2:2-capable decoder at high fidelity, with
    and without restart intervals; non-multiple-of-16 width exercises
    the 16x8 MCU padding."""
    arr = _smooth(50, 42)
    for ri in (0, 3):
        b = jpeg_encode(arr, 95, "422", restart_interval=ri)
        out = jpeg_decode(b)
        assert out.shape == arr.shape
        assert psnr(arr, out) > 33.0
    b = jpeg_encode(arr, 95, "422", restart_interval=3)
    import re

    assert re.search(b"\xff[\xd0-\xd7]", b)
    assert 0xDD in _markers(b)
    # SOF0 declares 2x1 luma sampling
    sof = b[b.index(b"\xff\xc0") + 4:]
    assert sof[6] == 1 and sof[7] == 0x21  # component 1, h=2 v=1


def test_422_beats_420_chroma_fidelity():
    """4:2:2 keeps vertical chroma resolution: on an image with
    horizontal chroma stripes it must beat 4:2:0 and trail 4:4:4."""
    h, w = 48, 48
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[..., 0] = 128
    arr[::2, :, 1] = 240  # alternating-row green stripes (chroma detail)
    arr[1::2, :, 2] = 240
    scores = {
        s: psnr(arr, jpeg_decode(jpeg_encode(arr, 95, s)))
        for s in ("444", "422", "420")
    }
    assert scores["444"] >= scores["422"] > scores["420"]


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed")
def test_pil_cross_decodes_422_and_dri():
    """Wire-level interop for the r5 encoder breadth: libjpeg (PIL)
    must decode our 4:2:2 bytes AND our DRI/RSTn stream to nearly the
    pixels our decoder produces."""
    import io

    from PIL import Image

    arr = _smooth(52, 36)
    for kwargs in ({"subsampling": "422"},
                   {"subsampling": "420", "restart_interval": 2},
                   {"subsampling": "422", "restart_interval": 3}):
        b = jpeg_encode(arr, 95, **kwargs)
        theirs = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
        assert psnr(theirs, jpeg_decode(b)) > 35.0, kwargs
        assert psnr(arr, theirs) > 33.0, kwargs


# ---------------------------------------------------------------------------
# Progressive (SOF2) — r5
# ---------------------------------------------------------------------------

def _prog():
    from vtshaver_spark.functions.jpeg import jpeg_encode_progressive
    return jpeg_encode_progressive


@pytest.mark.parametrize("sub", ["444", "420", "422"])
@pytest.mark.parametrize("w,h", [(32, 32), (37, 21), (8, 8)])
def test_progressive_equals_baseline_pixels(sub, w, h):
    """The decisive cross-path invariant: both encoders quantize
    through the same front end, so the progressive stream (10-scan
    spectral selection + successive approximation, per-scan optimal
    Huffman) must decode to BIT-IDENTICAL pixels as the baseline
    stream — two entirely different entropy layouts converging on the
    same coefficient store. Odd sizes exercise the non-interleaved
    actual-block grid (smaller than the MCU-padded grid)."""
    enc = _prog()
    for q in (50, 85, 98):
        arr = synth_image(f"prog_{sub}_{w}x{h}_{q}", w, h)
        base = jpeg_decode(jpeg_encode(arr, q, subsampling=sub))
        prog = jpeg_decode(enc(arr, q, subsampling=sub))
        assert np.array_equal(base, prog), (sub, w, h, q)


def test_progressive_edge_content():
    """Flat (long EOBn runs across blocks), impulse (ZRL paths), and
    noise (dense AC refinement correction bits) all round-trip to the
    baseline decode exactly."""
    enc = _prog()
    rng = np.random.default_rng(7)
    flat = np.full((48, 80, 3), 137, np.uint8)
    sparse = np.zeros((40, 40, 3), np.uint8)
    sparse[20, 20] = [255, 0, 255]
    noise = rng.integers(0, 256, (53, 41, 3)).astype(np.uint8)
    for arr in (flat, sparse, noise):
        for sub in ("444", "420"):
            base = jpeg_decode(jpeg_encode(arr, 85, subsampling=sub))
            prog = jpeg_decode(enc(arr, 85, subsampling=sub))
            assert np.array_equal(base, prog)


def test_progressive_wire_structure():
    """SOF2 frame, ten SOS scans, deterministic bytes, and smaller
    output than baseline (optimal tables + EOB run coding)."""
    enc = _prog()
    arr = synth_image("prog_wire", 48, 32)
    b = enc(arr, 85)
    assert b == enc(arr, 85)  # deterministic
    ms = _markers(b)
    assert ms[0] == 0xE0 and 0xC2 in ms and ms[-1] == 0xD9
    assert ms.count(0xDA) == 10  # the standard 10-scan script
    assert 0xC0 not in ms and 0xC4 in ms
    assert len(b) < len(jpeg_encode(arr, 85))


def test_progressive_router():
    out = decode_image(_prog()(synth_image("prog_router", 24, 18), 95))
    assert out.shape == (18, 24, 3) and out.dtype == np.uint8


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed")
def test_pil_cross_decodes_progressive():
    """libjpeg accepts and pixel-agrees with our progressive stream,
    and our decoder accepts libjpeg's own progressive output."""
    import io

    from PIL import Image

    arr = synth_image("prog_pil", 40, 40)
    ours = _prog()(arr, 90)
    theirs = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert psnr(jpeg_decode(ours), theirs) > 45.0

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90,
                              progressive=True)
    libjpeg_prog = buf.getvalue()
    assert psnr(arr, jpeg_decode(libjpeg_prog)) > 30.0

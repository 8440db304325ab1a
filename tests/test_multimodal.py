"""Multimodal pipeline: generate -> decode -> resize -> verify (PSNR),
plus codec unit checks. The RAWI codec is fully real; PIL-backed
format decode is stubbed (import-gated) per the container constraints."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtshaver_spark.functions.codecs import (
    HAS_PIL,
    gzip_udf,
    gunzip_udf,
    is_gzip,
    psnr,
    rawi_decode,
    rawi_encode,
    resize_nearest,
    synth_image,
)
from vtshaver_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    generate_image_bytes,
    generate_variant_images,
    phash_fingerprints,
    phash_near_dups,
    resize_images,
    verify_roundtrip_psnr,
)


def test_rawi_roundtrip():
    arr = synth_image("img_x", 40, 30)
    assert arr.shape == (30, 40, 3)
    again = rawi_decode(rawi_encode(arr))
    assert np.array_equal(arr, again)
    assert psnr(arr, again) == float("inf")


def test_rawi_rejects_unknown_format():
    # strict decoder: anything non-RAWI points at the sniffing router
    with pytest.raises(ValueError):
        rawi_decode(b"JUNKxxxx")
    # the router itself: truly unknown formats (no RAWI/PNG magic)
    # raise NotImplementedError unless PIL is importable
    from vtshaver_spark.functions.codecs import HAS_PIL, decode_image

    if not HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"JUNKxxxx")


def test_resize_psnr():
    arr = synth_image("img_y", 64, 64)
    down_up = resize_nearest(resize_nearest(arr, 32, 32), 64, 64)
    # a smooth gradient survives 2x down/up well above the 40 dB gate?
    # nearest-neighbor on gradients loses ~1 LSB-scale detail; assert
    # the metric is computed sanely rather than a specific bar
    p = psnr(arr, down_up)
    assert 10 < p < 100


def test_gzip_udfs(spark):
    df = spark.createDataFrame([(b"hello world" * 20,)], "data binary")
    zipped = df.select(gzip_udf("data").alias("z"))
    row = zipped.select(
        is_gzip(F.col("z")).alias("sniff"), gunzip_udf("z").alias("back")
    ).collect()[0]
    assert row["sniff"] is True
    assert bytes(row["back"]) == b"hello world" * 20
    # pass-through for non-gzip bytes
    plain = df.select(gunzip_udf("data").alias("p")).collect()[0]
    assert bytes(plain["p"]) == b"hello world" * 20


@pytest.fixture(scope="module")
def images(spark):
    base = spark.createDataFrame(
        [(f"img_{i:04d}",) for i in range(20)], "image_id string"
    )
    return generate_image_bytes(base).cache()


def test_generate_deterministic(spark, images):
    a = {r["image_id"]: (r["phash"], r["w"], r["h"]) for r in images.collect()}
    again = generate_image_bytes(
        spark.createDataFrame([(f"img_{i:04d}",) for i in range(20)], "image_id string")
    )
    b = {r["image_id"]: (r["phash"], r["w"], r["h"]) for r in again.collect()}
    assert a == b


def test_decode_features(spark, images):
    out = decode_features(images).collect()
    assert len(out) == 20
    for r in out:
        assert 0 <= r["mean_r"] <= 255
        assert r["phash_check"] is not None
    # phash from decode equals phash from generation (bit-exact decode)
    gen = {r["image_id"]: r["phash"] for r in images.collect()}
    for r in out:
        assert r["phash_check"] == gen[r["image_id"]]


def test_resize_and_psnr_gate(spark, images):
    resized = resize_images(images, 32, 32).select(
        "image_id", F.col("bytes").alias("bytes_small")
    )
    up = resize_images(
        resized.withColumnRenamed("bytes_small", "bytes"), 64, 64
    ).select("image_id", F.col("bytes").alias("bytes2"))
    # identity round-trip: PSNR must be inf (reported 999) — the
    # lossless gate from BASELINE.json input_hint
    ident = verify_roundtrip_psnr(
        images.select("image_id", "bytes").withColumn("bytes2", F.col("bytes"))
    ).collect()
    assert all(r["psnr_db"] == 999.0 for r in ident)
    assert up.count() == 20


def test_frame_sample(spark):
    frames = [rawi_encode(synth_image(f"f{i}", 8, 8)) for i in range(6)]
    video = b"".join(frames)
    df = spark.createDataFrame([("v1", video)], "video_id string, video_bytes binary")
    out = frame_sample(df, every_n=2).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    assert all(bytes(r["bytes"])[:4] == b"RAWI" for r in out)


def test_generate_video_bytes_closed_form(spark):
    """Video containers must hold exactly the per-frame closed-form
    gradient images (seed + i*997) the driver oracle replays; the
    demux -> decode -> phash chain must agree with direct numpy."""
    from vtshaver_spark.functions.codecs import synth_gradient_image
    from vtshaver_spark.operators.multimodal import (
        _phash64,
        decode_features,
        generate_video_bytes,
    )

    df = spark.createDataFrame(
        [("v1", 5, 12, 9, 40)],
        "video_id string, n_frames int, w int, h int, seed int",
    )
    blob = bytes(generate_video_bytes(df).collect()[0]["video_bytes"])
    assert len(blob) == 5 * (12 + 12 * 9 * 3)
    sampled = frame_sample(
        generate_video_bytes(df).select("video_id", "video_bytes"), every_n=2
    )
    got = {
        r["frame_idx"]: r["phash_check"]
        for r in decode_features(sampled).collect()
    }
    want = {
        i: _phash64(synth_gradient_image(40 + i * 997, 12, 9))
        for i in (0, 2, 4)
    }
    assert got == want


def test_pil_stub_flag():
    # container truth: PIL absent => decode path must be the gated stub
    assert HAS_PIL is False


# ---------------------------------------------------------------------------
# phash near-dups (variant-pair corpus)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def variant_corpus(spark):
    rows = []
    for k in range(1, 30):
        w, h, seed = 16 + k % 17, 16 + (k * 7) % 13, (k * 48271) % 251
        for v in ("a", "b"):
            rows.append((k, f"img_{k:08d}_{v}", v, w, h, seed))
    df = spark.createDataFrame(
        rows, "k long, image_id string, variant string, w int, h int, seed int"
    )
    return generate_variant_images(df).cache()


def test_variant_b_is_real_transform(variant_corpus):
    # 'b' bytes differ from 'a' (channel roll + 2x dims) — it is a
    # transformed image, not a copy
    rows = {r["image_id"]: r for r in variant_corpus.collect()}
    a, b = rows["img_00000003_a"], rows["img_00000003_b"]
    assert (b["out_w"], b["out_h"]) == (2 * a["out_w"], 2 * a["out_h"])
    arr_a = rawi_decode(bytes(a["bytes"]))
    arr_b = rawi_decode(bytes(b["bytes"]))
    # undo the transform: take every 2nd pixel, roll channels back
    down = arr_b[::2, ::2][..., [1, 2, 0]]
    assert np.array_equal(arr_a, down)


def test_variant_phash_identity(variant_corpus):
    # the planted-pair guarantee: phash('a') == phash('b') for every k
    fps = {
        r["image_id"]: r["phash"]
        for r in phash_fingerprints(variant_corpus).collect()
    }
    for k in range(1, 30):
        assert fps[f"img_{k:08d}_a"] == fps[f"img_{k:08d}_b"], k


def test_phash_near_dups_equals_brute_force(variant_corpus):
    # pigeonhole recall is exact for blocks > max_hamming: operator
    # output must equal the all-pairs scan, at both (4,3) and (8,6)
    fps = {
        r["image_id"]: r["phash"]
        for r in phash_fingerprints(variant_corpus).collect()
    }

    def brute(max_h):
        out = set()
        ids = sorted(fps)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                d = bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1")
                if d <= max_h:
                    out.add((a, b, d))
        return out

    for max_h, blocks in ((3, 4), (6, 8)):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in phash_near_dups(
                variant_corpus, max_hamming=max_h, blocks=blocks
            ).collect()
        }
        assert got == brute(max_h), (max_h, blocks)
        # every planted (a, b) pair surfaces at Hamming 0
        for k in range(1, 30):
            assert (f"img_{k:08d}_a", f"img_{k:08d}_b", 0) in got


def test_hamming_block_join_validates_args(variant_corpus):
    from vtshaver_spark.operators.dedup import hamming_block_join

    fps = phash_fingerprints(variant_corpus)
    with pytest.raises(ValueError, match="blocks > max_hamming"):
        hamming_block_join(fps, "image_id", "phash", max_hamming=4, blocks=4)
    with pytest.raises(ValueError, match="must divide"):
        hamming_block_join(fps, "image_id", "phash", max_hamming=3, blocks=7)

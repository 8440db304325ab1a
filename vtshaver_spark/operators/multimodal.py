"""Multimodal (image/audio/video-as-binary) pipeline operators.

Opaque ``binary`` columns + typed metadata, processed with
``mapInPandas`` kernels (Arrow batches, vectorized numpy inside — no
per-row Python objects beyond the unavoidable bytes). PNG decodes
natively (functions/codecs.py — pure stdlib zlib + numpy, no PIL);
lossy formats (JPEG/audio/video containers) are stubbed behind
import-tries. The engine's RAWI interchange format keeps the full
pipeline executable and testable at zero codec cost:

    generate -> decode -> feature-extract -> resize -> re-encode -> verify (PSNR)

Scale notes: kernels are placed AFTER all relational pruning (decode-
last discipline, mirroring the reference's layer-prune-before-feature-
decode — /root/reference/src/shave.cpp:260-276); batch size is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch so executor memory is
bytes-per-image x batch, independent of partition row count.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vtshaver_spark.functions.codecs import (
    PNG_MAGIC,
    decode_image,
    png_encode,
    psnr,
    rawi_decode,
    rawi_encode,
    resize_nearest,
    synth_gradient_image,
    synth_image,
)


def generate_image_bytes(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Materialize deterministic RAWI bytes + dims for each row
    (synthetic corpus bootstrap; real pipelines read bytes from the
    lake). Adds: bytes, w, h, fmt, phash."""
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            blobs, ws, hs, phs = [], [], [], []
            for iid in pdf[id_col].astype(str):
                w = 32 + (int.from_bytes(iid.encode()[-4:], "big") % 97)
                h = 32 + (int.from_bytes(iid.encode()[-4:], "little") % 73)
                arr = synth_image(iid, w, h)
                blobs.append(rawi_encode(arr))
                ws.append(w)
                hs.append(h)
                phs.append(_phash64(arr))
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            pdf["w"] = np.array(ws, dtype=np.int32)
            pdf["h"] = np.array(hs, dtype=np.int32)
            pdf["fmt"] = "rawi"
            pdf["phash"] = np.array(phs, dtype=np.int64)
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def _phash64(arr: np.ndarray) -> int:
    """Average-hash perceptual fingerprint: downsample luma to 8x8,
    threshold at the mean (sign-folded into int64)."""
    luma = arr.astype(np.float64).mean(axis=2)
    small = resize_nearest(luma[..., None].astype(np.uint8), 8, 8)[..., 0]
    bits = (small.astype(np.float64) >= small.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def generate_variant_images(
    df: DataFrame,
    variant_col: str = "variant",
    seed_col: str = "seed",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Materialize RAWI bytes for a variant-pair image corpus: variant
    ``'a'`` is the seeded gradient image at (w, h); variant ``'b'`` is
    a genuinely TRANSFORMED derivative — a channel-rolled 2x
    nearest-neighbor upscale of ``a`` — not a formula re-evaluation.

    ``b`` is provably phash-identical to ``a``: luma (the channel
    mean) is invariant under channel permutation, and the 8x8
    average-hash sample grid of an exact-2x nearest upscale lands on
    the same source pixels (floor identity: for integer ``i,h``,
    ``(i*2h//8)//2 == i*h//8``), so each corpus row plants one
    guaranteed Hamming-0 duplicate pair for the near-dup join to find.

    Adds: bytes (RAWI), out_w, out_h, fmt.
    """
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes", T.BinaryType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            blobs, ows, ohs = [], [], []
            for seed, w, h, variant in zip(
                pdf[seed_col], pdf[w_col], pdf[h_col], pdf[variant_col]
            ):
                arr = synth_gradient_image(int(seed), int(w), int(h))
                if variant == "b":
                    arr = resize_nearest(arr, 2 * int(w), 2 * int(h))
                    arr = arr[..., [2, 0, 1]]
                blobs.append(rawi_encode(arr))
                ohs.append(arr.shape[0])
                ows.append(arr.shape[1])
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            pdf["out_w"] = np.array(ows, dtype=np.int32)
            pdf["out_h"] = np.array(ohs, dtype=np.int32)
            pdf["fmt"] = "rawi"
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def phash_fingerprints(
    df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Decode each image and emit its 64-bit average-hash: (id, phash).

    Projection happens BEFORE the kernel so only (id, bytes) cross the
    Arrow boundary; executor memory per task is bytes-per-image x
    arrow batch size, independent of partition row count."""
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("phash", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": np.array(
                        [_phash64(decode_image(b)) for b in pdf[bytes_col]],
                        dtype=np.int64,
                    ),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(kernel, schema=schema)


def phash_near_dups(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    max_hamming: int = 3,
    blocks: int = 4,
    max_bucket_size: int | None = 100_000,
    capped_sink: list | None = None,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance:
    decode -> 64-bit average-hash (Arrow kernel) -> exact pigeonhole
    block join (operators/dedup.py hamming_block_join — the same core
    the simhash text path uses, recall-exact for blocks > max_hamming).

    100 TB shape: one map-only decode+hash pass over pruned (id, bytes)
    columns, then candidate generation by equi-join on 64/blocks-bit
    chunk values — never an all-pairs product. Output:
    (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    from vtshaver_spark.operators.dedup import hamming_block_join

    fps = phash_fingerprints(df, id_col=id_col, bytes_col=bytes_col)
    return hamming_block_join(
        fps,
        id_col=id_col,
        fp_col="phash",
        max_hamming=max_hamming,
        blocks=blocks,
        n_bits=64,
        max_bucket_size=max_bucket_size,
        capped_sink=capped_sink,
    )


def decode_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Decode + feature-extract: mean RGB, luma stats, phash — the
    typed-metadata extraction stage."""
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != bytes_col]
        + [
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("luma_std", T.DoubleType()),
            T.StructField("phash_check", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            stats = {k: [] for k in ("mean_r", "mean_g", "mean_b", "luma_std", "phash_check")}
            for blob in pdf[bytes_col]:
                arr = decode_image(blob)
                means = arr.reshape(-1, 3).mean(axis=0)
                stats["mean_r"].append(float(means[0]))
                stats["mean_g"].append(float(means[1]))
                stats["mean_b"].append(float(means[2]))
                stats["luma_std"].append(float(arr.astype(np.float64).mean(axis=2).std()))
                stats["phash_check"].append(_phash64(arr))
            out = pdf.drop(columns=[bytes_col]).copy()
            for k, v in stats.items():
                out[k] = v
            yield out

    return df.mapInPandas(kernel, schema=schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    bytes_col: str = "bytes",
    jpeg_quality: int = 98,
) -> DataFrame:
    """Nearest-neighbor resize, bytes -> bytes (keeps schema, updates
    w/h).

    ``jpeg_quality`` controls the lossy re-encode on the
    JPEG-preserving branch. The default (98) is the lowest Annex-K
    quality at which a decode->re-encode round-trip of the synthetic
    fixture corpus stays above the BASELINE.json per-row invariant of
    PSNR >= 40 dB (measured: q=98 -> 44.5 dB, q=95 -> 36.8 dB on
    synth_image; tests/test_jpeg.py pins the gate). Lower it only for
    pipelines that do not need the reference-parity invariant."""
    schema = df.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.copy()
            def _resized(b):
                # format-preserving: PNG in -> PNG out, JPEG in ->
                # JPEG out, WebP-lossless in -> WebP-lossless out,
                # else RAWI
                arr = resize_nearest(decode_image(b), out_w, out_h)
                if bytes(b[:8]) == PNG_MAGIC:
                    return png_encode(arr)
                if bytes(b[:2]) == b"\xff\xd8":
                    from vtshaver_spark.functions.jpeg import jpeg_encode

                    return jpeg_encode(arr, quality=jpeg_quality)
                if bytes(b[:4]) == b"RIFF" and bytes(b[8:12]) == b"WEBP" \
                        and bytes(b[12:16]) == b"VP8L":
                    from vtshaver_spark.functions.webp import webp_encode

                    return webp_encode(arr)
                return rawi_encode(arr)

            pdf[bytes_col] = [_resized(b) for b in pdf[bytes_col]]
            if "w" in pdf.columns:
                pdf["w"] = np.int32(out_w)
            if "h" in pdf.columns:
                pdf["h"] = np.int32(out_h)
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 2,
    video_col: str = "video_bytes",
    id_col: str = "video_id",
) -> DataFrame:
    """Video frame sampling: emit every n-th frame as its own row.

    Two container formats demux NATIVELY (r5): RAWI concatenations
    (the deterministic test interchange) and animated GIF — a real
    multi-frame wire format, decoded end-to-end by our own LZW/
    compositing decoder (functions/gif_tiff.gif_frames); sampled GIF
    frames are re-encoded as RAWI so every downstream stage (phash,
    decode_features) sees one uniform frame format. Codec-bearing
    containers (mp4/webm) would need libav — they raise through
    decode_image's capability gate; the batching/explode shape is
    identical either way."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("bytes", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vtshaver_spark.functions.gif_tiff import GIF_MAGICS, gif_frames

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for vid, blob in zip(pdf[id_col], pdf[video_col]):
                blob = bytes(blob)
                if blob[:6] in GIF_MAGICS:
                    for i, arr in enumerate(gif_frames(blob)):
                        if i % every_n == 0:
                            ids.append(vid)
                            idxs.append(i)
                            frames.append(rawi_encode(arr))
                    continue
                off = 0
                i = 0
                while off < len(blob):
                    import struct as _s

                    w, h = _s.unpack("<II", blob[off + 4 : off + 12])
                    size = 12 + w * h * 3
                    if i % every_n == 0:
                        ids.append(vid)
                        idxs.append(i)
                        frames.append(blob[off : off + size])
                    off += size
                    i += 1
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "frame_idx": np.array(idxs, dtype=np.int32), "bytes": frames}
                )

    return df.mapInPandas(kernel, schema=schema)


def generate_video_bytes(df: DataFrame) -> DataFrame:
    """Materialize a deterministic RAWI-concatenation "video" per row
    (the container shape frame_sample demuxes). Expects columns
    ``video_id, n_frames, w, h, seed``; adds ``video_bytes``. Frame
    ``i`` is ``synth_gradient_image(seed + i*997, w, h)`` — integer
    closed-form pixels, so a SQL oracle can replay any frame's
    average-hash exactly (the video_frame_phash driver query does)."""
    schema = T.StructType(
        df.schema.fields + [T.StructField("video_bytes", T.BinaryType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            blobs = []
            for _, r in pdf.iterrows():
                blobs.append(b"".join(
                    rawi_encode(synth_gradient_image(
                        int(r["seed"]) + i * 997, int(r["w"]), int(r["h"])
                    ))
                    for i in range(int(r["n_frames"]))
                ))
            pdf = pdf.copy()
            pdf["video_bytes"] = blobs
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def generate_audio_bytes(df: DataFrame) -> DataFrame:
    """Materialize deterministic WAV bytes for each clip row
    (synthetic corpus bootstrap; real pipelines read blobs from the
    lake). Expects columns ``clip_id, n_samples, sample_rate,
    n_channels, seed, scale`` and adds ``audio_bytes``.

    The waveform is pure integer arithmetic so an SQL oracle can
    replay every sample exactly (no trig, no RNG):

        raw[t, c]  = ((t*48271 + seed + c*1013) % 19997) - 9998
        pcm[t, c]  = clip(raw * scale, -32768, 32767)

    ``scale`` >= 4 drives peaks past full scale, exercising the
    clip-ratio path."""
    schema = T.StructType(
        df.schema.fields + [T.StructField("audio_bytes", T.BinaryType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vtshaver_spark.functions.codecs import wav_encode

        for pdf in batches:
            if pdf.empty:
                continue
            blobs = []
            for _, r in pdf.iterrows():
                n, ch = int(r["n_samples"]), int(r["n_channels"])
                t = np.arange(n, dtype=np.int64)
                chans = [
                    (t * 48271 + int(r["seed"]) + c * 1013) % 19997 - 9998
                    for c in range(ch)
                ]
                pcm = np.clip(
                    np.stack(chans, axis=1) * int(r["scale"]), -32768, 32767
                ).astype(np.int16)
                blobs.append(wav_encode(pcm, int(r["sample_rate"])))
            pdf = pdf.copy()
            pdf["audio_bytes"] = blobs
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def audio_features(
    df: DataFrame, bytes_col: str = "audio_bytes"
) -> DataFrame:
    """Decode WAV blobs (native RIFF/PCM codec — no third-party libs)
    and emit typed audio metadata: sample rate, channels, duration,
    RMS level, zero-crossing rate, clipping ratio. The audio member of
    the decode-last multimodal family: runs AFTER relational pruning,
    Arrow-batched, executor memory bounded by bytes-per-clip x batch."""
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != bytes_col]
        + [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_cross_rate", T.DoubleType()),
            T.StructField("clip_ratio", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vtshaver_spark.functions.codecs import wav_decode

        for pdf in batches:
            if pdf.empty:
                continue
            cols = {k: [] for k in (
                "sample_rate", "n_channels", "n_samples", "duration_s",
                "rms", "zero_cross_rate", "clip_ratio",
            )}
            for blob in pdf[bytes_col]:
                arr, rate = wav_decode(blob)
                mono = arr.astype(np.float64).mean(axis=1)
                n = len(mono)
                cols["sample_rate"].append(rate)
                cols["n_channels"].append(arr.shape[1])
                cols["n_samples"].append(n)
                cols["duration_s"].append(n / rate)
                cols["rms"].append(float(np.sqrt(np.mean(mono ** 2))) if n else 0.0)
                cols["zero_cross_rate"].append(
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1 else 0.0
                )
                # int32 first: np.abs(int16(-32768)) overflows back to
                # -32768 and a hard-clipped negative peak would be missed
                cols["clip_ratio"].append(
                    float(np.mean(np.abs(arr.astype(np.int32)) >= 32767))
                    if n else 0.0
                )
            out = pdf.drop(columns=[bytes_col]).copy()
            for k, v in cols.items():
                out[k] = v
            yield out

    return df.mapInPandas(kernel, schema=schema)


def verify_roundtrip_psnr(
    df: DataFrame, original_col: str = "bytes", decoded_col: str = "bytes2"
) -> DataFrame:
    """Per-row decoded-pixel PSNR between two byte columns (the
    BASELINE.json invariant: PSNR >= 40 dB for lossy round-trips;
    lossless paths give inf, reported as 999.0)."""
    schema = T.StructType(
        df.schema.fields + [T.StructField("psnr_db", T.DoubleType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vals = []
            for a, b in zip(pdf[original_col], pdf[decoded_col]):
                p = psnr(decode_image(a), decode_image(b))
                vals.append(999.0 if p == float("inf") else p)
            pdf = pdf.copy()
            pdf["psnr_db"] = vals
            yield pdf

    return df.mapInPandas(kernel, schema=schema)

"""Bloom-filter anti-join: dedup an unbounded corpus against a bounded
reference set, exactly.

The canonical crawl-hygiene shape: "drop every new document whose
content key already appears in a reference set" (a blocklist, an eval
benchmark, yesterday's crawl index). A plain anti-join shuffles the
FULL new corpus on the key — at 100 TB that is the job. The Bloom
plan keeps the big side map-only:

  1. BUILD (distributed, pure JVM): each reference key sets
     ``num_hashes`` bits; bit positions become (chunk, bit-word) rows
     and ONE ``bit_or`` aggregation keyed on the 64-bit-word index
     produces the bitmap — at most m/64 rows shuffle, never the
     reference rows themselves. The bitmap collects to the driver
     (m/8 bytes; 2^27 bits = 16 MB) and ships via
     plans/broadcast.ship_arrays (torrent broadcast above 4 MB).
  2. PROBE (map-only): the big side's two hash values are computed
     JVM-side with the SAME Column expression the build used —
     double hashing h_j = h1 + j*h2 (Kirsch-Mitzenmacher), so the
     Arrow kernel never hashes anything; it only gathers bitmap words
     (vectorized numpy, allocation-light). Bloom-negative rows are
     DEFINITELY new: they bypass any join entirely.
  3. VERIFY (exact): only bloom-positive rows — |true matches| +
     fpp * N, a sliver of the corpus — enter a real anti-join against
     the reference keys. The final result is therefore EXACT; the
     Bloom filter is pruning, not semantics (same contract as Spark's
     own InjectRuntimeFilter, applied cross-DataFrame).

Signed-64 parity note: bit positions are ``(h1 + j*h2) & (m-1)`` with
m a power of two. JVM long arithmetic and numpy int64 both wrap
two's-complement and both define ``& (m-1)`` on negatives identically,
so build (JVM) and probe (numpy) agree bit-for-bit without any
unsigned-conversion dance.

Reference scope note: vtshaver has no corpus operators; this is part
of the training-data graft surface (SURVEY.md §2 graft block), same
family as operators/dedup.py and operators/contamination.py.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Hash halves are folded to 31 bits so h1 + j*h2 stays far inside
# signed-64 range for any j <= 16 — Spark 4 runs ANSI mode, where a
# long overflow is an error, not a wrap (same discipline as
# operators/dedup.py's multiply-shift family).
_FOLD31 = (1 << 31) - 1


def _bloom_hashes(key: Column) -> tuple[Column, Column]:
    """The shared build/probe hash pair: h1 = xxhash64(key) folded to
    31 bits, h2 likewise from an independent seed and forced odd (an
    odd stride has full period modulo a power-of-two m)."""
    h1 = F.xxhash64(key).bitwiseAND(F.lit(_FOLD31))
    h2 = (
        F.xxhash64(key, F.lit(1))
        .bitwiseAND(F.lit(_FOLD31))
        .bitwiseOR(F.lit(1))
    )
    return h1, h2


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for ``n_items`` at target
    ``fpp``; num_bits rounded UP to a power of two (so the position
    modulus is a bitmask and JVM/numpy parity is trivial — see module
    docstring), num_hashes re-derived for the rounded size."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    n = max(1, n_items)
    m_opt = -n * math.log(fpp) / (math.log(2) ** 2)
    # cap at 2^30 bits (128 MB bitmap): positions are derived from
    # 31-bit hash halves, which are uniform only up to that modulus;
    # past ~10^8 reference items, raise fpp or pre-partition the
    # reference instead of growing one filter
    num_bits = 1 << min(30, max(6, math.ceil(math.log2(m_opt))))
    num_hashes = max(1, round(num_bits / n * math.log(2)))
    return num_bits, min(num_hashes, 16)


def build_bloom(
    ref: DataFrame, key: Column, num_bits: int, num_hashes: int
) -> np.ndarray:
    """Distributed Bloom build over the reference keys.

    Returns the bitmap as an int64 numpy array of num_bits/64 words.
    The shuffle carries at most num_bits/64 rows (the set word
    positions), independent of the reference row count.
    """
    if num_bits & (num_bits - 1) or num_bits < 64:
        raise ValueError(f"num_bits must be a power of two >= 64, got {num_bits}")
    mask = num_bits - 1
    h1, h2 = _bloom_hashes(key)
    rows = (
        ref.select(h1.alias("_h1"), h2.alias("_h2"))
        .select(
            F.explode(
                F.array(*[
                    (F.col("_h1") + F.lit(j) * F.col("_h2"))
                    .bitwiseAND(F.lit(mask))
                    for j in range(num_hashes)
                ])
            ).alias("_pos")
        )
        .select(
            F.shiftright("_pos", 6).alias("_chunk"),
            # F.shiftleft takes a Python-int shift amount; a per-row
            # shift needs the SQL form
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos & 63 AS INT))"
            ).alias("_word"),
        )
        .groupBy("_chunk")
        .agg(F.bit_or("_word").alias("_word"))
        .collect()
    )
    bitmap = np.zeros(num_bits >> 6, dtype=np.int64)
    for r in rows:
        bitmap[r["_chunk"]] = r["_word"]
    return bitmap


def bloom_anti_join(
    big: DataFrame,
    ref: DataFrame,
    key_expr,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """Rows of ``big`` whose key appears in no ``ref`` row — exact
    anti-join semantics, Bloom-pruned execution.

    ``key_expr`` is a function DataFrame-columns -> Column applied to
    both sides (e.g. ``lambda: F.md5("text")``); it must reference
    columns present in both frames. ``expected_items`` sizes the
    filter without an extra count() action (defaults to ref.count()).
    """
    # expected_items is a SIZING HINT only: non-positive values (a
    # plausible "unknown size" sentinel) must not disable dedup, so
    # they fall back to counting the reference. Only an actually-empty
    # reference short-circuits — that is exact anti-join semantics.
    n = expected_items if expected_items is not None and expected_items > 0 else ref.count()
    if n == 0:
        return big
    num_bits, num_hashes = bloom_params(n, fpp)
    bitmap = build_bloom(ref, key_expr(), num_bits, num_hashes)

    from vtshaver_spark.plans.broadcast import ship_arrays

    get_bm = ship_arrays(big.sparkSession, bitmap)
    mask = num_bits - 1

    h1, h2 = _bloom_hashes(key_expr())
    flagged_in = big.withColumn("_bk", key_expr()).withColumn(
        "_h1", h1
    ).withColumn("_h2", h2)

    out_schema = T.StructType(
        flagged_in.schema.fields[:-2] + [T.StructField("_maybe", T.BooleanType())]
    )

    def kernel(batches):
        import pyarrow as pa

        (bm,) = get_bm()
        for rb in batches:
            if rb.num_rows == 0:
                continue
            v1 = rb.column("_h1").to_numpy(zero_copy_only=False)
            v2 = rb.column("_h2").to_numpy(zero_copy_only=False)
            ok = np.ones(len(v1), dtype=bool)
            pos = np.empty(len(v1), dtype=np.int64)
            for j in range(num_hashes):
                # same signed wraparound + mask as the JVM build side
                np.multiply(v2, j, out=pos)
                np.add(pos, v1, out=pos)
                np.bitwise_and(pos, mask, out=pos)
                bits = (bm[pos >> 6] >> (pos & 63)) & 1
                ok &= bits.astype(bool)
                if not ok.any():
                    break
            keep = [
                rb.column(i)
                for i, nm in enumerate(rb.schema.names)
                if nm not in ("_h1", "_h2")
            ]
            names = [nm for nm in rb.schema.names if nm not in ("_h1", "_h2")]
            keep.append(pa.array(ok))
            names.append("_maybe")
            yield pa.RecordBatch.from_arrays(keep, names=names)

    flagged = flagged_in.mapInArrow(kernel, schema=out_schema)
    # bloom-negative rows are definitely new: no join at all
    clean = flagged.filter(~F.col("_maybe")).drop("_bk", "_maybe")
    # bloom-positive rows (true matches + fpp*N) verify exactly
    ref_keys = ref.select(key_expr().alias("_bk")).distinct()
    suspects = (
        flagged.filter(F.col("_maybe"))
        .join(ref_keys, on="_bk", how="left_anti")
        .drop("_bk", "_maybe")
    )
    return clean.unionByName(suspects)

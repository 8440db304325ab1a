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
  2. PROBE (map-only, pure JVM codegen — r6): the bitmap words ride
     as DATA in a one-row broadcast LocalRelation cross-joined onto
     the big side; each of the ``num_hashes`` probes is an
     ``element_at`` gather + shift with the SAME double-hashing
     expressions the build used — h_j = h1 + j*h2
     (Kirsch-Mitzenmacher). No Python boundary anywhere: the r5 numpy
     probe kernel shipped every big-side column (document text
     included) through the Python worker and back, and its
     clean/suspects union ran the scan+probe twice.
  3. VERIFY (exact): ONE LeftAnti hash join with the compound
     condition (_maybe AND key-equal) — bloom-negative rows match
     nothing and pass through; only bloom-positive rows
     (|true matches| + fpp * N, a sliver of the corpus) are verified
     on the extracted equi-key, with _maybe as the residual
     condition. The final result is therefore EXACT; the Bloom filter
     is pruning, not semantics (same contract as Spark's own
     InjectRuntimeFilter, applied cross-DataFrame).

Signed-64 parity note: bit positions are ``(h1 + j*h2) & (m-1)`` with
m a power of two — build and probe now share the literal Column
expressions, and numpy consumers of ``build_bloom`` stay bit-exact
because int64 wraps two's-complement with the same ``& (m-1)``
semantics as JVM longs.

Reference scope note: vtshaver has no corpus operators; this is part
of the training-data graft surface (SURVEY.md §2 graft block), same
family as operators/dedup.py and operators/contamination.py.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    broadcast_ref_keys: int = 5_000_000,
) -> DataFrame:
    """Rows of ``big`` whose key appears in no ``ref`` row — exact
    anti-join semantics, Bloom-pruned execution.

    ``key_expr`` is a function DataFrame-columns -> Column applied to
    both sides (e.g. ``lambda: F.md5("text")``); it must reference
    columns present in both frames. ``expected_items`` sizes the
    filter without an extra count() action (defaults to ref.count()).
    ``broadcast_ref_keys`` picks the verify-join shape: up to that
    many reference keys the verify is ONE broadcast LeftAnti over the
    whole probed stream; above it the reference is too big to
    broadcast and a planner-chosen join on the full big side would
    shuffle the corpus, so the verify reverts to the sliver shape —
    bloom-negative rows bypass the join entirely and only the
    fpp-sized positive stream joins (at the cost of running the
    map-only scan+probe twice).
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
    mask = num_bits - 1

    # r6 rewrite — the probe runs entirely JVM-side in whole-stage
    # codegen. The previous numpy probe kernel was correct but shipped
    # EVERY big-side column (document text included) through the Python
    # worker and back (Arrow transport dominated the probe cost), and
    # the clean/suspects filter+union referenced the kernel output from
    # both branches, re-running the whole scan+probe twice. Now:
    #   PROBE: the bitmap words ride as DATA in a one-row broadcast
    #     LocalRelation (never as an expression literal — plans stay
    #     small at any filter size) cross-joined onto the big side;
    #     each of the num_hashes probes is an element_at gather + shift
    #     — no Python boundary anywhere on the big side.
    #   VERIFY: ONE LeftAnti BroadcastHashJoin with the compound
    #     condition (_maybe AND key-equal): bloom-negative rows match
    #     nothing and pass through without probing the hash relation;
    #     bloom-positive rows (true matches + fpp*N) are verified
    #     exactly on the extracted _bk equi-key with _maybe as the
    #     residual condition. Result rows are IDENTICAL for any filter
    #     contents — the bloom is pruning, not semantics.
    spark = big.sparkSession
    # one-row Arrow table: shipping via .tolist() would materialize the
    # filter as a Python int list (~0.5 GB of PyObject overhead at the
    # 2^30-bit cap) before pickling; the Arrow path wraps the numpy
    # words without per-element conversion
    import pyarrow as pa

    bm_df = spark.createDataFrame(
        pa.table({"_bm": pa.array([bitmap], type=pa.list_(pa.int64()))})
    )

    def probe(j: int) -> str:
        pos = f"((_h1 + {j} * _h2) & {mask})"
        return (
            f"((element_at(_bm, CAST(shiftright({pos}, 6) AS INT) + 1) "
            f">> CAST(({pos} & 63) AS INT)) & 1) = 1"
        )

    h1, h2 = _bloom_hashes(key_expr())
    flagged = (
        big.withColumn("_bk", key_expr())
        .withColumn("_h1", h1)
        .withColumn("_h2", h2)
        .crossJoin(F.broadcast(bm_df))
        .withColumn(
            "_maybe", F.expr(" AND ".join(probe(j) for j in range(num_hashes)))
        )
        .drop("_bm", "_h1", "_h2")
    )
    ref_keys = ref.select(key_expr().alias("_rk")).distinct()
    if n <= broadcast_ref_keys:
        # single pass: the hint pins BroadcastHashJoin — without it a
        # size misestimate could plan a SortMergeJoin that shuffles
        # the ENTIRE probed corpus on _bk (the trap this operator
        # exists to avoid); bloom-negative rows probe the broadcast
        # relation once and pass through
        return (
            flagged.join(
                F.broadcast(ref_keys),
                on=F.col("_maybe") & (F.col("_bk") == F.col("_rk")),
                how="left_anti",
            )
            .drop("_bk", "_maybe")
        )
    # non-broadcastable reference: keep the corpus out of the shuffle —
    # negatives bypass the join, only the fpp-sized positive sliver
    # joins (second scan+probe pass is map-only)
    clean = flagged.filter(~F.col("_maybe")).drop("_bk", "_maybe")
    suspects = (
        flagged.filter(F.col("_maybe"))
        .join(ref_keys.withColumnRenamed("_rk", "_bk"), on="_bk", how="left_anti")
        .drop("_bk", "_maybe")
    )
    return clean.unionByName(suspects)

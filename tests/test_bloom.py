"""Bloom-filter anti-join (operators/bloom.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vtshaver_spark.operators.bloom import (
    bloom_anti_join,
    bloom_params,
    build_bloom,
    _bloom_hashes,
)


def test_bloom_params_shape():
    m, k = bloom_params(10_000, fpp=0.01)
    assert m & (m - 1) == 0 and m >= 64
    # ~9.6 bits/item optimal at 1% -> rounded up to a power of two
    assert 10_000 * 9 <= m <= 10_000 * 32
    assert 1 <= k <= 16
    with pytest.raises(ValueError):
        bloom_params(10, fpp=0.0)
    # cap: never past 2^30 bits
    assert bloom_params(10**12, fpp=0.001)[0] == 1 << 30


def test_build_bloom_no_false_negatives(spark):
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)], "k string"
    )
    m, kh = 1 << 12, 4
    bm = build_bloom(df, F.col("k"), m, kh)
    assert bm.shape == (m >> 6,) and bm.dtype == np.int64
    # membership check replayed through the same JVM hash pair: every
    # inserted key must hit all kh bits
    h = df.select(*[
        c.alias(n) for c, n in zip(_bloom_hashes(F.col("k")), ("h1", "h2"))
    ]).collect()
    mask = m - 1
    for r in h:
        for j in range(kh):
            pos = (r["h1"] + j * r["h2"]) & mask
            assert (int(bm[pos >> 6]) >> (pos & 63)) & 1 == 1


def test_bloom_anti_join_exact_under_forced_collisions(spark):
    # a deliberately tiny filter (64 bits for 200 ref keys) saturates:
    # nearly every probe is bloom-positive, so correctness rests
    # entirely on the exact verify join — the property under test
    ref = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(200)], "doc_id long, text string"
    )
    big = spark.createDataFrame(
        [(1000 + i, f"text-{i}") for i in range(150)]      # dups of ref
        + [(2000 + i, f"fresh-{i}") for i in range(100)],  # new content
        "doc_id long, text string",
    )
    out = bloom_anti_join(
        big, ref, lambda: F.md5(F.col("text")), expected_items=4, fpp=0.5
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == sorted(2000 + i for i in range(100))
    assert out.columns == ["doc_id", "text"]


def test_bloom_anti_join_zero_hint_still_dedups(spark):
    """expected_items=0 (a plausible 'unknown size' sentinel) is a
    sizing hint, not a switch: with a NON-empty reference it must fall
    back to counting and still remove duplicates — returning ``big``
    unchanged here would silently skip dedup."""
    ref = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(20)], "doc_id long, text string"
    )
    big = spark.createDataFrame(
        [(100 + i, f"text-{i}") for i in range(10)]
        + [(200 + i, f"fresh-{i}") for i in range(5)],
        "doc_id long, text string",
    )
    for hint in (0, -1):
        out = bloom_anti_join(
            big, ref, lambda: F.md5(F.col("text")), expected_items=hint
        )
        assert sorted(r["doc_id"] for r in out.collect()) == [
            200 + i for i in range(5)
        ]
    # an actually-empty reference is the only short-circuit
    empty_ref = spark.createDataFrame([], "doc_id long, text string")
    out = bloom_anti_join(big, empty_ref, lambda: F.md5(F.col("text")))
    assert out.count() == big.count()


def test_bloom_anti_join_normal_sizing_matches_plain_anti(spark):
    ref = spark.createDataFrame(
        [(i, f"doc {i} body") for i in range(0, 300, 3)],
        "doc_id long, text string",
    )
    big = spark.createDataFrame(
        [(10_000 + i, f"doc {i} body") for i in range(300)],
        "doc_id long, text string",
    )
    key = lambda: F.md5(F.col("text"))
    got = sorted(
        r["doc_id"] for r in bloom_anti_join(big, ref, key, fpp=0.01).collect()
    )
    expected = sorted(
        r["doc_id"]
        for r in big.withColumn("_k", key())
        .join(ref.select(key().alias("_k")).distinct(), "_k", "left_anti")
        .collect()
    )
    assert got == expected
    assert len(got) == 200  # i % 3 != 0 rows survive
    # the big-reference sliver shape (negatives bypass the verify
    # join; only bloom-positives join) must return the identical set
    sliver = sorted(
        r["doc_id"]
        for r in bloom_anti_join(
            big, ref, key, fpp=0.01, broadcast_ref_keys=0
        ).collect()
    )
    assert sliver == expected


def test_bloom_anti_join_empty_reference(spark):
    ref = spark.createDataFrame([], "doc_id long, text string")
    big = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = bloom_anti_join(big, ref, lambda: F.md5(F.col("text")))
    assert out.count() == 2

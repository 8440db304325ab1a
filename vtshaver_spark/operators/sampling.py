"""Deterministic stratified sampling for training-data mixing.

Data-mixture curation needs per-group sampling that is (a) exactly
reproducible across runs and engines (no RNG state, no partition-order
dependence), and (b) cheap at corpus scale. Two primitives:

- ``sample_by_rate``: keep a hash-derived uniform fraction of each
  group (e.g. {"en": 1.0, "de": 0.3, ...}). A row is kept iff
  ``hash(id) / 2^60 < rate[group]`` — MAP-ONLY: no shuffle, no state,
  embarrassingly parallel, and stable under repartitioning. This is
  the 100 TB path (the sampling decision for a row never depends on
  any other row).

- ``sample_quota``: keep exactly ``quota[group]`` rows per group,
  chosen by hash order (smallest hashes win — a uniform random
  permutation, derandomized). Exact counts need a per-group top-N:
  one hash-partition exchange + per-partition top-N heaps via
  row_number (Spark's WindowGroupLimit pushes the rank filter into a
  partial top-N on the map side, so no group ever materializes fully
  on one task). Use when exact mixture counts matter; rate mode when
  linear scalability matters.

Both share the hash-mode contract of operators/dedup.py: ``fast`` =
xxhash64 (JVM codegen), ``portable`` = md5-derived 60-bit hash replayed
bit-identically by the DuckDB oracle.

Reference scope note: vtshaver has no corpus operators; this belongs to
the training-data graft surface (SURVEY.md §2 graft block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vtshaver_spark.functions.text import PORTABLE60_MOD, portable_hash60


def _sample_hash(col: Column, salt: str, hash_mode: str) -> Column:
    """Uniform 60-bit draw in [0, 2^60) from a row key + salt.

    The salt decorrelates independent sampling passes over the same
    corpus (different salts -> independent keep decisions).
    """
    salted = F.concat(F.lit(f"{salt}:"), col.cast("string"))
    if hash_mode == "portable":
        return portable_hash60(salted)
    # fast path: one xxhash64, folded into [0, 2^60) via bitmask —
    # xxhash64's low bits are uniform; pmod not needed for a power of 2
    return F.xxhash64(salted).bitwiseAND(F.lit(PORTABLE60_MOD - 1))


def sample_by_rate(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix1",
    default_rate: float = 0.0,
    hash_mode: str = "fast",
) -> DataFrame:
    """Deterministic per-group Bernoulli sampling (map-only).

    ``rates`` maps group value -> keep fraction in [0, 1]; groups not
    listed fall back to ``default_rate``. The keep decision is
    ``hash(salt:id) < rate * 2^60`` — pure Column math, no shuffle.
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for group {g!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    # integer thresholds (exact: rates are compared in hash space, so
    # the oracle can replay the comparison without float-division drift)
    rate_expr: Column = F.lit(int(default_rate * PORTABLE60_MOD))
    for g, r in rates.items():
        rate_expr = F.when(
            F.col(group_col) == g, F.lit(int(r * PORTABLE60_MOD))
        ).otherwise(rate_expr)
    draw = _sample_hash(F.col(id_col), salt, hash_mode)
    return df.filter(draw < rate_expr)


def sample_quota(
    df: DataFrame,
    quotas: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix1",
    hash_mode: str = "fast",
) -> DataFrame:
    """Exactly ``quotas[group]`` rows per group, by hash order.

    Rows in groups without a quota are dropped. Ordering key is
    (draw, id) — the id tiebreak makes the cut deterministic even on
    the measure-zero chance of a hash collision at the boundary.
    Adds a ``_draw``-free output: original columns only.
    """
    for g, n in quotas.items():
        if n < 0:
            raise ValueError(f"quota for group {g!r} must be >= 0, got {n}")
    quota_expr: Column = F.lit(0)
    for g, n in quotas.items():
        quota_expr = F.when(
            F.col(group_col) == g, F.lit(int(n))
        ).otherwise(quota_expr)
    draw = _sample_hash(F.col(id_col), salt, hash_mode)
    w = Window.partitionBy(group_col).orderBy("_draw", id_col)
    # the literal conjunct (max quota) is what lets Spark's
    # InferWindowGroupLimit insert the map-side partial top-N — the
    # rule only fires on `rank <= IntegerLiteral`, so filtering on the
    # CASE expression alone would sort every group fully on one task;
    # the per-group CASE bound then trims to the exact quota
    max_quota = max(quotas.values(), default=0)
    return (
        df.withColumn("_draw", draw)
        .withColumn("_rk", F.row_number().over(w))
        .filter(
            (F.col("_rk") <= F.lit(int(max_quota)))
            & (F.col("_rk") <= quota_expr)
        )
        .drop("_draw", "_rk")
    )

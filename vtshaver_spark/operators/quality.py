"""Repetition-based quality signals for pretraining-data filtering.

The Gopher/MassiveText-style repetition family (Rae et al. 2021,
appendix A1.1): natural text rarely repeats itself; scraped boilerplate,
SEO spam, and template pages do. Two signals per document:

- ``dup_token_frac``: 1 - distinct/total tokens (pure Column math).
- ``top_bigram_char_frac``: characters covered by the single most
  frequent word 2-gram as a fraction of normalized text length (count
  x gram length / total; capped at 1). High values flag template spam
  ("click here click here ...").

Both are deterministic with explicit tie-breaks (highest count, then
lexicographically smallest gram) so a SQL oracle replays them exactly.

100 TB shape: one shingle explode + one (doc, gram) hash aggregation +
one per-doc max-struct aggregation — every key carries the doc id, so
work is doc-local behind hash exchanges; no corpus-wide state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vtshaver_spark.functions.text import shingles, tokens


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics: (doc, n_tokens,
    dup_token_frac, top_bigram, top_bigram_count,
    top_bigram_char_frac). Documents with fewer than 2 tokens have no
    bigram: NULL gram, zero count/fractions."""
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc"),
        F.size(toks).alias("n_tokens"),
        (
            F.when(
                F.size(toks) > 0,
                1.0
                - F.size(F.array_distinct(toks))
                / F.size(toks).cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("dup_token_frac"),
        F.length(F.concat_ws(" ", toks)).cast("double").alias("_norm_chars"),
        shingles(F.col(text_col), 2).alias("_bi"),
    )
    counts = (
        base.select("doc", F.explode("_bi").alias("_g"))
        .groupBy("doc", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # deterministic argmax: max over (count, reversed-tie gram) — the
    # struct MAX picks highest count; ties break toward the
    # lexicographically SMALLEST gram, encoded by ordering on the
    # negated comparison via a second struct field Spark compares
    # descending-count-first. MIN over (-count, gram) is the clean
    # encoding.
    top = (
        counts.groupBy("doc")
        .agg(F.min(F.struct((-F.col("_c")).alias("_nc"), F.col("_g"))).alias("_m"))
        .select(
            "doc",
            F.col("_m._g").alias("top_bigram"),
            (-F.col("_m._nc")).cast("long").alias("top_bigram_count"),
        )
    )
    return (
        base.join(top, "doc", "left")
        .select(
            "doc",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "dup_token_frac",
            "top_bigram",
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
            F.when(
                F.col("top_bigram").isNotNull() & (F.col("_norm_chars") > 0),
                F.least(
                    F.col("top_bigram_count")
                    * F.length("top_bigram")
                    / F.col("_norm_chars"),
                    F.lit(1.0),
                ),
            ).otherwise(F.lit(0.0)).alias("top_bigram_char_frac"),
        )
    )

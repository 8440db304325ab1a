"""Train/eval contamination check (benchmark decontamination).

The standard pretraining hygiene pass (GPT-3 appendix C, PaLM §6,
Llama-2 A.6): before training, find documents in the train corpus that
share enough word n-grams with a held-out evaluation set, and report
per-eval-document how much of it is "contaminated" — i.e. already
present somewhere in the training data.

Semantics per eval document:
  - ``n_shingles``      distinct word n-grams in the eval doc
  - ``n_contaminated``  of those, how many appear in ANY train doc
  - ``contamination``   the fraction (0 when the doc has no shingles)
  - ``is_contaminated`` fraction >= threshold

100 TB shape (the train side is the big side — eval sets are small):
  1. one shingle-explode + DISTINCT over the TRAIN corpus, keyed by a
     64-bit shingle hash (one long column — the narrow shuffle key;
     the shingle string itself never shuffles),
  2. shingle-explode of the (small) eval side,
  3. a LEFT SEMI equi-join eval-shingle -> train-shingle set on the
     long key — Catalyst picks broadcast when the eval side is small
     enough after AQE, else a hash join whose build side is the
     smaller,
  4. one per-eval-doc aggregation.
No pairwise doc x doc expansion anywhere: cost is linear in total
shingle count, the join key is a single long (LongHashedRelation fast
path), and the train side collapses to its distinct-shingle set before
any join.

Hash modes mirror operators/dedup.py: ``fast`` = xxhash64 (JVM, one
codegen op — the production path), ``portable`` = md5-derived 60-bit
(bit-identical in DuckDB — the correctness-oracle path).

Reference scope note: vtshaver has no corpus operators; this is part
of the training-data graft surface (SURVEY.md §2 graft block), same
family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vtshaver_spark.functions.text import portable_hash60, shingles


def _shingle_key(col: Column, hash_mode: str) -> Column:
    if hash_mode == "portable":
        return portable_hash60(col)
    return F.xxhash64(col)


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.2,
    hash_mode: str = "fast",
) -> DataFrame:
    """Per-eval-doc n-gram contamination against the train corpus.

    Returns one row per eval document:
    ``(id_col, n_shingles, n_contaminated, contamination,
    is_contaminated)``. Documents shorter than the shingle width have
    ``n_shingles = 0`` and contamination 0.0 (nothing to leak).
    """
    def shingle_rows(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode_outer(
                F.array_distinct(shingles(F.col(text_col), shingle_n))
            ).alias("_s"),
        )

    # train side: collapse to its distinct shingle-key set FIRST (one
    # hash agg) so the join build input is as small as it can be and
    # carries only a long
    train_keys = (
        shingle_rows(train)
        .filter(F.col("_s").isNotNull())
        .select(_shingle_key(F.col("_s"), hash_mode).alias("_k"))
        .distinct()
    )

    ev = shingle_rows(eval_df).withColumn(
        "_k",
        F.when(
            F.col("_s").isNotNull(), _shingle_key(F.col("_s"), hash_mode)
        ),
    )
    # mark eval shingles found in train: left join against the distinct
    # train-key set (semi-join shape; kept as a left join so the miss
    # rows survive for the fraction's denominator)
    hits = ev.join(
        train_keys.withColumn("_hit", F.lit(1)), on="_k", how="left"
    )
    agg = hits.groupBy(id_col).agg(
        F.count("_s").alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
    )
    frac = F.when(
        F.col("n_shingles") > 0,
        F.col("n_contaminated") / F.col("n_shingles"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        id_col,
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        F.round(frac, 6).alias("contamination"),
        (frac >= threshold).alias("is_contaminated"),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.2,
    min_matched: int | None = None,
    hash_mode: str = "fast",
) -> DataFrame:
    """Drop TRAIN documents that overlap the eval set too much — the
    mirror-image pass (contamination measured per train doc against
    the eval shingle set, which is the naturally-broadcastable side).

    Returns the train DataFrame filtered to documents whose shingle
    overlap with the eval set is below ``threshold``.

    DILUTION CAVEAT: the fractional ``threshold`` is measured against
    the TRAIN document's own shingle count, so a very long train
    document that embeds an entire short eval answer verbatim can read
    e.g. 200/50000 = 0.004 and escape. That is precisely the case the
    published decontamination passes target (GPT-3 App. C / PaLM /
    Llama-2 key on absolute n-gram collisions, not train-side
    fractions) — set ``min_matched`` to ALSO drop any train doc with
    at least that many matched shingles, regardless of its length.
    """
    report = contamination_report(
        # roles swapped: score each train doc against eval shingles
        train=eval_df, eval_df=train,
        id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, threshold=threshold, hash_mode=hash_mode,
    )
    dirty_cond = F.col("is_contaminated")
    if min_matched is not None:
        dirty_cond = dirty_cond | (F.col("n_contaminated") >= min_matched)
    dirty = report.filter(dirty_cond).select(id_col)
    return train.join(dirty, on=id_col, how="left_anti")

"""Deduplication operators for training-data pipelines.

All variants are shuffle-conscious: exact dedup is one hash
aggregation; MinHash-LSH generates candidates via band-bucket joins
(each doc replicates #bands times — never pairwise across the corpus);
SimHash is a single aggregation per doc over exploded tokens.

No Python in any hot path: hashing is ``xxhash64`` (JVM), signatures
are built with higher-order array functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vtshaver_spark.functions.text import fingerprint64, shingles, tokens


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact near-identical dedup on normalized content hash.

    Output: one row per distinct content — keeper id (min id), group
    size. One shuffle (hash aggregate with map-side partials).
    """
    return (
        df.withColumn("_fp", fingerprint64(F.col(text_col)))
        .groupBy("_fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .withColumnRenamed("_fp", "content_fp")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures: one row per doc, ``sig: array<bigint>``.

    Hash family: xxhash64 salted by the hash index (an equivalent
    independent family). Formulated as explode + ONE grouped
    aggregation with ``num_hashes`` MIN columns: the shingle
    tokenization (regex) runs exactly once per document, the 32 hash
    evaluations run per exploded shingle row with map-side combine —
    the shape that scales (a per-row array<transform> recomputes the
    regex per hash and serializes on wide rows).

    Docs with no shingles (shorter than the shingle width) are absent
    from the output, matching "no signature".
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_s"),
    )
    aggs = [
        F.min(F.xxhash64(F.concat(F.lit(f"{j}:"), F.col("_s")))).alias(f"_h{j}")
        for j in range(num_hashes)
    ]
    return (
        sh.groupBy("doc")
        .agg(*aggs)
        .select("doc", F.array(*[F.col(f"_h{j}") for j in range(num_hashes)]).alias("_sig"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows/bands rows shuffle per doc (band keys), self-join per bucket,
    pairs deduped with id ordering. Output: (doc_a, doc_b, n_shared_bands).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("_sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs.

    Joins shingle sets onto the (small) candidate pair set and computes
    |A∩B| / |A∪B| with array intersection — the standard LSH
    verify step.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed("_id", "doc_a").withColumnRenamed("_sh", "_sh_a"), "doc_a")
        .join(sh.withColumnRenamed("_id", "doc_b").withColumnRenamed("_sh", "_sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.when(
                F.size(F.array_union("_sh_a", "_sh_b")) > 0,
                F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
                / F.size(F.array_union("_sh_a", "_sh_b")),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_sh_a", "_sh_b")
    )


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document.

    Classic bit-vote construction, fully relational: explode tokens,
    hash each (xxhash64), then for every bit position sum +1/-1 votes
    in ONE aggregation (64 conditional sums, map-side combined), and
    reassemble the fingerprint from vote signs.
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = tok.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc", fp.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into ``blocks``
    chunks — any pair within the distance budget shares at least one
    exact chunk, so candidates come from equi-joins on chunk values
    (no quadratic blow-up), then exact popcount verification.
    """
    width = 64 // blocks
    sim = simhash64(df, id_col, text_col)
    mask = (1 << width) - 1
    chunks = sim.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bc"),
    ).select("doc", "simhash", "bc.blk", "bc.chunk")
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            F.col("l.simhash").alias("sim_a"),
            F.col("r.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    ).filter(F.col("hamming") <= max_hamming)

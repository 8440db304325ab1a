"""Sequence packing for LLM pretraining data (concat-and-chunk).

The canonical pretraining layout: concatenate every document's tokens
in a stable global order, then cut the stream into fixed-length
training sequences. Each document therefore owns a global token
interval [cum_start, cum_end), and the sequences it contributes to
are floor(cum_start / L) .. floor((cum_end - 1) / L).

The only primitive this needs at 100 TB is a GLOBAL ORDERED PREFIX
SUM — which a naive `Window.orderBy(doc)` computes on ONE partition
(the whole corpus through a single task: the classic scale trap). The
implementation here is the standard two-phase distributed prefix sum:

  1. range-repartition by the order key (parallel range sort),
  2. per-partition running totals (a window WITHIN each partition —
     every partition works independently),
  3. one tiny aggregation of per-partition sums (#partitions rows —
     bounded by cluster size, NOT corpus size) whose running offsets
     broadcast back via a BroadcastHashJoin.

Determinism: range boundaries are sampled, so WHICH partition a doc
lands in varies run to run — but partition-relative cumsum + that
partition's offset is the same global prefix sum for any boundary
choice (ranges are disjoint and sorted). Results are bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vtshaver_spark.functions.text import token_count, tokens


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_end",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact prefix sum of ``value_col`` over the global ``order_col``
    order, without ever materializing the corpus in one task.

    Adds ``out_col`` = inclusive running total. Two small shuffles
    (range partition + pid-keyed window) plus one #partitions-row
    aggregate; nothing driver-side scales with the data.

    PRECONDITION: ``order_col`` values must be UNIQUE. The per-
    partition window uses the default RANGE frame, so duplicate order
    values would all receive their tie-group's total (overlapping
    [cum_start, cum_end) intervals downstream); a ROWS frame would
    instead make results depend on nondeterministic post-shuffle tie
    order — uniqueness is what makes the sum exact AND bit-stable.
    Note the localCheckpoint below materializes the INPUT df's full
    column set to executor storage: project to (order, value) first
    when the frame carries wide payload columns (pack_token_sequences
    does).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Pre-materialize the input ONCE (r6): repartitionByRange runs a
    # RangePartitioner SAMPLING job over its child before the exchange
    # itself executes, so an expensive input plan (pack_token_sequences
    # feeds a full tokenizer pass) was computed twice per call. The
    # checkpointed frame is narrow — callers project to (order, value)
    # first — so the materialization is a few bytes per row.
    df = df.localCheckpoint()
    # localCheckpoint pins the sampled range boundaries: the ranged
    # exchange feeds TWO consumers (offsets agg + the windowed rows),
    # and a recomputed RangePartitioner could re-sample different
    # boundaries — desynchronizing offsets from rows. Materializing
    # once (narrow projection: order + value columns only) removes the
    # hazard; same discipline as neardup_components' lineage pin.
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # per-partition running total (window keys = physical partition,
    # so every partition windows independently — no global sort task)
    w = Window.partitionBy("_pid").orderBy(order_col)
    local = ranged.withColumn("_local_cum", F.sum(value_col).over(w))
    # per-partition totals -> running offsets (tiny: one row per
    # partition); broadcast back
    offsets = (
        local.groupBy("_pid")
        .agg(F.max("_local_cum").alias("_ptot"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_ptot").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_cum") + F.col("_offset"))
        .drop("_pid", "_local_cum")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token windows (the
    context-length chunking step of a pretraining / retrieval
    pipeline).

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap. COVERAGE semantics: chunks are
    emitted until the last one reaches the end of the document —
    n_chunks = 1 + max(0, ceil((n_tok - chunk_tokens) / stride)) — so
    a doc with n_tok <= chunk_tokens yields exactly one chunk, and no
    chunk starts after coverage is already complete (with overlap > 0
    this emits FEWER chunks than "every start < n_tok" would: the
    tail is covered by the previous overlapping chunk). Documents
    with zero tokens — or NULL text — yield no rows.

    100 TB shape: MAP-ONLY — tokenize once, explode a per-doc index
    sequence, slice the token array per chunk. Everything is codegen
    Column work (split/slice/array_join — none of Spark's interpreted
    higher-order lambdas); output is doc-local, so downstream
    (embedding, dedup) inherits the input partitioning.

    Output: id_col, chunk_idx, n_chunks, chunk_start (0-based token
    offset), chunk_len, chunk_text.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be > 0, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).withColumn("_n", F.size("_t"))
    # number of chunks: 1 + ceil((n - chunk) / stride) for n > 0.
    # NULL text makes _n NULL: the <=0 test is then NULL (falls to
    # otherwise) and greatest() SKIPS nulls -> a phantom full-length
    # chunk of NULL text — guard explicitly
    n_chunks = F.when(
        F.col("_n").isNull() | (F.col("_n") <= 0), F.lit(0)
    ).otherwise(
        F.lit(1)
        + F.greatest(
            F.lit(0),
            F.ceil((F.col("_n") - F.lit(chunk_tokens)) / F.lit(stride)),
        )
    )
    out = (
        toks.withColumn("n_chunks", n_chunks.cast("long"))
        .filter(F.col("n_chunks") > 0)
        .select(
            id_col,
            "n_chunks",
            "_t",
            "_n",
            F.explode(
                F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int"))
            ).alias("chunk_idx"),
        )
        .withColumn(
            "chunk_start", F.col("chunk_idx").cast("long") * F.lit(stride)
        )
        .withColumn(
            "chunk_len",
            F.least(
                F.lit(chunk_tokens).cast("long"),
                F.col("_n") - F.col("chunk_start"),
            ),
        )
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "n_chunks",
        "chunk_start",
        "chunk_len",
        F.array_join(
            # slice() is 1-based on the token array
            F.slice(
                F.col("_t"),
                (F.col("chunk_start") + 1).cast("int"),
                F.lit(chunk_tokens),
            ),
            " ",
        ).alias("chunk_text"),
    )


def pack_token_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Map every document to its place in the packed training stream.

    Output columns (one row per document, global ``id_col`` order):
      - ``n_tok``: the document's token count
      - ``cum_start`` / ``cum_end``: its global token interval
      - ``first_seq`` / ``last_seq``: the training sequences it spans
      - ``n_seqs``: how many sequences it touches (straddlers > 1)

    Zero-token documents occupy an empty interval: they belong to no
    sequence (``first_seq``/``last_seq`` NULL, ``n_seqs`` 0) — the
    concat stream simply skips them.
    """
    toks = df.select(
        F.col(id_col), token_count(F.col(text_col)).alias("n_tok")
    )
    cum = global_prefix_sum(
        toks, order_col=id_col, value_col="n_tok",
        num_partitions=num_partitions,
    )
    cum = cum.withColumn(
        "cum_start", (F.col("cum_end") - F.col("n_tok")).cast("long")
    ).withColumn("cum_end", F.col("cum_end").cast("long"))
    nonempty = F.col("n_tok") > 0
    return cum.select(
        id_col,
        F.col("n_tok").cast("long").alias("n_tok"),
        "cum_start",
        "cum_end",
        F.when(nonempty, F.floor(F.col("cum_start") / seq_len))
        .cast("long").alias("first_seq"),
        F.when(nonempty, F.floor((F.col("cum_end") - 1) / seq_len))
        .cast("long").alias("last_seq"),
        F.when(
            nonempty,
            F.floor((F.col("cum_end") - 1) / seq_len)
            - F.floor(F.col("cum_start") / seq_len) + 1,
        ).otherwise(F.lit(0)).cast("long").alias("n_seqs"),
    )

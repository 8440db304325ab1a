"""Sequence packing (operators/packing.py): the two-phase distributed
prefix sum must equal the naive global window, and the doc -> training
sequence mapping must honor straddlers and empty docs."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vtshaver_spark.operators.packing import (
    global_prefix_sum,
    pack_token_sequences,
)


def test_prefix_sum_matches_global_window(spark):
    rows = [(i, (i * 7919 + 3) % 97) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum_end"]
        for r in global_prefix_sum(df, "k", "v", num_partitions=7).collect()
    }
    want = {
        r["k"]: r["c"]
        for r in df.withColumn(
            "c", F.sum("v").over(Window.orderBy("k"))
        ).collect()
    }
    assert got == want
    # single-partition degenerate case
    got1 = {
        r["k"]: r["cum_end"]
        for r in global_prefix_sum(df, "k", "v", num_partitions=1).collect()
    }
    assert got1 == want


def test_pack_sequences_straddlers_and_empty(spark):
    # doc 1: 10 tokens, doc 2: 0 tokens, doc 3: 1020 tokens (straddles
    # seqs 0-2 at L=512 starting at offset 10), doc 4: 2 tokens
    texts = [
        (1, " ".join(f"w{i}" for i in range(10))),
        (2, "!!! ... ---"),  # no alnum tokens
        (3, " ".join(f"x{i}" for i in range(1020))),
        (4, "a b"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in
           pack_token_sequences(df, seq_len=512, num_partitions=3).collect()}
    assert got[1] == {"doc_id": 1, "n_tok": 10, "cum_start": 0,
                      "cum_end": 10, "first_seq": 0, "last_seq": 0,
                      "n_seqs": 1}
    assert got[2]["n_tok"] == 0 and got[2]["n_seqs"] == 0
    assert got[2]["first_seq"] is None and got[2]["last_seq"] is None
    assert got[2]["cum_start"] == got[2]["cum_end"] == 10
    # doc 3: [10, 1030) -> seqs 0..2
    assert got[3]["cum_start"] == 10 and got[3]["cum_end"] == 1030
    assert (got[3]["first_seq"], got[3]["last_seq"], got[3]["n_seqs"]) == (0, 2, 3)
    # doc 4: [1030, 1032) -> seq 2 only
    assert (got[4]["first_seq"], got[4]["last_seq"], got[4]["n_seqs"]) == (2, 2, 1)


def test_prefix_sum_no_global_sort_task(spark):
    """Scale-shape check: the big side's window must be keyed by the
    physical partition id (independent per-partition windows), never
    an unpartitioned global sort over the data."""
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "k long, v long"
    )
    plan = global_prefix_sum(df, "k", "v", num_partitions=4)._jdf \
        .queryExecution().executedPlan().toString()
    # the only unpartitioned window allowed is the #partitions-row
    # offsets aggregate (input: _ptot rows), never one over k/v rows
    for line in plan.splitlines():
        if "Window" in line and "_pid" not in line:
            assert "_ptot" in line, line


def test_chunk_documents_windows(spark):
    from vtshaver_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),                               # shorter than chunk
            (3, "!!! ..."),                             # zero tokens
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_start"], r["chunk_len"],
         r["chunk_text"])
        for r in out.collect()
    )
    # doc 1: stride 3 -> starts 0,3,6 and one tail at 9? n=10:
    # n_chunks = 1 + ceil((10-4)/3) = 3 -> starts 0,3,6 (covers to 10)
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 3, 4, "w3 w4 w5 w6"),
        (1, 2, 6, 4, "w6 w7 w8 w9"),
    ]
    assert [r for r in rows if r[0] == 2] == [(2, 0, 0, 3, "a b c")]
    assert not [r for r in rows if r[0] == 3]
    # every token position is covered by at least one chunk
    n_chunks = {r["doc_id"]: r["n_chunks"] for r in out.collect()}
    assert n_chunks == {1: 3, 2: 1}


def test_chunk_documents_validation(spark):
    import pytest
    from vtshaver_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_null_text_yields_no_rows(spark):
    """NULL text: size(NULL) is NULL in Spark 3, and greatest() skips
    nulls — an unguarded formula emitted a phantom full-length chunk
    of NULL text for every null-text document."""
    from vtshaver_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=2).collect()
    assert sorted(set(r["doc_id"] for r in out)) == [1]

"""Stateful streaming dedup: keys emit once across micro-batches."""

import pytest
from pyspark.sql import functions as F

from vtshaver_spark.streaming.stateful import stream_dedup


def test_stream_dedup(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    # two files -> (at least) two micro-batches under availableNow
    spark.createDataFrame(
        [("a",), ("b",), ("a",)], "doc_id string"
    ).write.parquet(src + "/f1")
    spark.createDataFrame(
        [("b",), ("c",), ("a",)], "doc_id string"
    ).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("doc_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
        .withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
    )
    deduped = stream_dedup(stream, key_col="doc_id")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    finished = q.awaitTermination(timeout=180)
    assert finished, "availableNow drain did not terminate within 180s"
    assert q.exception() is None
    rows = spark.sql("SELECT doc_id FROM dedup_out").collect()
    q.stop()
    emitted = [r["doc_id"] for r in rows]
    assert sorted(emitted) == ["a", "b", "c"]  # each key exactly once

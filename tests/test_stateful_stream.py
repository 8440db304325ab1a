"""Stateful streaming dedup: keys emit once across micro-batches."""

import os
import time

import pytest
from pyspark.sql import functions as F

from vtshaver_spark.streaming.stateful import stream_dedup


def _stamp(path: str, order: int) -> None:
    """Force a strictly ascending mtime per source file/dir: the file
    stream source orders batches by modification time, and parquet
    dirs written milliseconds apart can share an mtime under load —
    which reorders maxFilesPerTrigger=1 batches and flips
    order-dependent assertions (observed as a full-suite-only flake)."""
    t = time.time() - 3600 + order * 60
    for root, _dirs, files in os.walk(path):
        for fn in files:
            os.utime(os.path.join(root, fn), (t, t))


def _write_batch(df, path: str, order: int) -> None:
    """One micro-batch = ONE part file. A tiny createDataFrame write
    fans out to one part file per non-empty slice; all of them get the
    same _stamp mtime, so with maxFilesPerTrigger=1 the source's
    intra-dir order is an unspecified tie — if a LATER event's part
    file drains first, a 0-second watermark advances past the earlier
    event and silently drops it as late (observed: the event-time
    closure test emitted (1,1,2.0) instead of (1,2,3.0)).
    repartition(1) collapses the tie; sessionize_replay does the same."""
    df.repartition(1).write.parquet(path)
    _stamp(path, order)


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


def test_stream_sessionize(spark, tmp_path):
    import datetime as dt

    from vtshaver_spark.streaming.stateful import stream_sessionize

    src = str(tmp_path / "sess_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def row(user, minutes, value):
        return (user, t0 + dt.timedelta(minutes=minutes), value)

    schema = "user_id long, ts timestamp, value double"
    # batch 1: user 1 has two events 5 min apart (one session so far)
    _write_batch(
        spark.createDataFrame(
            [row(1, 0, 1.0), row(1, 5, 2.0), row(2, 0, 5.0)], schema
        ),
        src + "/f1", 1,
    )
    # batch 2: user 1 returns 90 min later -> closes session #1
    _write_batch(
        spark.createDataFrame([row(1, 95, 3.0), row(2, 10, 5.0)], schema),
        src + "/f2", 2,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        # timeout="none": the drain-handoff variant (open sessions stay
        # in state; the batch session_rollup drains them)
        stream_sessionize(stream, gap_minutes=30, timeout="none")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    assert q.awaitTermination(timeout=180)
    assert q.exception() is None
    rows = spark.sql(
        "SELECT user_id, n_events, sum_value FROM sess_out"
    ).collect()
    q.stop()
    # exactly one CLOSED session: user 1's first (2 events, 1.0+2.0);
    # user 2's events are 10 min apart (still open), user 1's third
    # event opened a new session (still open)
    assert [(r["user_id"], r["n_events"], r["sum_value"]) for r in rows] == [
        (1, 2, 3.0)
    ]


def test_stream_sessionize_event_time_closure(spark, tmp_path):
    """Open sessions close via event-time timeout when the watermark
    passes last_event + gap — NO separate batch drain job (r2
    VERDICT gap: a pure-streaming deployment leaked the last session
    per user)."""
    import datetime as dt

    from vtshaver_spark.streaming.stateful import stream_sessionize

    src = str(tmp_path / "sess_evt_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def row(user, minutes, value):
        return (user, t0 + dt.timedelta(minutes=minutes), value)

    schema = "user_id long, ts timestamp, value double"
    # batch 1: user 1's only events (0 and 5 min) — session stays open
    _write_batch(
        spark.createDataFrame([row(1, 0, 1.0), row(1, 5, 2.0)], schema),
        src + "/f1", 1,
    )
    # batch 2: OTHER user far in the future advances the watermark
    _write_batch(spark.createDataFrame([row(2, 120, 5.0)], schema), src + "/f2", 2)
    # batch 3: another late-arriving user keeps the stream moving so
    # the timeout (armed at 35 min, watermark now 120) fires
    _write_batch(spark.createDataFrame([row(3, 130, 7.0)], schema), src + "/f3", 3)
    # batch 4: one more advancing batch — the watermark lags one batch
    # and a timeout clamped to wm+1 (when a session starts AFTER the
    # watermark already passed its due time) needs the NEXT strictly
    # later watermark to fire; a fourth file makes closure independent
    # of file-listing order
    _write_batch(spark.createDataFrame([row(4, 140, 9.0)], schema), src + "/f4", 4)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
        .withWatermark("ts", "0 seconds")
    )
    q = (
        stream_sessionize(stream, gap_minutes=30, timeout="event")
        .writeStream.format("memory")
        .queryName("sess_evt_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_evt_ckpt"))
        .start()
    )
    assert q.awaitTermination(timeout=180)
    assert q.exception() is None
    rows = spark.sql(
        "SELECT user_id, n_events, sum_value FROM sess_evt_out"
    ).collect()
    q.stop()
    # user 1's session (2 events, 3.0) emitted by TIMEOUT — no user-1
    # event ever closed it, and no second job ran. Users 2/3/4 remain
    # open (the final watermark, 140 min, never passes their
    # last_event + gap) — correct event-time semantics for a stream
    # whose tail is still unknowable.
    got = {(r["user_id"], r["n_events"], r["sum_value"]) for r in rows}
    assert got == {(1, 2, 3.0)}, got


def test_stream_phash_dedup(spark, tmp_path):
    # image firehose: file2 re-uploads perceptual duplicates (variant
    # 'b' = channel-rolled 2x upscale, phash-identical to 'a') plus
    # one genuinely new image; only the new image may pass batch 2
    import time

    from vtshaver_spark.operators.multimodal import (
        generate_variant_images,
        phash_fingerprints,
    )
    from vtshaver_spark.streaming.stateful import stream_phash_dedup

    def corpus(ks, variant):
        rows = [
            (k, f"img_{k:08d}_{variant}", variant,
             16 + k % 17, 16 + (k * 7) % 13, (k * 48271) % 251)
            for k in ks
        ]
        df = spark.createDataFrame(
            rows,
            "k long, image_id string, variant string, w int, h int, seed int",
        )
        return generate_variant_images(df).select("image_id", "bytes")

    first = corpus([1, 2, 3], "a")
    # distinct phashes among the chosen ks (collision would invalidate
    # the expected emission set, not the operator)
    fps = {r["image_id"]: r["phash"] for r in phash_fingerprints(first).collect()}
    assert len(set(fps.values())) == 3
    src = str(tmp_path / "img_src")
    first.write.parquet(src + "/f1")
    time.sleep(1.1)  # ascending mtimes pin micro-batch order
    corpus([1, 2, 3], "b").union(corpus([4], "a")).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("image_id string, bytes binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    out = stream_phash_dedup(stream, n_buckets=4)
    q = (
        out.writeStream.format("memory")
        .queryName("phash_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "pckpt"))
        .start()
    )
    finished = q.awaitTermination(timeout=180)
    assert finished, "availableNow drain did not terminate within 180s"
    assert q.exception() is None
    rows = spark.sql("SELECT phash_key, image_id FROM phash_dedup_out").collect()
    q.stop()
    winners = sorted(r["image_id"] for r in rows)
    # 3 slots won by the first-arriving 'a' variants + the new k=4;
    # every 'b' re-upload was dropped
    assert winners == [
        "img_00000001_a", "img_00000002_a", "img_00000003_a", "img_00000004_a",
    ]
    assert len({r["phash_key"] for r in rows}) == 4


def test_sessionize_replay_matches_batch_minus_open(spark):
    """sessionize_replay (the driver-board harness) must emit exactly
    the batch sessionization minus each user's final open session —
    on a corpus with multi-session users, a single-session user (never
    emitted: still open), and events straddling shard boundaries."""
    import datetime as dt

    from vtshaver_spark.operators.sessions import session_rollup
    from vtshaver_spark.streaming.stateful import sessionize_replay

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user, offsets in [
        (1, [0, 5, 95, 100, 200]),   # sessions {0,5}, {95,100}, {200}
        (2, [0, 10]),                # one open session -> nothing emitted
        (3, [0, 40, 80, 300]),       # gap 30: four 1-event sessions
    ]:
        for m in offsets:
            rows.append((eid, user, t0 + dt.timedelta(minutes=m), float(m)))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in sessionize_replay(
            spark, events, n_shards=3, gap_minutes=30
        ).collect()
    }
    batch = session_rollup(events, gap_minutes=30).collect()
    last_idx = {}
    for r in batch:
        last_idx[r["user_id"]] = max(
            last_idx.get(r["user_id"], -1), r["session_idx"]
        )
    want = {
        (r["user_id"], r["session_start"], r["n_events"], float(r["sum_value"]))
        for r in batch
        if r["session_idx"] < last_idx[r["user_id"]]
    }
    assert got == want and len(want) == 5

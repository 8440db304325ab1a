"""Custom stateful streaming operators (applyInPandasWithState).

``stream_dedup``: exactly-once-per-key emission across micro-batches —
the streaming counterpart of exact_dedup for continuous ingestion
(e.g. dedup image_ids arriving from a firehose). State per key group
is a compact seen-set; GroupStateTimeout bounds memory for idle keys.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup(
    stream_df: DataFrame,
    key_col: str = "doc_id",
    bucket_col: str = "bucket",
    state_timeout_ms: int = 0,
    carry_col: str | None = None,
) -> DataFrame:
    """Emit each key at most once across the stream's lifetime.

    The stream must carry a ``bucket`` grouping column (e.g.
    ``pmod(xxhash64(key), N)``) so state shards across tasks; the
    seen-set lives per bucket.

    ``carry_col`` optionally names a column whose winning value rides
    along with each emitted key (e.g. the image_id that won a
    perceptual-hash slot); state still stores only the seen keys, so
    the memory contract is unchanged. Across micro-batches the winner
    is first-arrival; WITHIN one micro-batch (where arrow-chunk
    arrival order is shuffle-nondeterministic) ties break to the
    MINIMUM carry value, so replays are deterministic.

    ``state_timeout_ms`` bounds memory for idle buckets on continuous
    triggers — and bounds the dedup guarantee with it: when a bucket's
    state times out its seen-set is dropped, so a key that reappears
    AFTER the timeout is emitted again (at-most-once per state
    lifetime, not per stream lifetime — that is the explicit
    memory/exactness trade; leave 0 for the unconditional guarantee).
    It defaults to 0 (NoTimeout): arming a ProcessingTimeTimeout
    re-schedules work every micro-batch, so a
    ``trigger(availableNow=True)`` drain never reaches termination —
    only opt in for genuinely continuous queries.
    """
    out_fields = [
        T.StructField(bucket_col, T.LongType()),
        T.StructField(key_col, T.StringType()),
    ]
    if carry_col is not None:
        out_fields.append(T.StructField(carry_col, T.StringType()))
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])

    def dedup_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.hasTimedOut:
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        # concat + deterministic ordering: chunk arrival order is
        # shuffle-dependent, so "first in batch" would flip between
        # replays — order by (key, carry) instead
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        fresh, carried = [], []
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1 else chunks[0]
            )
            cseries = (
                whole[carry_col].astype(str)
                if carry_col is not None
                else whole[key_col].astype(str)
            )
            batch = sorted(zip(whole[key_col].astype(str), cseries))
            for k, c in batch:
                if k not in seen:
                    seen.add(k)
                    fresh.append(k)
                    carried.append(c)
        state.update((list(seen),))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        if fresh:
            out = {bucket_col: [bucket] * len(fresh), key_col: fresh}
            if carry_col is not None:
                out[carry_col] = carried
            yield pd.DataFrame(out)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(bucket_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def stream_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: float = 30.0,
    timeout: str = "event",
) -> DataFrame:
    """Streaming gap-based sessionization (applyInPandasWithState):
    per-user state carries the OPEN session (start, last event time,
    count, sum); a session is emitted when a later event arrives past
    the gap. The stream's micro-batches are processed in event-time
    order WITHIN each group's batch (sorted here); an event older than
    the open session's last timestamp extends that session (late data
    folds in rather than forking history).

    ``timeout="event"`` (default) CLOSES open sessions by event-time
    timeout: each update arms a timeout at ``last_event + gap``; when
    the stream's watermark passes it, the open session is emitted and
    its state removed — no separate batch drain job. Requires the
    input stream to carry a watermark
    (``stream_df.withWatermark(ts_col, ...)``); pure event-time, so a
    session only closes once LATER data advances the watermark past
    its gap (the genuinely-last session of a stream that simply stops
    is unknowable until more data or a drain — use
    ``timeout="none"`` + the batch ``session_rollup`` handoff for
    final-drain semantics).
    """
    import pandas as pd

    if timeout not in ("none", "event"):
        raise ValueError("timeout must be 'none' or 'event'")
    gap_s = gap_minutes * 60.0
    out_schema = T.StructType(
        [
            T.StructField(user_col, T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("sv", T.DoubleType()),
        ]
    )

    def emit(user, sessions):
        return pd.DataFrame(
            {
                user_col: [user] * len(sessions),
                "session_start": [pd.Timestamp(c[0] * 1000) for c in sessions],
                "session_end": [pd.Timestamp(c[1] * 1000) for c in sessions],
                "n_events": [c[2] for c in sessions],
                "sum_value": [c[3] for c in sessions],
            }
        )

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session can
            # never be extended by non-late data — close and emit it
            if state.exists:
                open_session = tuple(state.get)
                state.remove()
                yield emit(user, [open_session])
            else:
                state.remove()
            return
        cur = list(state.get) if state.exists else None
        closed = []
        # applyInPandasWithState delivers the group's batch as ~10k-row
        # arrow chunks in ARRIVAL order: sorting each chunk alone would
        # still process later-chunk events out of event-time order and
        # mis-split sessions for any user with a chunk-spanning batch —
        # concat the whole batch first
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        whole = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1 else (chunks[0] if chunks else None)
        )
        if whole is not None:
            whole = whole.sort_values(ts_col)
        for pdf in ([whole] if whole is not None else []):
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                us = int(pd.Timestamp(ts).value // 1000)
                v = float(val)
                if cur is None:
                    cur = [us, us, 1, v]
                elif us - cur[1] > gap_s * 1_000_000:
                    closed.append(tuple(cur))
                    cur = [us, us, 1, v]
                else:
                    cur[1] = max(cur[1], us)
                    cur[2] += 1
                    cur[3] += v
        if cur is not None:
            state.update(tuple(cur))
            if timeout == "event":
                # must be strictly beyond the current watermark or the
                # state store rejects it (a session already past its
                # gap fires at the next watermark tick)
                due_ms = cur[1] // 1000 + int(gap_s * 1000)
                state.setTimeoutTimestamp(
                    max(due_ms, state.getCurrentWatermarkMs() + 1)
                )
        if closed:
            yield emit(user, closed)

    timeout_conf = (
        GroupStateTimeout.EventTimeTimeout
        if timeout == "event"
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def sessionize_replay(
    spark,
    events: DataFrame,
    n_shards: int = 3,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Deterministic micro-batch REPLAY of ``stream_sessionize`` over a
    batch events table — the harness that puts the stateful operator
    under the same batch-SQL oracle gate as everything else.

    The events are split into ``n_shards`` CONTIGUOUS event-time
    ranges (ntile over (ts, order_col) — a global window, fine at
    replay/test scale; this is a verification vehicle, not a scale
    operator), written as one parquet file per shard with strictly
    ascending mtimes (the file source orders micro-batches by mtime),
    then drained with ``maxFilesPerTrigger=1`` + ``availableNow`` into
    a memory sink. Because shards are contiguous in event time, every
    user's events arrive in order, so the emitted CLOSED sessions are
    exactly the batch sessionization minus each user's final (still
    open, ``timeout="none"``) session — a set a SQL oracle states
    directly (QUALIFY session_idx < MAX(session_idx) OVER user).

    Returns the closed-session DataFrame (memory-sink table: the rows
    are already materialized; the temp shard dir is deleted).
    """
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tmp = tempfile.mkdtemp(prefix="vtshaver_replay_")
    name = "sess_replay_" + uuid.uuid4().hex[:8]
    try:
        shard = F.ntile(n_shards).over(Window.orderBy(ts_col, order_col))
        ev = events.select(user_col, ts_col, value_col, order_col).withColumn(
            "_shard", shard
        )
        for i in range(1, n_shards + 1):
            path = os.path.join(tmp, f"f{i}")
            (
                ev.filter(F.col("_shard") == i)
                .drop("_shard", order_col)
                .repartition(1)
                .write.parquet(path)
            )
            # strictly ascending mtimes pin micro-batch replay order
            t = time.time() - 3600 + i * 60
            for root, _dirs, files in os.walk(path):
                for fn in files:
                    os.utime(os.path.join(root, fn), (t, t))
        stream = (
            spark.readStream.schema(
                f"{user_col} long, {ts_col} timestamp, {value_col} double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(tmp, "f*"))
        )
        q = (
            stream_sessionize(
                stream, user_col=user_col, ts_col=ts_col,
                value_col=value_col, gap_minutes=gap_minutes,
                timeout="none",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        try:
            finished = q.awaitTermination(timeout=300)
            if not finished or q.exception() is not None:
                raise RuntimeError(
                    f"sessionize replay did not drain: {q.exception()}"
                )
        except BaseException:
            # stop BEFORE the finally rmtree deletes the source and
            # checkpoint out from under a still-active stream — an
            # orphaned query erroring in the background would pollute
            # the shared session for subsequent driver-board queries
            q.stop()
            spark.catalog.dropTempView(name)
            raise
        return spark.table(name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def stream_phash_dedup(
    stream_df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    n_buckets: int = 32,
    state_timeout_ms: int = 0,
) -> DataFrame:
    """Perceptual dedup of a continuous IMAGE stream: first arrival
    wins per 64-bit average-hash. The streaming counterpart of
    operators/multimodal.phash_near_dups for ingestion firehoses —
    later uploads of a perceptually identical image (re-encodes,
    exact-factor upscales, channel shuffles) are dropped before they
    reach the lake.

    Composition: the SAME Arrow phash kernel as the batch path
    (phash_fingerprints — mapInPandas is streaming-safe) computes each
    micro-batch's hashes after (id, bytes) pruning, then stream_dedup
    keyed on the hash value keeps the first image per slot. State per
    bucket is the seen-hash set only (images never enter state), so
    memory is O(distinct hashes / n_buckets) per task.

    Output: (bucket, phash_key, image_id) — one row per NEW perceptual
    slot, carrying the winning image's id.
    """
    from pyspark.sql import functions as F

    from vtshaver_spark.operators.multimodal import phash_fingerprints

    fps = phash_fingerprints(stream_df, id_col=id_col, bytes_col=bytes_col)
    keyed = fps.select(
        F.col("phash").cast("string").alias("phash_key"),
        F.col(id_col).cast("string").alias(id_col),
    ).withColumn("bucket", F.pmod(F.xxhash64("phash_key"), F.lit(n_buckets)))
    return stream_dedup(
        keyed,
        key_col="phash_key",
        bucket_col="bucket",
        state_timeout_ms=state_timeout_ms,
        carry_col=id_col,
    )

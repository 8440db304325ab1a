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
) -> DataFrame:
    """Emit each key at most once across the stream's lifetime.

    The stream must carry a ``bucket`` grouping column (e.g.
    ``pmod(xxhash64(key), N)``) so state shards across tasks; the
    seen-set lives per bucket.

    ``state_timeout_ms`` bounds memory for idle buckets on continuous
    triggers. It defaults to 0 (NoTimeout): arming a
    ProcessingTimeTimeout re-schedules work every micro-batch, so a
    ``trigger(availableNow=True)`` drain never reaches termination —
    only opt in for genuinely continuous queries.
    """
    out_schema = T.StructType(
        [
            T.StructField(bucket_col, T.LongType()),
            T.StructField(key_col, T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])

    def dedup_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.hasTimedOut:
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        fresh = []
        for pdf in pdfs:
            for k in pdf[key_col].astype(str):
                if k not in seen:
                    seen.add(k)
                    fresh.append(k)
        state.update((list(seen),))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        if fresh:
            yield pd.DataFrame({bucket_col: [bucket] * len(fresh), key_col: fresh})

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

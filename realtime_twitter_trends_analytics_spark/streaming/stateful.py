"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful op is the checkpointed window reduce
(proc:138). Beyond windowed aggs (streaming/pipeline.py), a trends engine
wants *cumulative per-key state across the whole stream* — e.g. lifetime
hashtag counts with momentum (delta vs the previous batch), which no
built-in windowed agg expresses. This is the ``applyInPandasWithState``
pattern: Arrow-batched grouped state, one state row per key, watermark-free
(state lives for the stream's lifetime; at 100 TB keyspace you'd add a TTL
via GroupStateTimeout).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("total", LongType()), StructField("prev_total", LongType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("hashtag", StringType()),
        StructField("lifetime_count", LongType()),
        StructField("batch_delta", LongType()),
    ]
)


def _update_counts(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
    if state.exists:
        (total, _prev) = state.get
    else:
        total, _prev = 0, 0
    new_total = total + batch_n
    state.update((new_total, total))
    yield pd.DataFrame(
        {
            "hashtag": [key[0]],
            "lifetime_count": [new_total],
            "batch_delta": [new_total - total],
        }
    )


def lifetime_hashtag_counts(scored: DataFrame) -> DataFrame:
    """Cumulative per-hashtag counts + per-trigger delta ('momentum').

    Input: the scored stream from streaming.pipeline.transform_tweets.
    Output mode must be 'update'. State: one (total, prev_total) row per
    hashtag, Arrow-batched per trigger.
    """
    return scored.groupBy("hashtag").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def lifetime_hashtag_counts_tws(scored: DataFrame) -> DataFrame:
    """Same semantics on the Spark 4 ``transformWithStateInPandas`` API
    (the successor to applyInPandasWithState): typed ValueState handles,
    explicit init/close lifecycle, and native per-state TTL — at firehose
    keyspace the TTL replaces the hand-rolled GroupStateTimeout eviction.
    Kept alongside the classic API so users of either shape have a
    reference implementation.

    NOTE: executing this path needs ``google.protobuf`` (the tws state
    protocol wire format), which this container lacks and cannot fetch —
    the test is skipif-gated on that import; the applyInPandasWithState
    twin above runs and pins the semantics."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LifetimeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterable[pd.DataFrame]:
            batch_n = 0
            for pdf in rows:
                batch_n += len(pdf)
            total = self._total.get()[0] if self._total.exists() else 0
            new_total = total + batch_n
            self._total.update((new_total, total))
            yield pd.DataFrame(
                {
                    "hashtag": [key[0]],
                    "lifetime_count": [new_total],
                    "batch_delta": [new_total - total],
                }
            )

        def close(self) -> None:
            pass

    return scored.groupBy("hashtag").transformWithStateInPandas(
        LifetimeCounts(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

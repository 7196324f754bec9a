"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only custom state is the Redis seen-set and the x-retry-count
header; dropDuplicates and retry_queue_step cover those. This module covers
the *arbitrary* keyed-state axis (SURVEY.md §2.9 [E]): a per-key running
aggregate maintained across micro-batches with explicit GroupState — the
Spark-native form of "stateful consumer with a side store".
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) maintained in GroupState across
    micro-batches; each batch emits the key's updated totals (update mode).

    State is partitioned by key in the state store — scale-out is by key
    hash, same as any keyed agg; no driver state.
    """
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EXACT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

EXACT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _update_exact(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Order-independent state transition: the running sum is kept in integer
    cents (each value grid-quantized ONCE on arrival), so the fold result is
    identical under any micro-batch/row arrival order — the property that
    makes the operator's output oracle-checkable and replay-stable."""
    import numpy as np

    n, cents, mx = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        cents += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, cents, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents], "max_value": [mx]}
    )


def running_user_stats_exact(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, cents-sum, max) in GroupState — the
    oracle-checkable variant of ``running_user_stats``."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_exact,
            outputStructType=EXACT_OUTPUT_SCHEMA,
            stateStructType=EXACT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

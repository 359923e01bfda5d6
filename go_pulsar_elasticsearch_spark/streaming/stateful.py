"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2B: the escape hatch for semantics Spark's built-in stateful
ops can't express).

`user_running_totals` keeps one state row per user (event count + value
sum + last event-time) and emits the updated totals every micro-batch —
a streaming materialized aggregate with explicit, inspectable state,
the building block the reference entirely lacks (its only state was the
in-flight ack map, main.go:173-202).

State is partitioned by the group key, so it scales horizontally; a
watermark-driven timeout (GroupStateTimeout) would bound it for
unbounded key domains.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ms", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("total_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ms", LongType()),
    ]
)


def _update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
            ) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total_events, total_value, last_ms = state.get
    else:
        total_events, total_value, last_ms = 0, 0.0, 0
    for pdf in pdfs:
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
        if len(pdf):
            last_ms = max(last_ms, int(pdf["ms"].max()))
    state.update((total_events, total_value, last_ms))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "total_events": [total_events],
            "total_value": [total_value],
            "last_ms": [last_ms],
        }
    )


def user_running_totals(source: DataFrame) -> DataFrame:
    """source columns: user_id long, value double, ms long (epoch millis).
    Emits the cumulative per-user totals after every micro-batch."""
    return source.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

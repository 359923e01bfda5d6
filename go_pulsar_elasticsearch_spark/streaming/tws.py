"""Stateful streaming via transformWithStateInPandas (Spark 4's
arbitrary-state API, successor to applyInPandasWithState).

`user_peak_tracker` maintains, per user, the running PEAK value and how
many events ago it was set — the alerting shape ("new high-water mark")
that needs explicit state: windowed aggs can't express "compare against
the all-time max so far", and dropDuplicates has no notion of ordering.

Why the new API (vs stateful.py's applyInPandasWithState): typed state
primitives (ValueState here; ListState/MapState for bounded buffers),
state schema evolution, and timers — the long-lived-pipeline features
the GroupState dict lacks.  Same scale posture: state is partitioned by
the grouping key and lives in the state store, so a 1000-executor
cluster shards it horizontally; TTL/timers bound unbounded key domains.

Runtime dependency: the TWS state-server protocol needs the python
`protobuf` package; environments without it (this container) can import
this module but must run the applyInPandasWithState twin (stateful.py)
instead — tests/test_tws.py skips itself accordingly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("peak_value", DoubleType()),
        StructField("n_events", LongType()),
        StructField("events_since_peak", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("peak_value", DoubleType()),
        StructField("n_events", LongType()),
        StructField("events_since_peak", LongType()),
    ]
)


class PeakTracker(StatefulProcessor):
    """ValueState = (peak so far, events seen, events since peak set)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("peak", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            peak, n_events, since = self._state.get()
        else:
            peak, n_events, since = float("-inf"), 0, 0
        for pdf in rows:
            # order within the batch follows the source; process row-wise
            # so "events since peak" is exact
            for v in pdf["value"]:
                n_events += 1
                if float(v) > peak:
                    peak, since = float(v), 0
                else:
                    since += 1
        self._state.update((peak, n_events, since))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "peak_value": [peak],
                "n_events": [n_events],
                "events_since_peak": [since],
            }
        )

    def close(self) -> None:
        pass


def user_peak_tracker(source: DataFrame) -> DataFrame:
    """source columns: user_id long, value double.  Emits the per-user
    peak snapshot after every micro-batch (update mode)."""
    return source.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=PeakTracker(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

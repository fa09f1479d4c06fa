"""Streaming anomaly detection via transformWithStateInPandas —
Spark 4's arbitrary-stateful-processing API (the successor of
applyInPandasWithState used in streaming/stateful.py; both are shown
because a reference user migrating to streaming will meet both).
NB: the transformWithState control channel needs the protobuf python
package, absent in the test container — the operator is exercised
there only when protobuf is available (tests skip otherwise).

Operator: per-user running value statistics (Welford-style n/Σ/Σ²
held in ValueState) emitting a row per event with the running z-score
and an anomaly flag. State is O(1) per user — the shape that runs
indefinitely on an unbounded stream.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("running_mean", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

_STATE_SCHEMA = "n LONG, s DOUBLE, s2 DOUBLE"


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (n, Σx, Σx²); z-score against the stats BEFORE
    the current event (so the first events of a key are never flagged
    against themselves)."""

    def __init__(self, z_threshold: float = 3.0, min_history: int = 10):
        self._z = z_threshold
        self._min_history = min_history

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, s, s2 = (self._state.get() or (0, 0.0, 0.0)) if self._state.exists() else (0, 0.0, 0.0)
        out = {k: [] for k in ("event_id", "value", "running_mean", "zscore", "is_anomaly")}
        for pdf in rows:
            pdf = pdf.sort_values("event_id")
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                v = float(v)
                if n >= self._min_history:
                    mean = s / n
                    var = max(s2 / n - mean * mean, 0.0)
                    std = math.sqrt(var)
                    z = (v - mean) / std if std > 0 else 0.0
                else:
                    mean, z = float("nan"), 0.0
                out["event_id"].append(int(eid))
                out["value"].append(v)
                out["running_mean"].append(mean)
                out["zscore"].append(z)
                out["is_anomaly"].append(abs(z) > self._z and n >= self._min_history)
                n, s, s2 = n + 1, s + v, s2 + v * v
        self._state.update((n, s, s2))
        if out["event_id"]:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out["event_id"]),
                    **out,
                }
            )

    def close(self) -> None:
        pass


def running_anomalies(
    events: DataFrame,
    z_threshold: float = 3.0,
    min_history: int = 10,
) -> DataFrame:
    """Streaming per-user anomaly tagging. Input: streaming DataFrame
    with (user_id, event_id, value)."""
    return events.select("user_id", "event_id", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(z_threshold, min_history),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )

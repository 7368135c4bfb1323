"""Arbitrary stateful streaming via the transformWithState API (the
successor surface to applyInPandasWithState, Spark 4.x): typed per-key
state handles (ValueState/ListState/MapState), timers, and TTL.

Demo operator: **running per-key counter** — ValueState accumulates the
event count per key across micro-batches and emits the running total
whenever the key sees data. With an availableNow drain this emits exactly
one row per key, equal to the batch group-by count, which is what the
DuckDB oracle checks.

Scale notes: state lives in the per-partition state store (RocksDB in
this engine's sessions); a ValueState row per key is the cheapest
possible state shape. Use MapState/ListState only when the per-key
payload genuinely varies, and attach TTL for unbounded keyspaces.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningCountProcessor(StatefulProcessor):
    """Emit (key, running_count) per key per micro-batch with data."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", "n BIGINT")

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch_n = sum(len(pdf) for pdf in rows)
        prev = self._count.get()[0] if self._count.exists() else 0
        total = int(prev) + int(batch_n)
        self._count.update((total,))
        yield pd.DataFrame({"key": [key[0]], "running_count": [total]})

    def close(self) -> None:
        pass


def streaming_running_counts(stream: DataFrame, key_col: str) -> DataFrame:
    """Running event count per key via transformWithStateInPandas."""
    return (
        stream.groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=RunningCountProcessor(),
            outputStructType="key BIGINT, running_count BIGINT",
            outputMode="Update",
            timeMode="None",
        )
    )

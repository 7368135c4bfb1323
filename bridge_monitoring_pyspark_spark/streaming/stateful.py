"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no arbitrary-state operators (SURVEY.md §2.10); this is
the engine-completeness extension for semantics the built-in windowed
aggregates can't express. The demo operator is **streaming keep-first
dedup**: per key group, emit only rows whose (dedup sub-key) was never seen
in any earlier micro-batch; seen-keys live in GroupState.

Scale notes: state is per group-key partition (hash shuffle on the key);
the seen-set must stay bounded — production variants hold a sketch (Bloom
filter) or TTL the state via timeouts rather than an exact set. Rows within
a micro-batch are sorted by the caller-supplied order columns so emission
is deterministic regardless of scan order.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_keep_first(
    stream: DataFrame,
    key_col: str,
    dedup_col: str,
    order_cols: list[str],
    output_schema: str,
    output_cols: list[str],
) -> DataFrame:
    """Emit the first row (by ``order_cols``) per (key, dedup value) across
    the whole stream; later occurrences in the same or later micro-batches
    are dropped via GroupState."""

    def dedup_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen: set = set(state.get[0]) if state.exists else set()
        # concat all Arrow chunks before sorting — chunk boundaries are not
        # deterministic, the (order_cols) sort must span the whole batch
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(order_cols)
        fresh = pdf[~pdf[dedup_col].isin(seen)].drop_duplicates(
            subset=[dedup_col], keep="first"
        )
        state.update((list(seen | set(fresh[dedup_col])),))
        if len(fresh):
            yield fresh[output_cols]

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_group,
        outputStructType=output_schema,
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

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

import numpy as np
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


def streaming_sessionize_timeout(
    stream: DataFrame, key_col: str, us_col: str, gap_us: int
) -> DataFrame:
    """Per-key sessionization with **event-time timers** (the state-eviction
    facility `streaming_keep_first` doesn't exercise): events whose gap
    exceeds ``gap_us`` start a new session; a completed session is emitted
    when (a) a later event for the key arrives past the gap, or (b) the
    key goes idle and the watermark passes session_end + gap — then the
    timer fires with an empty input iterator and the state is removed.
    This is THE unbounded-keyspace pattern at 100 TB: without (b), every
    key that ever appeared holds RocksDB state forever.

    Timestamps are carried as epoch **microseconds** (``us_col``, int64) so
    the Python worker never touches tz-sensitive datetime objects; the
    caller must still provide a watermarked proper-TIMESTAMP column for the
    engine's timer clock. Spark's watermark/timer clock is **millisecond**-
    floored, so the timer registers at ``(end_us + gap_us) // 1000`` and
    fires strictly after the watermark passes it — the DuckDB oracle
    replays exactly this flooring (see plans/streaming_q2.py).

    Output is batching-independent under an availableNow drain: whichever
    of (a)/(b) happens first emits the same session row once, so the
    oracle needs no knowledge of file/micro-batch boundaries.

    Late-but-valid events (possible whenever the caller's watermark delay
    is nonzero) are handled by interval-merging the stored session with
    the batch's segments rather than assuming batch events are newer than
    the stored end; a session whose close instant is already at/behind
    the watermark flushes immediately instead of arming a rejected timer.
    """

    def sessionize(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def emit(rows: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    key_col: np.full(len(rows), key[0], dtype=np.int64),
                    "session_start_us": np.array([r[0] for r in rows], dtype=np.int64),
                    "session_end_us": np.array([r[1] for r in rows], dtype=np.int64),
                    "n_events": np.array([r[2] for r in rows], dtype=np.int64),
                }
            )

        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield emit([(int(s), int(e), int(n))])
            return
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        us = np.sort(
            np.concatenate([c[us_col].to_numpy(dtype=np.int64) for c in chunks])
        )
        # segment boundaries where the in-batch gap exceeds gap_us (strict >,
        # mirrored by the oracle's `diff > gap`)
        cuts = np.flatnonzero(np.diff(us) > gap_us) + 1
        bounds = np.concatenate(([0], cuts, [len(us)]))
        segs = [
            (int(us[a]), int(us[b - 1]), int(b - a))
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        # Merge the stored open session as one more segment, by interval
        # logic — NOT by assuming batch events are newer than the stored
        # end. With a nonzero watermark delay a late-but-valid event can
        # precede the stored session (or even land inside its span); an
        # ordered-append merge would then produce end < start and a wrong
        # count. Sorting by (start, end) and coalescing on the gap rule
        # reproduces global sessionization for any arrival order.
        if state.exists:
            segs.append(tuple(int(v) for v in state.get))
            segs.sort(key=lambda t: (t[0], t[1]))
        merged: list[tuple[int, int, int]] = [segs[0]]
        for seg in segs[1:]:
            m = merged[-1]
            if seg[0] - m[1] <= gap_us:
                merged[-1] = (m[0], max(m[1], seg[1]), m[2] + seg[2])
            else:
                merged.append(seg)
        *flushed, last = merged
        # ms-floored event-time timer. If the newest session is already
        # closed per event time (its timer instant is at/behind the
        # watermark — possible when the whole batch was late data), flush
        # it now: the engine rejects timers <= watermark.
        timer_ms = (last[1] + gap_us) // 1000
        if timer_ms <= state.getCurrentWatermarkMs():
            flushed.append(last)
            if state.exists:
                state.remove()
        else:
            state.update(last)
            state.setTimeoutTimestamp(timer_ms)
        if flushed:
            yield emit(flushed)

    return stream.groupBy(key_col).applyInPandasWithState(
        sessionize,
        outputStructType=(
            f"{key_col} bigint, session_start_us bigint, "
            "session_end_us bigint, n_events bigint"
        ),
        stateStructType="s bigint, e bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

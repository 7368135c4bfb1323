"""The sustained-rate streaming bench (tools/bench_stream_rate.py) must
measure the workload it claims: the scoring expression is verified here in
batch mode against a pure-Python md5 replay, so the recorded rows/s figure
is for a real integer-classifier filter, not a degenerate pipeline."""

import hashlib
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_stream_rate import (  # noqa: E402
    CLS_BUCKETS,
    THRESH,
    TOKENS_PER_ROW,
    score_and_filter,
)


def _py_score(v: int) -> int:
    sm = 0
    for i in range(TOKENS_PER_ROW):
        tok = hashlib.md5(f"{v}_{i}".encode()).hexdigest()[:8]
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % CLS_BUCKETS
        sm += (b * 2654435761) % 2001
    return sm


def test_stream_rate_scoring_matches_python_replay(spark):
    n = 300
    df = spark.range(n).select(
        F.current_timestamp().alias("timestamp"), F.col("id").alias("value")
    )
    got = {r.value: r.sm for r in score_and_filter(df).collect()}
    expected = {
        v: _py_score(v)
        for v in range(n)
        if _py_score(v) > THRESH * TOKENS_PER_ROW
    }
    assert got == expected
    # the filter must be selective but non-trivial on this range — a
    # degenerate all-keep or all-drop pipeline would make the rows/s
    # figure meaningless
    assert 0 < len(expected) < n


def test_timer_sessionize_idle_pattern(spark):
    """The timer-sessionize mode's projection must give every key idle
    seconds (that's what forces the EventTimeTimeout path) while keeping
    the stream non-degenerate: each key active exactly
    (SESS_IDLE_EVERY - 1) of every SESS_IDLE_EVERY seconds."""
    from tools.bench_stream_rate import (
        SESS_IDLE_EVERY,
        SESS_KEYS,
        timer_sessionize_events,
    )

    seconds = SESS_IDLE_EVERY * 2
    rows_per_sec = SESS_KEYS  # every key appears once per second
    src = spark.range(seconds * rows_per_sec).select(
        F.timestamp_seconds(F.col("id") / rows_per_sec).alias("timestamp"),
        F.col("id").alias("value"),
    )
    got = (
        timer_sessionize_events(src)
        .groupBy("skey")
        .count()
        .collect()
    )
    assert len(got) == SESS_KEYS
    per_key = seconds - seconds // SESS_IDLE_EVERY
    assert {r["count"] for r in got} == {per_key}
    # per-key timestamps step in whole seconds, so us gaps within an
    # active stretch are 1s = 2x SESS_GAP_US: every batch burst is its
    # own session, closing continuously

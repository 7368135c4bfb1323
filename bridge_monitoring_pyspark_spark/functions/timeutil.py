"""Epoch arithmetic that is safe on TIMESTAMP_NTZ columns.

The driver testdata stores event time as parquet ``timestamp[us]`` with
``isAdjustedToUTC=false``, which Spark reads as TIMESTAMP_NTZ. NTZ rejects
both ``unix_millis`` (DATATYPE_MISMATCH) and ``cast(.. AS BIGINT)``
(CAST_WITHOUT_SUGGESTION), so every epoch conversion in the catalog goes
through these helpers instead: ``timestamp_diff`` against the NTZ epoch
literal is exact integer microseconds, timezone-free, and stays in codegen.

Semantics match the legacy TIMESTAMP forms the oracles mirror:
``epoch_seconds`` floors like ``cast(timestamp AS long)`` did (and like
DuckDB's ``CAST(floor(epoch(ts)) AS BIGINT)``); ``epoch_millis`` floors
like ``unix_millis``. The ``cast("timestamp_ntz")`` is a no-op on NTZ
inputs; on a zoned TIMESTAMP it re-interprets via the session timezone,
so callers on zoned columns must run with the UTC-pinned session
(session.py) for naive-as-UTC semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = "Column | str"


def _c(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _epoch_ntz() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_micros(ts) -> Column:
    """Exact integer microseconds since the naive epoch (long)."""
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), _c(ts).cast("timestamp_ntz"))


def epoch_millis(ts) -> Column:
    """Milliseconds since the naive epoch, floored (long) — the NTZ-safe
    replacement for ``F.unix_millis``."""
    return F.floor(epoch_micros(ts) / F.lit(1000.0)).cast("long")


def epoch_seconds(ts) -> Column:
    """Whole seconds since the naive epoch, floored (long) — the NTZ-safe
    replacement for ``F.col(ts).cast("long")`` on a timestamp column."""
    return F.floor(epoch_micros(ts) / F.lit(1000000.0)).cast("long")

"""Custom Python Data Source (Spark 4 API): the engine-native event
generator.

The reference ships a standalone Python process that writes JSON files for
Spark to pick up (reference: data_generator/data_generator.py:55-87). The
Spark-native re-expression is a first-class *data source*: the generator
runs inside the executors via the Python Data Source API — no landing-zone
hop, parallel by partition, usable from both ``spark.read`` and
``spark.readStream``.

Determinism: every field of event ``i`` is exact integer arithmetic on
``i`` (no RNG state, no wall clock), so any slice is reproducible from the
event id alone and a SQL oracle can regenerate the identical rows from a
``range(n)`` scan. The reference's uniform-random values and 0-60 s
event-time lag (data_generator.py:34-44) become Knuth-hash pseudo-noise —
same shape, replayable.

Scale notes (100 TB): batch reads split into ``numPartitions`` independent
id ranges — generation is embarrassingly parallel and the planner sees one
InputPartition per range (no shuffle, no skew). The stream reader hands
out offset ranges in ``batchSize`` steps; state is just the integer
offset, so recovery replays exactly (readBetweenOffsets).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "event_id bigint, bridge_id int, sensor_type string, value double, "
    "event_time timestamp, lag_seconds int"
)
SENSORS = ("temperature", "vibration", "tilt")
_BASE = datetime(1996, 1, 1, tzinfo=timezone.utc)
_KNUTH = 2654435761


def gen_event(i: int) -> tuple:
    """Event ``i`` — pure integer arithmetic, identical in any engine."""
    noise = (i * _KNUTH) % 100000
    lag = (i * _KNUTH) % 60
    return (
        i,
        i % 5 + 1,
        SENSORS[i % 3],
        noise / 1000.0,
        _BASE + timedelta(seconds=i),
        lag,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class BridgeEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield gen_event(i)


class BridgeEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset = next unread event id; each micro-batch is one id range."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch_size = int(options.get("batchSize", 200))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.batch_size, self.n)
        return iter([gen_event(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([gen_event(i) for i in range(start["i"], end["i"])])


class BridgeEventsDataSource(DataSource):
    """``spark.read.format("bridge_events").option("n", ...)`` — and the
    same name under ``readStream`` for micro-batch generation."""

    @classmethod
    def name(cls) -> str:
        return "bridge_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return BridgeEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return BridgeEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(BridgeEventsDataSource)

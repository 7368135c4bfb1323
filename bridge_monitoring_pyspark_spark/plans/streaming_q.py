"""Streaming queries in the catalog — each runs a real Structured Streaming
job (availableNow trigger) into a fresh temp dir, then returns the sink
read back as a batch DataFrame, so the driver can hash-compare streaming
output against a DuckDB oracle.

The gold oracle encodes append-mode + watermark semantics in closed form:
with availableNow the source drains in one batch and a no-data flush batch
emits every window whose end <= global watermark
(= min over branches of max event time − 2 min); windows newer than that
stay in state and are never emitted. See streaming/jobs.py docstring.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.jobs import run_bronze, run_gold, run_silver
from .bridge import EVENT_RULES, _VALID_SQL
from .catalog import Query


def _streaming_bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze ingest as a stream: null-split + date-partitioned valid sink
    (T3 append mode, T4 checkpointing, S6 parquet sink)."""
    out = tempfile.mkdtemp(prefix="eng_bronze_")
    paths = run_bronze(spark, sf_dir, out)
    return spark.read.parquet(paths["valid"]).select(
        "event_id", "ts", "user_id", "event_type", "value", "partition_date"
    )


_STREAMING_BRONZE_SQL = """
SELECT event_id, ts, user_id, event_type, value, CAST(ts AS DATE) AS partition_date
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL
"""


def _streaming_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver enrichment as a stream: DQ range split + broadcast
    stream-static LEFT join (J1 streaming form)."""
    out = tempfile.mkdtemp(prefix="eng_silver_")
    paths = run_silver(spark, sf_dir, out, EVENT_RULES)
    return spark.read.parquet(paths["valid"]).select(
        "event_id", "ts", "user_id", "event_type", "value", "name", "segment"
    )


_STREAMING_SILVER_SQL = f"""
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
       c.c_name AS name, c.c_mktsegment AS segment
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
WHERE {_VALID_SQL}
"""


def _streaming_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold as a stream: 3 watermarked windowed aggregates + 2 stream-stream
    joins (chained stateful operators, T1/T2/T7 + J2), append mode."""
    out = tempfile.mkdtemp(prefix="eng_gold_")
    path = run_gold(spark, sf_dir, out, window="1 hour", watermark="2 minutes")
    return spark.read.parquet(path).select(
        "window_start", "window_end", "avg_click_value", "max_view_value",
        "max_error_value",
    )


_STREAMING_GOLD_SQL = """
WITH wm AS (
  SELECT least(
    (SELECT max(ts) FROM events WHERE event_type = 'click'),
    (SELECT max(ts) FROM events WHERE event_type = 'view'),
    (SELECT max(ts) FROM events WHERE event_type = 'error')
  ) - INTERVAL 2 MINUTE AS w
),
clicks AS (
  SELECT date_trunc('hour', ts) AS ws, round(avg(value), 4) AS avg_click_value
  FROM events WHERE event_type = 'click' GROUP BY 1
), views AS (
  SELECT date_trunc('hour', ts) AS ws, round(max(value), 4) AS max_view_value
  FROM events WHERE event_type = 'view' GROUP BY 1
), errors AS (
  SELECT date_trunc('hour', ts) AS ws, round(max(value), 4) AS max_error_value
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT c.ws AS window_start, c.ws + INTERVAL 1 HOUR AS window_end,
       c.avg_click_value, v.max_view_value, e.max_error_value
FROM clicks c
JOIN views v ON c.ws = v.ws
JOIN errors e ON c.ws = e.ws
CROSS JOIN wm
WHERE c.ws + INTERVAL 1 HOUR <= wm.w
"""


QUERIES = [
    Query("streaming_bronze_valid", _streaming_bronze, _STREAMING_BRONZE_SQL,
          ("streaming", "S3", "S6", "T3", "T4")),
    Query("streaming_silver_enriched", _streaming_silver, _STREAMING_SILVER_SQL,
          ("streaming", "J1", "T6")),
    Query("streaming_gold_metrics", _streaming_gold, _STREAMING_GOLD_SQL,
          ("streaming", "T1", "T2", "T7", "J2")),
]

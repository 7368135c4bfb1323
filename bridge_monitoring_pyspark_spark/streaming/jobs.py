"""Structured Streaming jobs — the medallion pipeline, re-expressed.

Mirrors the reference's three pipeline programs (bronze ingest → silver
enrichment → gold aggregation; reference: pipelines/bronze_ingest.py,
silver_enrichment.py, gold_aggregation.py) with the design fixes SURVEY.md
§7 Phase 2 calls for:

* **availableNow trigger** for deterministic, testable runs (the reference
  uses the default ASAP trigger and must be killed by hand);
* **static schema registry** instead of gold's runtime batch-sampling of
  silver (reference: pipelines/gold_aggregation.py:27-28), removing the
  startup ordering dependency;
* **awaitAnyTermination** over all sinks instead of blocking on one query
  and ignoring failures of the rest (reference: pipelines/bronze_ingest.py:105);
* **deliberate partitionBy(partition_date)** where the reference leaked an
  accidental discovered `date` column (SURVEY.md §1.2);
* **RocksDB state store** (session.py) so window-agg + join state scales
  past executor heap at 100 TB.

Streaming semantics that matter for the oracle: with availableNow the file
source drains in one batch, then the engine runs a no-data flush batch once
the watermark advances — so append-mode output contains exactly the windows
whose end <= global watermark, where the global watermark is
min over watermarked branches of (max event time) − delay. That closed-form
is what plans/streaming_q.py's DuckDB oracles encode.

Each query gets its own checkpoint dir (exactly-once restart contract,
reference README.md:268-270).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import exact_avg
from ..operators.dq import SensorRules, split_valid_invalid

# Streaming-side schema for the driver's events table: parquet timestamp[us]
# with isAdjustedToUTC=false → TIMESTAMP_NTZ (see sources/readers.py).
# Deliberate asymmetry with load_table: the batch reader also converts the
# legacy TIMESTAMP(NANOS)-as-long layout, but this streaming schema pins NTZ
# µs only — on a nanos layout the stream fails loudly at first batch (schema
# mismatch) instead of silently mis-typing; extend here if that layout ever
# returns to the driver testdata.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# NTZ wall-clock → zoned TIMESTAMP at the same absolute instant (naive read
# as UTC). The *instant* is session-timezone-independent — timestamp_micros
# builds from epoch micros directly — but any later field extraction on the
# zoned value (to_date, hour, date_format) renders in the session timezone;
# derive calendar fields from the NTZ value BEFORE this retype when they
# must not shift with session tz (see run_bronze).
_NTZ_AS_UTC = (
    "timestamp_micros(timestampdiff("
    "MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
)


def read_events_stream_ntz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parquet source over the events table, timestamps left NTZ
    (S3 in SURVEY.md §2.1)."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENTS_RAW)
        # the driver testdata is a single file, not a directory; a glob path
        # makes the file-stream source anchor its basePath at the parent dir
        .load(f"{sf_dir}/events*.parquet")
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming events source with event-time re-typed NTZ → TIMESTAMP
    (naive-as-UTC instant), because watermarks require TIMESTAMP proper
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise)."""
    return read_events_stream_ntz(spark, sf_dir).withColumn("ts", F.expr(_NTZ_AS_UTC))


@contextmanager
def _stream_shuffle_partitions(spark: SparkSession, n: int | None):
    """Pin spark.sql.shuffle.partitions while a streaming query *starts*
    (the value is frozen into the checkpoint at creation). State-store
    partition count = shuffle partitions × stateful operators: size it to
    key cardinality and throughput, not to the batch default — a tumbling
    window keyed by a handful of groups gains nothing from 200 RocksDB
    instances per operator, while a 100 TB keyspace needs thousands."""
    if n is None:
        yield
        return
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _write(
    df: DataFrame, out_dir: str, name: str, available_now: bool, partition_by: str | None = None
):
    w = (
        df.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, name))
        .option("checkpointLocation", os.path.join(out_dir, f"_chk_{name}"))
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def write_json_landing(spark: SparkSession, sf_dir: str, landing_dir: str) -> None:
    """Materialize the events table as a JSON-lines landing zone with
    Hive-style date partitions — the reference's generator layout
    (data_generator/data_generator.py:72-81: streams/<sensor>/date=.../*.json).
    Test fixture only; production landing zones are written by producers."""
    from ..sources.readers import load_table

    # ts is NTZ: date_format renders its naive fields verbatim (no zone
    # pattern letter, so no session-tz dependence) and the literal 'Z'
    # stamps them as UTC — try_to_timestamp downstream recovers the same
    # absolute instant in any session timezone. (The earlier XXX pattern
    # rendered the *session* offset, which was only 'Z' under the
    # UTC-pinned session.)
    events = (
        load_table(spark, sf_dir, "events")
        .withColumn("date", F.to_date("ts"))
        .withColumn(
            "ts",
            F.concat(
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit("Z")
            ),
        )
    )
    events.write.mode("overwrite").partitionBy("date").json(landing_dir)


# Landing-zone schema: ts is an ISO-8601 string (parsed downstream — parse
# failure routes to quarantine), `date` arrives via partition discovery.
EVENTS_JSON = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def run_json_ingest(
    spark: SparkSession, landing_dir: str, out_dir: str, available_now: bool = True
) -> dict[str, str]:
    """Bronze ingest from the JSON landing zone (S1 streaming JSON source +
    S2 partition discovery; reference: pipelines/bronze_ingest.py:26-62):
    explicit schema, try_to_timestamp parse, null-split, date-partitioned
    valid sink."""
    raw = spark.readStream.schema(EVENTS_JSON).json(landing_dir)
    parsed = raw.withColumn("event_time_ts", F.try_to_timestamp(F.col("ts")))
    valid, invalid = split_valid_invalid(
        parsed, F.col("event_time_ts").isNotNull() & F.col("value").isNotNull()
    )
    queries = [
        _write(valid, out_dir, "json_bronze_valid", available_now, partition_by="date"),
        _write(invalid, out_dir, "json_bronze_rejected", available_now),
    ]
    if available_now:
        for q in queries:
            q.awaitTermination()
    # follow mode: return with the queries running — the caller (e.g. the
    # CLI's `all --follow`) starts every layer first, then blocks once on
    # spark.streams.awaitAnyTermination() so downstream layers aren't
    # starved by an upstream await.
    return {
        "valid": os.path.join(out_dir, "json_bronze_valid"),
        "rejected": os.path.join(out_dir, "json_bronze_rejected"),
    }


def run_silver_foreachbatch(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    rules: SensorRules,
    available_now: bool = True,
) -> dict[str, str]:
    """Silver DQ routing as ONE streaming query via foreachBatch: each
    micro-batch is persisted once and both branches write from it — halving
    source reads versus the two-query split (the trade the reference makes
    implicitly by running 4 sinks as 4 queries; at 100 TB the double scan
    is the bigger cost). Sink idempotence across retries comes from
    overwrite-by-batch-id directories."""
    events = read_events_stream(spark, sf_dir)
    valid_dir = os.path.join(out_dir, "fb_valid")
    rejected_dir = os.path.join(out_dir, "fb_rejected")
    cond = rules.valid_condition()

    def route(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.where(cond).write.mode("overwrite").parquet(
                f"{valid_dir}/batch_id={batch_id}"
            )
            batch_df.where(~cond).write.mode("overwrite").parquet(
                f"{rejected_dir}/batch_id={batch_id}"
            )
        finally:
            batch_df.unpersist()

    w = (
        events.writeStream.foreachBatch(route)
        .option("checkpointLocation", os.path.join(out_dir, "_chk_fb"))
    )
    if available_now:
        w = w.trigger(availableNow=True)
    q = w.start()
    if available_now:
        q.awaitTermination()
    # follow mode: return with the query running (see run_bronze note).
    return {"valid": valid_dir, "rejected": rejected_dir}


def run_bronze(
    spark: SparkSession, sf_dir: str, out_dir: str, available_now: bool = True
) -> dict[str, str]:
    """Bronze: derive partition_date, null-split, route valid/rejected to
    separate checkpointed sinks; valid is date-partitioned
    (reference: pipelines/bronze_ingest.py:44-103).

    partition_date comes from the NTZ wall clock *before* the zoned retype:
    to_date on a zoned TIMESTAMP renders in the session timezone, which
    would shift partition boundaries in a non-UTC session; to_date on NTZ
    is the naive calendar date, identical everywhere."""
    events = (
        read_events_stream_ntz(spark, sf_dir)
        .withColumn("partition_date", F.to_date("ts"))
        .withColumn("ts", F.expr(_NTZ_AS_UTC))
    )
    valid, invalid = split_valid_invalid(
        events, F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    queries = [
        _write(valid, out_dir, "bronze_valid", available_now, partition_by="partition_date"),
        _write(invalid.drop("partition_date"), out_dir, "bronze_rejected", available_now),
    ]
    if available_now:
        for q in queries:
            q.awaitTermination()
    # follow mode: return with the queries running — the caller (e.g. the
    # CLI's `all --follow`) starts every layer first, then blocks once on
    # spark.streams.awaitAnyTermination() so downstream layers aren't
    # starved by an upstream await.
    return {
        "valid": os.path.join(out_dir, "bronze_valid"),
        "rejected": os.path.join(out_dir, "bronze_rejected"),
    }


def run_silver(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    rules: SensorRules,
    available_now: bool = True,
) -> dict[str, str]:
    """Silver: per-type DQ range rules split + broadcast stream-static LEFT
    join against the customer dimension
    (reference: pipelines/silver_enrichment.py:70-143)."""
    events = read_events_stream(spark, sf_dir)
    valid, invalid = split_valid_invalid(events, rules.valid_condition())
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    enriched = valid.join(F.broadcast(dim), on="user_id", how="left")
    queries = [
        _write(enriched, out_dir, "silver_valid", available_now),
        _write(invalid, out_dir, "silver_rejected", available_now),
    ]
    if available_now:
        for q in queries:
            q.awaitTermination()
    # follow mode: return with the queries running — the caller (e.g. the
    # CLI's `all --follow`) starts every layer first, then blocks once on
    # spark.streams.awaitAnyTermination() so downstream layers aren't
    # starved by an upstream await.
    return {
        "valid": os.path.join(out_dir, "silver_valid"),
        "rejected": os.path.join(out_dir, "silver_rejected"),
    }


def run_gold(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 minutes",
    available_now: bool = True,
    shuffle_partitions: int | None = 4,
) -> str:
    """Gold: three watermarked tumbling-window aggregates stream-stream
    INNER-joined on the window struct, flattened, one checkpointed sink —
    the chained-stateful-operators flagship
    (reference: pipelines/gold_aggregation.py:52-118).

    shuffle_partitions defaults to 4: state-store instance count =
    partitions × stateful operators (3 aggs + 2 joins here), and the
    hourly-window key space is O(hundreds) — measured 14s → 5s at sf0.1
    going 8 → 4. Size it up with real key cardinality on a cluster."""
    events = read_events_stream(spark, sf_dir)
    win = F.window("ts", window)

    def branch(evt_type: str, agg, out_name: str) -> DataFrame:
        return (
            events.where(F.col("event_type") == evt_type)
            .withWatermark("ts", watermark)
            .groupBy(win.alias("window"))
            .agg(agg.alias(out_name))
        )

    # exact_avg (fixed-point sum + one division) instead of round(avg, 4):
    # order- and partitioning-independent, so restarts / repartitions of
    # this stateful job reproduce byte-identical gold output and the sf0.1
    # oracle replay has no rounding boundary (see functions/numeric.py).
    clicks = branch("click", exact_avg("value"), "avg_click_value")
    views = branch("view", F.max("value"), "max_view_value")
    errors = branch("error", F.max("value"), "max_error_value")
    joined = clicks.join(views, on="window", how="inner").join(
        errors, on="window", how="inner"
    )
    flat = joined.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "avg_click_value",
        "max_view_value",
        "max_error_value",
    )
    with _stream_shuffle_partitions(spark, shuffle_partitions):
        q = _write(flat, out_dir, "gold_metrics", available_now)
    if available_now:
        q.awaitTermination()
    # follow mode: return with the query running (see run_bronze note).
    return os.path.join(out_dir, "gold_metrics")


def run_gold_left_outer(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 minutes",
    available_now: bool = True,
    shuffle_partitions: int | None = 4,
) -> str:
    """Stream-stream LEFT OUTER join of two watermarked windowed aggregates
    — the outer-join extension of :func:`run_gold` (the reference only
    inner-joins, pipelines/gold_aggregation.py:82-99). Unmatched left
    windows emit null-padded once the watermark passes their window end;
    the error branch is filtered sparse (value > 90) so outer rows actually
    occur.

    Emission rule (verified empirically, and what the oracle encodes): a
    row emits iff window_end <= min(max ts of each branch) - watermark;
    matched rows carry the right aggregate, unmatched carry NULL — the
    outer-state eviction happens in the same commit that closes the
    window, so availableNow drains to the closed-form result."""
    events = read_events_stream(spark, sf_dir)
    win = F.window("ts", window)
    clicks = (
        events.where(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .groupBy(win.alias("window"))
        # deterministic fixed-point average — see run_gold / functions/numeric.py
        .agg(exact_avg("value").alias("avg_click_value"))
    )
    errors = (
        events.where((F.col("event_type") == "error") & (F.col("value") > 90))
        .withWatermark("ts", watermark)
        .groupBy(win.alias("window"))
        .agg(F.max("value").alias("max_error_value"))
    )
    flat = clicks.join(errors, on="window", how="left_outer").select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "avg_click_value",
        "max_error_value",
    )
    with _stream_shuffle_partitions(spark, shuffle_partitions):
        q = _write(flat, out_dir, "gold_outer", available_now)
    if available_now:
        q.awaitTermination()
    # follow mode: return with the query running (see run_bronze note).
    return os.path.join(out_dir, "gold_outer")

"""Streaming-layer tests: DQ routing completeness, batch/stream equivalence,
and append-mode watermark holdback."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.bridge import EVENT_RULES
from bridge_monitoring_pyspark_spark.sources.readers import load_table
from bridge_monitoring_pyspark_spark.streaming.jobs import run_bronze, run_gold, run_silver

from testdata_paths import SF_SMOKE


def test_bronze_routing_partitions_completely(spark):
    out = tempfile.mkdtemp(prefix="t_bronze_")
    paths = run_bronze(spark, SF_SMOKE, out)
    valid = spark.read.parquet(paths["valid"])
    total = load_table(spark, SF_SMOKE, "events").count()
    # testdata has no null ts/value rows: rejected sink exists but is empty,
    # so the valid branch carries everything
    assert valid.count() == total
    assert "partition_date" in valid.columns  # deliberate partitionBy


def test_silver_stream_equals_batch(spark):
    out = tempfile.mkdtemp(prefix="t_silver_")
    paths = run_silver(spark, SF_SMOKE, out, EVENT_RULES)
    stream_valid = spark.read.parquet(paths["valid"])
    events = load_table(spark, SF_SMOKE, "events")
    batch_valid = events.where(EVENT_RULES.valid_condition())
    assert stream_valid.count() == batch_valid.count()
    # join produced dimension attributes
    assert stream_valid.where(F.col("name").isNotNull()).count() > 0
    # rejected complement
    rejected = spark.read.parquet(paths["rejected"]) if batch_valid.count() < events.count() else None
    if rejected is not None:
        assert rejected.count() == events.count() - batch_valid.count()


def test_gold_watermark_holds_back_open_windows(spark):
    out = tempfile.mkdtemp(prefix="t_gold_")
    path = run_gold(spark, SF_SMOKE, out, window="1 hour", watermark="2 minutes")
    got = spark.read.parquet(path)
    events = load_table(spark, SF_SMOKE, "events")
    batch = (
        events.where(F.col("event_type").isin("click", "view", "error"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_types"))
        .where(F.col("n_types") == 3)
    )
    n_batch = batch.count()
    n_stream = got.count()
    # append mode: stream emits only watermark-closed windows — strictly
    # fewer than batch (the final window is always still open), never more
    assert 0 < n_stream < n_batch + 1
    assert n_stream >= n_batch - 2  # at most the tail windows held back

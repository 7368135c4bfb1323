"""Unit tests for the reusable operator library."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.operators.dq import SensorRules, split_valid_invalid
from bridge_monitoring_pyspark_spark.operators.enrich import derive_event_times, enrich_with_dim
from bridge_monitoring_pyspark_spark.operators.topk import top_k, top_k_per_group


def test_split_partitions_completely(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id int, v double"
    )
    valid, invalid = split_valid_invalid(df, F.col("v").isNotNull() & (F.col("v") >= 0))
    assert {r.id for r in valid.collect()} == {1}
    assert {r.id for r in invalid.collect()} == {2, 3}
    assert valid.count() + invalid.count() == df.count()


def test_sensor_rules_condition_and_sql_agree(spark):
    rules = SensorRules(
        type_col="t", value_col="v", time_col="ts",
        ranges={"a": (0.0, 10.0), "b": (None, 5.0)},
    )
    df = spark.createDataFrame(
        [("a", 5.0, "x"), ("a", 11.0, "x"), ("b", -99.0, "x"),
         ("b", 6.0, "x"), ("c", 123.0, "x"), ("a", None, "x"), ("a", 1.0, None)],
        "t string, v double, ts string",
    )
    via_col = {tuple(r) for r in df.where(rules.valid_condition()).collect()}
    via_sql = {tuple(r) for r in df.where(F.expr(rules.valid_sql())).collect()}
    assert via_col == via_sql
    assert ("a", 5.0, "x") in via_col and ("a", 11.0, "x") not in via_col
    assert ("b", -99.0, "x") in via_col  # one-sided rule: no lower bound
    assert ("c", 123.0, "x") in via_col  # unruled type passes null-guard only
    assert ("a", None, "x") not in via_col and ("a", 1.0, None) not in via_col


def test_derive_event_times_null_on_unparseable(spark):
    df = spark.createDataFrame(
        [("2024-01-01T00:00:07.123456Z", "2024-01-01T00:00:09Z"),
         ("not-a-time", "2024-01-01T00:00:09Z")],
        "event_time string, ingest_time string",
    )
    out = derive_event_times(df)
    rows = out.orderBy("event_time").collect()
    assert rows[0].event_time_ts is not None and rows[0].partition_date is not None
    assert rows[1].event_time_ts is None and rows[1].partition_date is None


def test_enrich_with_dim_broadcast_plan(spark):
    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    out = enrich_with_dim(fact, dim, on="k", how="left")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 100
    assert out.where(F.col("name").isNotNull()).count() == 2


def test_top_k_and_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 5), ("g1", 3), ("g2", 9), ("g2", 2)], "g string, v int"
    )
    top = top_k(df, [F.col("v").desc()], 2).collect()
    assert [r.v for r in top] == [9, 5]
    per = top_k_per_group(df, ["g"], [F.col("v").desc()], 1)
    assert {(r.g, r.v) for r in per.select("g", "v").collect()} == {("g1", 5), ("g2", 9)}

"""Stream-stream LEFT SEMI and FULL OUTER join witnesses."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def test_semi_join_equals_batch_exists(spark):
    got = all_queries()["streaming_semi_join"].build(spark, SF_SMOKE).collect()
    assert got
    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("c_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    batch = (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
            "left_semi",
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept_clicks"),
            F.min("event_id").alias("first_click"),
        )
        .orderBy("user_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]


def test_semi_join_emits_each_click_once(spark):
    # a click with many matching purchases must still count once
    ev = load_table(spark, SF_SMOKE, "events")
    n_clicks_with_match = (
        all_queries()["streaming_semi_join"]
        .build(spark, SF_SMOKE)
        .agg(F.sum("n_kept_clicks"))
        .collect()[0][0]
    )
    n_clicks_total = ev.where(F.col("event_type") == "click").count()
    assert 0 < n_clicks_with_match <= n_clicks_total


def test_full_outer_has_both_unmatched_directions(spark):
    rows = (
        all_queries()["streaming_full_outer_join"].build(spark, SF_SMOKE).collect()
    )
    assert rows
    click_only = [r for r in rows if r.max_error_value is None]
    error_only = [r for r in rows if r.avg_click_value is None]
    matched = [
        r
        for r in rows
        if r.avg_click_value is not None and r.max_error_value is not None
    ]
    # the error branch is filtered sparse so all three classes must occur
    assert click_only and matched
    # error-only windows exist only if some hour had a >90 error and no
    # click at all — rare at smoke scale; assert the class is *consistent*
    for r in error_only:
        assert r.max_error_value > 90
    # no fully-null rows can exist in a full outer of two aggregates
    assert all(
        r.avg_click_value is not None or r.max_error_value is not None
        for r in rows
    )


def test_full_outer_window_bounds_contiguous(spark):
    rows = (
        all_queries()["streaming_full_outer_join"].build(spark, SF_SMOKE).collect()
    )
    for r in rows:
        assert (r.window_end - r.window_start).total_seconds() == 3600

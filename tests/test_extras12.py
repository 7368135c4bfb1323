"""Tests for the calendar-spine pair: the WITH RECURSIVE form and the
idiomatic sequence()+explode form must be row-identical (same bounds, same
left-join semantics, zero-event days included)."""

from __future__ import annotations

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries

from testdata_paths import SF_SMOKE


def test_spine_forms_agree(spark):
    qs = all_queries()
    rec = qs["recursive_calendar_spine"].build(spark, SF_SMOKE).collect()
    seq = qs["sequence_calendar_spine"].build(spark, SF_SMOKE).collect()
    assert len(rec) > 0
    assert [tuple(r) for r in rec] == [tuple(r) for r in seq]


def test_spine_is_gap_free(spark):
    from datetime import timedelta

    rows = all_queries()["sequence_calendar_spine"].build(spark, SF_SMOKE).collect()
    days = [r.day for r in rows]
    assert all(
        (b - a) == timedelta(days=1) for a, b in zip(days, days[1:])
    ), "spine has gaps or duplicates"

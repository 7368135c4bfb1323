"""Tests for the eighth extension wave: conservation sanity for the
histogram and sessionization beyond the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE

CATALOG = all_queries()


def test_histogram_conserves_rows(spark):
    """Every event lands in exactly one bucket: the bar heights must sum
    to the table cardinality, per event type."""
    e = load_table(spark, SF_SMOKE, "events")
    want = {r.event_type: r.n for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    hist = CATALOG["value_histogram"].build(spark, SF_SMOKE).collect()
    got: dict[str, int] = {}
    for r in hist:
        got[r.event_type] = got.get(r.event_type, 0) + r.n
    assert got == want


def test_sessions_conserve_events(spark):
    """Sum over users of (n_sessions * avg_events_per_session) must equal
    the event count — sessionization may not drop or duplicate rows."""
    rows = CATALOG["session_islands"].build(spark, SF_SMOKE).collect()
    total = sum(r.n_sessions * r.avg_events_per_session for r in rows)
    want = load_table(spark, SF_SMOKE, "events").count()
    # avg is rounded to 4dp in the query, so allow the accumulated slack
    slack = 0.00005 * sum(r.n_sessions for r in rows) + 0.5
    assert abs(total - want) <= slack, (total, want, slack)
    assert all(r.n_sessions >= 1 and r.max_span_s >= 0 for r in rows)

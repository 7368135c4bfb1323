"""Tests for the sixth extension wave: approx_percentile error bound vs
exact percentiles, and bitmap-distinct exactness (belt-and-braces beyond
the oracle hash)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def test_approx_percentile_tracks_exact(spark):
    """The GK guarantee is on RANK, not value: the returned estimate is an
    actual data point whose rank must sit within eps·n of the target
    quantile (eps = 1/accuracy = 1e-4, so effectively exact-rank here; we
    allow 2% plus the discreteness slack of one row)."""
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    groups = {
        r.o_orderpriority: sorted(x.o_totalprice for x in rows)
        for r in orders.select("o_orderpriority").distinct().collect()
        for rows in [
            orders.where(F.col("o_orderpriority") == r.o_orderpriority).collect()
        ]
    }
    approx = all_queries()["approx_percentile_quantity"].build(spark, SF_SMOKE).collect()
    assert {r.o_orderpriority for r in approx} == set(groups)
    for r in approx:
        vals = groups[r.o_orderpriority]
        n = len(vals)
        assert r.n_orders == n
        for est, q in zip((r.p25, r.p50, r.p75), (0.25, 0.5, 0.75)):
            frac = sum(1 for v in vals if v <= est) / n
            assert abs(frac - q) <= 0.02 + 1.0 / n, (r.o_orderpriority, q, est, frac)


def test_bitmap_distinct_is_exact(spark):
    """Bitmap popcount distinct must EQUAL count_distinct (it is not a
    sketch), including the OR-merged ALL row."""
    e = load_table(spark, SF_SMOKE, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = e.select("user_id").distinct().count()
    got = {
        r.event_type: r.n_users
        for r in all_queries()["bitmap_exact_distinct"].build(spark, SF_SMOKE).collect()
    }
    assert got == exact

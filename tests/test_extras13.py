"""Tests for the fourteenth extension wave: time-series gapfill /
interpolation, funnel/cohort analytics, blocked fuzzy matching, Z-order."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras13 import _zorder_bits
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def _py_morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_bits_matches_python_reference(spark):
    pts = [(0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (200, 13)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = df.select(_zorder_bits(F.col("x"), F.col("y"), 8).alias("z")).collect()
    assert [r.z for r in got] == [_py_morton(x, y) for x, y in pts]


def test_zorder_buckets_bound_both_spans(spark):
    # bucket = z >> 10 fixes the top 3 bits of each coordinate, so every
    # bucket confines x AND y to a 32-wide range — the data-skipping win.
    rows = all_queries()["zorder_curve_layout"].build(spark, SF_SMOKE).collect()
    assert rows and all(r.x_span <= 31 and r.y_span <= 31 for r in rows)


def test_interpolation_matches_pandas_reference(spark):
    got = {
        r.event_id: r.value_interp
        for r in all_queries()["interpolate_missing_values"]
        .build(spark, SF_SMOKE).collect()
    }
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
    )
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    masked = ev.event_id % 7 == 0
    t_ms = ev.ts.astype("int64") // 10**6
    obs_v = ev.value.where(~masked)
    obs_t = t_ms.where(~masked)
    g = ev.user_id
    pv, pt = [s.groupby(g).apply(lambda x: x.shift(1).ffill())
              .reset_index(level=0, drop=True) for s in (obs_v, obs_t)]
    nv, nt = [s.groupby(g).apply(lambda x: x.shift(-1).bfill())
              .reset_index(level=0, drop=True) for s in (obs_v, obs_t)]
    want = pv + (nv - pv) * (t_ms - pt) / (nt - pt)
    want = want.where(pv.notna(), nv).where(nv.notna(), pv)
    want = want[masked]
    ids = ev.event_id[masked]
    assert set(got) == set(ids)
    for eid, w in zip(ids, want):
        assert abs(got[eid] - round(w, 4)) < 1e-6, eid


def test_gapfill_carries_last_observation(spark):
    rows = all_queries()["gapfill_hourly_ffill"].build(spark, SF_SMOKE).collect()
    last_seen: dict[str, float] = {}
    hours: dict[str, list] = {}
    for r in rows:  # already ordered by (event_type, hour)
        hours.setdefault(r.event_type, []).append(r.hour)
        if r.was_gap:
            assert r.value_ffill == last_seen.get(r.event_type)
        else:
            last_seen[r.event_type] = r.value_ffill
    for hs in hours.values():  # spine must be contiguous hourly
        assert all((b - a).total_seconds() == 3600 for a, b in zip(hs, hs[1:]))


def test_funnel_stage_counts_monotone(spark):
    r = all_queries()["funnel_conversion"].build(spark, SF_SMOKE).collect()[0]
    assert r.n_viewed >= r.n_clicked >= r.n_purchased > 0
    assert 0.0 <= r.conv_purchase <= 1.0 and 0.0 <= r.conv_click <= 1.0


def test_cohort_offset_zero_covers_every_user(spark):
    rows = all_queries()["cohort_retention"].build(spark, SF_SMOKE).collect()
    n_users = load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows if r.day_offset == 0) == n_users
    cum = all_queries()["cumulative_adoption"].build(spark, SF_SMOKE).collect()
    finals = {}
    for r in cum:  # ordered by (event_type, day): keep the last cum value
        finals[r.event_type] = r.cum_users
        assert r.n_new > 0
    per_type = dict(
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    assert finals == per_type

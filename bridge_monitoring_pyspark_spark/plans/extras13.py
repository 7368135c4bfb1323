"""Fourteenth extension wave: warehouse time-series analytics, entity
resolution, and multi-dimensional data layout.

The reference's notebook stops at per-minute counts and top-k
(`demo.ipynb` cells `189cedd1`, `5b90cce0`); this wave adds the analytics
an operations team would run next over the same event history — gap-free
forward-filled series, interpolation of masked readings, funnel and cohort
breakdowns — plus two 100 TB-scale staples the LLM-data north star needs:
blocked fuzzy matching (entity resolution by edit distance) and Z-order
curve layout for multi-dimensional data skipping.

Scale notes are per-query docstrings; the shared theme is that every
operator here is pure DataFrame/window algebra (whole-stage codegen,
no Python in the hot path) and every spine/dimension side is broadcast.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import exact_avg
from ..functions.timeutil import epoch_millis
from ..sources.readers import load_table
from .catalog import Query


def _gapfill_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free hourly series per event type with forward fill: build the
    hour spine with ``sequence`` (driver-free, no collect), cross-join the
    tiny type dimension (broadcast — the grid is hours x types regardless
    of fact size), left-join the aggregated facts, then ``last(...,
    ignorenulls=True)`` over an unbounded-preceding frame carries the most
    recent observation across gaps. The expensive side (the hourly agg)
    shuffles once on (event_type, hour); the window re-uses that
    partitioning's key prefix so the sort is per-type only."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        # deterministic fixed-point average — no summation-order rounding
        # boundary at any sf (see functions/numeric.py)
        .agg(exact_avg("value").alias("avg_value"))
    )
    spine = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    )
    types = ev.select("event_type").distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.last("avg_value", ignorenulls=True).over(w).alias("value_ffill"),
            F.col("avg_value").isNull().alias("was_gap"),
        )
        .orderBy("event_type", "hour")
    )


_GAPFILL_SQL = """
WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
           FROM events),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                  sum(round(value * 100, 0)) / (100 * count(value)) AS avg_value
           FROM events GROUP BY 1, 2)
SELECT t.event_type, s.hour,
       last_value(h.avg_value IGNORE NULLS) OVER (
         PARTITION BY t.event_type ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       h.avg_value IS NULL AS was_gap
FROM spine s CROSS JOIN types t
LEFT JOIN hourly h ON h.event_type = t.event_type AND h.hour = s.hour
ORDER BY t.event_type, s.hour
"""


def _interpolate_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of masked sensor readings: a deterministic
    mask (event_id % 7 == 0) nulls ~1/7 of values; each masked row is
    reconstructed from its nearest non-null neighbours in event-time order
    within the user's series — ``last(ignorenulls)`` over the preceding
    frame and ``first(ignorenulls)`` over the following frame give the
    bracketing (time, value) pairs, and the value is the time-weighted
    blend. Endpoints degrade to nearest-neighbour fill. One shuffle on
    user_id serves all four window calls (same partitioning + ordering);
    everything stays in codegen — no Python, no driver round-trips."""
    ev = load_table(spark, sf_dir, "events")
    masked = F.col("event_id") % 7 == 0
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        epoch_millis("ts").alias("t_ms"),
        F.when(masked, None).otherwise(F.col("value")).alias("obs_v"),
        F.when(masked, None).otherwise(epoch_millis("ts")).alias("obs_t"),
        masked.alias("was_masked"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nbrs = base.select(
        "event_id",
        "t_ms",
        "was_masked",
        F.last("obs_v", ignorenulls=True).over(wp).alias("pv"),
        F.last("obs_t", ignorenulls=True).over(wp).alias("pt"),
        F.first("obs_v", ignorenulls=True).over(wn).alias("nv"),
        F.first("obs_t", ignorenulls=True).over(wn).alias("nt"),
    )
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("t_ms") - F.col("pt"))
            / (F.col("nt") - F.col("pt"))
        )
    )
    return (
        nbrs.where("was_masked")
        .select("event_id", F.round(interp, 4).alias("value_interp"))
        .orderBy("event_id")
    )


_INTERPOLATE_SQL = """
WITH base AS (
  SELECT event_id, user_id, ts, epoch_ms(ts) AS t_ms,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS obs_v,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE epoch_ms(ts) END AS obs_t,
         event_id % 7 = 0 AS was_masked
  FROM events),
nbrs AS (
  SELECT event_id, t_ms, was_masked,
         last_value(obs_v IGNORE NULLS) OVER wp AS pv,
         last_value(obs_t IGNORE NULLS) OVER wp AS pt,
         first_value(obs_v IGNORE NULLS) OVER wn AS nv,
         first_value(obs_t IGNORE NULLS) OVER wn AS nt
  FROM base
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
SELECT event_id,
       round(CASE WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  WHEN nt = pt THEN pv
                  ELSE pv + (nv - pv) * (t_ms - pt) / (nt - pt) END, 4)
         AS value_interp
FROM nbrs WHERE was_masked ORDER BY event_id
"""


def _funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-stage funnel (view -> click -> purchase):
    stage N counts users whose earliest qualifying event is later than
    their stage N-1 entry time. Each stage is a groupBy on user_id plus a
    join back to the fact; the per-user stage tables are tiny relative to
    the fact, so they broadcast — three fact scans, zero fact shuffles.
    At 100 TB the fact scans dominate and are embarrassingly parallel;
    a single-scan alternative (conditional min-aggregation per user) is
    the fallback when even three scans are too dear."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.join(F.broadcast(s1), "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.join(F.broadcast(s2), "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count("*").alias("n_viewed"))
        .crossJoin(s2.agg(F.count("*").alias("n_clicked")))
        .crossJoin(s3.agg(F.count("*").alias("n_purchased")))
        .select(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            F.round(F.col("n_clicked") / F.col("n_viewed"), 4).alias("conv_click"),
            F.round(F.col("n_purchased") / F.col("n_clicked"), 4).alias("conv_purchase"),
        )
    )


_FUNNEL_SQL = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_viewed,
       CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_clicked,
       CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchased,
       round((SELECT count(*) FROM s2) / (SELECT count(*) FROM s1), 4)
         AS conv_click,
       round((SELECT count(*) FROM s3) / (SELECT count(*) FROM s2), 4)
         AS conv_purchase
"""


def _cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by first-seen day,
    counted on each subsequent active day as (cohort_day, day_offset)
    cells. The distinct (user, day) reduction happens FIRST — at 100 TB
    that collapses the fact by orders of magnitude before any join — and
    the per-user cohort table broadcasts into it."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        active.join(F.broadcast(firsts), "user_id")
        .select(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


_COHORT_SQL = """
WITH firsts AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                FROM events GROUP BY 1),
active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.d) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active a JOIN firsts f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _cumulative_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-distinct-users-over-time without a distinct-over-window
    (which neither engine supports): each (type, user)'s FIRST day is an
    ordinary min-aggregation, daily first-timer counts are a second
    aggregation, and a running sum turns them into the cumulative adopter
    curve. Two map-side-combinable shuffles + a 5-partition window —
    the scalable rewrite of ``count(DISTINCT x) OVER (ORDER BY day)``."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = firsts.groupBy("event_type", "day").agg(F.count("*").alias("n_new"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "n_new",
        F.sum("n_new").over(w).alias("cum_users"),
    ).orderBy("event_type", "day")


_CUMULATIVE_SQL = """
WITH firsts AS (SELECT event_type, user_id, min(CAST(ts AS DATE)) AS day
                FROM events GROUP BY 1, 2),
daily AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_new
          FROM firsts GROUP BY 1, 2)
SELECT event_type, day, n_new,
       CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily ORDER BY event_type, day
"""


def _fuzzy_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked edit distance: part pairs in the same
    brand block whose names are within levenshtein 3, reported per block.
    The plan exploits that the expensive predicate depends only on the
    (low-cardinality) name: levenshtein runs on DISTINCT (brand, name)
    pairs — thousands, not the millions of part-level pairs — and
    part-level pair counts are recovered by multiplying the name
    multiplicities (sum-of-products aggregation). A length-gap lower
    bound (levenshtein >= |len(a)-len(b)|) prunes candidates before the
    O(n*m) distance. At 100 TB this dedupe-then-weight shape is the
    difference between scoring ~10^6 and ~10^12 candidate pairs; when
    even distinct-value blocks skew, LSH (neardup_minhash_lsh_pairs)
    takes over. The oracle computes the same result the naive way, at
    part level."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_brand", "p_name")
        .agg(F.count("*").alias("c"))
    )
    a, b = names.alias("a"), names.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    name_pairs = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        # length-gap lower bound: cheap codegen filter ahead of the O(n*m)
        # edit-distance; implied by lev <= 3, so results are unchanged
        .where(F.abs(F.length("a.p_name") - F.length("b.p_name")) <= 3)
        .where(lev <= 3)
        .select(
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_name").alias("left_name"),
            F.col("a.c").alias("c1"),
            F.col("b.c").alias("c2"),
            lev.alias("lev"),
        )
    )
    per_brand = name_pairs.groupBy("p_brand").agg(
        F.sum(F.col("c1") * F.col("c2")).alias("n_pairs"),
        F.round(
            F.sum(F.col("lev") * F.col("c1") * F.col("c2"))
            / F.sum(F.col("c1") * F.col("c2")),
            4,
        ).alias("avg_dist"),
    )
    left_parts = (
        name_pairs.select("p_brand", "left_name", "c1")
        .distinct()
        .groupBy("p_brand")
        .agg(F.sum("c1").alias("n_left_parts"))
    )
    return per_brand.join(left_parts, "p_brand").orderBy("p_brand")


_FUZZY_SQL = """
WITH pairs AS (
  SELECT a.p_brand, levenshtein(a.p_name, b.p_name) AS lev, a.p_partkey AS lk
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 3)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(lev), 4) AS avg_dist,
       CAST(count(DISTINCT lk) AS BIGINT) AS n_left_parts
FROM pairs GROUP BY 1 ORDER BY 1
"""


def _zorder_bits(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low `bits` of x (even positions) and y (odd)."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return functools.reduce(lambda l, r: l.bitwiseOR(r), parts)


def _zorder_curve_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve layout audit: interleaving the bits of two
    clustering columns gives a 1-D sort key that keeps BOTH dimensions
    locally dense, so min/max file statistics prune on either predicate —
    the standard multi-dimensional data-skipping layout (Delta/Iceberg
    OPTIMIZE ZORDER). Here orders are mapped to a 16-bit Morton key over
    (custkey low byte, orderkey low byte) and bucketed into 64 curve
    segments; per-bucket coordinate spans stay near 32 (vs ~255 for a
    naive single-column sort), which is the quantity file-skipping cares
    about. Pure bit-twiddling in codegen — this exact expression is what
    a `repartitionByRange(zkey).sortWithinPartitions(zkey)` writer would
    use at 100 TB."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").bitwiseAND(F.lit(255)).alias("x"),
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("y"),
    )
    z = _zorder_bits(F.col("x"), F.col("y"), 8)
    return (
        o.select("x", "y", F.shiftright(z, 10).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
        .orderBy("bucket")
    )


def _zorder_oracle() -> str:
    terms = []
    for i in range(8):
        terms.append(f"((((o_custkey & 255) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((o_orderkey & 255) >> {i}) & 1) << {2 * i + 1})")
    zexpr = " | ".join(terms)
    return f"""
WITH m AS (
  SELECT o_custkey & 255 AS x, o_orderkey & 255 AS y,
         ({zexpr}) >> 10 AS bucket
  FROM orders)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
       max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
FROM m GROUP BY 1 ORDER BY 1
"""


QUERIES = [
    Query("gapfill_hourly_ffill", _gapfill_hourly_ffill, _GAPFILL_SQL,
          ("timeseries", "window", "gapfill")),
    Query("interpolate_missing_values", _interpolate_missing, _INTERPOLATE_SQL,
          ("timeseries", "window", "imputation")),
    Query("funnel_conversion", _funnel_conversion, _FUNNEL_SQL,
          ("analytics", "funnel")),
    Query("cohort_retention", _cohort_retention, _COHORT_SQL,
          ("analytics", "cohort")),
    Query("cumulative_adoption", _cumulative_adoption, _CUMULATIVE_SQL,
          ("analytics", "window")),
    Query("fuzzy_blocked_pairs", _fuzzy_blocked_pairs, _FUZZY_SQL,
          ("dedup", "entity-resolution", "blocking")),
    Query("zorder_curve_layout", _zorder_curve_layout, _zorder_oracle(),
          ("layout", "data-skipping", "scale")),
]

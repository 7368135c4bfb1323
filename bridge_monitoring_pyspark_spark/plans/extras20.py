"""Non-equi join scale paths: the banded pure-range join and the
bounded-lookback (tolerance) LEFT as-of.

operators/joins.py's scale notes have always said the quiet part: a range
predicate with no equi conjunct degenerates to BroadcastNestedLoopJoin —
one side materialized on every executor, |A|x|B| compares — and the fix is
to manufacture an equi key by bucketing time into coarse bands. This
module witnesses that fix (operators/joins.py:banded_range_join): every
click opens a 10-minute window, every purchase is a point, and the match
runs as an equi-join on 10-minute bands (fan-out <= 2 copies per click)
with the exact predicate as a post-filter. Identical results to the theta
join, so the DuckDB oracle is simply the naive BETWEEN join; pytest
asserts row-level equality against Spark's own nested-loop plan and that
the banded physical plan contains no nested-loop/cartesian node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join, banded_range_join
from ..sources.readers import load_table
from .catalog import Query

RANGE_WINDOW_MIN = 10  # click window length (minutes)
BAND_SECONDS = 600  # band width = window span -> fan-out <= 2 bands/click
ASOF_TOLERANCE_DAYS = 5  # bounded as-of lookback


def _clicks_and_purchases(spark: SparkSession, sf_dir: str):
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        (F.col("ts") + F.expr(f"INTERVAL {RANGE_WINDOW_MIN} MINUTES")).alias("c_hi"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    return clicks, purchases


def _range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (click, purchase) pair with the purchase inside the click's
    10-minute window, across ALL users (no equi key exists), aggregated to
    per-day match statistics. Both sides scale with the corpus; the banded
    plan keeps them hash-partitioned."""
    clicks, purchases = _clicks_and_purchases(spark, sf_dir)
    pairs = banded_range_join(
        clicks,
        purchases,
        lo=F.col("c_ts"),
        hi=F.col("c_hi"),
        point_ts=F.col("p_ts"),
        band_seconds=BAND_SECONDS,
    )
    return (
        pairs.groupBy(F.to_date("c_ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("click_id").alias("n_clicks_matched"),
            F.countDistinct("purchase_id").alias("n_purchases_matched"),
        )
        .orderBy("day")
    )


_RANGE_BANDED_SQL = f"""
WITH c AS (SELECT event_id AS click_id, ts AS c_ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT click_id, c_ts, purchase_id
  FROM c JOIN p ON p.p_ts >= c.c_ts
               AND p.p_ts <= c.c_ts + INTERVAL {RANGE_WINDOW_MIN} MINUTE
)
SELECT CAST(c_ts AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks_matched,
       CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases_matched
FROM pairs
GROUP BY CAST(c_ts AS DATE)
ORDER BY day
"""


def _asof_tolerance_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback LEFT as-of (pandas ``merge_asof(tolerance=...)``):
    each event takes its user's most recent order no more than 5 days old;
    events with no order in the window survive with NULLs. The tolerance is
    the scale lever — the join filter caps each event's candidate set at a
    5-day slice instead of the user's entire order history."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    o = load_table(spark, sf_dir, "orders")
    out = asof_join(
        e,
        o,
        left_key=F.col("user_id"),
        right_key=F.col("o_custkey"),
        left_time=F.col("ts"),
        right_time=F.col("o_orderdate"),
        left_row_id=["event_id"],
        tiebreak=[F.col("o_orderkey").desc()],
        tolerance=F.expr(f"INTERVAL {ASOF_TOLERANCE_DAYS} DAYS"),
        how="left",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("recent_orderkey"),
        F.col("o_orderdate").alias("recent_orderdate"),
    ).orderBy("event_id")


_ASOF_TOL_SQL = f"""
SELECT e.event_id, e.user_id,
       o.o_orderkey AS recent_orderkey, o.o_orderdate AS recent_orderdate
FROM events e LEFT JOIN orders o
  ON o.o_custkey = e.user_id
 AND o.o_orderdate <= e.ts
 AND o.o_orderdate >= e.ts - INTERVAL {ASOF_TOLERANCE_DAYS} DAY
WHERE e.event_id < 500
QUALIFY row_number() OVER (
    PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
ORDER BY e.event_id
"""


QUERIES = [
    Query("range_join_banded", _range_join_banded, _RANGE_BANDED_SQL,
          ("join", "range", "banded", "scale_path")),
    Query("asof_tolerance_left", _asof_tolerance_left, _ASOF_TOL_SQL,
          ("join", "asof", "tolerance", "outer")),
]

"""Thirteenth extension wave: recursive CTEs (WITH RECURSIVE, Spark 4).

Spark's recursive CTE currently supports UNION ALL recursion only, which
rules out fixpoint transitive closure over cyclic graphs (that stays with
the iterative DataFrame loop in `neardup_components`); the natural
UNION ALL shape is monotone generation — here, a gap-free calendar spine
driven by the data's own bounds, the warehouse pattern for "report every
day, including days with no events". Both engines run the same recursive
construction, so the oracle also proves termination-bound parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .catalog import Query


def _recursive_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free daily activity report via WITH RECURSIVE: the anchor is
    the corpus min date, each step adds one day up to the max (the bound
    is a scalar subquery, so no driver collect), and a LEFT JOIN brings in
    per-day counts — zero-event days survive. Recursion depth = calendar
    span in days, independent of row count: the spine costs the same at
    100 TB as at 1 MB, and the heavy side joins once, hash-partitioned on
    the date."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_for_cal")
    return spark.sql(
        """
        WITH RECURSIVE
        b AS (
          SELECT to_date(min(ts)) AS lo, to_date(max(ts)) AS hi
          FROM events_for_cal
        ),
        cal(day) AS (
          SELECT lo AS day FROM b
          UNION ALL
          SELECT date_add(day, 1) AS day FROM cal WHERE day < (SELECT hi FROM b)
        ),
        daily AS (
          SELECT to_date(ts) AS day,
                 count(*) AS n_events,
                 round(sum(value), 4) AS sum_value
          FROM events_for_cal
          GROUP BY to_date(ts)
        )
        SELECT cal.day,
               CAST(coalesce(daily.n_events, 0) AS BIGINT) AS n_events,
               coalesce(daily.sum_value, 0.0) AS sum_value
        FROM cal LEFT JOIN daily ON cal.day = daily.day
        ORDER BY cal.day
        """
    )


_CAL_SPINE_SQL = """
WITH RECURSIVE
b AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi FROM events),
cal(day) AS (
  SELECT lo AS day FROM b
  UNION ALL
  SELECT day + INTERVAL 1 DAY FROM cal WHERE day < (SELECT hi FROM b)
),
daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
         round(sum(value), 4) AS sum_value
  FROM events
  GROUP BY CAST(ts AS DATE)
)
SELECT CAST(cal.day AS DATE) AS day,
       CAST(coalesce(daily.n_events, 0) AS BIGINT) AS n_events,
       coalesce(daily.sum_value, 0.0) AS sum_value
FROM cal LEFT JOIN daily ON CAST(cal.day AS DATE) = daily.day
ORDER BY day
"""


QUERIES = [
    Query("recursive_calendar_spine", _recursive_calendar_spine, _CAL_SPINE_SQL,
          ("sql", "recursive", "timeseries")),
]

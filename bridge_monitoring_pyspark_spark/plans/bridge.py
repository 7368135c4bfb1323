"""Reference-parity queries (SURVEY.md §2), re-keyed onto the driver's
``events`` table.

The reference's domain maps onto the driver testdata as:
  sensor_type -> event_type   (5 types instead of 3)
  bridge_id   -> user_id
  event_time  -> ts           (already a timestamp in the testdata)
  bridges.csv -> customer     (static dimension, joined on user_id=c_custkey)

Every query cites the reference operator(s) it covers (SURVEY.md §2 ids).
All are batch-form; the streaming forms reuse the same expressions
(streaming/jobs.py) — batch-first because the correctness oracle is DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import exact_avg
from ..operators.dq import SensorRules, split_valid_invalid
from ..operators.enrich import enrich_with_dim
from ..operators.topk import top_k
from ..sources.readers import load_table
from .catalog import Query

# DQ value ranges per event type — the analog of the reference's per-sensor
# rules (temperature [-40,80], vibration >=0, tilt [0,90];
# pipelines/silver_enrichment.py:70-88). Bounds chosen so each type actually
# rejects some testdata rows (observed sf0.01 maxima: 337..490).
EVENT_RULES = SensorRules(
    type_col="event_type",
    value_col="value",
    time_col="ts",
    ranges={
        "click": (0.0, 400.0),
        "view": (0.0, 300.0),
        "purchase": (0.05, 350.0),
        "signup": (0.0, 340.0),
        "error": (0.0, 300.0),
    },
)

_VALID_SQL = EVENT_RULES.valid_sql()


# --- P1 + P2: derived-column projection + null-validity split ---------------
def _bronze_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze layer: derive partition_date, keep rows passing the null check
    (reference: pipelines/bronze_ingest.py:44-62)."""
    events = load_table(spark, sf_dir, "events")
    enriched = events.withColumn("partition_date", F.to_date("ts"))
    valid, _ = split_valid_invalid(
        enriched, F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    return valid.select("event_id", "ts", "user_id", "event_type", "value", "partition_date")


_BRONZE_VALID_SQL = """
SELECT event_id, ts, user_id, event_type, value, CAST(ts AS DATE) AS partition_date
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL
"""


# --- P3 + P4 + A3: per-type range predicates, complement, rejected counts ---
def _dq_rejected_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejected rows per type (reference: silver DQ split
    pipelines/silver_enrichment.py:70-96 + notebook cell 744e0696)."""
    events = load_table(spark, sf_dir, "events")
    _, invalid = split_valid_invalid(events, EVENT_RULES.valid_condition())
    return (
        invalid.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("rejected_rows"))
        .orderBy("event_type")
    )


_DQ_REJECTED_SQL = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS rejected_rows
FROM events
WHERE NOT ({_VALID_SQL})
GROUP BY event_type
ORDER BY event_type
"""


# --- J1: stream-static LEFT equi-join (broadcast dim) ------------------------
def _silver_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid events LEFT-joined to the customer dimension
    (reference: pipelines/silver_enrichment.py:104-106)."""
    events = load_table(spark, sf_dir, "events")
    valid, _ = split_valid_invalid(events, EVENT_RULES.valid_condition())
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return enrich_with_dim(valid, dim, on="user_id", how="left").select(
        "event_id", "ts", "user_id", "event_type", "value", "name", "segment"
    )


_SILVER_ENRICHED_SQL = f"""
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
       c.c_name AS name, c.c_mktsegment AS segment
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
WHERE {_VALID_SQL}
"""


# --- P6 + A7: join success-rate audit ----------------------------------------
def _join_success_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of fact rows that found a dimension match, against a dimension
    restricted to c_custkey < 100 so the rate is genuinely < 100%
    (reference: demo.ipynb cell ba9e5c00; README.md:222-228)."""
    events = load_table(spark, sf_dir, "events")
    dim = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 100)
        .select(F.col("c_custkey").alias("user_id"), F.col("c_name").alias("name"))
    )
    joined = enrich_with_dim(events, dim, on="user_id", how="left")
    return joined.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count("name").alias("matched_rows"),
        F.round(F.count("name") * 100.0 / F.count(F.lit(1)), 2).alias("match_pct"),
    )


_JOIN_SUCCESS_SQL = """
SELECT CAST(count(*) AS BIGINT) AS total_rows,
       CAST(count(c.c_name) AS BIGINT) AS matched_rows,
       round(count(c.c_name) * 100.0 / count(*), 2) AS match_pct
FROM events e
LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100) c
  ON e.user_id = c.c_custkey
"""


# --- A1 + A2 + J2 + P5: windowed aggs joined on window key, flattened --------
def _gold_metrics_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship gold query: three per-type tumbling-window aggregates
    INNER-joined on the window struct, then flattened
    (reference: pipelines/gold_aggregation.py:52-109). Hourly windows over
    the whole stream (the testdata has ~14 events/hour, so all three branches
    populate nearly every window)."""
    events = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")

    def branch(evt_type: str, agg_col, out_name: str) -> DataFrame:
        return (
            events.where(F.col("event_type") == evt_type)
            .groupBy(win.alias("window"))
            .agg(agg_col.alias(out_name))
        )

    # exact_avg (fixed-point sum, one division) instead of round(avg, 4):
    # order-independent and bit-identical across engines, so the sf0.1
    # oracle replay's rounding-boundary class cannot occur (see
    # functions/numeric.py). max over 2-decimal data needs no rounding.
    clicks = branch("click", exact_avg("value"), "avg_click_value")
    views = branch("view", F.max("value"), "max_view_value")
    errors = branch("error", F.max("value"), "max_error_value")

    joined = clicks.join(views, on="window", how="inner").join(
        errors, on="window", how="inner"
    )
    return joined.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "avg_click_value",
        "max_view_value",
        "max_error_value",
    )


_GOLD_HOURLY_SQL = """
WITH clicks AS (
  SELECT date_trunc('hour', ts) AS ws,
         sum(round(value * 100, 0)) / (100 * count(value)) AS avg_click_value
  FROM events WHERE event_type = 'click' GROUP BY 1
), views AS (
  SELECT date_trunc('hour', ts) AS ws, max(value) AS max_view_value
  FROM events WHERE event_type = 'view' GROUP BY 1
), errors AS (
  SELECT date_trunc('hour', ts) AS ws, max(value) AS max_error_value
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT c.ws AS window_start, c.ws + INTERVAL 1 HOUR AS window_end,
       c.avg_click_value, v.max_view_value, e.max_error_value
FROM clicks c
JOIN views v ON c.ws = v.ws
JOIN errors e ON c.ws = e.ws
"""


# --- J2 variant: composite (id, window) key, daily ---------------------------
def _gold_daily_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key stream-stream-join form: (user_id, 1-day window)
    exactly mirrors the reference's (bridge_id, window) key
    (pipelines/gold_aggregation.py:89-99)."""
    events = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 day")
    clicks = (
        events.where(F.col("event_type") == "click")
        .groupBy(F.col("user_id"), win.alias("window"))
        # deterministic fixed-point average — see functions/numeric.py
        .agg(exact_avg("value").alias("avg_click_value"))
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id"), win.alias("window"))
        .agg(F.max("value").alias("max_purchase_value"))
    )
    return clicks.join(purchases, on=["user_id", "window"], how="inner").select(
        "user_id",
        F.col("window.start").alias("window_start"),
        "avg_click_value",
        "max_purchase_value",
    )


_GOLD_DAILY_SQL = """
WITH clicks AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws,
         sum(round(value * 100, 0)) / (100 * count(value)) AS avg_click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), purchases AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws,
         max(value) AS max_purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.user_id, c.ws AS window_start, c.avg_click_value, p.max_purchase_value
FROM clicks c
JOIN purchases p ON c.user_id = p.user_id AND c.ws = p.ws
"""


# --- A4: batch windowed count -------------------------------------------------
def _events_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-minute window (reference: demo.ipynb cell 189cedd1)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 minute").alias("window"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


_EVENTS_PER_MIN_SQL = """
SELECT date_trunc('minute', ts) AS window_start, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


# --- A5 + O1 + O3: re-aggregation + global sort desc + limit (top-k) ---------
def _top_users_by_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by peak event value (reference: demo.ipynb cell 5b90cce0 —
    top bridges by peak vibration). Deterministic tiebreak on user_id."""
    events = load_table(spark, sf_dir, "events")
    peaks = events.groupBy("user_id").agg(F.max("value").alias("peak_value"))
    return top_k(peaks, [F.col("peak_value").desc(), F.col("user_id").asc()], 10)


_TOP_USERS_SQL = """
SELECT user_id, max(value) AS peak_value
FROM events GROUP BY user_id
ORDER BY peak_value DESC, user_id ASC
LIMIT 10
"""


# --- A6: global (grouping-less) min/max --------------------------------------
def _event_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global event-time range (reference: demo.ipynb cell 4589aea2)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_TIME_RANGE_SQL = """
SELECT min(ts) AS min_ts, max(ts) AS max_ts, CAST(count(*) AS BIGINT) AS n_rows
FROM events
"""


# --- P7 + A8: watermark-retention simulation ----------------------------------
def _watermark_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch simulation of a 2-minute watermark cutoff: rows kept vs dropped
    relative to max event time (reference: demo.ipynb cell 0d28976d). The
    scalar max is cross-joined as a broadcast, not collected to the driver."""
    events = load_table(spark, sf_dir, "events").where(F.col("event_type") == "click")
    mx = events.agg(F.max("ts").alias("max_ts"))
    cutoff = F.col("max_ts") - F.expr("INTERVAL 2 MINUTES")
    return (
        events.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.when(F.col("ts") >= cutoff, 1)).alias("kept_rows"),
            F.count(F.when(F.col("ts") < cutoff, 1)).alias("dropped_rows"),
        )
    )


_WATERMARK_SQL = """
WITH e AS (SELECT * FROM events WHERE event_type = 'click'),
     mx AS (SELECT max(ts) AS max_ts FROM e)
SELECT CAST(count(*) FILTER (WHERE e.ts >= mx.max_ts - INTERVAL 2 MINUTE) AS BIGINT) AS kept_rows,
       CAST(count(*) FILTER (WHERE e.ts <  mx.max_ts - INTERVAL 2 MINUTE) AS BIGINT) AS dropped_rows
FROM e CROSS JOIN mx
"""


# --- U1: schema-aligning union of rejected branches ---------------------------
def _rejected_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union the null-check rejects and the range-rule rejects into one
    quarantine stream with differing per-branch columns, via
    unionByName(allowMissingColumns=True)
    (reference: pipelines/bronze_ingest.py:91-94,
    pipelines/silver_enrichment.py:98-101)."""
    events = load_table(spark, sf_dir, "events")
    _, null_rejects = split_valid_invalid(
        events, F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    valid_nulls, range_rejects = split_valid_invalid(events, EVENT_RULES.valid_condition())
    a = null_rejects.select("event_id", "event_type").withColumn(
        "reject_reason", F.lit("null_check")
    )
    b = (
        range_rejects.where(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
        .withColumn("reject_reason", F.lit("range_rule"))
    )
    merged = a.unionByName(b, allowMissingColumns=True)
    return (
        merged.groupBy("reject_reason", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("reject_reason", "event_type")
    )


_REJECTED_UNION_SQL = f"""
WITH merged AS (
  SELECT event_id, event_type, 'null_check' AS reject_reason
  FROM events WHERE ts IS NULL OR value IS NULL
  UNION ALL BY NAME
  SELECT event_id, event_type, value, 'range_rule' AS reject_reason
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT ({_VALID_SQL})
)
SELECT reject_reason, event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(value), 4) AS sum_value
FROM merged
GROUP BY reject_reason, event_type
ORDER BY reject_reason, event_type
"""


QUERIES = [
    Query("bronze_valid_events", _bronze_valid, _BRONZE_VALID_SQL, ("bridge", "P1", "P2")),
    Query("dq_rejected_counts", _dq_rejected_counts, _DQ_REJECTED_SQL, ("bridge", "P3", "P4", "A3", "smoke_may_be_empty")),
    Query("silver_enriched", _silver_enriched, _SILVER_ENRICHED_SQL, ("bridge", "J1")),
    Query("join_success_rate", _join_success_rate, _JOIN_SUCCESS_SQL, ("bridge", "P6", "A7")),
    Query("gold_metrics_hourly", _gold_metrics_hourly, _GOLD_HOURLY_SQL, ("bridge", "A1", "A2", "J2", "P5")),
    Query("gold_daily_per_user", _gold_daily_per_user, _GOLD_DAILY_SQL, ("bridge", "J2")),
    Query("events_per_minute", _events_per_minute, _EVENTS_PER_MIN_SQL, ("bridge", "A4")),
    Query("top_users_by_peak_value", _top_users_by_peak, _TOP_USERS_SQL, ("bridge", "A5", "O1", "O3")),
    Query("event_time_range", _event_time_range, _TIME_RANGE_SQL, ("bridge", "A6")),
    Query("watermark_retention_sim", _watermark_retention, _WATERMARK_SQL, ("bridge", "P7", "T5")),
    Query("rejected_union_by_name", _rejected_union_by_name, _REJECTED_UNION_SQL, ("bridge", "U1", "smoke_may_be_empty")),
]

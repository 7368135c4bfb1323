"""Eighth extension wave: batch sessionization (gaps-and-islands), value
histograms via width_bucket, and unigram-LM log-probability quality scores.

Oracle notes: all three are exact and fully SQL-expressible — the
sessionization uses the classic lag + cumulative-flag-sum island id in
both engines; the LM score writes the add-one-smoothed unigram model out
long-hand in DuckDB (same natural log, same rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds
from ..sources.readers import load_table
from .catalog import Query

SESSION_GAP_MIN = 30
HIST_BUCKETS = 10
HIST_LO = 0.0
HIST_HI = 1000.0


# --- Gaps-and-islands sessionization (batch twin of session_window) -------------
def _session_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization without the session_window operator: lag the
    event time per user, flag gaps > 30 min, turn the flags into island
    ids with a running sum, then aggregate twice (per session, per user).
    Two narrow windows over one hash exchange on user_id — the whole thing
    shuffles the events table exactly once, which is the property to keep
    at 100 TB (session_window is the streaming form; this is the batch
    backfill form over historical data)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "new_sess",
        F.when(
            epoch_seconds("ts")
            - F.lag(epoch_seconds("ts")).over(by_user)
            > SESSION_GAP_MIN * 60,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = flagged.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(epoch_seconds("ts")) - F.min(epoch_seconds("ts"))).alias(
            "span_s"
        ),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
            F.max("span_s").alias("max_span_s"),
        )
        .orderBy("user_id")
    )


_SESSION_SQL = f"""
WITH sec AS (
  -- Spark's cast(ts AS long) truncates sub-second parts per row; mirror
  -- that exactly or gap comparisons and spans drift by one second
  SELECT user_id, ts, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_MIN} * 60
              THEN 1 ELSE 0 END AS new_sess
  FROM sec
),
ids AS (
  SELECT user_id, t,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
),
per_session AS (
  SELECT user_id, sess_id, count(*) AS n_events,
         max(t) - min(t) AS span_s
  FROM ids GROUP BY user_id, sess_id
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       round(avg(n_events), 4) AS avg_events_per_session,
       CAST(max(span_s) AS BIGINT) AS max_span_s
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


# --- Value histogram via width_bucket -------------------------------------------
def _value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of the event value distribution per event type:
    width_bucket assigns bins in codegen, one groupBy produces all bars —
    the single-pass distributed histogram (contrast histogram_numeric,
    whose adaptive bins are engine-specific and not oracle-able)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn(
            "bucket",
            F.width_bucket(
                "value", F.lit(HIST_LO), F.lit(HIST_HI), F.lit(HIST_BUCKETS)
            ),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("event_type", "bucket")
    )


# DuckDB has no width_bucket — spell out its semantics (1..n inside
# [lo,hi), 0 below, n+1 at-or-above hi) with the same floor arithmetic
_HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(CASE WHEN value < {HIST_LO} THEN 0
                 WHEN value >= {HIST_HI} THEN {HIST_BUCKETS} + 1
                 ELSE floor((value - {HIST_LO})
                            / (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS})) + 1
            END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


# --- Unigram-LM log-probability quality score -----------------------------------
def _unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based quality scoring (the statistical precursor to perplexity
    filtering à la CCNet): fit an add-one-smoothed unigram model on the
    corpus itself, score each document by mean token log-probability, and
    report the 10 lowest-scoring docs (the outlier tail a data pipeline
    would drop). Two aggregations plus one broadcast join on term — no
    Python, and the model side is tiny (vocabulary) at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    term_counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    totals = term_counts.agg(
        F.sum("tc").alias("n_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    scored = (
        toks.join(F.broadcast(term_counts), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "logp",
            F.log((F.col("tc") + 1.0) / (F.col("n_tokens") + F.col("vocab"))),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("logp"), 4).alias("mean_logprob"),
            F.count(F.lit(1)).alias("n_tokens_doc"),
        )
        .orderBy("mean_logprob", "doc_id")
        .limit(10)
    )
    return scored


_UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
),
tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tc AS (SELECT term, count(*) AS tc FROM tok GROUP BY term),
totals AS (SELECT sum(tc) AS n_tokens, count(*) AS vocab FROM tc)
SELECT doc_id,
       round(avg(ln((tc.tc + 1.0) / (totals.n_tokens + totals.vocab))), 4) AS mean_logprob,
       CAST(count(*) AS BIGINT) AS n_tokens_doc
FROM tok
JOIN tc ON tok.term = tc.term
CROSS JOIN totals
GROUP BY doc_id
ORDER BY mean_logprob, doc_id
LIMIT 10
"""


QUERIES = [
    Query("session_islands", _session_islands, _SESSION_SQL,
          ("window", "sessionization")),
    Query("value_histogram", _value_histogram, _HISTOGRAM_SQL, ("agg", "histogram")),
    Query("unigram_logprob_quality", _unigram_logprob_quality, _UNIGRAM_SQL,
          ("llm", "text", "quality")),
]

"""Third extension wave: semi-structured data (VARIANT), SQL LATERAL
joins, Python UDTFs, in-flight Observation metrics, and multimodal frame
sampling.

Oracle notes: the UDTF and frame-sample queries do deterministic
char/byte arithmetic on pure-ASCII text (verified: every document's
octet_length == char length), so DuckDB substring math mirrors the Python
byte slicing exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import sample_frames, with_binary_payload
from ..sources.readers import load_table
from ..functions.plan import sorted_once
from .catalog import Query


# --- VARIANT / semi-structured JSON ------------------------------------------
def _variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path via the VARIANT type (Spark 4.x): parse the
    JSON props column once into a variant, extract a typed field, and
    aggregate. At scale this beats per-expression JSON string re-parsing —
    parse_json runs once per row, extractions are cheap variant lookups."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_VARIANT_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS avg_k,
       CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- SQL LATERAL join ---------------------------------------------------------
_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 4) AS totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey < 100
ORDER BY c.c_custkey, totalprice DESC, t.o_orderkey
"""


def _lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each customer's
    two priciest orders — the SQL-text form of per-group top-k (Catalyst
    decorrelates to a ranked window join). The identical text runs on
    DuckDB."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


# --- Python UDTF --------------------------------------------------------------
CHUNK_CHARS = 120


def _udtf_char_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 3.5+) splitting each document
    into fixed-width char chunks, applied per-row via SQL LATERAL.

    ``useArrow`` is deliberately **False** here, on measurement: in this
    Spark build the Arrow UDTF path does engage under LATERAL
    (``ArrowEvalPythonUDTF`` in the plan) but benches ~3x slower than the
    pickled ``BatchEvalPythonUDTF`` at sf0.1 (2.16s vs 0.68s, 3-run
    medians) — a generator UDTF emitting a few short rows per input is
    dominated by per-call Arrow batch assembly, not serialization. The
    row-pickling ban (tests/test_plan_quality.py, tools/plan_audit.py)
    carves out exactly this operator; scalar UDFs stay Arrow-only. Bulk
    chunking still prefers the pure-codegen form (doc_chunks_sliding);
    the UDTF is the extensibility surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_chars int, chunk_md5 string")
    class CharChunker:
        def eval(self, text: str):
            for k, start in enumerate(range(0, len(text), CHUNK_CHARS)):
                chunk = text[start : start + CHUNK_CHARS]
                yield k, len(chunk), hashlib.md5(chunk.encode()).hexdigest()

    spark.udtf.register("eng_char_chunker", CharChunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    # NOT sorted_once (round 14): the plan gate asserting the deliberate
    # BatchEvalPythonUDTF operator needs the UDTF visible in the final
    # plan, and the double-exec cost here is ~0.2 s — transparency wins.
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_chars, c.chunk_md5
        FROM documents d, LATERAL eng_char_chunker(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


_UDTF_SQL = f"""
WITH s AS (
  SELECT doc_id, text,
         unnest(range(1, length(text) + 1, {CHUNK_CHARS})) AS start
  FROM documents
)
SELECT doc_id,
       CAST((start - 1) // {CHUNK_CHARS} AS INT) AS chunk_idx,
       CAST(length(substring(text, start, {CHUNK_CHARS})) AS INT) AS chunk_chars,
       md5(substring(text, start, {CHUNK_CHARS})) AS chunk_md5
FROM s
ORDER BY doc_id, chunk_idx
"""


# --- Observation metrics ------------------------------------------------------
def _observed_ingest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight observability: df.observe attaches metric aggregates that
    are computed DURING the main action (zero extra passes over the data —
    the production pattern for row-count/quality counters on 100 TB ingest
    jobs, vs. a second count() scan). The observed values are returned as
    a single-row DataFrame."""
    e = load_table(spark, sf_dir, "events")
    obs = Observation("ingest_metrics")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count(F.when(F.col("value") > 50, 1)).alias("n_high"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_value"], m["n_high"])],
        "n_rows bigint, sum_value double, n_high bigint",
    )


_OBSERVED_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(value), 4) AS sum_value,
       CAST(count(CASE WHEN value > 50 THEN 1 END) AS BIGINT) AS n_high
FROM events
"""


# --- Multimodal frame sampling ------------------------------------------------
def _frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (one-to-many mapInPandas):
    every 256-byte window becomes a frame row with byte features. ASCII
    text means DuckDB's char substring math reproduces the byte slicing."""
    d = load_table(spark, sf_dir, "documents")
    return sorted_once(
        sample_frames(with_binary_payload(d, "text"), stride=256),
        "doc_id", "frame_idx",
    )


_FRAME_SQL = """
WITH s AS (
  SELECT doc_id, text,
         unnest(range(1, length(text) + 1, 256)) AS start
  FROM documents
)
SELECT doc_id,
       CAST((start - 1) // 256 AS INT) AS frame_idx,
       CAST(length(substring(text, start, 256)) AS INT) AS frame_bytes,
       CAST(ascii(substring(text, start, 1)) AS INT) AS first_byte
FROM s
ORDER BY doc_id, frame_idx
"""


QUERIES = [
    Query("variant_props_stats", _variant_props_stats, _VARIANT_SQL, ("json", "variant")),
    Query("lateral_top_orders", _lateral_top_orders, _LATERAL_SQL, ("sql", "lateral", "topk")),
    Query("udtf_char_chunks", _udtf_char_chunks, _UDTF_SQL, ("udtf", "llm", "chunking")),
    Query("observed_ingest_metrics", _observed_ingest_metrics, _OBSERVED_SQL, ("observability",)),
    Query("multimodal_frame_sample", _frame_sample, _FRAME_SQL, ("llm", "multimodal")),
]

"""Sixteenth extension wave: training-sequence packing.

The last mile of an LLM pretraining data pipeline: documents are
concatenated in a deterministic order and chunked into fixed-token-budget
training sequences (GPT-style concat-and-chunk — documents straddle
sequence boundaries; nothing is padded or dropped). The operator reports
the per-sequence layout: how many documents touch each sequence, how many
tokens it holds, and its first/last document — exactly what a loader
manifest needs.

Scale note (100 TB): the global token offset is a prefix sum. A single
`Window.orderBy` computes it here (one partition — fine at test SF); at
corpus scale the identical algebra runs hierarchically: per-shard cumsum +
a tiny driver-side prefix sum of shard totals added back as a literal
offset — the layout produced is byte-identical, so the small-SF oracle
still certifies the distributed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count_estimate
from ..sources.readers import load_table
from .catalog import Query

PACK_BUDGET = 512  # tokens per training sequence


def _sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents (ordered by doc_id) into PACK_BUDGET-token sequences
    and report the per-sequence manifest.

    Plan shape: token counts are a codegen regexp pass; the running offset
    is one window cumsum; each document explodes into the 1..few sequences
    it overlaps (`sequence(first_seq, last_seq)`); one groupBy rolls up the
    manifest. Zero-token documents are dropped (they occupy no span)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", token_count_estimate(F.col("text")).cast("long").alias("n_tok")
    ).where(F.col("n_tok") > 0)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    spans = toks.select(
        "doc_id",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start"),
    )
    b = F.lit(PACK_BUDGET)
    exploded = spans.select(
        "doc_id",
        "n_tok",
        "start",
        # integer `div`, not `/`+cast: double division loses exactness past
        # 2^53 total tokens, which a 100 TB corpus exceeds
        F.explode(
            F.sequence(
                F.expr(f"start div {PACK_BUDGET}"),
                F.expr(f"(start + n_tok - 1) div {PACK_BUDGET}"),
            )
        ).alias("seq_id"),
    )
    in_seq = F.least(
        F.col("start") + F.col("n_tok"), (F.col("seq_id") + 1) * b
    ) - F.greatest(F.col("start"), F.col("seq_id") * b)
    return (
        exploded.select("doc_id", F.col("seq_id"), in_seq.alias("tok_in_seq"))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_in_seq").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("seq_id")
    )


_PACKING_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
             AS n_tok
  FROM documents
),
spans AS (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tok AS BIGINT) AS start
  FROM toks WHERE n_tok > 0
),
exploded AS (
  SELECT doc_id, n_tok, start,
         unnest(range(start // {PACK_BUDGET}, (start + n_tok - 1) // {PACK_BUDGET} + 1)) AS seq_id
  FROM spans
)
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least(start + n_tok, (seq_id + 1) * {PACK_BUDGET})
                - greatest(start, seq_id * {PACK_BUDGET})) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM exploded
GROUP BY seq_id
ORDER BY seq_id
"""


QUERIES = [
    Query("sequence_packing_stats", _sequence_packing_stats, _PACKING_SQL,
          ("llm", "packing", "training-data")),
]

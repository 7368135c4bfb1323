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
    return _pack_manifest(spans)


def _pack_manifest(spans: DataFrame) -> DataFrame:
    """(doc_id, n_tok, start) -> per-sequence manifest. Shared by the
    one-level and hierarchical packers, which differ only in how the
    `start` prefix sum is computed."""
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


PACK_BUCKET_WIDTH = 65536  # doc_ids per prefix-sum bucket (scale knob)


def _sequence_packing_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hierarchical prefix sum the one-level packer's docstring
    promises, implemented: `sequence_packing_stats` computes the global
    token offset with a single `Window.orderBy` — an Exchange
    SinglePartition that funnels the whole corpus through one task. Here
    the identical algebra runs in two levels: cumsum within doc_id-range
    buckets (`doc_id div PACK_BUCKET_WIDTH` — monotone in doc_id, so
    bucket order extends document order), then an exclusive prefix sum of
    bucket totals over the tiny bucket spine, broadcast back as each
    bucket's offset. start = local_start + bucket_offset is bit-identical,
    so the manifest — and the oracle — matches the one-level form exactly.
    Same decomposition as stable_doc_ids and sweep_concurrency_bucketed;
    at truly unbounded corpora the spine recurses."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id", token_count_estimate(F.col("text")).cast("long").alias("n_tok")
        )
        .where(F.col("n_tok") > 0)
        .withColumn("bucket", F.expr(f"doc_id div {PACK_BUCKET_WIDTH}"))
    )
    win_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # localCheckpoint: `local` feeds both the bucket-total aggregate and the
    # spans join; without it each branch re-runs the regexp token count over
    # the full corpus (Spark expression trees are trees, not DAGs — measured
    # 2x at sf100). Four long columns per doc — cheap to materialize; on a
    # cluster, persist(MEMORY_AND_DISK) + unpersist.
    local = toks.withColumn(
        "local_start", F.sum("n_tok").over(win_in) - F.col("n_tok")
    ).localCheckpoint()
    prior = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("bucket")
        .agg(F.sum("n_tok").alias("btot"))
        .withColumn("offset", F.coalesce(F.sum("btot").over(prior), F.lit(0)))
        .select("bucket", "offset")
    )
    spans = local.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        "n_tok",
        (F.col("local_start") + F.col("offset")).alias("start"),
    )
    return _pack_manifest(spans)


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


SHUFFLE_SEED = "epoch-0"  # changing the seed string re-deals the whole order


def _corpus_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: every document gets a pseudorandom
    training-order rank from the md5 of (seed, doc_id). This is how a
    multi-epoch pipeline re-deals data without materializing a permutation
    — rank is a pure function of (seed, id), reproducible on any engine or
    cluster size, resumable mid-epoch. The sort key is md5 hex (engine-
    neutral); the returned (doc_id, shuffle_rank) pairs pin the exact
    permutation, so the oracle verifies the order itself, not just
    membership. At 100 TB: rank assignment is embarrassingly parallel;
    the global row_number becomes sortWithinPartitions after a range
    repartition on the key (same permutation, distributed sort)."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.encode(F.concat(F.lit(SHUFFLE_SEED + ":"), F.col("doc_id").cast("string")), "UTF-8"))
    w = Window.orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", key.alias("k"))
        .select("doc_id", F.row_number().over(w).alias("shuffle_rank"))
        .orderBy("doc_id")
    )


_SHUFFLE_SQL = f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
       ) AS INT) AS shuffle_rank
FROM documents
ORDER BY doc_id
"""


SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # remainder is test


def split_bucket(id_col: str):
    """The split-assignment hash bucket: first 8 md5 hex chars of the
    stringified id, mod 100. A pure function of the id — this single
    expression is the whole growth-stability guarantee, so the query AND
    any caller share it from here (tests replay it independently with
    hashlib to pin the formula itself)."""
    return F.expr(
        f"CAST(conv(substring(md5(encode(CAST({id_col} AS STRING), 'UTF-8')), 1, 8), 16, 10) AS BIGINT) % 100"
    )


def _hash_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: bucket = first 8 md5 hex chars
    of the doc id mod 100 — stable under corpus growth (a document's split
    never changes when others are added/removed, unlike row_number-based
    splits), engine-neutral, and skew-free. Reports per-split counts and a
    membership checksum (sum of doc_ids) so the oracle verifies the exact
    assignment, not just the sizes."""
    d = load_table(spark, sf_dir, "documents")
    bucket = split_bucket("doc_id")
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("docid_checksum"),
        )
        .orderBy("split")
    )


_SPLIT_SQL = f"""
WITH b AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN bucket < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS docid_checksum
FROM b
GROUP BY 1
ORDER BY split
"""


QUERIES = [
    Query("sequence_packing_stats", _sequence_packing_stats, _PACKING_SQL,
          ("llm", "packing", "training-data")),
    Query("sequence_packing_hierarchical", _sequence_packing_hierarchical,
          _PACKING_SQL, ("llm", "packing", "training-data", "scale_path")),
    Query("corpus_shuffle_rank", _corpus_shuffle_rank, _SHUFFLE_SQL,
          ("llm", "shuffle", "training-data")),
    Query("hash_split_assign", _hash_split_assign, _SPLIT_SQL,
          ("llm", "split", "training-data")),
]

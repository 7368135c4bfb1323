"""Eighteenth extension wave: incremental-corpus and vector-compression
operators — the two patterns that keep a petabyte pipeline from reprocessing
itself.

- ``incremental_dedup_new_docs`` — dedup the DAILY INCREMENT against the
  historical fingerprint index instead of re-deduping the whole corpus:
  at 100 TB nobody rescans history; the index is a (fingerprint -> min id)
  table the increment anti-joins / first-wins against.
- ``embedding_int8_quantize`` — symmetric per-vector int8 quantization of
  the embedding column with reconstruction-error accounting: the standard
  4x memory cut that makes a 100 TB ANN corpus fit its serving tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5
from ..sources.readers import load_table
from .catalog import Query

INCR_SPLIT = 250  # doc_id < INCR_SPLIT is "history", >= is new content
INCR_RECRAWL_N = 20  # history docs that re-arrive in the batch (new ids)
INCR_INTRA_N = 10  # batch docs that also arrive twice within the batch
RECRAWL_OFFSET = 100_000
INTRA_OFFSET = 200_000


def _incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup the incoming batch against the historical index, never
    rescanning history's text: history contributes only its fingerprint
    index (fp -> min doc_id, what a production pipeline persists between
    runs); the new batch keeps a document iff its fingerprint is absent
    from the index AND it is the first occurrence within the batch.
    Emits the batch audit: every new doc with its verdict and, for
    rejects, the id of the document it duplicates.

    The corpus has no naturally identical texts, so the batch is built
    like a real daily increment: fresh docs (id >= INCR_SPLIT), re-crawled
    history (copies of the first INCR_RECRAWL_N history docs under new
    ids -> 'dup_of_history'), and an internally-duplicated slice (copies
    of the first INCR_INTRA_N fresh docs -> 'dup_in_batch') — all
    deterministic, so the oracle replays the same union.

    Plan shape: one groupBy to (re)build the index slice, one window for
    within-batch first-wins, one LEFT join on fingerprint. At scale the
    index join is a shuffle on fp (or a bucketed/bloom-pruned probe); the
    batch side is the small one — days, not corpora."""
    d = load_table(spark, sf_dir, "documents")
    fp = fingerprint_md5(F.col("text"))
    hist_index = (
        d.where(F.col("doc_id") < INCR_SPLIT)
        .select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("hist_doc_id"))
    )
    fresh = d.where(F.col("doc_id") >= INCR_SPLIT).select("doc_id", "text")
    recrawl = d.where(F.col("doc_id") < INCR_RECRAWL_N).select(
        (F.col("doc_id") + RECRAWL_OFFSET).alias("doc_id"), "text"
    )
    intra = d.where(
        (F.col("doc_id") >= INCR_SPLIT) & (F.col("doc_id") < INCR_SPLIT + INCR_INTRA_N)
    ).select((F.col("doc_id") + INTRA_OFFSET).alias("doc_id"), "text")
    batch = (
        fresh.unionByName(recrawl)
        .unionByName(intra)
        .select("doc_id", fp.alias("fp"))
    )
    rn = F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    batch_first = batch.withColumn("batch_rank", rn)
    joined = batch_first.join(hist_index, "fp", "left")
    first_in_batch = F.min("doc_id").over(Window.partitionBy("fp"))
    verdict = (
        F.when(F.col("hist_doc_id").isNotNull(), "dup_of_history")
        .when(F.col("batch_rank") > 1, "dup_in_batch")
        .otherwise("keep")
    )
    dup_of = F.when(F.col("hist_doc_id").isNotNull(), F.col("hist_doc_id")).when(
        F.col("batch_rank") > 1, first_in_batch
    )
    return (
        joined.select(
            "doc_id", verdict.alias("verdict"), dup_of.alias("dup_of")
        )
        .orderBy("doc_id")
    )


_INCR_SQL = f"""
WITH fps AS (
  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
),
hist AS (
  SELECT fp, min(doc_id) AS hist_doc_id FROM fps
  WHERE doc_id < {INCR_SPLIT} GROUP BY fp
),
incoming AS (
  SELECT doc_id, fp FROM fps WHERE doc_id >= {INCR_SPLIT}
  UNION ALL
  SELECT doc_id + {RECRAWL_OFFSET}, fp FROM fps WHERE doc_id < {INCR_RECRAWL_N}
  UNION ALL
  SELECT doc_id + {INTRA_OFFSET}, fp FROM fps
  WHERE doc_id >= {INCR_SPLIT} AND doc_id < {INCR_SPLIT} + {INCR_INTRA_N}
),
batch AS (
  SELECT doc_id, fp,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS batch_rank,
         min(doc_id) OVER (PARTITION BY fp) AS first_in_batch
  FROM incoming
)
SELECT b.doc_id,
       CASE WHEN h.hist_doc_id IS NOT NULL THEN 'dup_of_history'
            WHEN b.batch_rank > 1 THEN 'dup_in_batch'
            ELSE 'keep' END AS verdict,
       CASE WHEN h.hist_doc_id IS NOT NULL THEN h.hist_doc_id
            WHEN b.batch_rank > 1 THEN b.first_in_batch END AS dup_of
FROM batch b LEFT JOIN hist h ON b.fp = h.fp
ORDER BY b.doc_id
"""


QUANT_BITS_MAX = 127  # symmetric int8 range


def _embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max(|x|)/127,
    q_i = round(x_i / scale), reconstruction x̂_i = q_i * scale. Reports
    per-vector scale and reconstruction error so the compression is
    auditable (max abs error <= scale/2 by construction — the invariant
    pytest asserts). All higher-order-function arithmetic, fully codegen;
    at 100 TB this is the 4x memory cut before vectors hit an ANN tier,
    and the audit columns are what decides per-dataset whether int8 recall
    loss is acceptable.

    Determinism note: q uses round-half-away-from-zero (`round` in both
    engines), and error aggregates are rounded to 6 dp so double
    summation-order noise cannot flip the oracle hash."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x))) / F.lit(
        float(QUANT_BITS_MAX)
    )
    with_scale = e.select("vec_id", "embedding", scale.alias("scale"))
    q = F.transform("embedding", lambda x: F.round(x / F.col("scale")).cast("int"))
    rec_err = F.zip_with(
        "embedding",
        "q",
        lambda x, qi: F.abs(x - qi.cast("double") * F.col("scale")),
    )
    return (
        with_scale.withColumn("q", q)
        .withColumn("err", rec_err)
        .select(
            "vec_id",
            F.round("scale", 6).alias("scale"),
            F.array_max("q").alias("q_max"),
            F.array_min("q").alias("q_min"),
            F.round(F.array_max("err"), 6).alias("max_abs_err"),
            F.round(
                F.aggregate("err", F.lit(0.0), lambda a, x: a + x)
                / F.size("err"),
                6,
            ).alias("mean_abs_err"),
        )
        .orderBy("vec_id")
    )


_QUANT_SQL = f"""
WITH d AS (
  -- cast up front: DuckDB keeps FLOAT[] arithmetic in float32 otherwise,
  -- while Spark widens to double — same float bits, different rounding
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings WHERE vec_id < 100
),
s AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) / {QUANT_BITS_MAX}.0 AS scale
  FROM d
),
qd AS (
  SELECT vec_id, scale,
         list_transform(emb, x -> CAST(round(x / scale) AS INT)) AS q,
         list_transform(emb, x -> abs(x - round(x / scale) * scale)) AS err
  FROM s
)
SELECT vec_id,
       round(scale, 6) AS scale,
       list_max(q) AS q_max,
       list_min(q) AS q_min,
       round(list_max(err), 6) AS max_abs_err,
       round(list_sum(err) / len(err), 6) AS mean_abs_err
FROM qd
ORDER BY vec_id
"""


QUERIES = [
    Query("incremental_dedup_new_docs", _incremental_dedup_new_docs, _INCR_SQL,
          ("llm", "dedup", "incremental")),
    Query("embedding_int8_quantize", _embedding_int8_quantize, _QUANT_SQL,
          ("llm", "vectors", "quantization")),
]

"""Second LLM-training-data wave: document chunking, Gopher-style
repetition signals, TF-IDF term extraction, and vector-column analytics
(per-dimension stats, per-label centroids).

All stay JVM-side: chunking and repetition use explode + higher-order
array functions (no Python in the hot path); the vector analytics use
posexplode so the per-dimension aggregation distributes over (dim) /
(label, dim) keys instead of pulling arrays to the driver. At 100 TB the
explode fan-out is the dominant cost — every query here projects to the
minimal columns *before* exploding so the multiplied rows carry only the
key and one value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import words
from ..sources.readers import load_table
from .catalog import Query

CHUNK_WORDS = 40
CHUNK_STRIDE = 20


# --- Sliding-window document chunking -----------------------------------------
def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 40-word / stride-20 chunks per document — the standard
    context-window prep step. sequence() generates the start offsets,
    posexplode emits (chunk ordinal, start), slice() cuts the window; the
    chunk text itself is fingerprinted (md5) rather than materialized so
    the output stays narrow."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("w"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunk = F.slice(F.col("w"), F.col("start"), CHUNK_WORDS)
    return (
        d.select("doc_id", words(F.col("text")).alias("w"))
        .select("doc_id", "w", F.posexplode(starts).alias("chunk_ord", "start"))
        .select(
            "doc_id",
            "chunk_ord",
            F.size(chunk).alias("chunk_words"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_ord")
    )


_CHUNKS_SQL = rf"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
starts AS (
  SELECT doc_id, w,
         unnest(range(1, greatest(len(w), 1) + 1, {CHUNK_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) / {CHUNK_STRIDE} AS INT) AS chunk_ord,
       CAST(len(list_slice(w, start, start + {CHUNK_WORDS} - 1)) AS INT) AS chunk_words,
       md5(array_to_string(list_slice(w, start, start + {CHUNK_WORDS} - 1), ' ')) AS chunk_md5
FROM starts
ORDER BY doc_id, chunk_ord
"""


# --- Gopher-style repetition signals ------------------------------------------
def _repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition fractions à la the Gopher quality rules:
    share of tokens belonging to the most frequent word, and share of
    bigrams belonging to the most frequent bigram. Explode → count per
    (doc, gram) → max/sum per doc; both levels shuffle on doc_id-prefixed
    keys so the aggregation is skew-free."""
    d = load_table(spark, sf_dir, "documents")
    w = words(F.col("text"))
    bigrams = F.expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)),"
        " (x, i) -> concat(x, ' ', w[i + 1]))"
    )
    base = d.select("doc_id", w.alias("w")).select(
        "doc_id", "w", bigrams.alias("bg")
    )

    # One scan, one big shuffle: both gram levels ride the same explode
    # (tagged by `kind`), so the corpus is tokenized once and exchanged
    # once on (doc_id, kind, gram) — the previous form scanned and
    # shuffled the corpus twice, once per level. The second and third
    # aggregations are per-doc (≤ 2 rows/doc) and cost nothing. Keys are
    # doc_id-prefixed, so the big exchange stays skew-free at 100 TB.
    tagged = F.concat(
        F.expr("transform(w, x -> struct(0 AS kind, x AS gram))"),
        F.expr("transform(bg, x -> struct(1 AS kind, x AS gram))"),
    )
    g = base.select("doc_id", F.explode(tagged).alias("t")).select(
        "doc_id", F.col("t.kind").alias("kind"), F.col("t.gram").alias("gram")
    )
    counts = g.groupBy("doc_id", "kind", "gram").agg(F.count(F.lit(1)).alias("c"))
    fracs = counts.groupBy("doc_id", "kind").agg(
        F.round(F.max("c") / F.sum("c"), 4).alias("frac")
    )
    return (
        fracs.groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("kind") == 0, F.col("frac"))).alias("top_word_frac"),
            F.max(F.when(F.col("kind") == 1, F.col("frac"))).alias("top_bigram_frac"),
        )
        # inner-join semantics of the two-branch form: docs with no
        # bigrams (< 2 words) drop out
        .where(F.col("top_bigram_frac").isNotNull())
        .orderBy("doc_id")
    )


_REPETITION_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
wx AS (SELECT doc_id, unnest(w) AS gram FROM t),
wc AS (SELECT doc_id, count(*) c FROM wx GROUP BY doc_id, gram),
wf AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 4) AS top_word_frac
       FROM wc GROUP BY doc_id),
bx AS (SELECT doc_id,
              unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram
       FROM t),
bc AS (SELECT doc_id, count(*) c FROM bx GROUP BY doc_id, gram),
bf AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 4) AS top_bigram_frac
       FROM bc GROUP BY doc_id)
SELECT wf.doc_id, top_word_frac, top_bigram_frac
FROM wf JOIN bf ON wf.doc_id = bf.doc_id
ORDER BY wf.doc_id
"""


# --- TF-IDF top terms ----------------------------------------------------------
def _tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF. Term frequencies
    and document frequencies are two aggregations over one exploded
    projection; N arrives as a broadcast single-row join (no driver
    collect); ranking is a per-doc window. The idf join broadcasts the
    (term → df) side only when it is small — at corpus scale it
    sort-merge-joins on the term key."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
    # one tokenize+explode+aggregate per action (round 15): tf is lazily
    # checkpointed and df derives FROM it — tf holds one row per distinct
    # (doc, term), so count(*) per term over tf IS countDistinct(doc_id)
    # over the raw tokens, without the countDistinct expand or a second
    # evaluation of the explode chain (the r15 plan audit counted both).
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("tfidf"), 6).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "term",
                F.round("tfidf", 4).alias("tfidf"))
        .orderBy("doc_id", "rank")
    )


_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf * ln(n_docs::DOUBLE / df) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY round(tfidf, 6) DESC, term ASC) AS INT) AS rank,
       term, round(tfidf, 4) AS tfidf
FROM scored
QUALIFY rank <= 3
ORDER BY doc_id, rank
"""


# --- Vector-column analytics ---------------------------------------------------
def _emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution profile of the embedding column (drift /
    normalization check): posexplode to (dim, value) rows, aggregate per
    dim. 64 dims × N rows distributes evenly; no array ever reaches the
    driver."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val")
    )
    return (
        exploded.groupBy("dim")
        .agg(
            F.round(F.avg("val"), 4).alias("mean_val"),
            F.round(F.stddev_samp("val"), 4).alias("std_val"),
            F.round(F.min("val"), 4).alias("min_val"),
            F.round(F.max("val"), 4).alias("max_val"),
        )
        .orderBy("dim")
    )


_EMB_DIM_SQL = """
WITH x AS (
  SELECT unnest(range(0, len(embedding))) AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
)
SELECT dim, round(avg(val), 4) AS mean_val,
       round(stddev_samp(val), 4) AS std_val,
       round(min(val), 4) AS min_val,
       round(max(val), 4) AS max_val
FROM x
GROUP BY dim
ORDER BY dim
"""


def _emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, emitted as (label, dim, mean) rows — the
    k-means-style cluster profile and the building block ivf_topk's
    centroid refresh would use. Same posexplode plan keyed on
    (label, dim)."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val"),
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(F.round(F.avg("val"), 4).alias("centroid_val"))
        .orderBy("label", "dim")
    )


_EMB_CENTROID_SQL = """
WITH x AS (
  SELECT label, unnest(range(0, len(embedding))) AS dim,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
)
SELECT label, dim, round(avg(val), 4) AS centroid_val
FROM x
GROUP BY label, dim
ORDER BY label, dim
"""


QUERIES = [
    Query("doc_chunks_sliding", _doc_chunks, _CHUNKS_SQL, ("llm", "text", "chunking")),
    Query("repetition_signals_gopher", _repetition_signals, _REPETITION_SQL, ("llm", "text", "quality")),
    Query("tfidf_top_terms", _tfidf_top_terms, _TFIDF_SQL, ("llm", "text")),
    Query("emb_dim_stats", _emb_dim_stats, _EMB_DIM_SQL, ("llm", "ann", "vector")),
    Query("emb_label_centroids", _emb_label_centroids, _EMB_CENTROID_SQL, ("llm", "ann", "vector")),
]

"""Hybrid retrieval: BM25 sparse ranking fused with dense vector ranking
via Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009).

RRF is the standard hybrid-search combiner (Elasticsearch, Vespa, most
RAG stacks): each retriever contributes ``1 / (K + rank)`` per document,
so scores from incomparable scales (BM25 weights vs cosine similarity)
fuse without calibration.

Spark-first shape, 100 TB notes:
* Both legs end in a global top-``depth`` — Catalyst compiles
  ``orderBy().limit()`` to TakeOrderedAndProject, so each leg ships only
  ``depth`` rows per partition to one reducer, never a full sort.
* The fusion join runs on two ``depth``-row DataFrames — broadcast-sized
  by construction regardless of corpus size.
* Ranks are assigned over rounded scores with an id tie-break, making the
  fused output deterministic across partitionings and engines.

No counterpart in the 550-LoC reference (no text or vector retrieval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60


def bm25_topn(
    docs: DataFrame,
    terms: tuple[str, ...],
    depth: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-``depth`` for a disjunctive term query:
    (doc_id, sparse_rank). Lucene-form idf; corpus scalars (N, avgdl) ride
    along via broadcast cross-join — no driver collect."""
    toks = docs.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(text_col), "[^a-z]+"), lambda x: x != F.lit("")
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.where(F.col("term").isin(*terms))
        .join(F.broadcast(df_.where(F.col("term").isin(*terms))), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "w",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(depth)
    )
    return scored.select(
        id_col,
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), id_col))
        .alias("sparse_rank"),
    )


def cosine_topn(
    vectors: DataFrame,
    query_id: int,
    depth: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dense top-``depth`` by cosine similarity to the ``query_id`` row:
    (vec_id, dense_rank). The single query vector is a broadcast one-row
    cross-join; the dot/norm fold is a codegen ``aggregate`` over zipped
    dimensions (no Python)."""
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = v.where(F.col(id_col) == query_id).select(F.col("v").alias("qv"))
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, c: a * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        v.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(dot / (norm(F.col("v")) * norm(F.col("qv"))), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), id_col)
        .limit(depth)
    )
    return scored.select(
        id_col,
        F.row_number()
        .over(Window.orderBy(F.col("cos").desc(), id_col))
        .alias("dense_rank"),
    )


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    topk: int,
    *,
    sparse_id: str = "doc_id",
    dense_id: str = "vec_id",
    k: int = RRF_K,
) -> DataFrame:
    """Full-outer-join the two rank lists on id and score each document
    ``sum(1 / (k + rank))`` over the lists it appears in; top-``topk`` by
    (score desc, id). Both inputs are depth-bounded, so the join is
    broadcast-sized however large the corpus."""
    s = sparse.withColumnRenamed(sparse_id, "doc_id")
    d = dense.withColumnRenamed(dense_id, "doc_id")
    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(k)) + F.col(r)), F.lit(0.0)
    )
    return (
        s.join(d, "doc_id", "full_outer")
        .select(
            "doc_id",
            "sparse_rank",
            "dense_rank",
            F.round(term("sparse_rank") + term("dense_rank"), 6).alias(
                "rrf_score"
            ),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(topk)
    )

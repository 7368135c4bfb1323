"""Similarity search over embedding columns.

Two tiers:

* **Brute-force top-k** — broadcast the (small) query set against the full
  corpus, JVM-side cosine, per-query top-k via row_number. Exact; cost is
  O(|queries| × |corpus| × dim) with no shuffle of the corpus (queries are
  broadcast). This is the correctness baseline and is genuinely the right
  plan whenever |queries| is small — at 100 TB the corpus scan dominates
  and is embarrassingly parallel.
* **IVF (inverted-file) top-k** — the scale path: partition the corpus by
  nearest centroid (one broadcast of the centroid table, one narrow pass),
  then search only the ``n_probe`` closest clusters per query. Recall < 1
  by construction; the trade is measured in tests against brute force.
  Centroid selection here is deterministic (fixed ids) so results are
  stable; production would k-means on a sample.

Ranking determinism: ordering is on round(sim, 6) desc then neighbor id, so
double-precision noise below 1e-6 can't reorder results across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..operators.topk import top_k_per_group


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded)."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_similarity(F.col("__qv"), F.col("__cv")))
    )
    ranked = top_k_per_group(
        scored,
        ["query_id"],
        [F.round("sim", 6).desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )
    return ranked.select(
        "query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id",
        F.round("sim", 4).alias("cosine_sim"),
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    centroid_id: str,
    centroid_vec: str,
    k: int,
    n_probe: int = 3,
) -> DataFrame:
    """Approximate top-k: corpus rows are assigned to their nearest centroid
    once; each query searches only its ``n_probe`` nearest clusters.

    Both assignment passes are broadcast joins against the centroid table —
    the corpus never shuffles until the final per-query rank, whose input is
    already cut down by the cluster filter.
    """
    cent = centroids.select(
        F.col(centroid_id).alias("cluster_id"), F.col(centroid_vec).alias("__centv")
    )

    def assign(df: DataFrame, id_out: str, vec_out: str, n_keep: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent)).withColumn(
            "__csim", cosine_similarity(F.col(vec_out), F.col("__centv"))
        )
        ranked = top_k_per_group(
            scored,
            [id_out],
            [F.round("__csim", 6).desc(), F.col("cluster_id").asc()],
            n_keep,
            rank_col="__crank",
        )
        return ranked.select(id_out, vec_out, "cluster_id")

    corpus_assigned = assign(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "neighbor_id",
        "__cv",
        1,
    )
    query_probes = assign(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv")),
        "query_id",
        "__qv",
        n_probe,
    )
    scored = (
        corpus_assigned.join(F.broadcast(query_probes), on="cluster_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_similarity(F.col("__qv"), F.col("__cv")))
    )
    ranked = top_k_per_group(
        scored,
        ["query_id"],
        [F.round("sim", 6).desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )
    return ranked.select(
        "query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id",
        F.round("sim", 4).alias("cosine_sim"),
    )

"""Round-8 extension wave: SemDeDup — cluster-blocked semantic deduplication.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") is the canonical recipe for
pruning semantically-redundant training documents: cluster the embedding
space, then compare pairs ONLY within a cluster and keep one representative
of each near-duplicate group. The engine already ships the two other
embedding-dedup blocking strategies (exact blocked all-pairs and
hyperplane-LSH candidates, plans/extras3.py); this adds the
cluster-blocked third, which is the variant the paper actually ran at
LAION/CommonCrawl scale because the cluster index is reusable and the
per-cluster work is embarrassingly parallel.

Scale shape: assignment is one broadcast N x K pass (K ~ sqrt(N), the same
rule the IVF witness uses), then one shuffle on cluster_id and
within-cluster pairs (sum of c_i^2 ~ N^1.5 for balanced clusters). At
100 TB you would feed real k-means centroids (kmeans_embeddings) and cap
cluster size (split oversized clusters on a secondary hash) — the witness
uses deterministic stride centroids so the DuckDB oracle can replay
centroid choice, assignment tie-breaks, and the keep rule exactly,
making this a hash-checked witness rather than a recall claim.

Keep rule (deterministic keep-first): within a cluster, a vector is
DROPPED iff some lower-id vector in the same cluster has cosine
similarity >= TAU with it — regardless of whether that lower-id vector
itself survives. This is the standard sort-order sweep (identical to the
exact-dedup keep-first convention elsewhere in the engine) and is what
makes the result order-insensitive and SQL-expressible.

No counterpart in the 550-LoC reference (no embeddings at all there);
this is LLM-training-data surface the mandate names explicitly
(embedding-cosine near-dup).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_prenorm, l2_norm
from ..sources.readers import load_table
from .catalog import Query

SEMDEDUP_TAU = 0.4  # same near-dup threshold as the LSH/exact embedding twins


def _semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors of SemDeDup pruning: (vec_id, cluster_id) for every vector
    NOT dropped by the keep-first rule, ordered by vec_id.

    Assignment: nearest of K ~ sqrt(N) stride centroids under the engine's
    standard deterministic order — round(cos, 6) DESC, centroid id ASC —
    encoded as one BIGINT max_by key so the aggregate gets map-side
    combine (no window over the N x K scored pairs). The centroid table is
    broadcast; the corpus never shuffles until the per-cluster pair join."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    stride = int(math.isqrt(e.count()))  # one scalar action, K ~ sqrt(N)
    cents = e.where(F.col("vec_id") % stride == 0).select(
        (F.col("vec_id") / stride).cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
        l2_norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        e.withColumn("vn", l2_norm(F.col("embedding")))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "s",
            cosine_similarity_prenorm(
                F.col("embedding"), F.col("cv"), F.col("vn"), F.col("cn")
            ),
        )
    )
    # BIGINT composite key: micro-rounded similarity then smaller-cid
    # tie-break. The double round before the cast matters — round(s,6)*1e6
    # lands within fp-epsilon of an integer and Spark's bigint cast
    # truncates while DuckDB's rounds, so both engines re-round to the
    # exact integer first.
    key = F.round(F.round(F.col("s"), 6) * 1000000, 0).cast("bigint") * F.lit(
        10000000
    ).cast("bigint") - F.col("cid")
    assigned = scored.groupBy("vec_id").agg(F.max_by("cid", key).alias("cid"))
    m = assigned.join(e, "vec_id")  # vec_id, cid, embedding
    left = m.select(
        F.col("cid"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    right = m.select(
        F.col("cid"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    dropped = (
        left.join(right, "cid")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(
            F.round(
                cosine_similarity_prenorm(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                6,
            )
            >= SEMDEDUP_TAU
        )
        .select("vec_b")
        .distinct()
    )
    return (
        m.join(dropped, m.vec_id == dropped.vec_b, "left_anti")
        .select("vec_id", F.col("cid").alias("cluster_id"))
        .orderBy("vec_id")
    )


_SEMDEDUP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
st AS (SELECT CAST(floor(sqrt(count(*))) AS BIGINT) AS stride FROM e),
cents AS (
  SELECT CAST(e.vec_id // st.stride AS INT) AS cid, e.v AS cv
  FROM e CROSS JOIN st WHERE e.vec_id % st.stride = 0
),
scored AS (
  SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cv) AS s
  FROM e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id,
         arg_max(cid, CAST(round(round(s, 6) * 1000000, 0) AS BIGINT)
                      * 10000000 - cid) AS cid
  FROM scored GROUP BY vec_id
),
m AS (SELECT a.vec_id, a.cid, e.v FROM assigned a JOIN e USING (vec_id)),
dropped AS (
  SELECT DISTINCT y.vec_id AS vec_b
  FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
  WHERE round(list_cosine_similarity(x.v, y.v), 6) >= {SEMDEDUP_TAU}
)
SELECT m.vec_id, m.cid AS cluster_id
FROM m LEFT JOIN dropped d ON m.vec_id = d.vec_b
WHERE d.vec_b IS NULL
ORDER BY vec_id
"""

QUERIES = [
    Query(
        "semdedup_prune",
        _semdedup_prune,
        _SEMDEDUP_SQL,
        ("llm", "dedup", "embedding", "semdedup"),
    ),
]

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

Scale shape: assignment is one Arrow/BLAS matmul pass per batch against
the broadcast centroid matrix (round 10 — the SQL crossJoin + interpreted
HOF cosine it replaced was the repo's slowest decade-3 run, 1719 s at
sf100), then one shuffle on cluster_id and within-cluster pairs (sum of
c_i^2 ~ N^1.5 for balanced stride clusters). Two centroid rules are
witnessed: ``semdedup_prune`` uses deterministic stride centroids
(K ~ sqrt(N)) so the oracle replays centroid choice exactly, and
``semdedup_prune_kmeans`` is the 100 TB production form — a trained
fixed-K Lloyd model (plans/extras9) feeding the same assigner, O(N·K·d)
BLAS with corpus-independent K. At 100 TB the cluster size must be
capped, and two split rules are shipped: ``semdedup_prune_kmeans_capped``
(random ``vec_id % nsub`` hash — one corpus shuffle, recall ~1/nsub for
pair dups) and ``semdedup_prune_kmeans_capped_proj`` (rank members by
cosine-to-centroid and chunk runs of CAP — same shuffle count, up to 6x
the hash split's recall; round-12 measurement in SCALING.md). All are
hash-checked witnesses; the recall numbers are measured, not claimed.

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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.plan import sorted_once
from ..operators.similarity import nearest_centroids_arrow
from ..session import pinned_shuffle_partitions
from ..sources.readers import load_table
from .catalog import Query
from .extras9 import KMEANS_ITERS, lloyd_centroids, lloyd_cte_parts

SEMDEDUP_TAU = 0.4  # same near-dup threshold as the LSH/exact embedding twins

# Sub-cluster size cap for the capped production variant. Pinned small so the
# split rule is actually exercised at the oracle scale factors (fixed-K
# clusters hold ~60 members at sf0.01, ~250 at sf0.1); a production run would
# set this ~1e5 and tune recall vs the per-task O(cap^2) sweep budget.
# _semdedup_kmeans_capped_sql interpolates this constant directly, so the
# Spark and oracle sides cannot drift.
SEMDEDUP_CAP = 32


def _semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors of SemDeDup pruning: (vec_id, cluster_id) for every vector
    NOT dropped by the keep-first rule, ordered by vec_id.

    Assignment (round 10): the N x K nearest-centroid pass runs on the
    Arrow/BLAS assigner (operators/similarity.nearest_centroids_arrow) —
    one matmul per Arrow batch against the broadcast K ~ sqrt(N) centroid
    matrix, zero shuffle. The original SQL crossJoin + higher-order-
    function cosine was the exact pattern the round-9 decade-3 program
    convicted in the IVF build (O(N^1.5) INTERPRETED pair work; 1719 s at
    sf100, the slowest run in the whole scale program). Ordering contract
    is unchanged — round(cos, 6) DESC half-away-from-zero, centroid id ASC
    (stride cids are 0..K-1, so the assigner's rank tie-break IS the cid
    tie-break) — so the DuckDB oracle below replays assignments exactly.
    The corpus never shuffles until the per-cluster pair join."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    stride = int(math.isqrt(e.count()))  # one scalar action, K ~ sqrt(N)
    cents = e.where(F.col("vec_id") % stride == 0).select(
        (F.col("vec_id") / stride).cast("int").alias("cid"), "embedding"
    )
    # (vec_id, embedding, cid): the assigner carries the vector through,
    # so no re-join with the corpus is needed
    m = nearest_centroids_arrow(e, cents, "vec_id", "embedding", "cid", 1)
    return _prune_survivors(m)


_SWEEP_BLOCK = 2048  # row-block CAP of the per-cluster cosine matmul
# Per-task byte budget for one sweep block's similarity temporaries
# (the (block, e) float64 matmul output plus its int64 quantized copy,
# 16 bytes per cell). Same auto-sizing convention as
# similarity.cosine_pairs_blocked: the block SHRINKS as the cluster
# grows, so per-task sims memory is ~flat in cluster size instead of
# linear — the fixed block=2048 was what made the uncapped decade-3
# sweep (clusters ~250k members) exceed worker memory (SCALING.md r11).
# Block size never changes results (the blocked sweep is exact), only
# the BLAS call granularity.
_SWEEP_BYTES = 512 << 20


def _sweep_block(c: int) -> int:
    """Row-block size for a c-member cluster: the fixed 2048 cap while it
    fits the byte budget, else the largest block that does (floor 64)."""
    return max(64, min(_SWEEP_BLOCK, _SWEEP_BYTES // (max(c, 1) * 16)))


def _prune_survivors(
    m: DataFrame,
    extra_group_cols: tuple[str, ...] = (),
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """Keep-first sweep over an assigned corpus ``m = (vec_id, embedding,
    cid)``: a vector is dropped iff a lower-id vector in the same cluster
    has round(cosine, 6) >= TAU with it. Shared by the stride-centroid
    and fixed-K k-means variants.

    Round-10 plan: one shuffle on cid, then each cluster sweeps itself in
    a single applyInPandas call — blockwise BLAS matmul over the
    normalized member matrix plus a strictly-lower-triangle any() per
    row, the same quantize-half-up rounding contract as the assigner.
    The self-join form this replaces evaluated the same sum(c_i^2)
    within-cluster pairs through the interpreted higher-order-function
    cosine — after the assignment moved to BLAS (this round's first
    fix), that sweep was the whole remaining decade-3 cost (1091 s of
    the sf100 run). Sims temporaries per task are bounded at
    _SWEEP_BYTES via the auto-sized block (round 14; the fixed 2048
    block made them linear in cluster size, the witnessed d3 OOM), so
    the remaining per-task growth is the c x dim member matrix itself —
    linear, and what the capped variants below bound with the upstream
    split; a pathologically skewed cluster still wants that cap at
    100 TB."""
    from ..operators.similarity import _normalized_batch

    tau_q = int(round(tau * 1_000_000))
    id_t = dict(m.dtypes)["vec_id"]
    cid_t = dict(m.dtypes)["cid"]

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        unit = _normalized_batch(pdf["embedding"])
        c = len(pdf)
        blk = _sweep_block(c)
        drop = np.zeros(c, dtype=bool)
        for s in range(0, c, blk):
            e = min(s + blk, c)
            sims = unit[s:e] @ unit[:e].T  # (block, e) float64
            # Threshold without materializing the int64 quantized copy:
            # for integer tau_q >= 1, _quantize_half_up(sims) >= tau_q
            # <=> floor(|f| + 0.5) >= tau_q on the positive branch
            # <=> f + 0.5 >= tau_q (floor(x) >= n <=> x >= n for int n;
            # f <= 0 gives f + 0.5 <= 0.5 < tau_q, matching its negative
            # quantization) -- bit-exact, same float ops, ~half the
            # per-block passes of quantize-then-compare.
            np.multiply(sims, 1_000_000.0, out=sims)
            np.add(sims, 0.5, out=sims)
            hit = sims >= tau_q  # bool (block, e)
            # row b = s+i may only be dropped by columns a < b: every
            # column < s qualifies outright; the diagonal block needs
            # the strict lower triangle
            tri = np.arange(e - s)[None, :] < np.arange(e - s)[:, None]
            drop[s:e] = hit[:, :s].any(axis=1) | (hit[:, s:] & tri).any(
                axis=1
            )
        return pdf.loc[~drop, ["vec_id", "cid"]].rename(
            columns={"cid": "cluster_id"}
        )

    # sorted_once: orderBy's range-bound sampling pass re-executed the
    # whole assignment mapInPandas + shuffle + BLAS sweep — TWICE per
    # action before round 14 (see functions/plan.py). Survivor rows are
    # (id, cid) only, so the per-build blocks are tiny at any corpus
    # size. Plan gates that pin this pipeline's shape (arrow assigner,
    # single corpus shuffle) monkeypatch sorted_once back to a plain
    # orderBy so the computation plan stays inspectable in tests.
    return sorted_once(
        m.groupBy("cid", *extra_group_cols).applyInPandas(
            sweep, f"vec_id {id_t}, cluster_id {cid_t}"
        ),
        "vec_id",
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

def _semdedup_prune_kmeans(
    spark: SparkSession, sf_dir: str, tau: float = SEMDEDUP_TAU
) -> DataFrame:
    """Fixed-K SemDeDup — the 100 TB posture SCALING.md documents for the
    stride witness, now running code: centroids are the trained
    kmeans_embeddings model (K = KMEANS_K, KMEANS_ITERS Lloyd updates,
    deterministic init — plans/extras9.lloyd_centroids), not every-
    stride-th row, and the final assignment is the same Arrow/BLAS cosine
    pass as the stride variant. K is pinned by the model, so the
    assignment is O(N·K·d) BLAS work with a fixed K — the corpus-
    independent cost the paper's production form relies on (vs the
    stride rule's K ~ sqrt(N)). The keep-first sweep is the shared
    per-cluster pair join. Oracle: the k-means witness's unrolled Lloyd
    CTE chain (same model, bit-for-bit tie rules) + cosine arg_max
    assignment + the standard sweep — hash-checked end to end."""
    with pinned_shuffle_partitions(spark):
        pts = (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .localCheckpoint()  # scanned once per Lloyd iteration
        )
        model = lloyd_centroids(pts)
    cdf = spark.createDataFrame(
        [(cid, vec) for cid, vec in model], "cid int, embedding array<double>"
    )
    m = nearest_centroids_arrow(pts, cdf, "vec_id", "embedding", "cid", 1)
    return _prune_survivors(m, tau=tau)  # (vec_id, cluster_id)


def _semdedup_prune_kmeans_capped(
    spark: SparkSession, sf_dir: str, cap: int = SEMDEDUP_CAP,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """Cluster-size-capped SemDeDup — the shape that survives decade 3.

    The fixed-K form above is honest about its ceiling: with K pinned and N
    growing, per-cluster membership is ~N/K, so the keep-first sweep's pair
    work is N^2/K and its per-task block temporaries grow with the cluster
    (SWEEP_BLOCK x c_i int64). SCALING.md has promised the mitigation since
    round 10: split oversized clusters on a secondary hash before sweeping.
    This entry is that mitigation as running code — after the Arrow/BLAS
    assignment, each cluster is split into ``ceil(c_i / SEMDEDUP_CAP)``
    sub-clusters keyed by ``vec_id % nsub`` (a deterministic, SQL-replayable
    "secondary hash"; sizes are capped in expectation, the standard
    hash-split posture), and the sweep runs per (cid, sub). Pair work drops
    to ~N * cap / 2 (linear in N), and per-task memory is bounded by the cap
    regardless of corpus size. The price is recall: near-dup pairs landing
    in different sub-clusters are not compared — the documented
    approximation trade every production SemDeDup at this scale makes.

    The per-cluster sizes aggregate collapses map-side to K rows and joins
    back as a broadcast, so the corpus still shuffles exactly once (on the
    (cid, sub) grouping); the assignment scan runs twice against the
    localCheckpointed points, which is cheaper than a second full-corpus
    shuffle. Oracle: the same unrolled Lloyd CTE chain + arg_max assignment,
    then the identical integer-arithmetic split rule and the standard sweep
    restricted to (cid, sub) — hash-checked end to end.

    ``cap`` parameterizes the split for the recall-vs-CAP sweep
    (tools/recall_capped_semdedup.py, round 12); the catalog entry always
    runs the pinned SEMDEDUP_CAP so the oracle SQL stays in lockstep."""
    with pinned_shuffle_partitions(spark):
        pts = (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .localCheckpoint()
        )
        model = lloyd_centroids(pts)
    cdf = spark.createDataFrame(
        [(cid, vec) for cid, vec in model], "cid int, embedding array<double>"
    )
    # NOT checkpointed (r15 audit): sizes and the split both consume the
    # assignment, but a clean A/B toggling only a lazy checkpoint here read
    # 1.01x at sf0.1 AND at a decade-1 embeddings fixture — the duplicate
    # Arrow pass over the checkpointed points stays cheaper than
    # materializing (vec_id, embedding, cid), exactly the trade the
    # docstring above documents.
    m = nearest_centroids_arrow(pts, cdf, "vec_id", "embedding", "cid", 1)
    sizes = m.groupBy("cid").agg(F.count(F.lit(1)).alias("c_sz"))
    m_sub = (
        m.join(F.broadcast(sizes), "cid")
        .withColumn(
            "sub",
            F.expr(
                f"cast(vec_id % ((c_sz + {cap - 1}) div {cap}) as int)"
            ),
        )
        .drop("c_sz")
    )
    return _prune_survivors(m_sub, extra_group_cols=("sub",), tau=tau)


def _semdedup_prune_kmeans_capped_proj(
    spark: SparkSession, sf_dir: str, cap: int = SEMDEDUP_CAP,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """Locality-preserving capped SemDeDup — same hard per-task bound as
    the hash-split form, measurably higher recall.

    The round-12 recall sweep (tools/recall_capped_semdedup.py →
    SCALING.md) put a number on the hash split's documented trade:
    ``vec_id % nsub`` scatters a near-dup pair into the same sub-cluster
    with probability ~1/nsub, so recall vs the uncapped ground truth was
    0.42/0.15/0.03/0.02 at sf0.01/sf0.1/d1/d2 with CAP=32. This variant
    replaces the random split with a LOCALITY split: members of each
    cluster are ranked by their quantized cosine to the cluster centroid
    (``__simq`` from the same Arrow/BLAS assignment pass — no extra
    compute), ties broken by vec_id, and consecutive runs of CAP become
    the sub-clusters. By the triangle inequality on angles, a near-dup
    pair's centroid-cosines differ by at most the pair's own angle, so
    near-dups sit close in the ranking and usually share a chunk. That
    makes the recall advantage MEASURED, not proven — a chunk boundary
    can still separate a pair the hash split happens to co-locate — but
    the round-12 sweep found proj ≥ hash at every measured cell (6.0× at
    200k vectors), and tests pin proj ≥ hash at the swept scale factors.

    Cost vs hash: a per-cluster sort-spill window — and NO extra shuffle:
    the executed plan (verified via .explain) carries exactly one corpus
    Exchange, because hashpartitioning(cid) from the rank window already
    satisfies the sweep's ClusteredDistribution(cid, sub), so Catalyst
    inserts only a partition-local sort between them. Per-task memory
    stays bounded (sort-based window spills; sweep groups ≤ CAP). Oracle:
    same Lloyd CTEs + arg_max assignment, then the identical rank rule
    (row_number over (simq DESC, vec_id) per cluster, chunked by CAP) —
    hash-checked end to end."""
    with pinned_shuffle_partitions(spark):
        pts = (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .localCheckpoint()
        )
        model = lloyd_centroids(pts)
    cdf = spark.createDataFrame(
        [(cid, vec) for cid, vec in model], "cid int, embedding array<double>"
    )
    m = nearest_centroids_arrow(
        pts, cdf, "vec_id", "embedding", "cid", 1, emit_sim=True
    )
    w = Window.partitionBy("cid").orderBy(
        F.col("__simq").desc(), F.col("vec_id")
    )
    m_sub = (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn("sub", F.expr(f"cast((rn - 1) div {cap} as int)"))
        .drop("__simq", "rn")
    )
    return _prune_survivors(m_sub, extra_group_cols=("sub",), tau=tau)


def _semdedup_kmeans_capped_proj_sql() -> str:
    ctes = ",\n".join(lloyd_cte_parts(final_assign=False))
    return f"""
WITH {ctes},
assigned AS MATERIALIZED (
  SELECT p.vec_id,
         arg_max(c.cluster,
                 CAST(round(round(list_cosine_similarity(
                        CAST(p.embedding AS DOUBLE[]), c.cent), 6)
                      * 1000000, 0) AS BIGINT) * 10000000 - c.cluster) AS cid
  FROM pts p CROSS JOIN c{KMEANS_ITERS} c GROUP BY p.vec_id
),
m AS (
  SELECT a.vec_id, a.cid, CAST(e.embedding AS DOUBLE[]) AS v,
         CAST(round(round(list_cosine_similarity(
                CAST(e.embedding AS DOUBLE[]), c.cent), 6)
              * 1000000, 0) AS BIGINT) AS simq
  FROM assigned a
  JOIN pts e USING (vec_id)
  JOIN c{KMEANS_ITERS} c ON c.cluster = a.cid
),
ranked AS (
  SELECT vec_id, cid, v,
         CAST((row_number() OVER (PARTITION BY cid
                                  ORDER BY simq DESC, vec_id) - 1)
              // {SEMDEDUP_CAP} AS INT) AS sub
  FROM m
),
dropped AS (
  SELECT DISTINCT y.vec_id AS vec_b
  FROM ranked x JOIN ranked y
    ON x.cid = y.cid AND x.sub = y.sub AND x.vec_id < y.vec_id
  WHERE round(list_cosine_similarity(x.v, y.v), 6) >= {SEMDEDUP_TAU}
)
SELECT r.vec_id, r.cid AS cluster_id
FROM ranked r LEFT JOIN dropped d ON r.vec_id = d.vec_b
WHERE d.vec_b IS NULL
ORDER BY vec_id
"""


def _semdedup_kmeans_sql() -> str:
    ctes = ",\n".join(lloyd_cte_parts(final_assign=False))
    return f"""
WITH {ctes},
assigned AS MATERIALIZED (
  SELECT p.vec_id,
         arg_max(c.cluster,
                 CAST(round(round(list_cosine_similarity(
                        CAST(p.embedding AS DOUBLE[]), c.cent), 6)
                      * 1000000, 0) AS BIGINT) * 10000000 - c.cluster) AS cid
  FROM pts p CROSS JOIN c{KMEANS_ITERS} c GROUP BY p.vec_id
),
m AS (
  SELECT a.vec_id, a.cid, CAST(e.embedding AS DOUBLE[]) AS v
  FROM assigned a JOIN pts e USING (vec_id)
),
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


def _semdedup_kmeans_capped_sql() -> str:
    ctes = ",\n".join(lloyd_cte_parts(final_assign=False))
    return f"""
WITH {ctes},
assigned AS MATERIALIZED (
  SELECT p.vec_id,
         arg_max(c.cluster,
                 CAST(round(round(list_cosine_similarity(
                        CAST(p.embedding AS DOUBLE[]), c.cent), 6)
                      * 1000000, 0) AS BIGINT) * 10000000 - c.cluster) AS cid
  FROM pts p CROSS JOIN c{KMEANS_ITERS} c GROUP BY p.vec_id
),
sizes AS (SELECT cid, count(*) AS c_sz FROM assigned GROUP BY cid),
m AS (
  SELECT a.vec_id, a.cid,
         CAST(a.vec_id % ((s.c_sz + {SEMDEDUP_CAP - 1}) // {SEMDEDUP_CAP})
              AS INT) AS sub,
         CAST(e.embedding AS DOUBLE[]) AS v
  FROM assigned a JOIN sizes s USING (cid) JOIN pts e USING (vec_id)
),
dropped AS (
  SELECT DISTINCT y.vec_id AS vec_b
  FROM m x JOIN m y
    ON x.cid = y.cid AND x.sub = y.sub AND x.vec_id < y.vec_id
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
    Query(
        # Superseded at scale by semdedup_prune_kmeans_capped: the uncapped
        # within-cluster sweep is O(max_cluster²) per task and was witnessed
        # OOM-ing at decade 3 (SCALE_RUNS_DECADE3.json, round 11). Kept as
        # the exact-recall ceiling witness and the capped form's ground
        # truth at oracle scales; do NOT ship this form against a corpus
        # whose largest cluster can exceed task memory.
        "semdedup_prune_kmeans",
        _semdedup_prune_kmeans,
        _semdedup_kmeans_sql(),
        ("llm", "dedup", "embedding", "semdedup", "iterative",
         "superseded-at-scale"),
    ),
    Query(
        "semdedup_prune_kmeans_capped",
        _semdedup_prune_kmeans_capped,
        _semdedup_kmeans_capped_sql(),
        ("llm", "dedup", "embedding", "semdedup", "iterative", "scale"),
    ),
    Query(
        "semdedup_prune_kmeans_capped_proj",
        _semdedup_prune_kmeans_capped_proj,
        _semdedup_kmeans_capped_proj_sql(),
        ("llm", "dedup", "embedding", "semdedup", "iterative", "scale",
         "recall"),
    ),
]

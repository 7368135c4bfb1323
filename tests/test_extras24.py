"""Round-8 wave: SemDeDup cluster-blocked semantic dedup."""

from __future__ import annotations

import math

import numpy as np

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras24 import SEMDEDUP_TAU
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def _numpy_semdedup(emb: dict[int, np.ndarray]):
    """First-principles replay: stride centroids, round(cos,6)-desc /
    cid-asc assignment, keep-first prune within clusters."""
    stride = math.isqrt(len(emb))
    cents = {
        int(vid // stride): v for vid, v in sorted(emb.items()) if vid % stride == 0
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assigned = {}
    for vid, v in emb.items():
        best = max(
            cents.items(), key=lambda cv: (round(cos(v, cv[1]), 6), -cv[0])
        )[0]
        assigned[vid] = best
    clusters: dict[int, list[int]] = {}
    for vid in sorted(assigned):
        clusters.setdefault(assigned[vid], []).append(vid)
    survivors = {}
    for cid, members in clusters.items():
        for i, b in enumerate(members):
            dropped = any(
                round(cos(emb[a], emb[b]), 6) >= SEMDEDUP_TAU for a in members[:i]
            )
            if not dropped:
                survivors[b] = cid
    return survivors


def test_semdedup_matches_numpy_replay(spark):
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    want = _numpy_semdedup(emb)
    got = {
        r.vec_id: r.cluster_id
        for r in all_queries()["semdedup_prune"].build(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_semdedup_drops_something_and_keeps_first(spark):
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    all_ids = {r.vec_id for r in rows}
    kept = {
        r.vec_id
        for r in all_queries()["semdedup_prune"].build(spark, SF_SMOKE).collect()
    }
    assert kept < all_ids, "prune should drop at least one near-duplicate"
    # keep-first: the smallest vec_id can never be dropped (no predecessor)
    assert min(all_ids) in kept


def test_semdedup_plan_broadcasts_centroids(spark):
    plan = (
        all_queries()["semdedup_prune"]
        .build(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan  # all codegen, no Python-row UDFs

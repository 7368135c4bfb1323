"""Hybrid RRF retrieval (operators/retrieval.py)."""

from __future__ import annotations

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras27 import (
    HYBRID_DEPTH,
    HYBRID_TOPK,
)
from bridge_monitoring_pyspark_spark.operators.retrieval import RRF_K

from testdata_paths import SF_SMOKE


def test_hybrid_rrf_scores_and_order(spark):
    rows = (
        all_queries()["hybrid_rrf_retrieval"].build(spark, SF_SMOKE).collect()
    )
    assert len(rows) == HYBRID_TOPK
    # fused score must equal the RRF formula over the reported ranks
    for r in rows:
        want = sum(
            1.0 / (RRF_K + rank)
            for rank in (r.sparse_rank, r.dense_rank)
            if rank is not None
        )
        assert abs(r.rrf_score - want) < 1e-6
        for rank in (r.sparse_rank, r.dense_rank):
            assert rank is None or 1 <= rank <= HYBRID_DEPTH
    # descending by score, doc_id tie-break
    key = [(-r.rrf_score, r.doc_id) for r in rows]
    assert key == sorted(key)
    # fusion is doing something: at least one doc present in both lists
    # ranks above any single-list doc with comparable rank
    both = [r for r in rows if r.sparse_rank and r.dense_rank]
    assert both, "expected some doc in both top lists on the fixture corpus"


def test_hybrid_rrf_includes_single_list_docs(spark):
    rows = (
        all_queries()["hybrid_rrf_retrieval"].build(spark, SF_SMOKE).collect()
    )
    # the full-outer fuse keeps docs that only one retriever surfaced
    # (dense-only docs exist because BM25 term hits are sparse)
    assert any(r.sparse_rank is None or r.dense_rank is None for r in rows)

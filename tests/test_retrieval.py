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


def test_temperature_mix_weights_replay(spark):
    import math
    import re

    from bridge_monitoring_pyspark_spark.plans.extras27 import (
        MIX_ALPHA,
        MIX_BUDGET_TOKENS,
    )
    from bridge_monitoring_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    tok = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    agg: dict[str, list[int]] = {}
    for r in docs:
        a = agg.setdefault(r.source, [0, 0])
        a[0] += 1
        a[1] += len(tok.findall(r.text))
    raw = {s: math.pow(t, MIX_ALPHA) for s, (_, t) in agg.items()}
    raw_total = sum(raw.values())
    tok_total = sum(t for _, t in agg.values())
    got = (
        all_queries()["temperature_mix_weights"].build(spark, SF_SMOKE).collect()
    )
    assert [r.source for r in got] == sorted(agg)
    for r in got:
        n_docs, n_tokens = agg[r.source]
        assert (r.n_docs, r.n_tokens) == (n_docs, n_tokens)
        p = raw[r.source] / raw_total
        assert abs(r.mix_weight - p) < 1e-3
        assert abs(r.epochs_at_budget - p * MIX_BUDGET_TOKENS / n_tokens) < 1e-2
        assert abs(r.oversample_ratio - p / (n_tokens / tok_total)) < 1e-3
    # weights form a distribution; temperature flattens vs natural:
    # smaller-than-average sources oversample (>1), larger undersample (<1)
    assert abs(sum(r.mix_weight for r in got) - 1.0) < 1e-2
    mean_tok = tok_total / len(agg)
    for r in got:
        if r.n_tokens < 0.9 * mean_tok:
            assert r.oversample_ratio > 1
        if r.n_tokens > 1.1 * mean_tok:
            assert r.oversample_ratio < 1


def test_bm25_single_term_and_duplicate_terms(spark):
    """ADVICE r9: a single-term query is in-domain (the match predicate is
    an OR-fold, not F.greatest), and duplicate query terms dedupe
    first-seen instead of double-counting their score."""
    from bridge_monitoring_pyspark_spark.operators.retrieval import bm25_topn
    from bridge_monitoring_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    single = [
        (r.doc_id, r.sparse_rank) for r in bm25_topn(docs, ("hash",), 10).collect()
    ]
    assert single, "single-term query must rank matching docs"
    duped = [
        (r.doc_id, r.sparse_rank)
        for r in bm25_topn(docs, ("hash", "hash"), 10).collect()
    ]
    assert duped == single
    import pytest

    with pytest.raises(ValueError):
        bm25_topn(docs, (), 10)

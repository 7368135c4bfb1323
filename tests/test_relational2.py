"""Targeted tests for the second relational/LLM wave (plans/relational2.py,
plans/llmdata2.py): physical-plan expectations and semantic invariants the
DuckDB oracle can't express (determinism, coverage, numpy ground truth)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE

CATALOG = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_theta_join_is_broadcast_nested_loop(spark):
    """A join with no equality conjunct must plan as BroadcastNestedLoopJoin
    (tiny build side) — if this ever becomes a cartesian over a fact table
    the plan string changes and this trips."""
    df = CATALOG["theta_join_nation_pairs"].build(spark, SF_SMOKE)
    assert "BroadcastNestedLoopJoin" in _plan(df)


def test_q6_filters_reach_scan(spark):
    """Q6's three range predicates must be pushed into the parquet scan."""
    df = CATALOG["q6_forecast_revenue"].build(spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_q4_semi_join_physical(spark):
    df = CATALOG["q4_priority_fulfilment"].build(spark, SF_SMOKE)
    assert "LeftSemi" in _plan(df)


def test_chunking_covers_every_word(spark):
    """Stride-20/width-40 chunks: ceil(n/stride) chunks per doc, first chunk
    starts at word 1, chunk word-counts sum to n + overlap."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    n_words = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    chunks = CATALOG["doc_chunks_sliding"].build(spark, SF_SMOKE)
    got = (
        chunks.groupBy("doc_id")
        .agg(F.count("*").alias("n_chunks"), F.sum("chunk_words").alias("covered"))
        .join(n_words, "doc_id")
        .collect()
    )
    assert got, "no chunk rows"
    for r in got:
        expected_chunks = max(1, math.ceil(r.n / 20))
        assert r.n_chunks == expected_chunks, r
        # overlapping slices cover every word at least once:
        # sum of chunk sizes >= n, and == n when only one chunk exists
        assert r.covered >= r.n, r


def test_repetition_fractions_bounded(spark):
    df = CATALOG["repetition_signals_gopher"].build(spark, SF_SMOKE)
    bad = df.where(
        (F.col("top_word_frac") <= 0)
        | (F.col("top_word_frac") > 1)
        | (F.col("top_bigram_frac") <= 0)
        | (F.col("top_bigram_frac") > 1)
        | (F.col("top_bigram_frac") < F.col("top_word_frac") * 0)  # sanity no-op guard
    ).count()
    assert bad == 0


def test_label_centroids_match_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    got = CATALOG["emb_label_centroids"].build(spark, SF_SMOKE).collect()
    for r in got:
        expect = round(float(np.mean([v[r.dim] for v in by_label[r.label]])), 4)
        assert abs(r.centroid_val - expect) <= 1e-9, (r, expect)


def test_hash_sampling_is_deterministic_and_near_rate(spark):
    q = CATALOG["sample_hash_docs"]
    a = [r.doc_id for r in q.build(spark, SF_SMOKE).collect()]
    b = [r.doc_id for r in q.build(spark, SF_SMOKE).collect()]
    assert a == b, "hash sample must be bit-identical across runs"
    total = load_table(spark, SF_SMOKE, "documents").count()
    rate = len(a) / total
    # threshold '1a' = 26/256 ≈ 10.2%; allow wide tolerance on small N
    assert 0.03 < rate < 0.25, rate


def test_percentiles_match_numpy(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    vals = {
        r.o_orderpriority: r
        for r in CATALOG["percentile_order_values"].build(spark, SF_SMOKE).collect()
    }
    rows = o.select("o_orderpriority", "o_totalprice").collect()
    by_prio: dict[str, list[float]] = {}
    for r in rows:
        by_prio.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for prio, xs in by_prio.items():
        p25, p50, p75 = np.percentile(np.array(xs), [25, 50, 75], method="linear")
        assert abs(vals[prio].p25 - round(float(p25), 4)) <= 1e-9
        assert abs(vals[prio].p50 - round(float(p50), 4)) <= 1e-9
        assert abs(vals[prio].p75 - round(float(p75), 4)) <= 1e-9

"""Tests for the fifteenth extension wave: profiling, EWMA, PageRank,
decontamination."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras14 import (
    PAGERANK_DAMPING,
    PAGERANK_ITERS,
)
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def test_pagerank_matches_numpy_replay(spark):
    got = {
        r.node: r.rank
        for r in all_queries()["pagerank_transitions"].build(spark, SF_SMOKE).collect()
    }
    # rebuild the same transition graph and run the same power iteration
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).toPandas().sort_values(["user_id", "ts", "event_id"])
    ev["dst"] = ev.groupby("user_id")["event_type"].shift(-1)
    steps = ev.dropna(subset=["dst"])
    counts = steps.groupby(["event_type", "dst"]).size()
    nodes = sorted(set(counts.index.get_level_values(0)) | set(counts.index.get_level_values(1)))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for (src, dst), w in counts.items():
        P[idx[dst], idx[src]] = w
    P /= np.maximum(P.sum(axis=0, keepdims=True), 1e-300)
    r = np.full(n, 1.0 / n)
    for _ in range(PAGERANK_ITERS):
        r = (1 - PAGERANK_DAMPING) / n + PAGERANK_DAMPING * (P @ r)
    for node, i in idx.items():
        assert abs(got[node] - r[i]) < 1e-6, node
    assert sum(got.values()) <= 1.0 + 1e-9


def test_ewma_covers_every_user_and_all_events(spark):
    rows = all_queries()["ewma_smoothing"].build(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    assert len(rows) == ev.select("user_id").distinct().count()
    assert sum(r.n_events for r in rows) == ev.count()
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    assert all(lo - 1e-9 <= r.ewma_last <= hi + 1e-9 for r in rows)


def test_column_profile_distincts_exact(spark):
    rows = {r.col_name: r for r in
            all_queries()["column_profile_summary"].build(spark, SF_SMOKE).collect()}
    o = load_table(spark, SF_SMOKE, "orders")
    for c in ("o_orderkey", "o_orderstatus"):
        assert rows[c].n_distinct == o.select(c).distinct().count()
        assert rows[c].n_nulls == o.where(F.col(c).isNull()).count()
    assert rows["o_orderkey"].min_val == str(
        o.agg(F.min("o_orderkey")).collect()[0][0]
    )


def test_decontamination_excludes_benchmark_docs(spark):
    rows = all_queries()["decontaminate_ngram_overlap"].build(spark, SF_SMOKE).collect()
    assert rows, "no contaminated docs found at smoke scale"
    for r in rows:
        assert r.doc_id % 50 != 0, "benchmark doc reported as contaminated"
        assert r.n_shared_grams > 0

"""Tests for training-sequence packing: token conservation and the
fixed-budget invariant (every sequence except the last holds exactly
PACK_BUDGET tokens — concat-and-chunk leaves no internal padding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.functions.text import token_count_estimate
from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras15 import PACK_BUDGET
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from conftest import SF_SMOKE


def test_packing_conserves_tokens_and_fills_budget(spark):
    rows = all_queries()["sequence_packing_stats"].build(spark, SF_SMOKE).collect()
    assert rows
    total = (
        load_table(spark, SF_SMOKE, "documents")
        .select(token_count_estimate(F.col("text")).cast("long").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.n_tokens for r in rows) == total
    for r in rows[:-1]:
        assert r.n_tokens == PACK_BUDGET, f"seq {r.seq_id} under-filled"
    assert 0 < rows[-1].n_tokens <= PACK_BUDGET
    assert [r.seq_id for r in rows] == list(range(len(rows)))

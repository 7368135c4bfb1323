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


def test_shuffle_rank_is_permutation(spark):
    rows = all_queries()["corpus_shuffle_rank"].build(spark, SF_SMOKE).collect()
    n = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n
    assert sorted(r.shuffle_rank for r in rows) == list(range(1, n + 1))
    # seeded rank must not be the identity order (it would mean no shuffle)
    assert [r.shuffle_rank for r in sorted(rows, key=lambda r: r.doc_id)] != list(
        range(1, n + 1)
    )


def test_hash_split_stable_under_corpus_growth(spark):
    # a document's split is a pure function of its id: assigning over a
    # half-corpus and the full corpus must agree on the shared documents
    import pyspark.sql.functions as SF

    from bridge_monitoring_pyspark_spark.plans.extras15 import _hash_split_assign

    full = {
        r.split: (r.n_docs, r.docid_checksum)
        for r in _hash_split_assign(spark, SF_SMOKE).collect()
    }
    assert set(full) == {"train", "val", "test"}
    d = load_table(spark, SF_SMOKE, "documents")
    half_ids = {r.doc_id for r in d.where(SF.col("doc_id") % 2 == 0).collect()}
    bucket = SF.expr(
        "CAST(conv(substring(md5(encode(CAST(doc_id AS STRING), 'UTF-8')), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    assign = {
        r.doc_id: r.b
        for r in d.select("doc_id", bucket.alias("b")).collect()
    }
    half_assign = {
        r.doc_id: r.b
        for r in d.where(SF.col("doc_id") % 2 == 0)
        .select("doc_id", bucket.alias("b"))
        .collect()
    }
    assert all(assign[i] == half_assign[i] for i in half_ids)


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

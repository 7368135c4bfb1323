"""Tests for training-sequence packing: token conservation and the
fixed-budget invariant (every sequence except the last holds exactly
PACK_BUDGET tokens — concat-and-chunk leaves no internal padding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.functions.text import token_count_estimate
from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras15 import PACK_BUDGET
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def test_shuffle_rank_is_permutation(spark):
    rows = all_queries()["corpus_shuffle_rank"].build(spark, SF_SMOKE).collect()
    n = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n
    assert sorted(r.shuffle_rank for r in rows) == list(range(1, n + 1))
    # seeded rank must not be the identity order (it would mean no shuffle)
    assert [r.shuffle_rank for r in sorted(rows, key=lambda r: r.doc_id)] != list(
        range(1, n + 1)
    )


def test_hash_split_matches_independent_replay(spark):
    # growth stability = the bucket is a pure function of the id alone.
    # Pin the FORMULA itself with an independent hashlib replay, then
    # check the query's per-split aggregates against that replay.
    import hashlib

    from bridge_monitoring_pyspark_spark.plans.extras15 import (
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        _hash_split_assign,
        split_bucket,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    got = {
        r.doc_id: r.b
        for r in d.select("doc_id", split_bucket("doc_id").alias("b")).collect()
    }

    def replay(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    assert got and all(b == replay(i) for i, b in got.items())

    def split_of(b: int) -> str:
        if b < SPLIT_TRAIN_PCT:
            return "train"
        if b < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT:
            return "val"
        return "test"

    expect: dict[str, list[int]] = {"train": [], "val": [], "test": []}
    for i in got:
        expect[split_of(replay(i))].append(i)
    rows = {r.split: r for r in _hash_split_assign(spark, SF_SMOKE).collect()}
    assert set(rows) == {k for k, v in expect.items() if v}
    for k, r in rows.items():
        assert r.n_docs == len(expect[k])
        assert r.docid_checksum == sum(expect[k])


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


def test_hierarchical_packing_equals_one_level(spark):
    """The two-level prefix sum must reproduce the one-level packer's
    manifest exactly (start offsets are bit-identical by construction)."""
    cat = all_queries()
    a = [tuple(r) for r in
         cat["sequence_packing_stats"].build(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in
         cat["sequence_packing_hierarchical"].build(spark, SF_SMOKE).collect()]
    assert a == b and a

"""Partition-pruned IVF index and k-anonymity generalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras29 import (
    K_ANON,
    ivf_index_dir,
)

from testdata_paths import SF_SMOKE


def test_pruned_index_matches_ivf_topk(spark):
    # same centroid rule, probes, and tie-breaks -> identical results
    idx = all_queries()["ann_ivf_pruned_index"].build(spark, SF_SMOKE).collect()
    ivf = all_queries()["ann_ivf_topk"].build(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in idx] == [tuple(r) for r in ivf]
    assert len(idx) > 0


def test_pruned_index_scan_has_partition_filters(spark):
    df = all_queries()["ann_ivf_pruned_index"].build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the index read must prune at the file-listing level: a scan node
    # with a non-empty PartitionFilters clause on cid
    assert "PartitionFilters: [cid" in plan.replace(
        "PartitionFilters: [isnotnull(cid", "PartitionFilters: [cid"
    ) or "cid#" in plan.split("PartitionFilters: [")[1].split("]")[0]


def test_pruned_index_reads_fewer_partitions_than_k(spark):
    import os

    idx_dir, stride = ivf_index_dir(spark, SF_SMOKE)
    all_cids = [d for d in os.listdir(idx_dir) if d.startswith("cid=")]
    probed = (
        all_queries()["ann_ivf_pruned_index"]
        .build(spark, SF_SMOKE)
        .select("neighbor_id")
        .count()
    )
    assert probed > 0
    # 10 queries x 3 probes can touch at most 30 clusters; the index holds
    # ~sqrt(N) of them, so pruning must leave some directories unread
    n = (
        spark.read.parquet(idx_dir)
        .select(F.countDistinct("cid"))
        .collect()[0][0]
    )
    assert len(all_cids) == n
    assert n > 3  # enough clusters that pruning is meaningful


def test_index_build_is_cached_per_sf_dir(spark):
    d1, s1 = ivf_index_dir(spark, SF_SMOKE)
    d2, s2 = ivf_index_dir(spark, SF_SMOKE)
    assert (d1, s1) == (d2, s2)


def test_k_anonymity_released_classes_reach_k(spark):
    rows = all_queries()["k_anonymity_generalize"].build(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.level == 0:
            assert r.source_gen != "*" and r.lang_gen != "*"
            assert r.n_docs >= K_ANON and r.n_cells_merged == 1
        elif r.level == 1:
            # the (lang, '*') class is the union of that language's
            # below-k cells and must itself reach k
            assert r.source_gen == "*" and r.lang_gen != "*"
            assert r.n_docs >= K_ANON
        else:
            assert (r.lang_gen, r.source_gen) == ("*", "*")


def test_k_anonymity_doc_counts_conserved(spark):
    from bridge_monitoring_pyspark_spark.sources.readers import load_table

    rows = all_queries()["k_anonymity_generalize"].build(spark, SF_SMOKE).collect()
    total = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == total


def test_assignment_broadcasts_released_after_index_build(spark):
    """ADVICE r9: repeated index builds must not accumulate centroid
    broadcasts. A FRESH ivf_index_dir build ends with an empty registry,
    and assignment still works afterwards (new broadcast, releasable)."""
    import shutil

    import pyspark.sql.functions as F

    from bridge_monitoring_pyspark_spark.operators import similarity as sim
    from bridge_monitoring_pyspark_spark.plans import extras29
    from bridge_monitoring_pyspark_spark.sources.readers import load_table

    sim.release_assignment_broadcasts()  # earlier tests' probe plans
    cached = extras29._IVF_INDEX.pop(SF_SMOKE, None)
    # ADVICE r10: a build's release must be scoped to its OWN mints. Mint
    # an unrelated lazy assignment plan first; it must survive the build
    # and still execute afterwards (its broadcast not destroyed).
    e0 = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    c0 = e0.where(F.col("vec_id") < 2).select(
        F.col("vec_id").cast("int").alias("cid"), "embedding"
    )
    pending = sim.nearest_centroids_arrow(
        e0.where(F.col("vec_id") < 8), c0, "vec_id", "embedding", "cid", 1
    )
    assert len(sim._ASSIGN_BROADCASTS) == 1  # ours, still lazy
    try:
        fresh_dir, _ = extras29.ivf_index_dir(spark, SF_SMOKE)
        # build released its own mint only; the pending plan's survives
        assert len(sim._ASSIGN_BROADCASTS) == 1
        assert pending.count() == 8  # executes fine post-build-release
        assert sim.release_assignment_broadcasts() == 1
        assert sim._ASSIGN_BROADCASTS == []
    finally:
        rebuilt = extras29._IVF_INDEX.pop(SF_SMOKE, None)
        if rebuilt:
            shutil.rmtree(rebuilt[0], ignore_errors=True)
        if cached:
            extras29._IVF_INDEX[SF_SMOKE] = cached
    # a fresh assignment after release must still compute (new broadcast)
    e = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    cents = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"), "embedding"
    )
    got = sim.nearest_centroids_arrow(e, cents, "vec_id", "embedding", "cid", 1)
    assert got.count() == e.count()
    assert len(sim._ASSIGN_BROADCASTS) == 1
    assert sim.release_assignment_broadcasts() == 1
    assert sim._ASSIGN_BROADCASTS == []

"""Physical-plan quality gates — the 100 TB design assertions.

Correctness tests prove the right rows come back; these prove the *plan*
is the one that survives a 1000-executor scale-up: filters reach the
parquet scan, dimension joins broadcast (the fact side never shuffles for
them), partition filters prune directories, and top-k compiles to
TakeOrderedAndProject instead of a global sort.
"""

from __future__ import annotations

import re
import tempfile

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE

CATALOG = all_queries()


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_filter_pushed_to_scan(spark):
    df = CATALOG["q1_pricing_summary"].build(spark, SF_SMOKE)
    plan = _executed_plan(df)
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_q1_column_pruning(spark):
    df = CATALOG["q1_pricing_summary"].build(spark, SF_SMOKE)
    plan = _executed_plan(df)
    scan_cols = plan.split("FileScan parquet [")[1].split("]")[0]
    # only the 7 needed columns reach the scan, not all 11
    assert "l_orderkey" not in scan_cols and "l_partkey" not in scan_cols
    assert "l_quantity" in scan_cols and "l_shipdate" in scan_cols
    assert len(scan_cols.split(",")) == 7


def test_dim_joins_broadcast(spark):
    for name in ("silver_enriched", "q5_region_revenue", "q3_shipping_priority"):
        plan = _executed_plan(CATALOG[name].build(spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"
        assert "SortMergeJoin" not in plan or name == "q5_region_revenue", (
            f"{name} shuffles the fact side for a dim join"
        )


def test_semi_anti_join_physical(spark):
    semi = _executed_plan(CATALOG["semi_join_urgent_customers"].build(spark, SF_SMOKE))
    anti = _executed_plan(CATALOG["anti_join_no_urgent_customers"].build(spark, SF_SMOKE))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_topk_is_take_ordered(spark):
    plan = _executed_plan(CATALOG["top_users_by_peak_value"].build(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, "top-k degenerated into a global sort"


def test_partition_pruning(spark):
    out = tempfile.mkdtemp(prefix="t_prune_") + "/by_date"
    e = load_table(spark, SF_SMOKE, "events").withColumn(
        "partition_date", F.to_date("ts")
    )
    e.write.mode("overwrite").partitionBy("partition_date").parquet(out)
    pruned = spark.read.parquet(out).where(
        F.col("partition_date") == F.lit("2024-01-05").cast("date")
    )
    plan = _executed_plan(pruned)
    assert "PartitionFilters: [" in plan
    assert "partition_date" in plan.split("PartitionFilters")[1][:200]
    # one partition directory actually scanned
    n_days = e.select("partition_date").distinct().count()
    assert pruned.count() < e.count() / max(n_days - 5, 1)


def test_whole_stage_codegen_active(spark):
    df = CATALOG["q1_pricing_summary"].build(spark, SF_SMOKE)
    df.collect()  # AQE finalizes the physical plan on first execution
    plan = _executed_plan(df)
    # codegen stages print as "*(n) Operator" in the final adaptive plan
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    assert "AQEShuffleRead" in plan  # adaptive coalescing actually engaged


def test_approx_distinct_error_bound(spark):
    rows = CATALOG["approx_distinct_users"].build(spark, SF_SMOKE).collect()
    assert rows
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.within_5pct, f"{r.event_type}: HLL estimate out of 5% bound"


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    # At 100 TB a selective dim filter should cut the fact side BEFORE the
    # shuffle: Spark's InjectRuntimeFilter plants a bloom filter built from
    # the filtered dim keys into the fact scan. Thresholds are sized for
    # real clusters (10 GB application side), so pin them down to observe
    # the rewrite on test-scale data.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMOKE, "lineitem")
        p = load_table(spark, SF_SMOKE, "part").where(F.col("p_brand") == "Brand#13")
        df = (
            li.join(p, li.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = _optimized_plan(df)
        assert "might_contain" in plan.lower(), "runtime bloom filter not injected"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_dpp_prunes_fact_partitions(spark):
    """dpp_partitioned_join must plan a dynamicpruning subquery on the
    Hive-partitioned fact scan: the date filter lives on the dim side, so
    only runtime pruning (fed by the reused broadcast exchange) can keep
    the fact read to the surviving partitions — at 100 TB the difference
    between 10 partitions scanned and all of them."""
    df = CATALOG["dpp_partitioned_join"].build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower(), "dynamic partition pruning not planned"


def test_nested_schema_pruning_narrows_read(spark):
    """nested_schema_pruning's scan must read ONLY meta.event_type and
    meta.value: props (the widest leaf) and the entire who struct stay in
    the file. A ReadSchema carrying either means leaf-level pruning broke
    and the scan reads the whole row group at 100 TB."""
    df = CATALOG["nested_schema_pruning"].build(spark, SF_SMOKE)
    plan = _executed_plan(df)
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, "no ReadSchema in executed plan"
    schema = m.group(1)
    assert "event_type" in schema and "value" in schema
    assert "props" not in schema and "who" not in schema, schema


def test_cbo_reorders_fact_fact_dim_join(spark):
    """cbo_join_reorder is WRITTEN fact x fact first with the selective
    dim last; with ANALYZE stats + CBO the optimized tree must move
    lineitem out of the innermost join (orders x filtered customer join
    first), while the CBO-off build keeps the written order — proving the
    reorder is stats-driven, not accidental."""
    from bridge_monitoring_pyspark_spark.plans.extras22 import (
        cbo_join_reorder_build,
    )

    def join_order(cbo: bool) -> list[str]:
        df = cbo_join_reorder_build(spark, SF_SMOKE, cbo)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        seen: list[str] = []
        for r in re.findall(r"cbo_(\w+)", plan):
            if r not in seen:
                seen.append(r)
        return seen

    assert join_order(False)[0] == "lineitem"  # written order preserved
    reordered = join_order(True)
    assert reordered[0] != "lineitem", f"CBO did not reorder: {reordered}"


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass").endswith(
            "RocksDBStateStoreProvider"
        )
    )


def test_no_row_at_a_time_python_udfs(spark):
    """Every Python-extension query must plan Arrow-family execution
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas...), never the
    row-pickling BatchEvalPython (tools/plan_audit.py sweeps the whole
    catalog; this pins the contract on the Python-UDF headliners).

    Exception: udtf_char_chunks plans BatchEvalPythonUDTF on purpose — the
    Arrow UDTF path was measured 3x slower for that generator workload
    (see its docstring) — so it asserts the UDTF operator, while scalar
    BatchEvalPython remains banned everywhere."""
    df = CATALOG["udtf_char_chunks"].build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPythonUDTF" in plan
    assert "BatchEvalPython" not in plan.replace("BatchEvalPythonUDTF", "")
    for name in (
        "multimodal_features",
        "multimodal_resize",
        "ann_cosine_topk",
        "grouped_ols_fit",
        "grouped_agg_geomean",
        "emb_norms_arrow",
        "winnow_fingerprint_stats",
    ):
        df = CATALOG[name].build(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name} plans a row-at-a-time UDF"


def test_smallside_verifier_not_used_by_plans():
    """The O(N)-driver broadcast all-pairs form is a test-only verifier:
    no module under plans/ (the catalog surface) may reference it — the
    production path is cosine_pairs_blocked. Import boundary, not just a
    docstring warning."""
    import pathlib

    import bridge_monitoring_pyspark_spark.plans as plans_pkg

    plans_dir = pathlib.Path(plans_pkg.__file__).parent
    for py in plans_dir.glob("*.py"):
        src = py.read_text()
        assert "_cosine_pairs_smallside_verifier" not in src, py.name
        assert "cosine_pairs_arrow" not in src, py.name


def test_neardup_pairs_build_never_touches_driver(spark, monkeypatch):
    """neardup_embedding_pairs must plan without any driver-side
    materialization — the round-2/3 scale-killer was a full-table
    .collect() at build time. Poisoning collect()/toPandas() during build
    proves the blocked form keeps the corpus on the executors."""
    # patch the CLASSIC class — Spark 4 instances resolve methods there, so
    # poisoning the pyspark.sql.DataFrame base alone never fires (r15 audit)
    from pyspark.sql.classic.dataframe import DataFrame

    def _boom(self, *a, **k):
        raise AssertionError("driver-side materialization during query build")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    # inspect the computation plan: sorted_once's lazy checkpoint (round
    # 14) wraps the final plan in an opaque LogicalRDD — swap in a plain
    # orderBy so the gate still sees the blocked-matmul stage
    from bridge_monitoring_pyspark_spark.plans import llmdata as _llm

    monkeypatch.setattr(_llm, "sorted_once", lambda d, *c: d.orderBy(*c))
    df = CATALOG["neardup_embedding_pairs"].build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # the blocked matmul stage


def test_ivf_assignment_never_windows_nxk(spark, monkeypatch):
    """The IVF nearest-centroid assignment must never rank the N x K
    scored pairs through a row_number window — the sf0.1→sf1 scale run
    measured that window (shuffling every pair with two vector payloads)
    as the dominant term of a x63.7 blowup (SCALING.md, round 5). The
    catalog path assigns via Arrow matmul batches (MapInPandas — no
    assignment shuffle at all), leaving exactly one real Window node: the
    final per-query re-rank. The JVM-only fallback (`assignment="sql"`)
    is pinned separately: corpus top-1 must aggregate (max_by, map-side
    combine), allowing one more Window for the n_probe query side."""
    from bridge_monitoring_pyspark_spark.plans import llmdata as _llm

    monkeypatch.setattr(_llm, "sorted_once", lambda d, *c: d.orderBy(*c))
    df = CATALOG["ann_ivf_topk"].build(spark, SF_SMOKE)
    plan = _executed_plan(df)
    assert "MapInPandas" in plan
    # "Window [" counts real Window nodes only — WindowGroupLimit nodes are
    # the partial/final rank-limit pushdown and are welcome.
    assert plan.count("Window [") <= 1, plan.count("Window [")

    from bridge_monitoring_pyspark_spark.operators.similarity import ivf_topk

    e = load_table(spark, SF_SMOKE, "embeddings")
    cents = e.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") / 20).cast("int").alias("cid"), "embedding"
    )
    sql_form = ivf_topk(
        e.where(F.col("vec_id") < 10), e, cents,
        query_id="vec_id", corpus_id="vec_id", vec_col="embedding",
        centroid_id="cid", centroid_vec="embedding", k=5, assignment="sql",
    )
    sql_plan = _executed_plan(sql_form)
    assert "max_by" in sql_plan
    assert sql_plan.count("Window [") <= 2, sql_plan.count("Window [")


def test_sorted_once_shipped_plan_is_checkpointed_sort(spark, monkeypatch):
    """UNPATCHED gate on the shipped sorted_once shape (VERDICT r14 item 5 /
    ADVICE r14): every other plan gate substitutes a plain orderBy to see
    through the checkpoint, so without this test a refactor could silently
    drop the lazy localCheckpoint (re-introducing the double Python-stage
    execution) or make it eager (moving work out of the timed/oracle'd
    build). Asserts, on a representative catalog user (simhash_docs):
    (a) the executed plan is the claimed `Scan ExistingRDD -> Exchange
    rangepartitioning -> Sort` shape, and (b) the checkpoint call is lazy."""
    # patch the CLASSIC class — Spark 4 instances resolve methods there,
    # not on the pyspark.sql.DataFrame base
    from pyspark.sql.classic.dataframe import DataFrame

    calls: list[bool] = []
    orig = DataFrame.localCheckpoint

    def spy(self, eager=True):
        calls.append(eager)
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)
    df = CATALOG["simhash_docs"].build(spark, SF_SMOKE)
    assert calls == [False], f"expected one lazy localCheckpoint, saw {calls}"
    plan = _executed_plan(df)
    assert "Scan ExistingRDD" in plan, "lazy checkpoint missing from shipped plan"
    assert "Sort [" in plan and "rangepartitioning" in plan
    # the Sort must consume the checkpointed child, not a recomputed subtree
    assert plan.index("Sort [") < plan.index("Scan ExistingRDD")

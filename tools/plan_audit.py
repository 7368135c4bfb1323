"""Physical-plan anti-pattern sweep over the whole query catalog.

Usage:  python tools/plan_audit.py [query ...]

For every batch catalog query, builds the DataFrame and inspects the
(executed, pre-materialization) plan string for:

- ``BatchEvalPython``   — a row-at-a-time Python UDF in the plan. The
  engine's contract is ZERO of these (Arrow paths show ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas instead) — any hit fails the audit.
- ``CartesianProduct``  — a non-broadcast cross join. Also zero-tolerance:
  deliberate theta joins must plan BroadcastNestedLoopJoin (small side
  broadcast), never a full cartesian shuffle.
- ``Exchange SinglePartition`` — reported, not failed: legitimate for
  single-row global aggregates and the documented global-ordering demos,
  but every occurrence should be a conscious choice, so the audit prints
  them for review.

Streaming queries and eager-executing iterative queries are skipped by tag
(building them RUNS them); their plan posture is asserted in
tests/test_plan_quality.py and their own modules' pytest files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

# tags whose queries execute (not just plan) at build time
SKIP_TAGS = {"streaming"}
# eager/iterative or side-effecting builders not covered by a tag
SKIP_NAMES = {
    "kmeans_embeddings", "pagerank_transitions", "neardup_components",
    "dedup_pipeline_survivors", "small_file_compaction", "cached_reuse_metrics",
    "csv_dim_roundtrip", "orc_dim_roundtrip", "xml_roundtrip_events",
    "text_source_roundtrip", "binaryfile_multimodal_ingest",
    "bucketed_join_revenue", "zorder_curve_layout", "stable_doc_ids",
    "partition_pruned_daily", "pyds_generated_events",
}


def main() -> int:
    from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
    from bridge_monitoring_pyspark_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(master="local[8]", extra_confs={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    failures, single_parts, audited = [], [], 0
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        if not only and (set(q.tags) & SKIP_TAGS or name in SKIP_NAMES):
            continue
        try:
            df = q.build(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            failures.append((name, f"build/plan failed: {e}"))
            continue
        audited += 1
        # BatchEvalPythonUDTF is allowed: for generator UDTFs the Arrow path
        # measured ~3x slower (see plans/extras2.py:_udtf_char_chunks); the
        # ban targets row-pickling *scalar* UDFs.
        if "BatchEvalPython" in plan.replace("BatchEvalPythonUDTF", ""):
            failures.append((name, "row-at-a-time Python UDF (BatchEvalPython)"))
        if "CartesianProduct" in plan:
            failures.append((name, "non-broadcast CartesianProduct"))
        n_single = plan.count("Exchange SinglePartition")
        if n_single:
            single_parts.append((name, n_single))
    print(f"audited {audited} query plans")
    if single_parts:
        print("Exchange SinglePartition (review: deliberate?):")
        for name, n in sorted(single_parts):
            print(f"  {name:36s} x{n}")
    for name, why in failures:
        print(f"FAIL  {name}: {why}")
    print("AUDIT " + ("FAILED" if failures else "OK"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

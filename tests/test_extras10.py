"""Tests for the eleventh extension wave: compaction must actually shrink
the file count while conserving rows and content."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras10 import COMPACT_TARGET_FILES
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def test_compaction_shrinks_files_conserves_rows(spark):
    row = all_queries()["small_file_compaction"].build(spark, SF_SMOKE).collect()[0]
    assert row.files_after <= COMPACT_TARGET_FILES < row.files_before
    src = load_table(spark, SF_SMOKE, "events")
    assert row.n_rows == src.count()
    want = src.agg(F.round(F.sum("value"), 4).alias("s")).collect()[0].s
    assert abs(row.sum_value - want) < 1e-6

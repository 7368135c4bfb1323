"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query catalog
(``bridge_monitoring_pyspark_spark.plans.catalog``): every implemented
operator from SURVEY.md §2 is a named catalog entry pairing a Spark
DataFrame builder with (where SQL-expressible) its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The gold metrics query — windowed per-type aggregates inner-joined on
    the window key and flattened (reference: pipelines/gold_aggregation.py:52-109).
    """
    q = all_queries()["gold_metrics_hourly"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible catalog entry."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}

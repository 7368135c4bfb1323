from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bridge_monitoring_pyspark_spark.session import get_spark

from testdata_paths import SF_ORACLE, SF_SMOKE  # noqa: E402,F401 — shared with test modules


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        extra_confs={
            "spark.sql.shuffle.partitions": "8",
            "spark.default.parallelism": "8",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s

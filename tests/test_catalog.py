"""Catalog-wide invariants: every query runs on the smoke SF, returns rows,
and has distinct, snake_case column names (driver hash-compare requirement)."""

from __future__ import annotations

import re

import pytest

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries

from testdata_paths import SF_SMOKE

CATALOG = all_queries()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_runs_and_returns_rows(spark, name):
    q = CATALOG[name]
    df = q.build(spark, SF_SMOKE)
    cols = df.columns
    assert len(cols) == len(set(cols)), f"duplicate columns in {name}: {cols}"
    for c in cols:
        assert re.fullmatch(r"[a-z][a-z0-9_]*", c), f"non-snake-case column {c!r} in {name}"
    n = df.count()
    if "smoke_may_be_empty" in q.tags:
        assert n >= 0
    else:
        assert n > 0, f"{name} returned 0 rows at smoke SF"


def test_oracle_coverage():
    """Every query should carry an oracle unless tagged as non-SQL-expressible."""
    for name, q in CATALOG.items():
        if q.oracle is None:
            assert "no_oracle" in q.tags, f"{name} lacks oracle and no_oracle tag"

"""Tests for the Count-Min sketch heavy hitters (plans/extras21.py):
pure-Python sketch replay, the one-sided error guarantee, and the
mergeability identity that makes a CMS a CMS."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras21 import (
    CMS_DEPTH,
    CMS_PROBE_K,
    CMS_WIDTH,
)
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def _cms_col(token: str, d: int) -> int:
    return int(hashlib.md5(f"{d}:{token}".encode()).hexdigest()[:8], 16) % CMS_WIDTH


def _token_stream(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    for r in docs:
        yield from re.split(r"\s+", r.text.strip())


def test_cms_matches_python_replay_and_one_sided_error(spark):
    truth = Counter(_token_stream(spark))
    sketch = Counter()
    for token, n in truth.items():
        for d in range(CMS_DEPTH):
            sketch[(d, _cms_col(token, d))] += n
    heavy = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_PROBE_K]
    expect = {
        token: min(sketch[(d, _cms_col(token, d))] for d in range(CMS_DEPTH))
        for token, _ in heavy
    }
    rows = all_queries()["cms_heavy_hitters"].build(spark, SF_SMOKE).collect()
    assert len(rows) == CMS_PROBE_K
    for r in rows:
        assert truth[r.token] == r.true_count
        assert expect[r.token] == r.cms_est
        # the CMS guarantee: estimates never undercount
        assert r.overestimate >= 0
        assert r.cms_est == r.true_count + r.overestimate


def test_cms_shards_merge_by_addition(spark):
    """Sharded build == global build: the mergeability that lets every
    executor sketch its partition independently at 100 TB."""
    tokens = list(_token_stream(spark))
    half = len(tokens) // 2
    merged = Counter()
    for shard in (tokens[:half], tokens[half:]):
        local = Counter()
        for t in shard:
            for d in range(CMS_DEPTH):
                local[(d, _cms_col(t, d))] += 1
        merged.update(local)
    global_build = Counter()
    for t in tokens:
        for d in range(CMS_DEPTH):
            global_build[(d, _cms_col(t, d))] += 1
    assert merged == global_build

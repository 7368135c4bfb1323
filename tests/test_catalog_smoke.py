"""Fast catalog-wide ANALYSIS smoke: build every catalog query against the
smoke SF and force plan resolution (``.schema``), without executing batch
plans. This is the pre-commit guard for "testdata layout changed and a
tail query silently broke" — the failure mode that can otherwise survive
until a full-suite run, because analysis errors only surface per-query.

All failures are collected and reported together (not fail-fast), so one
layout change shows its full blast radius in a single run:

    python -m pytest tests/test_catalog_smoke.py -q      # ~2 min
"""

from __future__ import annotations

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries

from testdata_paths import SF_SMOKE


def test_every_query_resolves_analysis(spark):
    failures = []
    for name, q in sorted(all_queries().items()):
        try:
            df = q.build(spark, SF_SMOKE)
            _ = df.schema  # triggers full analysis/resolution, no execution
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
    assert not failures, (
        f"{len(failures)} catalog queries fail analysis:\n" + "\n".join(failures)
    )

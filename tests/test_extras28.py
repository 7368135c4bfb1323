"""Runtime bloom-filter join witness and hard-negative mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras28 import (
    bloomfilter_join_build,
)

from testdata_paths import SF_SMOKE


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_bloom_filter_injected_only_when_enabled(spark):
    on = bloomfilter_join_build(spark, SF_SMOKE, bloom=True)
    off = bloomfilter_join_build(spark, SF_SMOKE, bloom=False)
    p_on, p_off = _opt_plan(on), _opt_plan(off)
    assert "might_contain" in p_on and "bloom_filter_agg" in p_on
    assert "might_contain" not in p_off
    # the filter must sit on the FACT side's join key, pruning before the
    # shuffle — not anywhere downstream of the join
    assert "l_orderkey" in p_on.split("Join")[-1]


def test_bloom_on_off_results_identical(spark):
    on = bloomfilter_join_build(spark, SF_SMOKE, bloom=True).collect()
    off = bloomfilter_join_build(spark, SF_SMOKE, bloom=False).collect()
    assert [tuple(r) for r in on] == [tuple(r) for r in off]
    assert len(on) >= 1


def test_bloom_build_restores_caller_confs(spark):
    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    before = {k: spark.conf.get(k) for k in keys}
    bloomfilter_join_build(spark, SF_SMOKE, bloom=True)
    assert {k: spark.conf.get(k) for k in keys} == before


def test_hard_negative_mining_python_replay(spark):
    import math

    from bridge_monitoring_pyspark_spark.sources.readers import load_table

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: (list(r.embedding), r.label) for r in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    got = all_queries()["hard_negative_mining"].build(spark, SF_SMOKE).collect()
    assert got, "no hard negatives mined"
    anchors = sorted({r.query_id for r in got})
    for qid in anchors:
        qv, ql = vecs[qid]
        sims = [
            (cos(qv, v), nid, lb)
            for nid, (v, lb) in vecs.items()
            if nid != qid
        ]
        pos6 = max(s for s, _, lb in sims if lb == ql)
        negs = sorted(
            ((s, nid, lb) for s, nid, lb in sims if lb != ql),
            key=lambda t: (-t[0], t[1]),
        )
        mine = [r for r in got if r.query_id == qid]
        assert [r.rank for r in mine] == list(range(1, len(mine) + 1))
        for r, (s, nid, lb) in zip(mine, negs):
            assert r.neighbor_id == nid and r.neg_label == lb
            assert r.neg_sim == round(s, 4)
            assert r.pos_sim == round(pos6, 4)
            assert r.margin == round(pos6 - s, 4)


def test_hard_negative_margin_semantics(spark):
    # every mined negative's similarity must not exceed pos_sim + margin
    # identity, and ranks within an anchor are by neg_sim desc
    got = all_queries()["hard_negative_mining"].build(spark, SF_SMOKE).collect()
    by_anchor: dict[int, list] = {}
    for r in got:
        by_anchor.setdefault(r.query_id, []).append(r)
    for rs in by_anchor.values():
        sims = [r.neg_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        for r in rs:
            assert abs((r.pos_sim - r.neg_sim) - r.margin) < 2e-4


def test_hard_negative_anchors_broadcast(spark):
    df = all_queries()["hard_negative_mining"].build(spark, SF_SMOKE)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in physical or "BroadcastExchange" in physical

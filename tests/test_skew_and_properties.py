"""Scale-behavior tests: AQE skew-join splitting must engage on a hot key,
and the DQ split must satisfy its partition invariant on arbitrary
hypothesis-generated rows (not just the fixture distributions)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.operators.dq import split_valid_invalid


def test_aqe_splits_skewed_join(spark):
    """One key holding ~95% of the fact side: with AQE skew-join thresholds
    lowered, the final adaptive plan must mark the sort-merge join as
    skew-handled (isSkew=true partitions) instead of leaving one straggler
    task with the whole hot key — the runtime re-plan this engine relies
    on for 100 TB skew (SCALING.md §Joins)."""
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # a keyed agg right after the join pins the join's output
        # distribution and vetoes the split unless forced
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        # sha2 payload: incompressible AND referenced downstream, so column
        # pruning can't shrink the hot partition below the skew threshold
        payload = F.sha2(F.col("id").cast("string"), 256)
        hot = spark.range(200_000).select(F.lit(7).alias("k"), payload.alias("p"))
        tail = spark.range(10_000).select(
            (F.col("id") % 97 + 100).alias("k"), payload.alias("p")
        )
        fact = hot.unionByName(tail)
        dim = spark.range(300).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = (
            fact.join(dim, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("p")).alias("lp"))
        )
        rows = {r.k: r.n for r in joined.collect()}
        assert rows[7] == 200_000  # correctness under the split
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(allow_infinity=False, width=64)),
            st.one_of(st.none(), st.integers(min_value=-10, max_value=10)),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_dq_split_partition_invariant(spark, rows):
    """For ANY input (nulls, NaNs, extremes): valid ∪ invalid == input and
    valid ∩ invalid == ∅ — the quarantine router may never drop or
    duplicate a row, the property the reference relies on for its
    bronze/silver routing (SURVEY.md §2.2 P2)."""
    df = spark.createDataFrame(
        [(v, b) for v, b in rows], "value double, bridge_id int"
    )
    cond = (
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.col("value") >= -40)
        & (F.col("value") <= 80)
    )
    valid, invalid = split_valid_invalid(df, cond)
    n, nv, ni = df.count(), valid.count(), invalid.count()
    assert nv + ni == n
    for r in valid.collect():
        assert r.value is not None and not math.isnan(r.value)
        assert -40 <= r.value <= 80


def test_salted_join_equals_plain_join(spark):
    """salted_join must be bit-identical to the plain equi-join (inner and
    left), including on a synthetically hot key, with broadcast disabled so
    the salted shuffle path actually executes."""
    from pyspark.sql import functions as F

    from bridge_monitoring_pyspark_spark.operators.joins import salted_join
    from bridge_monitoring_pyspark_spark.sources.readers import load_table
    from testdata_paths import SF_SMOKE

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        e = load_table(spark, SF_SMOKE, "events")
        # hot key: fold ~half the fact side onto user_id 1
        fact = e.select(
            F.when(F.col("event_id") % 2 == 0, F.lit(1))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "event_id",
            "value",
        )
        dim = (
            e.select("user_id").distinct()
            .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
        )
        for how in ("inner", "left"):
            plain = fact.join(dim, on="user_id", how=how)
            salted = salted_join(fact, dim, "user_id", salt_on="event_id",
                                 buckets=4, how=how)
            assert sorted(map(tuple, plain.collect())) == sorted(
                map(tuple, salted.collect())
            ), how
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_rejects_existing_salt_column(spark):
    """A pre-existing __salt column on either side must be a loud error —
    the operator would otherwise overwrite it and silently drop it from
    the output."""
    import pytest

    from bridge_monitoring_pyspark_spark.operators.joins import salted_join

    fact = spark.createDataFrame([(1, 10, 0)], "k int, v int, __salt int")
    dim = spark.createDataFrame([(1, "a")], "k int, tag string")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact, dim, "k", salt_on="v", buckets=4)
    clean_fact = fact.drop("__salt")
    dirty_dim = dim.withColumn("__salt", dim.k)
    with pytest.raises(ValueError, match="__salt"):
        salted_join(clean_fact, dirty_dim, "k", salt_on="v", buckets=4)


def test_salted_join_physical_keys_include_salt(spark):
    """The witness only means something if the shuffle actually partitions
    on (key, salt): with broadcast off, the join must be a shuffle join
    whose keys include the deterministic salt."""
    from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
    from testdata_paths import SF_SMOKE

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = all_queries()["salted_skew_join_revenue"].build(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # shuffled-hash, not sort-merge: the salt makes every (key, salt)
        # dim partition small by construction, and the sf10->sf100 run
        # measured the SMJ form x37 at x10 rows (fact-side sort spill)
        assert "ShuffledHashJoin" in plan and "SortMergeJoin" not in plan
        assert "__salt" in plan and "xxhash64" in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),   # join key (small → collisions)
            st.integers(min_value=0, max_value=10**6),  # salt_on column
        ),
        min_size=0,
        max_size=40,
    ),
    dim_keys=st.sets(st.integers(min_value=0, max_value=40), max_size=20),
    buckets=st.integers(min_value=1, max_value=6),
)
def test_salted_join_property(spark, data, dim_keys, buckets):
    """For ANY fact/dim contents and any bucket count, salted_join(inner
    and left) equals the plain join exactly — including empty inputs,
    unmatched keys, and duplicate fact keys."""
    from bridge_monitoring_pyspark_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(k, s) for k, s in data] or [], "k int, salt_src int"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in dim_keys] or [], "k int, tag string"
    )
    for how in ("inner", "left"):
        plain = sorted(map(tuple, fact.join(dim, "k", how).collect()))
        salted = sorted(
            map(tuple, salted_join(fact, dim, "k", "salt_src", buckets, how).collect())
        )
        assert salted == plain, (how, buckets)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=0,
        max_size=25,
    ),
    threshold=st.floats(min_value=-0.5, max_value=0.99),
    n_blocks=st.integers(min_value=1, max_value=5),
)
def test_blocked_pairs_property(spark, vecs, threshold, n_blocks):
    """For ANY vector set (including zero vectors, duplicates and empty
    input), the blocked all-pairs search equals the broadcast form — every
    unordered pair is computed exactly once regardless of block count."""
    from bridge_monitoring_pyspark_spark.operators.similarity import (
        _cosine_pairs_smallside_verifier,
        cosine_pairs_blocked,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)] or [], "id long, vec array<float>"
    )
    blocked = sorted(
        map(tuple, cosine_pairs_blocked(df, "id", "vec", threshold, n_blocks).collect())
    )
    if not vecs:
        assert blocked == []
        return
    arrow = sorted(
        map(tuple, _cosine_pairs_smallside_verifier(df, "id", "vec", threshold).collect())
    )
    assert blocked == arrow

"""Join operators beyond the reference's two equi-joins.

The reference exercises only J1 (stream-static LEFT) and J2 (stream-stream
INNER on a composite key) — SURVEY.md §2.3. Everything here is
engine-completeness extension (§2.11): semi/anti, range, and as-of joins,
each expressed as compositions of built-in DataFrame ops so Catalyst keeps
choosing the physical strategy.

Scale notes (100 TB):
* semi/anti compile to Broadcast/SortMerge *semi* joins — no payload columns
  cross the wire, prefer them over ``join+dropDuplicates``.
* range_join keeps an equi component in the condition so Catalyst plans a
  hash/sort-merge join with the range as a post-filter; a pure range
  condition degenerates to BroadcastNestedLoopJoin — never ship that at
  scale without bucketing one side into coarse range buckets first.
  banded_range_join below IS that bucketing: it manufactures the equi key
  (a coarse time band) so the pure-range case hash-partitions too.
* asof_join is equi-join + per-left-row rank-1; the shuffle is on the equi
  key. For high fan-in keys, pre-aggregate the right side per (key, coarse
  time bucket) before the join to bound the intermediate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def semi_join(left: DataFrame, right: DataFrame, on: Column | list[str]) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right`` (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column | list[str]) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi + range predicate join. The equi component is mandatory by
    signature — see module scale notes."""
    return left.join(right, equi & range_cond, how=how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the manual salting pattern for when one
    join key holds a disproportionate share of the fact side, the dim side
    is too large to broadcast, and AQE's skew split can't help (e.g. the
    skewed stage feeds a stateful/streaming operator, or the straggler is
    the *state store* partition rather than a shuffle block).

    Fact rows fan out across ``buckets`` reducers via a deterministic salt
    hashed from ``salt_on`` (a fact-side high-cardinality column — using a
    deterministic hash instead of rand() keeps the operator replayable and
    retry-safe); the dim side replicates once per salt value, so every
    (key, salt) pair still meets all its matches. Result is identical to
    the plain equi-join for ``inner`` and ``left`` (fact-preserving) joins;
    right/full would duplicate unmatched dim rows per salt, so they are
    rejected.

    Cost model: dim shuffle volume × ``buckets``; the hot fact key's rows
    spread over ``buckets`` reducers. Pick buckets ≈ (hot-key share ×
    fact rows) / target-partition-rows. With AQE available prefer
    ``skewJoin.enabled`` and keep this for the cases above.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join preserves fact rows only; how={how!r}")
    clash = [side for side, df in (("fact", fact), ("dim", dim)) if "__salt" in df.columns]
    if clash:
        raise ValueError(
            f"salted_join: '__salt' already present on {clash}; it would be "
            "silently overwritten and dropped from the output"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets)).cast("int")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    # Shuffled-hash, not sort-merge: salting exists to make every (key, salt)
    # dim partition small, so building a hash map on the replicated dim side
    # beats externally sorting the huge fact side. Caught by the sf10->sf100
    # scale run: the SMJ form went x37 at x10 rows (fact-side sort spill)
    # while SHJ restored ~linear wall-clock. Results are identical; the hint
    # only picks the physical strategy.
    return fact_s.join(dim_s.hint("shuffle_hash"), on=[key, "__salt"], how=how).drop(
        "__salt"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: Column,
    right_key: Column,
    left_time: Column,
    right_time: Column,
    left_row_id: Sequence[str],
    tiebreak: Sequence[Column] = (),
    tolerance: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the greatest
    ``right_time`` <= ``left_time`` within the same key.

    Composition: equi-join on key with the time bound as a join filter, then
    ``row_number() == 1`` per left row ordered by right_time desc (plus a
    caller-supplied deterministic tiebreak). ``left_row_id`` must uniquely
    identify left rows.

    ``tolerance`` bounds the lookback (pandas ``merge_asof(tolerance=...)``
    semantics): only right rows with ``right_time >= left_time - tolerance``
    match. Besides the semantics, it is the scale lever — an unbounded
    as-of drags a key's whole history into the rank; a tolerance caps the
    per-row candidate set at the join filter. ``how="left"`` keeps
    matchless left rows with NULL right columns (the lone null row ranks 1,
    so the rank-1 cut passes it through). Only ``inner`` and ``left`` are
    meaningful: the rank-1 cut partitions by ``left_row_id``, so with
    ``right``/``full`` every unmatched right row lands in the NULL
    left_row_id group and all but one would be silently discarded.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"asof_join supports how in ('inner', 'left'); got {how!r} — "
            "the per-left-row rank-1 cut is undefined for unmatched right rows"
        )
    cond = (left_key == right_key) & (right_time <= left_time)
    if tolerance is not None:
        cond = cond & (right_time >= left_time - tolerance)
    joined = left.join(right, cond, how)
    order = [right_time.desc(), *tiebreak]
    w = Window.partitionBy(*left_row_id).orderBy(*order)
    return (
        joined.withColumn("__asof_rank", F.row_number().over(w))
        .where(F.col("__asof_rank") == 1)
        .drop("__asof_rank")
    )


def banded_range_join(
    intervals: DataFrame,
    points: DataFrame,
    lo: Column,
    hi: Column,
    point_ts: Column,
    band_seconds: int,
    max_bands: int = 16,
) -> DataFrame:
    """Pure range join (NO equi key) between two big tables, decomposed so
    it hash-partitions: match every interval ``[lo, hi]`` to every point
    with ``lo <= point_ts <= hi``.

    Each interval explodes into every ``band_seconds``-wide time band it
    overlaps; each point maps to its single band; the join becomes an
    *equi-join on the band* with the exact range predicate as a post-join
    filter. A (interval, point) match shares exactly one band — the
    point's — so results need no dedup and equal the naive theta join
    row-for-row.

    100 TB shape: the naive plan is BroadcastNestedLoopJoin (one side
    materialized on every executor, |A|x|B| compares). This plan shuffles
    both sides by band: per-task work is one band's intervals x points, and
    fan-out is bounded by ``ceil(span / band_seconds) + 1`` copies per
    interval. Pick ``band_seconds`` near the typical interval span — wider
    bands cut the fan-out, narrower bands cut the per-band pairing cost.
    Intervals must have bounded span for the explode to be bounded:
    any row that would fan past ``max_bands`` copies fails the job loudly
    (``raise_error`` inside the plan) instead of silently exploding —
    a single open-ended interval at 100 TB is a job-killer, not a row.
    """
    # __lo/__hi are reserved on BOTH sides: the intervals side would have
    # them overwritten and dropped, and a points-side copy makes the
    # post-join range filter's column reference ambiguous.
    for df, side in ((intervals, "intervals"), (points, "points")):
        clash = [c for c in ("__band", "__lo", "__hi") if c in df.columns]
        if clash:
            raise ValueError(
                f"banded_range_join: {side} already has internal column(s) "
                f"{clash}; they would be overwritten, dropped, or made "
                "ambiguous"
            )

    def _band(ts: Column) -> Column:
        # TIMESTAMP_NTZ has no direct long cast; route through TIMESTAMP
        # (a no-op for tz-aware columns, monotone for NTZ — and the band
        # only has to be a consistent monotone bucketing, the exact range
        # predicate below does the real filtering).
        secs = ts.cast("timestamp").cast("long")
        return (secs / band_seconds).cast("long")

    hi_band_checked = F.when(
        _band(hi) - _band(lo) < F.lit(max_bands), _band(hi)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"banded_range_join: interval spans >= {max_bands} bands — "
                "raise band_seconds or max_bands"
            )
        ).cast("long")
    )
    iv = intervals.withColumn(
        "__band", F.explode(F.sequence(_band(lo), hi_band_checked))
    ).withColumn("__lo", lo).withColumn("__hi", hi)
    pt = points.withColumn("__band", _band(point_ts))
    out = iv.join(pt, "__band").where(
        (point_ts >= F.col("__lo")) & (point_ts <= F.col("__hi"))
    )
    return out.drop("__band", "__lo", "__hi")

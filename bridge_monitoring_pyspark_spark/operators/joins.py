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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: Column,
    right_key: Column,
    left_time: Column,
    right_time: Column,
    left_row_id: Sequence[str],
    tiebreak: Sequence[Column] = (),
) -> DataFrame:
    """As-of join: for each left row, the single right row with the greatest
    ``right_time`` <= ``left_time`` within the same key.

    Composition: equi-join on key with the time bound as a join filter, then
    ``row_number() == 1`` per left row ordered by right_time desc (plus a
    caller-supplied deterministic tiebreak). ``left_row_id`` must uniquely
    identify left rows.
    """
    joined = left.join(right, (left_key == right_key) & (right_time <= left_time), "inner")
    order = [right_time.desc(), *tiebreak]
    w = Window.partitionBy(*left_row_id).orderBy(*order)
    return (
        joined.withColumn("__asof_rank", F.row_number().over(w))
        .where(F.col("__asof_rank") == 1)
        .drop("__asof_rank")
    )

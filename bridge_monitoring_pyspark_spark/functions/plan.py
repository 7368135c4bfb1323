"""Plan-shape helpers shared by the catalog builders."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def sorted_once(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Global ``orderBy`` that executes its child exactly once.

    ``orderBy`` plans an ``Exchange rangepartitioning`` whose partition
    bounds come from a SAMPLING JOB over the child — and sampling an RDD
    partition computes the whole partition. When the child contains a
    Python stage (mapInPandas / applyInPandas / cogroup / mapInArrow),
    every decode/score/merge therefore ran TWICE per action (round-14
    audit: 24 catalog entries had the shape; the cogrouped as-of measured
    6.9 s -> 3.4 s at sf0.1 from this one change).

    A *lazy* ``localCheckpoint`` materializes the child when the sampling
    job first touches it and lets the sort's real pass reuse the blocks:

    * lazy, not eager — ``build()`` must stay plan-only (the plan-audit /
      oracle contract builds DataFrames without running them);
    * RDD-level blocks are minted per ``build()`` call, so bench reruns
      and oracle replays still compute from the parquet inputs — this is
      within-action reuse, not cross-run caching;
    * only apply where the child is worth materializing (a Python stage
      or an expensive multi-shuffle subtree); for a cheap codegen child
      the extra persist is pure overhead.
    """
    return df.localCheckpoint(eager=False).orderBy(*cols)

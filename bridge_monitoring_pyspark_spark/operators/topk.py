"""Sort / limit / top-k operators.

O1-O3 (reference: demo.ipynb cell 5b90cce0 — group-max, global sort desc,
display limit). The per-group variant is the idiomatic upgrade SURVEY.md §2.5
calls for: the reference has no analytic window functions, but its top-bridges
query *is* a top-k.

Scale notes: ``orderBy().limit(k)`` compiles to ``TakeOrderedAndProject`` —
each partition keeps a k-row heap, only k rows per partition cross the wire;
no global sort materializes. The per-group form shuffles once on the group
key (hash partition) and keeps a per-group heap via ``row_number`` — at
100 TB prefer a high-cardinality group key or pre-aggregate first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: TakeOrderedAndProject, not a full sort."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Per-group top-k via row_number over a hash-partitioned window."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )

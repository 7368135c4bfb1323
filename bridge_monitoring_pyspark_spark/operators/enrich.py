"""Projection/enrichment operators.

P1 derived-column projection (reference: pipelines/bronze_ingest.py:44-53)
J1 stream-static LEFT equi-join (pipelines/silver_enrichment.py:104-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_event_times(
    df: DataFrame,
    event_time_col: str = "event_time",
    ingest_time_col: str | None = "ingest_time",
    date_col: str = "partition_date",
) -> DataFrame:
    """Add parsed timestamp columns + a partition date.

    ``try_to_timestamp`` yields NULL on unparseable input, which is exactly
    what drives the bronze null-split (reference: pipelines/bronze_ingest.py:
    46-48, 55-58): parse failure == DQ failure, no exceptions in the hot path.
    (Plain ``to_timestamp`` throws under Spark 4 ANSI mode.)
    """
    out = df.withColumn(f"{event_time_col}_ts", F.try_to_timestamp(F.col(event_time_col)))
    if ingest_time_col is not None:
        out = out.withColumn(
            f"{ingest_time_col}_ts", F.try_to_timestamp(F.col(ingest_time_col))
        )
    return out.withColumn(date_col, F.to_date(F.col(f"{event_time_col}_ts")))


def enrich_with_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """LEFT-join a fact/stream against a small dimension table.

    The reference relies on Catalyst auto-broadcasting its 5-row dimension
    (pipelines/silver_enrichment.py:104-106); here the broadcast is explicit
    because at 100 TB the fact side must never be shuffled for a dim join —
    a silent sort-merge fallback (dim drifting over the autoBroadcast
    threshold) would be the single worst plan regression available.
    """
    if broadcast_dim:
        dim = F.broadcast(dim)
    return fact.join(dim, on=on, how=how)

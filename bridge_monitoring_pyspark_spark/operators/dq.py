"""Data-quality predicate split — the engine's signature routing operator.

The reference routes rows into valid / rejected branches twice: a null-check
split in bronze (reference: pipelines/bronze_ingest.py:55-62) and per-sensor
range predicates in silver (pipelines/silver_enrichment.py:70-96), writing the
complement (``~cond``) to a quarantine sink. Here that pattern is one reusable
operator over arbitrary rule sets.

Scale notes: the split is two narrow ``Filter`` nodes over the same scan;
Catalyst pushes both predicates into the parquet/JSON scan, and because the
branches are complements the source is read once per branch with no shuffle.
At 100 TB the only cost is the double scan — callers that need both branches
materialized should write them in one pass via ``foreachBatch`` (see
streaming/jobs.py) instead of two separate queries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SensorRules:
    """Per-type value-range rules, mirroring the reference's DQ table
    (pipelines/silver_enrichment.py:70-88; README.md:200-210).

    ``ranges`` maps a type-discriminator value to (lo, hi); either bound may
    be None for a one-sided rule. Rows whose type has no rule pass the
    null-guard only.
    """

    type_col: str
    value_col: str
    time_col: str
    ranges: dict[str, tuple[float | None, float | None]] = field(default_factory=dict)

    def valid_condition(self) -> Column:
        """Null guard AND the matching range rule (conjunctive, like the
        reference's `&`-chained predicates)."""
        cond = F.col(self.time_col).isNotNull() & F.col(self.value_col).isNotNull()
        v = F.col(self.value_col)
        rule: Column = F.lit(True)
        for typ, (lo, hi) in self.ranges.items():
            r: Column = F.lit(True)
            if lo is not None:
                r = r & (v >= F.lit(lo))
            if hi is not None:
                r = r & (v <= F.lit(hi))
            rule = F.when(F.col(self.type_col) == typ, r).otherwise(rule)
        return cond & rule


    def valid_sql(self) -> str:
        """ANSI-SQL rendering of :meth:`valid_condition`, so the DuckDB
        oracle and the Spark plan share one rule definition and cannot
        drift apart."""
        parts = [f"{self.time_col} IS NOT NULL", f"{self.value_col} IS NOT NULL"]
        if self.ranges:
            whens = []
            for typ, (lo, hi) in self.ranges.items():
                conds = []
                if lo is not None:
                    conds.append(f"{self.value_col} >= {lo}")
                if hi is not None:
                    conds.append(f"{self.value_col} <= {hi}")
                whens.append(f"WHEN {self.type_col} = '{typ}' THEN ({' AND '.join(conds)})")
            parts.append(f"(CASE {' '.join(whens)} ELSE TRUE END)")
        return " AND ".join(parts)


def split_valid_invalid(df: DataFrame, cond: Column) -> tuple[DataFrame, DataFrame]:
    """Predicate split: (rows matching ``cond``, complement).

    The reference writes the bronze complement longhand with ``|``/``isNull``
    (pipelines/bronze_ingest.py:55-62) and the silver one with ``~``
    (pipelines/silver_enrichment.py:94-96); ``~cond`` covers both because the
    null guard inside ``cond`` makes null-valued rows fail it.
    """
    return df.where(cond), df.where(~cond)

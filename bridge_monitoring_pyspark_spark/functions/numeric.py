"""Order-independent numeric aggregate expressions.

``round(avg(value), 4)`` is the catalog's standard float-agg convention, but
it has a residual failure mode the sf0.1 oracle replay exposed (round-7
ORACLE_SF01: 4 hash fails, all one class): when the TRUE average lands
exactly on a rounding boundary (e.g. 51.51125), Spark's and DuckDB's
different float summation orders put the computed double on opposite sides
of the boundary and round(·, 4) amplifies a ~1e-12 difference to 1e-4.

The events fixture's ``value`` column is exact 2-decimal data (verified:
max |value*100 - round(value*100)| < 4e-12 at sf0.1), so the average has a
fully deterministic form:

    sum(round(value * 100)) / (100 * count)

Each scaled term is an exactly-representable integer double, so the sum is
EXACT and order-independent (magnitudes here are << 2^53); the single IEEE
division is correctly rounded, so both engines produce the bit-identical
double — no rounding step, no boundary, hash-green at any scale factor.

This matters beyond the oracle: a 100 TB pipeline re-partitioning or
re-running a gold job should produce byte-identical outputs, and
order-dependent float aggregation silently breaks that reproducibility
contract. Fixed-point accumulation is the standard fix (it is what Spark's
own DECIMAL sum does internally).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_avg(col: str | Column, scale: int = 100) -> Column:
    """Deterministic average of a fixed-point-valued double column.

    Equivalent DuckDB oracle expression:
        sum(round(value * {scale}, 0)) / ({scale} * count(value))
    """
    c = F.col(col) if isinstance(col, str) else col
    scaled = F.round(c * scale, 0)
    # count only non-null inputs, matching avg() semantics
    return F.sum(scaled) / (F.lit(float(scale)) * F.count(c))


def exact_avg_sql(expr: str, scale: int = 100) -> str:
    """The DuckDB-side twin of :func:`exact_avg` (same operand order)."""
    return f"sum(round(({expr}) * {scale}, 0)) / ({scale} * count({expr}))"

"""Named-query catalog — the single source for __spark_entry__.py.

Each :class:`Query` pairs a Spark DataFrame builder with (where expressible)
the ANSI-SQL oracle the driver runs through DuckDB at sf=0.01. Column names
and rounding are aligned on both sides because the driver's compare hashes
values after sorting columns by name (see repo README / driver contract).

Conventions:
* every computed column is explicitly aliased, identically in both engines;
* every floating-point aggregate is ``round(x, 4)`` in both engines so
  summation-order differences below 1e-4 cannot flip the value hash;
* ``count(...)`` / ``sum(int)`` are cast to BIGINT in the oracle because
  DuckDB widens integer sums to HUGEINT while Spark stays at long.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """A named engine capability: Spark builder + optional DuckDB oracle."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default=())


def all_queries() -> dict[str, Query]:
    """Assemble the full catalog (import here to keep module import light)."""
    from . import (
        advanced,
        bridge,
        extras,
        extras2,
        llmdata,
        llmdata2,
        relational2,
        streaming_q,
        streaming_q2,
        tpch,
        tpch2,
        extras3,
        extras4,
        extras5,
        extras6,
        extras7,
        extras8,
        extras9,
        extras10,
        extras11,
        extras12,
        extras13,
        extras14,
    )

    out: dict[str, Query] = {}
    for mod in (
        bridge, tpch, llmdata, streaming_q, extras, advanced,
        relational2, llmdata2, streaming_q2, extras2, tpch2, extras3, extras4,
        extras5,
        extras6,
        extras7,
        extras8,
        extras9,
        extras10,
        extras11,
        extras12,
        extras13,
        extras14,
    ):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name: {q.name}")
            out[q.name] = q
    return out

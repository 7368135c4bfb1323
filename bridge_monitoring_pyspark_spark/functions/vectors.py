"""Vector math over ``array<float>`` embedding columns — JVM-side.

``zip_with`` + ``aggregate`` keep the dot product inside codegen: a 64-dim
cosine is ~130 fused arithmetic ops per row, no Python, no Arrow transfer.
All math is double-precision (inputs widened from float) with left-to-right
accumulation, which keeps results reproducible across engines/runs — this is
what lets the DuckDB oracle hash-match similarity outputs.

Scale path: for very wide vectors (>1k dims) or very hot inner loops, a
vectorized pandas_udf over Arrow batches (numpy dot) wins; see
operators/similarity.py for where that trade is documented.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_similarity_prenorm(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with per-row precomputed L2 norms.

    In a scored join each input row meets many partners; evaluating
    ``cosine_similarity`` per pair recomputes both norms every time — three
    zip_with/aggregate traversals per pair. Hoisting ``l2_norm`` to a
    per-row column *before* the join leaves one traversal (the cross dot)
    per pair, a ~3x cut on the pair loop's dominant cost. ``l2_norm(a)`` is
    the same left-to-right accumulation wherever it's evaluated, so the
    result is bitwise identical to :func:`cosine_similarity` — oracle SQL
    needs no change.
    """
    return dot_product(a, b) / (norm_a * norm_b)

"""Aggregation operators beyond plain groupBy: skew-resistant salting and
bucketed co-located joins — the two shuffle-shaping tools SCALING.md
promises for the 100 TB path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: Sequence[tuple[Column, str, Column]],
    salt_on: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a salted first stage.

    A single hot group key turns a groupBy into one straggler reducer; the
    fix is to fan each key across ``buckets`` reducers by a deterministic
    salt, partially aggregate, then merge. ``aggs`` is (partial_agg, name,
    merge_agg) triples — the merge must be the partial's combiner (sum/sum,
    max/max, count/sum...). Results are identical to the unsalted groupBy
    (associative aggregates only).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets)).alias("__salt")
    partial = df.groupBy(*key_cols, salt).agg(
        *[p.alias(f"__p_{name}") for p, name, _ in aggs]
    )
    merged = partial.groupBy(*key_cols).agg(
        *[m(F.col(f"__p_{name}")).alias(name) for _, name, m in aggs]
    )
    return merged


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist a table bucketed (and sorted) on the join key. Two tables
    bucketed identically join with NO shuffle and NO sort — the exchange is
    paid once at write time and amortized over every subsequent join.
    Asserted in tests: the bucketed join plan has zero Exchange nodes."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_tables(
    spark: SparkSession,
    specs: Sequence[tuple[DataFrame, str, str]],
    base_path: str,
    bucket_col_of: dict[str, str],
    n_buckets: int = 8,
) -> dict[str, DataFrame]:
    """Write each (df, table_name, subdir) bucketed on its key and return
    the re-read catalog tables."""
    out = {}
    for df, table, sub in specs:
        write_bucketed(df, table, f"{base_path}/{sub}", bucket_col_of[table], n_buckets)
        out[table] = spark.table(table)
    return out

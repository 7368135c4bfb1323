"""Count-Min sketch heavy-hitter estimation, engine-neutral and exact to
replay.

The HLL (`sketch_distinct_users`) and GK (`approx_percentile_quantity`)
entries cover distinct-count and quantile sketches; this adds the third
classic mergeable summary — frequency. A CMS is D independent hash rows of
W counters; an item's estimate is the min of its D counters, which can
only over-count (collisions add, never subtract). The sketch here is
deterministic (md5-slice row hashes), so DuckDB rebuilds the identical
counter table and the oracle is exact — and the one-sided error shows up
as a checkable ``overestimate >= 0`` column instead of a tolerance.

100 TB shape: the counter table is D*W cells *regardless of corpus size*
— the build is one explode + one grouped count with map-side combine
(every executor pre-aggregates its shard of the sketch; merging IS
addition), and probes join against D*W rows, trivially broadcast. That
fixed-memory property is the entire point of sketching a 100 TB stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import words
from ..sources.readers import load_table
from .catalog import Query

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 64  # counters per row
CMS_PROBE_K = 10  # heavy hitters probed (exact top-k by true count)


def _cms_col(token, d: int):
    """Row-d column index: md5 of 'd:token', first 8 hex chars, mod W —
    the same salt-prefix trick both engines compute identically."""
    salted = F.concat(F.lit(f"{d}:"), token)
    return (
        F.conv(F.substring(F.md5(F.encode(salted, "UTF-8")), 1, 8), 16, 10).cast("long")
        % CMS_WIDTH
    )


def _cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 4x64 CMS over every token occurrence in ``documents``, then
    probe it with the exact top-10 tokens: per token, the true count, the
    CMS estimate (min over rows), and the collision overestimate (>= 0 by
    construction — the sketch's one-sided guarantee, verified row by row).
    """
    # NOT checkpointed (r15 audit): sketch build and exact probe both
    # evaluate the token explode, but it is pure codegen — the interleaved
    # A/B read a within-action checkpoint as a loss here
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(words(F.col("text"))).alias("token")
    )
    cells = tok.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), _cms_col(F.col("token"), d).alias("w"))
                for d in range(CMS_DEPTH)
            ])
        ).alias("c")
    )
    sketch = (
        cells.select("c.d", "c.w")
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    heavy = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.col("true_count").desc(), "token")
        .limit(CMS_PROBE_K)
    )
    probes = heavy.select(
        "token",
        "true_count",
        F.explode(
            F.array(*[
                F.struct(F.lit(d).alias("d"), _cms_col(F.col("token"), d).alias("w"))
                for d in range(CMS_DEPTH)
            ])
        ).alias("c"),
    ).select("token", "true_count", "c.d", "c.w")
    est = (
        probes.join(F.broadcast(sketch), ["d", "w"])
        .groupBy("token", "true_count")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "token",
        "true_count",
        "cms_est",
        (F.col("cms_est") - F.col("true_count")).alias("overestimate"),
    ).orderBy(F.col("true_count").desc(), "token")


_CMS_SQL = f"""
WITH tok AS MATERIALIZED (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token FROM documents
),
cells AS (
  SELECT d, CAST(CAST(('0x' || substring(md5(d || ':' || token), 1, 8)) AS UBIGINT)
               % {CMS_WIDTH} AS BIGINT) AS w
  FROM tok, UNNEST(range(0, {CMS_DEPTH})) AS t(d)
),
sketch AS (SELECT d, w, count(*) AS cnt FROM cells GROUP BY d, w),
heavy AS (
  SELECT token, count(*) AS true_count FROM tok GROUP BY token
  ORDER BY true_count DESC, token LIMIT {CMS_PROBE_K}
),
probes AS (
  SELECT token, true_count, d,
         CAST(CAST(('0x' || substring(md5(d || ':' || token), 1, 8)) AS UBIGINT)
              % {CMS_WIDTH} AS BIGINT) AS w
  FROM heavy, UNNEST(range(0, {CMS_DEPTH})) AS t(d)
),
est AS (
  SELECT token, true_count, min(cnt) AS cms_est
  FROM probes JOIN sketch USING (d, w)
  GROUP BY token, true_count
)
SELECT token, CAST(true_count AS BIGINT) AS true_count,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - true_count AS BIGINT) AS overestimate
FROM est
ORDER BY true_count DESC, token
"""


QUERIES = [
    Query("cms_heavy_hitters", _cms_heavy_hitters, _CMS_SQL,
          ("agg", "sketch", "cms", "heavy-hitters")),
]

"""Deduplication operators for LLM training-data pipelines.

Four families, each with an explicit scale story:

* **Exact** — content fingerprint (md5 of canonical form) + keep-first.
  One shuffle on the fingerprint; at 100 TB this is the cheapest possible
  dedup and always runs first to shrink the fuzzy stages' input.
* **N-gram Jaccard (brute verify)** — inverted-index pair generation
  (explode shingles → self-join on shingle → count intersections), NOT a
  cartesian product: only documents sharing at least one shingle ever meet.
  Still quadratic in the worst case (a shingle shared by k docs yields
  k² pairs) — at scale, drop ubiquitous shingles first (document-frequency
  cap), exactly like stop-word removal.
* **MinHash + LSH** — the 100 TB path: 128 xxhash64 min-hashes per doc,
  banded 32×4 so a pair with Jaccard s collides in ≥1 band with
  p = 1-(1-s⁴)³², i.e. >1-5e-8 at s=0.8. Candidates (tiny) are then
  exactly verified, so output == brute force with near-certainty while the
  shuffle volume is O(docs × bands), not O(pairs).
* **SimHash** — 64-bit signed-projection sketch; hamming-adjacent docs are
  near-dups. Pure JVM bit arithmetic (no UDF); banding over 16-bit chunks
  finds hamming≤3 pairs with one shuffle.

All hashing is Spark's xxhash64 — deterministic, seedable via an extra
hashed column, available in SQL and Column form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, word_shingles, words


def exact_dedup_keep_first(
    df: DataFrame, text_col: str, order: list[Column], id_cols: list[str]
) -> DataFrame:
    """Keep the first row (by ``order``) per canonical-text fingerprint."""
    w = Window.partitionBy("fingerprint").orderBy(*order)
    return (
        df.withColumn("fingerprint", fingerprint_md5(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def with_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Attach distinct n-word shingle arrays (column ``shingles``)."""
    return df.withColumn("shingles", word_shingles(words(F.col(text_col)), n))


def jaccard_pairs_inverted_index(
    shingled: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """All (a,b) id pairs with shingle-Jaccard >= threshold.

    Inverted-index plan: explode → self-equi-join on the shingle (one hash
    shuffle) → count shared shingles per pair → join per-doc sizes →
    J = inter / (|A|+|B|-inter). Pairs sharing zero shingles never appear.
    """
    sizes = shingled.select(
        F.col(id_col).alias("doc"), F.size("shingles").alias("n_shingles")
    )
    posting = shingled.select(
        F.col(id_col).alias("doc"), F.explode("shingles").alias("shingle")
    )
    inter = (
        posting.alias("a")
        .join(
            posting.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_shingles", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_shingles", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """MinHash signature: element k is min over shingles of xxhash64(k, s).
    Varying the first hashed column is the standard seeded-family trick."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(num_hashes)),
        lambda k: F.array_min(F.transform(shingles, lambda s: F.xxhash64(k, s))),
    )


def lsh_band_hashes(
    shingles: Column, num_hashes: int = 128, rows_per_band: int = 4
) -> Column:
    """Array of (band_idx, band_hash) structs, one per LSH band.

    Band b hashes minhashes [b*r+1 .. b*r+r]; each minhash is computed
    inside its own band expression exactly once. (Computing a full
    ``signature`` column first and slicing it per band looks cleaner but is
    a 32x performance trap: Catalyst's CollapseProject inlines the whole
    128-hash signature expression into every band's slice.)
    """
    n_bands = num_hashes // rows_per_band
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band_idx"),
            F.xxhash64(
                F.transform(
                    F.sequence(b * rows_per_band + 1, (b + 1) * rows_per_band),
                    lambda k: F.array_min(
                        F.transform(shingles, lambda s: F.xxhash64(k, s))
                    ),
                )
            ).alias("band_hash"),
        ),
    )


def lsh_candidate_pairs(
    shingled: DataFrame,
    id_col: str,
    num_hashes: int = 128,
    rows_per_band: int = 4,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs colliding in >=1 LSH band.

    One shuffle on (band_idx, band_hash); bucket sizes are tiny for
    non-duplicate corpora, so the within-bucket self-join is cheap. Skewed
    buckets (boilerplate-heavy corpora) are the known failure mode — cap
    bucket size or document-frequency-filter shingles upstream.
    """
    bands = shingled.select(
        F.col(id_col).alias("doc"),
        F.explode(
            lsh_band_hashes(F.col("shingles"), num_hashes, rows_per_band)
        ).alias("band"),
    ).select("doc", "band.band_idx", "band.band_hash")
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def verify_candidates_jaccard(
    candidates: DataFrame, shingled: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (array_intersect on the small
    candidate set — the cheap final pass that makes LSH output exact)."""
    sh = shingled.select(F.col(id_col).alias("doc"), "shingles")
    a = sh.withColumnRenamed("doc", "doc_a").withColumnRenamed("shingles", "sh_a")
    b = sh.withColumnRenamed("doc", "doc_b").withColumnRenamed("shingles", "sh_b")
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def token_hashes(tokens: Column) -> Column:
    """xxhash64 of each distinct token — precomputed once so the 64-bit
    vote loop below doesn't rehash per bit position."""
    return F.transform(F.array_distinct(tokens), lambda t: F.xxhash64(t))


def simhash64(hashes_col: str) -> Column:
    """64-bit SimHash over a pre-hashed token array column (see
    :func:`token_hashes`), entirely in JVM expressions.

    For each bit position, sum +1/-1 votes from each token hash's bit, then
    pack the vote signs into one long. Expressed as SQL because
    ``shiftrightunsigned`` with a *column* shift amount has no PySpark
    Column wrapper. ~64×|tokens| fused ops per row — heavy but shuffle-free
    and UDF-free.
    """
    return F.expr(
        f"""
        aggregate(
          transform(sequence(0, 63), b ->
            if(aggregate({hashes_col}, 0,
                 (acc, h) -> acc + if((shiftrightunsigned(h, b) & 1) = 1, 1, -1)) > 0,
               shiftleft(1L, b), 0L)),
          0L, (acc, x) -> acc | x)
        """
    )

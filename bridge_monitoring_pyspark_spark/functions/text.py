"""Text-analysis column expressions — all JVM-side (no UDFs).

Building blocks for the LLM-data-pipeline operators (dedup, quality scoring,
language ID). Everything here is a ``Column`` → ``Column`` combinator over
built-in higher-order array functions, so the hot path stays inside
whole-stage codegen; at 100 TB the per-row cost is the tokenizer regex plus
array arithmetic, with zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column) -> Column:
    """Whitespace tokenization (``\\s+`` split of the trimmed text)."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(wordarr: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a token array; empty array below n words.

    0-based ``sequence`` indices + 1-based ``element_at``: shingle i is
    words[i..i+n-1].
    """
    idx = F.sequence(F.lit(0), F.size(wordarr) - n)
    mk = lambda i: F.concat_ws(" ", *[F.element_at(wordarr, i + k + 1) for k in range(n)])
    return F.when(
        F.size(wordarr) >= n, F.array_distinct(F.transform(idx, mk))
    ).otherwise(F.array().cast("array<string>"))


def avg_word_len(wordarr: Column) -> Column:
    """Mean token length (double; NULL on empty array)."""
    total = F.aggregate(
        F.transform(wordarr, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total / F.size(wordarr)


def stopword_ratio(wordarr: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens in ``stopwords`` (double; NULL on empty array)."""
    hits = F.size(F.filter(wordarr, lambda w: w.isin(*stopwords)))
    return hits / F.size(wordarr)


def token_count_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate: runs of letters, runs of digits, or a
    single non-space symbol each count as one token."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def fingerprint_md5(text: Column) -> Column:
    """Canonical-form content fingerprint: md5 of lowercased trimmed text."""
    return F.md5(F.encode(F.lower(F.trim(text)), "UTF-8"))


def kgram_md5(text: Column, k: int) -> Column:
    """Rolling k-gram hash sequence: md5 of every k-char window (position
    order preserved). Empty array for texts shorter than k."""
    h = F.transform(
        F.sequence(F.lit(1), F.length(text) - k + 1),
        lambda i: F.md5(F.encode(F.substring(text, i, F.lit(k)), "UTF-8")),
    )
    return F.when(F.length(text) >= k, h).otherwise(F.array().cast("array<string>"))


def winnow_from_hashes(h: Column, w: int = 4) -> Column:
    """Winnowing over an already-materialized hash-sequence column: the
    distinct minima of every ``w``-window.

    ``h`` MUST be a real column (materialized by a prior select), not an
    inline expression: Spark expression trees are trees, not DAGs, so an
    inline ``h`` would be re-evaluated on every window iteration of the
    transform — turning an O(n) pass into O(n^2) hashing per row."""
    wins = F.transform(
        F.sequence(F.lit(1), F.size(h) - w + 1),
        lambda j: F.array_min(F.slice(h, j, w)),
    )
    return F.when(F.size(h) >= w, F.array_distinct(wins)).otherwise(
        F.array().cast("array<string>")
    )


def winnow_fingerprints(df, text_col: str, out_col: str = "fps",
                        k: int = 8, w: int = 4):
    """Winnowing document fingerprint (Schleimer et al., MOSS): the distinct
    minima of every ``w``-window over the k-gram hash sequence. Guarantees
    at least one shared fingerprint for any match of length >= w + k - 1,
    while keeping ~2/(w+1) of the hashes — the standard rolling-hash
    fingerprint for plagiarism/near-dup detection.

    DataFrame→DataFrame (adds ``out_col``): the k-gram hash array is
    materialized as a column between the two steps, so each hash is
    computed exactly once per row (see :func:`winnow_from_hashes`). Both
    steps are higher-order-function pipelines — JVM-side, nothing leaves
    the row at 100 TB."""
    hashed = df.withColumn("__kgram_h", kgram_md5(F.col(text_col), k))
    return hashed.withColumn(out_col, winnow_from_hashes(F.col("__kgram_h"), w)).drop(
        "__kgram_h"
    )

"""Iterative BPE tokenizer training (Sennrich et al. 2016) — distributed.

The catalog already witnesses ONE merge step (``bpe_merge_pairs``,
plans/extras16.py: corpus-wide pair counts on the distinct-word
vocabulary). This module runs the full training loop: N rounds of
(count pairs -> pick argmax merge -> apply merge to the vocabulary), the
same driver-loop-over-distributed-state shape as k-means and PageRank.

Spark-first design:
* All per-iteration work is JVM-side built-ins — pair extraction is a
  ``transform`` over array slices, merge application is an ``aggregate``
  (fold) lambda, both inside whole-stage codegen. No Python UDFs.
* The corpus collapses to the distinct-word vocabulary with counts before
  the loop (Zipf: |vocab| ~ sqrt(corpus)), so each iteration touches
  |vocab| short arrays, not the corpus. At 100 TB the vocabulary is
  millions of rows — still a small DataFrame to re-shuffle per round.
* Driver traffic is exactly one row per iteration (the argmax pair) —
  same bounded-collect contract as the k-means centroid pull.
* ``localCheckpoint`` after each merge application truncates the lineage
  so the fold lambdas don't stack into one unbounded codegen unit.

The fold-based merge application is exact greedy left-to-right BPE: a
merged token never equals its own left part (``left+right != left``), so
"merge then immediately re-merge as left" can only happen where standard
BPE would also merge (the ``a a a a -> aa aa`` case folds correctly —
see tests/test_bpe.py for the property check against a pure-Python
reference).

No counterpart in the 550-LoC reference (no text processing at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import words

WORD_END = "</w>"


def char_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word vocabulary with counts, each word as its character
    symbols plus the ``</w>`` end marker: (w string, syms array<string>,
    cnt long). ``w`` rides along untouched so post-training consumers
    (fertility stats, encode maps) can join tokenizations back to words."""
    return (
        docs.select(F.explode(words(F.col(text_col))).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "w",
            F.concat(F.split("w", ""), F.array(F.lit(WORD_END))).alias("syms"),
            "cnt",
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-symbol pair counts (one codegen shuffle)."""
    pair = F.explode(
        F.transform(
            F.slice(F.col("syms"), 1, F.size("syms") - 1),
            lambda x, i: F.struct(
                x.alias("l"),
                F.element_at(F.col("syms"), i + F.lit(2)).alias("r"),
            ),
        )
    ).alias("p")
    return (
        vocab.select("cnt", pair)
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("n_pairs"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of every adjacent (left, right) pair,
    as a JVM-side fold: walk the symbols, and whenever the accumulated
    tail is ``left`` and the next symbol is ``right``, replace the tail
    with the merged token."""
    merged = left + right
    fold = F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.select("w", fold.alias("syms"), "cnt")


def _train(
    spark: SparkSession, docs: DataFrame, n_merges: int, text_col: str
) -> tuple[list[tuple], DataFrame]:
    """Shared loop: returns (merge list, final encoded vocabulary)."""
    vocab = char_vocab(docs, text_col).localCheckpoint(eager=True)
    out: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("n_pairs").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n_pairs"])
        out.append((rank, l, r, n))
        vocab = _apply_merge(vocab, l, r).localCheckpoint(eager=True)
    return out, vocab


def train_bpe(
    spark: SparkSession, docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the merge table
    (rank int, left string, right string, n_pairs long), rank 1 = first
    merge learned. Ties break lexicographically on (left, right) so the
    result is deterministic across partitionings."""
    out, _ = _train(spark, docs, n_merges, text_col)
    return spark.createDataFrame(
        out, "rank int, left string, right string, n_pairs long"
    )


def encode_token_freqs(
    spark: SparkSession, docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` merges, apply them to the corpus, and return the
    corpus-wide token frequency table (token string, freq long) — the
    post-BPE unigram distribution a tokenizer-aware data pipeline samples
    or filters on. The encode step is the training loop's final vocabulary
    (each word already rewritten by every learned merge, in rank order),
    so applying merges costs nothing beyond training; frequencies are one
    explode + one map-side-combined shuffle over the distinct-word vocab,
    never the raw corpus."""
    _, vocab = _train(spark, docs, n_merges, text_col)
    return (
        vocab.select(F.explode("syms").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
    )


def fertility_by_lang(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility per language: train ``n_merges`` merges on the
    whole corpus, then report per-language avg post-BPE tokens per word
    occurrence (incl. the ``</w>`` marker) — the standard multilingual-
    tokenizer fairness metric (a language with higher fertility pays more
    sequence length per word under the shared vocabulary). The per-word
    tokenization comes free from the training loop's final vocabulary;
    the per-language occurrence table joins to it on the word — both
    sides are vocabulary-scale, never corpus-scale."""
    _, vocab = _train(spark, docs, n_merges, text_col)
    occ = (
        docs.select(lang_col, F.explode(words(F.col(text_col))).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy(lang_col, "w")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return (
        occ.join(vocab.select("w", F.size("syms").alias("n_tok")), "w")
        .groupBy(lang_col)
        .agg(
            F.sum("occ").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.round(
                F.sum(F.col("occ") * F.col("n_tok")) / F.sum("occ"), 4
            ).alias("fertility"),
        )
        .orderBy(lang_col)
    )


def train_bpe_reference(texts: list[str], n_merges: int) -> list[tuple]:
    """Pure-Python reference (test oracle): same tokenizer, same greedy
    merge, same tie-break — independent of the DataFrame implementation."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [WORD_END])] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        new = Counter()
        for syms, cnt in vocab.items():
            acc = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            new[tuple(acc)] += cnt
        vocab = new
    return merges

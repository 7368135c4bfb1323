"""Viterbi word segmentation under a substring-frequency unigram LM —
dynamic programming as iterative DataFrame relaxation.

The SentencePiece-family counterpart to the BPE trainer (operators/bpe.py):
where BPE greedily merges the best pair, a unigram tokenizer scores every
segmentation of a word under a piece model and keeps the best path. This
module runs the E-step's Viterbi pass distributed:

* The corpus collapses to the distinct-word vocabulary first (Zipf:
  |vocab| ~ sqrt(corpus)), so the DP runs on vocabulary-scale rows — the
  same cost argument as BPE training.
* The piece model is integer: freq(piece) = total weighted substring
  occurrences (length 1..MAX_PIECE_LEN) across the corpus. Length-1
  pieces always exist, so every word is segmentable.
* The DP objective is the unigram log-likelihood QUANTIZED TO INTEGER
  BITS: each piece scores ``floor(log2 freq) - floor(log2 total)`` — a
  non-positive integer, so every extra cut costs and frequent pieces
  cost less, exactly the unigram-LM shape — with ties broken by FEWER
  pieces. float log-probs would put the cross-engine hash one libm ulp
  away from a rounding boundary; floor-log2 is exact in both engines
  (``length(bin(f)) - 1`` / ``length(printf('%b', f)) - 1``). Score and
  piece count pack into one composite ``score * 32 + (31 - n)`` so the
  per-position relaxation is a plain ``max``. Words are asserted
  < 32 chars.
* Relaxation: position i's best = max over k=1..MAX_PIECE_LEN of
  best(i-k) + freq(word[i-k+1 .. i]). Each round is one vocabulary-scale
  join + map-side-combined max — ``max_word_len`` rounds total, lineage
  capped with localCheckpoint like the other driver-loop operators
  (k-means, PageRank, BPE).

The DuckDB oracle unrolls the same DP as per-position CTEs (the BPE
replace-trick pattern, plans/extras26.py), so correctness is hash-checked
end to end, composite encoding included.

No counterpart in the 550-LoC reference (no text processing at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import words

MAX_PIECE_LEN = 4
# packed-score offset: scores are non-positive (log-probs), but negative
# composites decode differently under Spark's truncating division and
# DuckDB's flooring // — shifting by +4096 keeps every composite positive
# so both engines decode identically. |score| <= 31 pieces x 63 bits, so
# 4096 can never underflow.
SCORE_OFFSET = 4096


def _vocab(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(words(F.col(text_col))).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _substring_cells(vocab: DataFrame) -> DataFrame:
    """Every (word, end position, piece length, piece) cell with the word's
    corpus count: piece = word[end-k+1 .. end]. One explode over ≤ L×4
    cells per vocabulary row."""
    cells = F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.transform(
                    F.sequence(F.lit(1), F.lit(MAX_PIECE_LEN)),
                    lambda k: F.struct(i.alias("end"), k.alias("k")),
                ),
            )
        ),
        lambda s: s["end"] - s["k"] >= 0,
    )
    return (
        vocab.select("w", "cnt", F.explode(cells).alias("c"))
        .select("w", "cnt", F.col("c.end").alias("end"), F.col("c.k").alias("k"))
        .withColumn("piece", F.expr("substring(w, end - k + 1, k)"))
    )


def piece_freqs(vocab: DataFrame) -> DataFrame:
    """Integer unigram model: freq(piece) = Σ over occurrences of
    cnt(word). Map-side-combined shuffle on the piece key."""
    return (
        _substring_cells(vocab)
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )


def viterbi_segment_stats(
    spark: SparkSession, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per distinct word: corpus count, Viterbi-best total piece frequency
    and piece count under the corpus substring model.

    Round-14 restructure: each word's DP is independent and bounded
    (< 32 positions x MAX_PIECE_LEN candidate cells), so the relaxation
    runs as ONE vectorized numpy pass over all of a partition's words —
    scored cells shuffle once on the word key and a ``mapInPandas`` stage
    relaxes every word simultaneously (a (words x 32) dp matrix, one
    integer max per (position, k)). The previous form ran ``max_word_len``
    driver rounds, each a vocabulary-scale join + eagerly-checkpointed
    aggregation — 31 eager jobs and ~2.5 s of pure scheduling at sf0.1
    (3.6 s -> ~1.2 s). Scale shape: per-task state is the partition's
    cells plus the dp matrix (both proportional to the shuffle partition
    size, the EWMA-operator bound); scores stay the exact integer
    composite, so results are bit-identical to the round-based relaxation
    (same max over the same cells; pytest replays the DP in pure Python).
    """
    vocab = _vocab(docs, text_col).localCheckpoint(eager=True)
    max_len = vocab.agg(F.max(F.length("w"))).collect()[0][0]
    if max_len is None:
        return spark.createDataFrame(
            [], "w string, cnt long, best_score long, n_pieces int"
        )
    if max_len >= 32:
        raise ValueError(f"composite DP encoding needs words < 32 chars, got {max_len}")

    pf = piece_freqs(vocab).localCheckpoint(eager=True)
    # unigram normalizer: one scalar pull (the k-means/BPE driver-traffic
    # contract), quantized to floor(log2)
    total = pf.agg(F.sum("freq")).collect()[0][0]
    t_bits = int(total).bit_length() - 1
    cells = (
        _substring_cells(vocab)
        .join(pf, "piece")
        .select(
            "w",
            "cnt",
            "end",
            "k",
            # integer log-prob in bits: floor(log2 freq) - floor(log2 total)
            (F.length(F.bin(F.col("freq"))) - 1 - F.lit(t_bits)).alias("lp"),
        )
    )

    base = SCORE_OFFSET * 32 + 31
    kmax = MAX_PIECE_LEN
    # sentinel far below any reachable composite (|lp|*32 <= ~2000/cell,
    # <= 31 cells): never wins a max, never under/overflows int64
    neg = -(1 << 40)

    def relax(batches):
        import numpy as np
        import pandas as pd

        # a shuffle partition can deliver ZERO batches (ADVICE r14: the
        # empty guard below is unreachable for that case and pd.concat([])
        # raises) — currently shielded only by AQE coalescing, so guard it
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        words_u, widx = np.unique(pdf["w"].to_numpy(), return_inverse=True)
        nw = len(words_u)
        lens = np.array([len(w) for w in words_u], dtype=np.int64)
        ml = int(lens.max())
        lp = np.full((nw, ml + 1, kmax + 1), neg, dtype=np.int64)
        lp[widx, pdf["end"].to_numpy(), pdf["k"].to_numpy()] = (
            pdf["lp"].to_numpy()
        )
        cnt = np.zeros(nw, dtype=np.int64)
        cnt[widx] = pdf["cnt"].to_numpy()
        dp = np.full((nw, ml + 1), neg, dtype=np.int64)
        dp[:, 0] = base
        for i in range(1, ml + 1):
            # max over k of dp[i-k] + lp*32 - 1 — the same integer
            # composite relaxation the round-based form aggregated;
            # k=1 cells always exist (single chars are pieces), so every
            # position of a real word is reachable
            cand = [
                dp[:, i - k] + lp[:, i, k] * 32 - 1
                for k in range(1, min(kmax, i) + 1)
            ]
            dp[:, i] = np.max(cand, axis=0)
        comp = dp[np.arange(nw), lens]
        yield pd.DataFrame(
            {
                "w": words_u,
                "cnt": cnt,
                "best_score": comp // 32 - SCORE_OFFSET,
                "n_pieces": (31 - comp % 32).astype("int32"),
            }
        )

    from ..functions.plan import sorted_once

    return sorted_once(
        cells.repartition("w").mapInPandas(
            relax, "w string, cnt long, best_score long, n_pieces int"
        ),
        "w",
    )


def viterbi_reference(texts: list[str]) -> dict[str, tuple[int, int, int]]:
    """Pure-Python oracle for tests: {word: (cnt, best_score, n_pieces)}."""
    from collections import Counter

    vocab = Counter(w for t in texts for w in t.split() if w)
    freq: Counter = Counter()
    for w, c in vocab.items():
        for i in range(len(w)):
            for k in range(1, MAX_PIECE_LEN + 1):
                if i + k <= len(w):
                    freq[w[i : i + k]] += c
    t_bits = sum(freq.values()).bit_length() - 1
    out = {}
    for w, c in vocab.items():
        # comp = (score + SCORE_OFFSET) * 32 + (31 - n)
        dp = [None] * (len(w) + 1)
        dp[0] = SCORE_OFFSET * 32 + 31
        for i in range(1, len(w) + 1):
            best = None
            for k in range(1, min(MAX_PIECE_LEN, i) + 1):
                if dp[i - k] is None:
                    continue
                lp = freq[w[i - k : i]].bit_length() - 1 - t_bits
                cand = dp[i - k] + lp * 32 - 1
                if best is None or cand > best:
                    best = cand
            dp[i] = best
        comp = dp[len(w)]
        out[w] = (c, comp // 32 - SCORE_OFFSET, 31 - comp % 32)
    return out

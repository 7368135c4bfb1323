"""Viterbi unigram-LM segmentation: DP-on-DataFrames vs pure-Python."""

from __future__ import annotations

from bridge_monitoring_pyspark_spark.operators.unigram import (
    MAX_PIECE_LEN,
    viterbi_reference,
    viterbi_segment_stats,
)
from bridge_monitoring_pyspark_spark.plans.catalog import all_queries

from testdata_paths import SF_SMOKE


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return {
        r.w: (r.cnt, r.best_score, r.n_pieces)
        for r in viterbi_segment_stats(spark, df).collect()
    }


def test_viterbi_matches_python_reference(spark):
    texts = ["low lower lowest", "new newest news", "low low banana"]
    assert _run(spark, texts) == viterbi_reference(texts)


def test_viterbi_prefers_frequent_pieces_and_fewer_cuts(spark):
    # 'abab' repeated makes the 4-gram 'abab' the heaviest piece; the best
    # segmentation of 'abab' must be the single piece (n_pieces = 1)
    texts = ["abab abab abab ababx"]
    got = _run(spark, texts)
    want = viterbi_reference(texts)
    assert got == want
    assert got["abab"][2] == 1


def test_viterbi_single_chars_always_segmentable(spark):
    # a word of unique chars longer than MAX_PIECE_LEN still segments
    texts = ["qwertyui zz"]
    got = _run(spark, texts)
    want = viterbi_reference(texts)
    assert got == want
    assert got["qwertyui"][2] >= 8 // MAX_PIECE_LEN


def test_viterbi_catalog_entry_runs_on_documents(spark):
    rows = all_queries()["viterbi_segment_stats"].build(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_pieces <= len(r.w)
        assert r.best_score <= 0  # quantized log-probs
    assert [r.w for r in rows] == sorted(r.w for r in rows)

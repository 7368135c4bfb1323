"""Tests for corpus-composition operators: mixture-weight algebra
(python replay from the token counts) and the token-budget curation
invariants (budget respected, best-first selection, conservation)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bridge_monitoring_pyspark_spark.functions.text import token_count_estimate, words
from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.plans.extras16 import LANG_TOKEN_BUDGET
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def test_mixture_weights_match_python_replay(spark):
    rows = all_queries()["domain_mixture_weights"].build(spark, SF_SMOKE).collect()
    assert rows
    tot = sum(r.n_tokens for r in rows)
    tot_sqrt = sum(math.sqrt(r.n_tokens) for r in rows)
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.n_tokens > 0 and r.n_docs > 0
        assert abs(r.raw_share - r.n_tokens / tot) < 1e-6
        assert abs(r.mix_weight - math.sqrt(r.n_tokens) / tot_sqrt) < 1e-6
        assert abs(r.upsample_factor - r.mix_weight / r.raw_share) < 1e-3


def test_bpe_pairs_match_python_replay(spark):
    from collections import Counter

    rows = all_queries()["bpe_merge_pairs"].build(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    texts = [r.text for r in
             load_table(spark, SF_SMOKE, "documents").select("text").collect()]
    counts: Counter = Counter()
    for t in texts:
        for w in t.split():
            for a, b in zip(w, w[1:]):
                counts[(a, b)] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:len(rows)]
    got = [((r.left, r.right), r.n_pairs) for r in rows]
    assert got == expect


def test_curation_budget_and_best_first(spark):
    rows = {r.lang: r for r in
            all_queries()["token_budget_curation"].build(spark, SF_SMOKE).collect()}
    assert rows
    d = load_table(spark, SF_SMOKE, "documents")
    w = words(F.col("text"))
    scored = d.select(
        "doc_id", "lang",
        token_count_estimate(F.col("text")).cast("long").alias("n_tok"),
        F.round(F.size(F.array_distinct(w)) / F.size(w), 4).alias("quality"),
    ).collect()
    by_lang: dict[str, list] = {}
    for r in scored:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(rows) == set(by_lang)
    for lang, docs in by_lang.items():
        docs.sort(key=lambda r: (-r.quality, r.doc_id))
        cum, kept = 0, []
        for r in docs:
            cum += r.n_tok
            if cum <= LANG_TOKEN_BUDGET:
                kept.append(r)
        got = rows[lang]
        assert got.n_docs_total == len(docs)
        assert got.tokens_total == sum(r.n_tok for r in docs)
        assert got.n_docs_kept == len(kept)
        if kept:
            assert got.tokens_kept == sum(r.n_tok for r in kept)
            assert got.tokens_kept <= LANG_TOKEN_BUDGET
            assert abs(got.min_quality_kept - min(r.quality for r in kept)) < 1e-6


def test_pretraining_manifest_funnel_invariants(spark):
    from bridge_monitoring_pyspark_spark.plans.extras15 import PACK_BUDGET

    rows = {r.stage: r for r in
            all_queries()["pretraining_manifest"].build(spark, SF_SMOKE).collect()}
    assert list(rows) == ["raw", "quality", "dedup", "curated", "packed"]
    # funnel: each filtering stage keeps a non-empty, non-increasing subset
    chain = [rows["raw"], rows["quality"], rows["dedup"], rows["curated"]]
    for a, b in zip(chain, chain[1:]):
        assert 0 < b.n_docs <= a.n_docs
        assert 0 < b.n_tokens <= a.n_tokens
    # the quality floor must actually drop something at this SF
    assert rows["quality"].n_docs < rows["raw"].n_docs
    # packing: concat-and-chunk over the curated tokens
    c = rows["curated"]
    p = rows["packed"]
    assert p.n_tokens == c.n_tokens
    assert p.n_docs == (c.n_tokens + PACK_BUDGET - 1) // PACK_BUDGET


def test_multimodal_resize_matches_python_replay(spark):
    from bridge_monitoring_pyspark_spark.plans.extras16 import RESIZE_TARGET

    rows = {r.doc_id: r for r in
            all_queries()["multimodal_resize"].build(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        b = d.text.encode("utf-8")
        stride = max(1, -(-len(b) // RESIZE_TARGET))
        s = b[::stride]
        r = rows[d.doc_id]
        assert r.in_bytes == len(b)
        assert r.out_bytes == len(s) <= RESIZE_TARGET
        assert r.stride == stride
        assert r.checksum == sum(s)
        assert r.first_byte == (s[0] if s else -1)
        assert r.last_byte == (s[-1] if s else -1)

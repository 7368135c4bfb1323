"""Iterative BPE trainer (operators/bpe.py) vs a pure-Python reference."""

from __future__ import annotations

from bridge_monitoring_pyspark_spark.operators.bpe import (
    train_bpe,
    train_bpe_reference,
)
from bridge_monitoring_pyspark_spark.plans.catalog import all_queries

from testdata_paths import SF_SMOKE

CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "new new newer newer",
]


def _spark_merges(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [tuple(r) for r in train_bpe(spark, df, n, "text").collect()]


def test_bpe_matches_reference_on_classic_corpus(spark):
    # A Sennrich-style corpus. With these multiplicities the first merge
    # is ('e','w') (newest 6 + new 2 + newer 2 = 10 beats ('e','s') = 9).
    got = _spark_merges(spark, CORPUS, 6)
    want = train_bpe_reference(CORPUS, 6)
    assert got == want
    assert got[0][1:4] == ("e", "w", 10)


def test_bpe_greedy_left_to_right_run_folding(spark):
    # 'a a a a' inside one word must fold left-to-right: aaaa -> aa aa,
    # not aa a a / a aa a. The reference implements exactly that walk.
    texts = ["aaaa aaaa aaaa baaab"]
    got = _spark_merges(spark, texts, 3)
    want = train_bpe_reference(texts, 3)
    assert got == want


def test_bpe_tie_break_is_lexicographic(spark):
    # Every adjacent pair in 'xy' / 'yz' words ties on count; the winner
    # must be the lexicographically smallest (left, right).
    texts = ["xy yz", "xy yz"]
    got = _spark_merges(spark, texts, 2)
    want = train_bpe_reference(texts, 2)
    assert got == want
    assert got[0][1:3] == min(p[1:3] for p in want)


def test_bpe_exhausts_when_no_pairs_left(spark):
    # Single-char words have one pair each (c,</w>); after those merge,
    # training must stop early rather than loop.
    texts = ["a b a"]
    got = _spark_merges(spark, texts, 10)
    want = train_bpe_reference(texts, 10)
    assert got == want
    assert len(got) < 10


def _ref_encode(word: str, merges) -> list[str]:
    # greedy left-to-right fold of each learned merge, in rank order —
    # the same semantics as operators/bpe._apply_merge
    syms = list(word) + ["</w>"]
    for _, left, right, _ in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_fertility_matches_python_replay(spark):
    from bridge_monitoring_pyspark_spark.operators.bpe import fertility_by_lang

    rows = [
        ("en", "low low lower newest"),
        ("en", "new newest widest"),
        ("de", "niedrig niedriger neueste"),
        ("de", "neu neueste"),
        ("fr", "bas plus nouveau"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    merges = train_bpe_reference([t for _, t in rows], 5)
    want: dict[str, tuple[int, int, float]] = {}
    for lang in ("de", "en", "fr"):
        occ: dict[str, int] = {}
        for lg, t in rows:
            if lg == lang:
                for w in t.split():
                    occ[w] = occ.get(w, 0) + 1
        n_words = sum(occ.values())
        tok = sum(c * len(_ref_encode(w, merges)) for w, c in occ.items())
        want[lang] = (n_words, len(occ), round(tok / n_words, 4))
    got = fertility_by_lang(spark, df, 5).collect()
    assert [r.lang for r in got] == ["de", "en", "fr"]
    for r in got:
        assert (r.n_words, r.n_distinct_words, r.fertility) == want[r.lang]


def test_bpe_catalog_entry_runs_on_documents(spark):
    df = all_queries()["bpe_train_merges"].build(spark, SF_SMOKE)
    rows = df.collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.n_pairs > 0 for r in rows)
    # Monotone non-increasing pair counts (greedy argmax each round can
    # only see counts <= the previous max + merges never add new pairs
    # with higher count than the chosen one had... not strictly true in
    # general BPE, so just sanity-check the first is the global max).
    assert rows[0].n_pairs == max(r.n_pairs for r in rows)

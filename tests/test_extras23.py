"""Round-7 wave: product-quantization ANN + perceptual-hash image dedup."""

from __future__ import annotations

import numpy as np
import pytest

from bridge_monitoring_pyspark_spark.plans.catalog import all_queries
from bridge_monitoring_pyspark_spark.sources.readers import load_table

from testdata_paths import SF_SMOKE


def _exact_l2_top5(emb: dict[int, np.ndarray], n_query: int = 10):
    out = {}
    for q in range(n_query):
        if q not in emb:
            continue
        d2 = {
            c: float(((emb[q] - v) ** 2).sum()) for c, v in emb.items() if c != q
        }
        out[q] = {c for c, _ in sorted(d2.items(), key=lambda kv: (kv[1], kv[0]))[:5]}
    return out


def test_pq_recall_vs_exact_l2(spark):
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    exact = _exact_l2_top5(emb)
    approx = {}
    for r in all_queries()["ann_pq_adc_topk"].build(spark, SF_SMOKE).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    # near-uniform random embeddings are PQ's hardest case; random top-5
    # over ~50 candidates would score ~0.1
    assert mean_recall >= 0.3, f"PQ recall collapsed: {mean_recall}"


def test_pq_adc_is_sum_of_subspace_tables(spark):
    """ADC distance of (query, neighbor) must equal the sum over subspaces
    of the query-to-codeword d2 for the neighbor's assigned codeword —
    recomputed here from first principles in numpy."""
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    n = len(emb)
    stride = max(1, n // 16)
    cb = {j: emb[j * stride] for j in range(16) if j * stride in emb}

    def d2(a, b):
        s = float(a @ a) - 2 * float(a @ b) + float(b @ b)
        # replicate HALF_UP at 6 decimals like both engines
        return float(np.floor(s * 1e6 + 0.5) / 1e6) if s >= 0 else round(s, 6)

    def codes(vid):
        return [
            min(
                range(len(cb)),
                key=lambda j: (d2(emb[vid][m * 16:(m + 1) * 16],
                                  cb[j][m * 16:(m + 1) * 16]), j),
            )
            for m in range(4)
        ]

    got = all_queries()["ann_pq_adc_topk"].build(spark, SF_SMOKE).collect()
    assert got, "PQ returned no rows"
    for r in got[:10]:
        c = codes(r.neighbor_id)
        expect = round(
            sum(
                d2(emb[r.query_id][m * 16:(m + 1) * 16],
                   cb[c[m]][m * 16:(m + 1) * 16])
                for m in range(4)
            ),
            6,
        )
        assert r.adc_d2 == pytest.approx(expect, abs=2e-6), (
            r.query_id, r.neighbor_id)


def test_phash_identical_images_collide(spark):
    from bridge_monitoring_pyspark_spark.operators.multimodal import (
        perceptual_dhash, synth_png,
    )

    df = spark.createDataFrame(
        [(1, bytearray(synth_png(7))),
         (2, bytearray(synth_png(7))),   # same image, different doc
         (3, bytearray(synth_png(8)))],  # different image
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.dhash for r in perceptual_dhash(df).collect()}
    assert len(got) == 3
    assert all(len(h) == 64 and set(h) <= {"0", "1"} for h in got.values())
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_phash_dedup_classes_partition_corpus(spark):
    q = all_queries()["phash_image_dedup"]
    got = q.build(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_images for r in got) == n_docs
    assert all(len(r.dhash) == 64 for r in got)
    # representative is the smallest member by construction
    assert min(r.rep_doc for r in got) == 0

"""Invariants of tools/gen_scale.py — the deterministic fixture scaler
behind the committed sf0.1→sf1→sf10 trajectory evidence (SCALING.md).

The scaling measurements are only meaningful if the transforms really are
semantics-preserving: keys must stay unique, every foreign-key edge must
stay closed within its copy, the document cipher must preserve within-copy
shingle structure while killing cross-copy overlap, and the embedding
permutation must be orthogonal. Runs on sf0.001 (6k lineitem rows) with
factor 3 into a tmpdir — covers every transform branch in seconds.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from gen_scale import scale  # noqa: E402

SRC = "/root/testdata/sf0.001"
FACTOR = 3


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale") / "sf_scaled")
    scale(SRC, dst, FACTOR)
    return dst


def _q(sql):
    return duckdb.sql(sql).fetchone()


def test_row_counts_and_key_uniqueness(scaled):
    for table, key in [
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        n_src = _q(f"SELECT count(*) FROM read_parquet('{SRC}/{table}.parquet')")[0]
        n, nd = _q(
            f"SELECT count(*), count(DISTINCT {key}) "
            f"FROM read_parquet('{scaled}/{table}.parquet')"
        )
        assert n == FACTOR * n_src, table
        assert nd == n, f"{table}: duplicate {key} after scaling"


def test_dims_fixed(scaled):
    for table in ("region", "nation"):
        n_src = _q(f"SELECT count(*) FROM read_parquet('{SRC}/{table}.parquet')")[0]
        n = _q(f"SELECT count(*) FROM read_parquet('{scaled}/{table}.parquet')")[0]
        assert n == n_src, table


def test_foreign_keys_closed(scaled):
    for fact, fk, dim, pk in [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
    ]:
        dangling = _q(
            f"SELECT count(*) FROM read_parquet('{scaled}/{fact}.parquet') f "
            f"LEFT JOIN read_parquet('{scaled}/{dim}.parquet') d "
            f"ON f.{fk} = d.{pk} WHERE d.{pk} IS NULL"
        )[0]
        assert dangling == 0, f"{fact}.{fk} -> {dim}.{pk}"


def test_copy_zero_identical(scaled):
    n_src = _q(f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')")[0]
    diff = _q(
        f"SELECT count(*) FROM ("
        f"SELECT * FROM read_parquet('{scaled}/documents.parquet') "
        f"WHERE doc_id < {n_src} "
        f"EXCEPT SELECT * FROM read_parquet('{SRC}/documents.parquet'))"
    )[0]
    assert diff == 0


def test_cipher_preserves_lengths_and_dup_structure(scaled):
    # bijective letter substitution: lengths unchanged (n_chars stays
    # truthful) and each copy has exactly the source's exact-dup count,
    # with zero cross-copy text collisions
    bad_len = _q(
        f"SELECT count(*) FILTER (len(text) <> n_chars) "
        f"FROM read_parquet('{scaled}/documents.parquet')"
    )[0]
    assert bad_len == 0
    n_src, nd_src = _q(
        f"SELECT count(*), count(DISTINCT text) FROM read_parquet('{SRC}/documents.parquet')"
    )
    n, nd = _q(
        f"SELECT count(*), count(DISTINCT text) FROM read_parquet('{scaled}/documents.parquet')"
    )
    assert (n - nd) == FACTOR * (n_src - nd_src), "dup count must scale linearly"


def test_measured_shape_bands():
    """Pin the classifier (tools/bench_scale.py:measured_shape): the decade-3
    18.08x-at-10x case must classify superlinear, never linear."""
    from bench_scale import measured_shape

    assert measured_shape(1.1, 10) == "flat"
    assert measured_shape(4.0, 10) == "sublinear"
    assert measured_shape(10.0, 10) == "linear"
    assert measured_shape(13.0, 10) == "linear"
    assert measured_shape(14.54, 10) == "superlinear"  # q3 @ decade 3
    assert measured_shape(18.08, 10) == "superlinear"  # salted join @ decade 3
    assert measured_shape(80.0, 10) == "quadratic-ish"


def test_committed_scale_runs_carry_measured_shape():
    """Every committed SCALE_RUNS artifact must store BOTH the expected tag
    and a measured_shape consistent with its own recorded ratio — the
    round-5 review found the old single field overstating 18x as linear."""
    import json

    from bench_scale import measured_shape

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fname in ("SCALE_RUNS.json", "SCALE_RUNS_DECADE2.json", "SCALE_RUNS_DECADE3.json"):
        d = json.load(open(os.path.join(repo, fname)))
        for name, rec in d["queries"].items():
            assert "shape" not in rec, f"{fname}:{name} still has the old field"
            assert "expected_shape" in rec, f"{fname}:{name}"
            if "ratio" in rec:
                assert rec["measured_shape"] == measured_shape(
                    rec["ratio"], d["factor_rows"]
                ), f"{fname}:{name}"


def test_embedding_permutation_orthogonal(scaled):
    # dimension permutation preserves every within-copy norm exactly
    n_src = _q(f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')")[0]
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{scaled}/embeddings.parquet')"
    ).fetchall()
    base = {vid: np.array(v, dtype=np.float64) for vid, v in rows if vid < n_src}
    for vid, v in rows:
        b = base[vid % n_src]
        v = np.array(v, dtype=np.float64)
        # the EXACT claim: same multiset of components (a permutation, not
        # a rotation) — norm equality then follows up to summation order,
        # so the float check is tolerance-1-ulp only
        assert sorted(v.tolist()) == sorted(b.tolist()), vid
        assert abs(np.linalg.norm(v) - np.linalg.norm(b)) < 1e-12, vid


def test_plant_neardup_pairs_exact_cosine():
    """Round-13 planting (VERDICT r12 item 2): planted targets hit the
    requested cosine band EXACTLY against their sources, preserve the
    overwritten row's norm, touch nothing else, use disjoint indices, and
    replay deterministically from the same seed."""
    from gen_scale import plant_neardup_pairs

    rng = np.random.default_rng(7)
    mat = (rng.standard_normal((400, 32)) * 3).astype(np.float32)
    orig = mat.copy()
    pairs = plant_neardup_pairs(mat, np.random.default_rng(1), 60)
    src = np.array([p[0] for p in pairs])
    dst = np.array([p[1] for p in pairs])
    u = mat[src] / np.linalg.norm(mat[src], axis=1, keepdims=True)
    v = mat[dst] / np.linalg.norm(mat[dst], axis=1, keepdims=True)
    cos = (u * v).sum(axis=1)
    assert cos.min() >= 0.905 - 1e-5 and cos.max() <= 0.98 + 1e-5
    assert np.allclose(
        np.linalg.norm(mat[dst], axis=1),
        np.linalg.norm(orig[dst], axis=1),
        rtol=1e-5,
    )
    untouched = np.ones(len(mat), dtype=bool)
    untouched[dst] = False
    assert np.array_equal(mat[untouched], orig[untouched])
    assert len(set(src) | set(dst)) == 2 * len(pairs)  # disjoint
    mat2 = orig.copy()
    assert plant_neardup_pairs(mat2, np.random.default_rng(1), 60) == pairs
    assert np.array_equal(mat, mat2)
    with pytest.raises(ValueError):
        plant_neardup_pairs(mat2, np.random.default_rng(2), 201)  # 402 > 400


def test_plant_zero_pairs_leaves_scale_output_identical(tmp_path):
    """--plant-pairs 0 (the default) must be byte-identical to the
    pre-round-13 generator output — the committed SCALE_RUNS* timing
    fixtures depend on it."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    scale(SRC, a, 2, {"embeddings"})
    scale(SRC, b, 2, {"embeddings"}, plant_pairs=0)
    with open(os.path.join(a, "embeddings.parquet"), "rb") as fa, open(
        os.path.join(b, "embeddings.parquet"), "rb"
    ) as fb:
        assert fa.read() == fb.read()


def test_planted_pairs_sidecar_replay_matches_vectors(tmp_path):
    """The planted_pairs.json sidecar is recovered by RNG REPLAY (index
    draws only), not recorded during planting — so pin that the replayed
    (src, dst) vec_id pairs really are the planted ones: every sidecar
    pair must hit the planted cosine band in the written parquet."""
    import json

    import pyarrow.parquet as pq

    from gen_scale import planted_pair_vec_ids

    d = str(tmp_path / "planted")
    scale(SRC, d, 3, {"embeddings"}, plant_pairs=40)
    with open(os.path.join(d, "planted_pairs.json")) as f:
        pairs = json.load(f)
    assert pairs == [list(p) for p in planted_pair_vec_ids(SRC, 3, 40)]
    assert len(pairs) == 3 * 40
    t = pq.read_table(os.path.join(d, "embeddings.parquet"))
    vid = t["vec_id"].to_numpy()
    mat = np.asarray(t["embedding"].combine_chunks().flatten()).reshape(
        len(t), -1
    )
    pos = {int(v): i for i, v in enumerate(vid)}
    s = np.array([pos[a] for a, b in pairs])
    dst = np.array([pos[b] for a, b in pairs])
    u = mat[s] / np.linalg.norm(mat[s], axis=1, keepdims=True)
    v = mat[dst] / np.linalg.norm(mat[dst], axis=1, keepdims=True)
    cos = (u * v).sum(axis=1)
    assert cos.min() >= 0.905 - 1e-4 and cos.max() <= 0.98 + 1e-4
    # pairs are within-copy: both ids fall in the same copy's id range
    stride = int(vid.max() // 3) + 1  # 3 copies over the source key space
    assert all(a // stride == b // stride for a, b in pairs)

"""Deterministic scale-up of the driver's sf0.1 fixtures (default 10x -> "sf1").

The driver only ships sf{0.001,0.01,0.1}; the 100 TB argument needs at least
one measured decade of scaling (VERDICT r4, next-round item 2). This tool
replicates every table ``--factor`` times with transforms chosen so the
*semantic density* of each workload scales linearly — i.e. a correct engine
should show ~linear wall-clock on the linear-work operators, and the known
quadratic ones (exact k-NN join, blocked all-pairs) should show their honest
quadratic shape:

- **Relational tables** (customer/supplier/part/orders/lineitem/events):
  copy ``i`` offsets every surrogate/foreign key by ``i * (max_key + 1)`` so
  keys stay unique and every join edge lands inside its own copy. Join
  fan-out per key, group cardinality per key, and selectivity of every
  filter are copy-invariant, so group-by/join work scales by exactly
  ``factor``. Timestamps are kept — scaling means *denser* traffic over the
  same wall-clock window, which is what a bigger cluster ingests.
- **documents.text**: copy ``i`` applies a per-copy bijective letter
  substitution (a seeded permutation of a-z). A uniform bijection maps every
  shingle set through the same injection, so *within-copy* Jaccard /
  MinHash / SimHash / winnowing structure is preserved exactly, while
  cross-copy shingle overlap collapses to ~0 (different cipher). Near-dup
  pair counts therefore scale ~linearly instead of quadratically in the
  copy count, which is the realistic "more distinct documents" regime.
- **embeddings.embedding**: copy ``i`` permutes the vector dimensions with a
  seeded permutation. Dimension permutation is orthogonal, so within-copy
  cosine structure is exact; cross-copy similarities decorrelate. Threshold
  near-dup pair counts scale linearly; k-NN targets stay within-copy-dense.

Copy 0 is byte-identical to the source, so sf0.1 results embed in sf1.

**Planted tight near-dups (round 13, VERDICT r12 item 2).** The synthetic
embeddings have NO pairs above cosine 0.6 (max-pair sweep, SCALING.md
round 12), so the production SemDeDup regime (τ ≈ 0.9) was unmeasurable.
``--plant-pairs P`` overwrites, per copy, P target rows with exact-cosine
near-dups of P distinct source rows: for unit source û and a seeded
gaussian direction orthogonalized to it (ŵ), the target becomes
``(cosθ·û + sinθ·ŵ)·‖orig‖`` with θ drawn so cos θ ∈ [0.905, 0.98] —
strictly inside τ=0.9, scale-preserving, deterministic. Pairs are
within-copy (planted-pair counts scale linearly with --factor) and
planting happens after the per-copy dimension permutation (orthogonal, so
the constructed cosine is exact either way). Default 0 = no planting; the
copy-0-byte-identical invariant and every committed SCALE_RUNS* timing
fixture are untouched unless the flag is passed — planted corpora belong
in their own --dst (convention: ``.scale/sf<k>nd``).

Usage:
    python tools/gen_scale.py [--src /root/testdata/sf0.1] \
        [--dst .scale/sf1] [--factor 10]

Output goes under the repo (``.scale/`` is gitignored) — /root/testdata is
read-only and must not be touched.
"""

from __future__ import annotations

import argparse
import os
import string

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42

# table -> columns that are surrogate/foreign keys into a per-table key space.
# Each key column is offset by copy * (max_of_that_space + 1); spaces are
# named so foreign keys share their parent's offset.
KEY_SPACES: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}

# Dimension tables that do not scale with sf (TPC-H convention).
FIXED_TABLES = ("region", "nation")


def _space_strides(src: str) -> dict[str, int]:
    """stride per key space = max value across every column in the space + 1."""
    strides: dict[str, int] = {}
    for table, cols in KEY_SPACES.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=list(cols))
        for col, space in cols.items():
            m = pc.max(t[col]).as_py()
            strides[space] = max(strides.get(space, 0), int(m) + 1)
    return strides


def _letter_cipher(copy: int) -> dict[int, int] | None:
    """Per-copy bijective substitution over ascii lowercase (copy 0 = identity)."""
    if copy == 0:
        return None
    rng = np.random.default_rng(SEED * 1000 + copy)
    letters = list(string.ascii_lowercase)
    perm = rng.permutation(26)
    return str.maketrans(
        string.ascii_lowercase, "".join(letters[j] for j in perm)
    )


def plant_neardup_pairs(
    mat: np.ndarray,
    rng: np.random.Generator,
    n_pairs: int,
    cos_lo: float = 0.905,
    cos_hi: float = 0.98,
) -> list[tuple[int, int]]:
    """Overwrite ``n_pairs`` rows of ``mat`` IN PLACE with exact-cosine
    near-dups of ``n_pairs`` other rows; returns the (source, target) index
    pairs.

    Construction: for unit source û, draw gaussian g, orthogonalize to û
    and normalize (ŵ), then target = (cosθ·û + sinθ·ŵ)·‖target_orig‖ with
    cosθ ~ U[cos_lo, cos_hi]. cos(û, target) == cosθ exactly (up to float
    rounding ~1e-7), and cosine is scale-invariant so preserving the
    target's original norm keeps the corpus' magnitude distribution.
    Sources and targets are 2·n_pairs DISTINCT rows, so no planted vector
    is both a source and an overwritten target and the planted pairs are
    mutually disjoint."""
    n = len(mat)
    if 2 * n_pairs > n:
        raise ValueError(f"cannot plant {n_pairs} disjoint pairs in {n} rows")
    idx = rng.choice(n, size=2 * n_pairs, replace=False)
    src, dst = idx[:n_pairs], idx[n_pairs:]
    u = mat[src].astype(np.float64)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    g = rng.standard_normal(u.shape)
    w = g - (g * u).sum(axis=1, keepdims=True) * u
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    cos = rng.uniform(cos_lo, cos_hi, size=(n_pairs, 1))
    norms = np.linalg.norm(mat[dst].astype(np.float64), axis=1, keepdims=True)
    mat[dst] = ((cos * u + np.sqrt(1.0 - cos**2) * w) * norms).astype(mat.dtype)
    return list(zip(src.tolist(), dst.tolist()))


def _transform_copy(
    table: str, t: pa.Table, copy: int, strides: dict[str, int],
    plant_pairs: int = 0,
) -> pa.Table:
    cols = {}
    key_cols = KEY_SPACES.get(table, {})
    for name in t.column_names:
        arr = t[name]
        if name in key_cols and copy > 0:
            off = copy * strides[key_cols[name]]
            arr = pc.add(arr, pa.scalar(off, type=arr.type))
        cols[name] = arr
    if table == "documents" and copy > 0:
        cipher = _letter_cipher(copy)
        texts = cols["text"].to_pylist()
        cols["text"] = pa.array(
            [s.translate(cipher) if s is not None else None for s in texts],
            type=t.schema.field("text").type,
        )
    if table == "embeddings" and (copy > 0 or plant_pairs):
        rng = np.random.default_rng(SEED * 2000 + copy)
        emb = cols["embedding"].combine_chunks()
        mat = np.asarray(emb.flatten()).reshape(len(t), -1)
        if copy > 0:
            mat = mat[:, rng.permutation(mat.shape[1])]  # copies
        else:
            mat = mat.copy()  # planting writes in place; never the source
        if plant_pairs:
            plant_neardup_pairs(
                mat, np.random.default_rng(SEED * 3000 + copy), plant_pairs
            )
        cols["embedding"] = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), type=pa.float32()), mat.shape[1]
        ).cast(t.schema.field("embedding").type)
    return pa.table(cols, schema=t.schema)


def planted_pair_vec_ids(
    src: str, factor: int, plant_pairs: int, strides: dict[str, int] | None = None
) -> list[tuple[int, int]]:
    """Replay the planting RNG to recover every planted (source vec_id,
    target vec_id) pair of a ``scale(..., plant_pairs=P)`` run — the
    ground truth that outlives the uncapped SemDeDup oracle (which OOMs at
    decade 3 while planted-pair resolution stays countable at any scale).
    Row index i of copy c maps to vec_id[i] + c·stride, and the planting
    RNG (SEED·3000 + c) draws indices then the direction/cosine vectors,
    so index pairs are recoverable WITHOUT touching the vectors."""
    if strides is None:
        strides = _space_strides(src)
    t = pq.read_table(os.path.join(src, "embeddings.parquet"), columns=["vec_id"])
    vec_ids = t["vec_id"].to_numpy()
    n = len(vec_ids)
    stride = strides["vecid"]
    out: list[tuple[int, int]] = []
    for c in range(factor):
        rng = np.random.default_rng(SEED * 3000 + c)
        idx = rng.choice(n, size=2 * plant_pairs, replace=False)
        src_i, dst_i = idx[:plant_pairs], idx[plant_pairs:]
        off = c * stride
        out.extend(
            (int(vec_ids[s]) + off, int(vec_ids[d]) + off)
            for s, d in zip(src_i, dst_i)
        )
    return out


def scale(
    src: str, dst: str, factor: int, only: set[str] | None = None,
    plant_pairs: int = 0,
) -> None:
    os.makedirs(dst, exist_ok=True)
    strides = _space_strides(src)
    tables = list(FIXED_TABLES) + list(KEY_SPACES)
    if only:
        tables = [t for t in tables if t in only]
    for table in tables:
        path = os.path.join(src, f"{table}.parquet")
        t = pq.read_table(path)
        out_path = os.path.join(dst, f"{table}.parquet")
        if table in FIXED_TABLES:
            pq.write_table(t, out_path, row_group_size=1 << 20, compression="snappy")
            n_out = len(t)
        else:
            # stream one copy at a time: peak memory is a single copy, so
            # --factor 100 (sf10) fits without materializing the concat
            with pq.ParquetWriter(out_path, t.schema, compression="snappy") as w:
                for c in range(factor):
                    w.write_table(
                        _transform_copy(table, t, c, strides, plant_pairs)
                    )
            n_out = len(t) * factor
        planted = (
            f"  ({plant_pairs} near-dup pairs/copy planted)"
            if table == "embeddings" and plant_pairs
            else ""
        )
        print(f"{table}: {len(t)} -> {n_out} rows{planted}")
    if plant_pairs and (only is None or "embeddings" in only):
        # sidecar: the planted (src_vec_id, dst_vec_id) ground truth,
        # recovered by RNG replay so it is exact by construction
        import json

        pairs = planted_pair_vec_ids(src, factor, plant_pairs, strides)
        with open(os.path.join(dst, "planted_pairs.json"), "w") as f:
            json.dump(pairs, f)
        print(f"planted_pairs.json: {len(pairs)} pairs")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--tables", default=None,
                    help="comma-list subset of tables to generate (e.g. "
                         "'documents,embeddings' for a vectors-only decade run)")
    ap.add_argument("--plant-pairs", type=int, default=0,
                    help="plant N exact-cosine (0.905-0.98) near-dup pairs "
                         "per copy into embeddings (default 0 = untouched; "
                         "use a dedicated --dst, e.g. .scale/sf1nd)")
    a = ap.parse_args()
    scale(a.src, a.dst, a.factor,
          set(a.tables.split(",")) if a.tables else None, a.plant_pairs)


if __name__ == "__main__":
    main()

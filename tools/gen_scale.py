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


def _transform_copy(table: str, t: pa.Table, copy: int, strides: dict[str, int]) -> pa.Table:
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
    if table == "embeddings" and copy > 0:
        rng = np.random.default_rng(SEED * 2000 + copy)
        emb = cols["embedding"].combine_chunks()
        mat = np.asarray(emb.flatten()).reshape(len(t), -1)
        perm = rng.permutation(mat.shape[1])
        cols["embedding"] = pa.FixedSizeListArray.from_arrays(
            pa.array(mat[:, perm].ravel(), type=pa.float32()), mat.shape[1]
        ).cast(t.schema.field("embedding").type)
    return pa.table(cols, schema=t.schema)


def scale(src: str, dst: str, factor: int, only: set[str] | None = None) -> None:
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
                    w.write_table(_transform_copy(table, t, c, strides))
            n_out = len(t) * factor
        print(f"{table}: {len(t)} -> {n_out} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--tables", default=None,
                    help="comma-list subset of tables to generate (e.g. "
                         "'documents,embeddings' for a vectors-only decade run)")
    a = ap.parse_args()
    scale(a.src, a.dst, a.factor, set(a.tables.split(",")) if a.tables else None)


if __name__ == "__main__":
    main()

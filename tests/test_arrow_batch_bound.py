"""Arrow batch bounding for payload-carrying media stages (VERDICT r12
item 6). The round-12 memory audit named payload width × the 10k-row
default Arrow batch as the one residual multimodal risk and proposed
pinning ``maxRecordsPerBatch`` per entry. Investigating that fix surfaced
two facts these tests pin down:

1. the conf is read at ACTION time — a scoped set around a lazy builder
   is a silent no-op, so any per-entry "scoped conf" that doesn't also
   materialize inside the scope would be theater;
2. Spark 4 already bounds batch BYTES natively —
   ``spark.sql.execution.arrow.maxBytesPerBatch`` (default 64 MB) slices
   JVM→Python batches in addition to the row cap, at every Arrow hop,
   under ANY session (the driver's vanilla harness included), which is
   exactly the ~64 MB budget the verdict asked for.

So the engine relies on the native bound and WITNESSES it here by reading
the effective batch sizes back during execution, rather than duplicating
it with per-entry machinery; ``session.pinned_arrow_batch`` stays as the
explicit scoped override for tighter row budgets and its mechanics
(including the action-time caveat) are witnessed too."""

from __future__ import annotations

import pandas as pd

from bridge_monitoring_pyspark_spark.session import pinned_arrow_batch

PAYLOAD_MB = 1 << 20
N_ROWS = 200
KEY_ROWS = "spark.sql.execution.arrow.maxRecordsPerBatch"
KEY_BYTES = "spark.sql.execution.arrow.maxBytesPerBatch"


def _payload_df(spark, payload_bytes: int = PAYLOAD_MB, n_rows: int = N_ROWS):
    return spark.range(n_rows, numPartitions=1).selectExpr(
        "id AS doc_id",
        f"CAST(repeat('x', {payload_bytes}) AS BINARY) AS payload",
    )


def _make_observe():
    # defined per call so the UDF pickles as a closure — a module-level
    # function would pickle by reference and executors can't import a
    # pytest module
    def observe(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})

    return observe


def test_native_byte_bound_defaults(spark):
    """The session (tuned or vanilla — these are Spark defaults, not
    session.py settings) ships a 64 MB byte cap beside the 10k row cap.
    Parsed numerically (the rendering of the default — '67108864b' today —
    is not contractual across Spark versions; the byte count is)."""
    raw = spark.conf.get(KEY_BYTES).lower().rstrip("b")
    assert int(raw) == 64 * 1024 * 1024
    assert int(spark.conf.get(KEY_ROWS)) == 10000


def test_native_byte_bound_slices_wide_payloads(spark):
    """Effective-batch-size read-back: 200 rows × 1 MB payloads through a
    mapInPandas hop arrive in ≤64-row batches (64 MB / 1 MB) with NO conf
    changes — the native bound, not maxRecordsPerBatch (10k), did the
    slicing. This is the bound that keeps a production media pipeline's
    per-task working set ~64 MB at any payload width."""
    sizes = [
        r.n
        for r in _payload_df(spark).mapInPandas(_make_observe(), "n long").collect()
    ]
    assert sum(sizes) == N_ROWS
    assert max(sizes) <= 64
    assert len(sizes) >= N_ROWS // 64


def test_pinned_arrow_batch_scoped_override(spark):
    """The scoped ROW override binds only what materializes inside the
    scope (the conf is action-time), restores on exit, and wins when
    tighter than the byte bound."""
    probe = _payload_df(spark).mapInPandas(_make_observe(), "n long")
    before = spark.conf.get(KEY_ROWS, None)
    with pinned_arrow_batch(spark, 16):
        bounded = [r.n for r in probe.localCheckpoint().collect()]
    assert spark.conf.get(KEY_ROWS, None) == before  # scope restored
    assert sum(bounded) == N_ROWS
    assert max(bounded) <= 16

    # action-time caveat, pinned: the same scope around a LAZY build is a
    # no-op once the action runs outside it — batches revert to the
    # native 64 MB slicing, NOT to 16 rows
    with pinned_arrow_batch(spark, 16):
        lazy = _payload_df(spark).mapInPandas(_make_observe(), "n long")
    unbounded = [r.n for r in lazy.collect()]
    assert max(unbounded) > 16

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as ``mapInPandas`` over
Arrow batches, so payload bytes move columnar-batched (never row-pickled)
and the Python stage parallelizes per partition.

The decode step itself is STUBBED: the real image/audio libraries are not
in this container, so :func:`extract_features` computes deterministic
byte-level features (and the place where PIL/ffmpeg would slot in raises
``NotImplementedError``). The Spark-side plumbing — schema, batching,
partitioning, UDF signature — is real and tested.

Scale notes: binary payloads dominate row width; keep
``spark.sql.files.maxPartitionBytes`` at its default 128 MB so tasks stay
memory-bounded, and never groupBy/shuffle the payload column — project the
features out first, then drop the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, byte_len long, first_byte int, n_spaces long"
)


def with_binary_payload(df: DataFrame, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Attach an opaque binary payload + metadata struct (here derived from
    text since the container ships no media files; a real pipeline reads
    ``binaryFile`` sources into exactly this shape)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).alias("byte_len"),
        ),
    )


def decode_media(payload: bytes, mime: str) -> object:
    """Where PIL/librosa/ffmpeg would decode the payload. Stubbed: the
    container has no media libraries (see module docstring)."""
    raise NotImplementedError(f"no decoder available for {mime} in this environment")


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta).

    Deterministic byte-level stand-ins for decoded features: payload length,
    first byte value, space count. Batch shape: pandas DataFrames of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "byte_len": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "n_spaces": payloads.map(lambda b: b.count(b" ")),
                }
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, first_byte int"


def sample_frames(df: DataFrame, stride: int = 256) -> DataFrame:
    """Fixed-stride frame sampling over binary payloads — the video
    analogue (every Nth frame / byte window) of :func:`extract_features`,
    demonstrating the one-to-many Arrow mapping: each input row yields one
    output row per frame. The frame *decode* would slot into
    :func:`decode_media`; here each frame contributes deterministic byte
    features so the query stays oracle-checkable.

    Scale notes: output fan-out is byte_len/stride per row — project away
    the payload right after this step, and pick stride so frames-per-task
    stays bounded (frame sampling at 100 TB is an explode of the largest
    column in the dataset)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, firsts = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k, start in enumerate(range(0, len(payload), stride)):
                    frame = payload[start : start + stride]
                    ids.append(doc_id)
                    idxs.append(k)
                    sizes.append(len(frame))
                    firsts.append(frame[0] if len(frame) else -1)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "first_byte": firsts,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, in_bytes long, out_bytes int, stride int, "
    "checksum long, first_byte int, last_byte int"
)


def resize_media(df: DataFrame, target: int = 64) -> DataFrame:
    """Deterministic media *resize* over binary payloads: nearest-neighbor
    downsampling to at most ``target`` samples (stride = ceil(len/target),
    keep bytes at 0, stride, 2*stride, ...). This is the 1-D stand-in for
    an image thumbnail pass — the real decoder+PIL resample slots into
    :func:`decode_media`; the Spark-side shape (Arrow batches in, fixed
    compact feature row out, payload projected away) is exactly the
    production plumbing.

    Scale notes: resize is the classic payload-width REDUCER — run it as
    early as possible so downstream shuffles move thumbnails, not
    originals; the output row is O(target) regardless of input size, so
    the post-resize table is safely shuffleable."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ins, outs, strides, sums, firsts, lasts = [], [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                stride = max(1, -(-n // target))
                b = np.frombuffer(payload, dtype=np.uint8)[::stride]
                ids.append(doc_id)
                ins.append(n)
                outs.append(len(b))
                strides.append(stride)
                sums.append(int(b.astype(np.int64).sum()))
                firsts.append(int(b[0]) if len(b) else -1)
                lasts.append(int(b[-1]) if len(b) else -1)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "in_bytes": ins,
                    "out_bytes": outs,
                    "stride": strides,
                    "checksum": sums,
                    "first_byte": firsts,
                    "last_byte": lasts,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as ``mapInPandas`` over
Arrow batches, so payload bytes move columnar-batched (never row-pickled)
and the Python stage parallelizes per partition.

The decode slot is REAL for PNM images (P6 RGB / P5 grayscale) via a
dependency-free parser — :func:`decode_media` returns width/height/pixel
array for ``image/x-portable-pixmap`` / ``-graymap`` and the
``multimodal_decode_ppm`` catalog entry oracle-checks decoded pixel
statistics end-to-end. Formats needing PIL/librosa/ffmpeg (not in this
container) still raise ``NotImplementedError`` from the same slot.

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


_PNM_WS = b" \t\r\n\x0b\x0c"


def _pnm_parse_header(buf: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a PNM (P6/P5) header — whitespace- and ``#``-comment-tolerant
    per the netpbm format spec — returning (magic, width, height, maxval,
    raster_offset). Exactly one whitespace byte separates maxval from the
    raster."""
    tokens: list[bytes] = []
    i, n = 0, len(buf)
    while len(tokens) < 4 and i < n:
        c = buf[i : i + 1]
        if c in _PNM_WS:
            i += 1
        elif c == b"#":
            j = buf.find(b"\n", i)
            i = n if j == -1 else j + 1
        else:
            j = i
            while j < n and buf[j : j + 1] not in _PNM_WS and buf[j : j + 1] != b"#":
                j += 1
            tokens.append(buf[i:j])
            i = j
    if len(tokens) < 4 or i >= n:
        raise ValueError("truncated PNM header")
    # Comments are legal between maxval and the raster delimiter; each runs
    # through its newline, and the LAST consumed newline is the single
    # whitespace that delimits the raster. Anything else in that position
    # (e.g. a stray token) must fail loudly — without the whitespace check
    # the raster offset would land inside arbitrary header bytes and
    # silently decode them as pixels.
    while buf[i : i + 1] == b"#":
        j = buf.find(b"\n", i)
        if j == -1:
            raise ValueError("truncated PNM header")
        if buf[j + 1 : j + 2] == b"#":
            i = j + 1  # another comment follows; its newline delimits instead
        else:
            return tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3]), j + 1
    if buf[i : i + 1] not in _PNM_WS:
        raise ValueError("PNM maxval not followed by whitespace or comment")
    return tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3]), i + 1


def decode_media(payload: bytes, mime: str) -> object:
    """Decode a media payload. REAL for 8-bit PNM images (P6 RGB, P5
    grayscale) — dependency-free parse to ``{width, height, channels,
    pixels: np.ndarray(h, w, c)}``. Other formats need PIL/librosa/ffmpeg,
    which this container doesn't ship, and raise from this same slot."""
    if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        import numpy as np

        magic, w, h, maxval, off = _pnm_parse_header(payload)
        channels = {b"P6": 3, b"P5": 1}.get(magic)
        if channels is None:
            raise ValueError(f"unsupported PNM magic: {magic!r}")
        if not 0 < maxval < 256:
            raise ValueError(f"only 8-bit PNM supported, maxval={maxval}")
        if w <= 0 or h <= 0:
            raise ValueError(f"bad PNM dimensions {w}x{h}")
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=off)
        return {
            "width": w,
            "height": h,
            "channels": channels,
            "pixels": raster.reshape(h, w, channels),
        }
    raise NotImplementedError(f"no decoder available for {mime} in this environment")


def synth_ppm(doc_id: int) -> bytes:
    """Deterministic P6 fixture image for ``doc_id``: width 4 + id%5,
    height 3 + id%4, pixel byte i = (id*7 + i*13) % 256 — closed-form so a
    SQL oracle can replay the decoded statistics exactly. Includes a
    comment line so the production header path (not a toy subset) is what
    gets exercised."""
    import numpy as np

    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    i = np.arange(w * h * 3, dtype=np.int64)
    pix = ((doc_id * 7 + i * 13) % 256).astype(np.uint8)
    return f"P6\n# synth {doc_id}\n{w} {h}\n255\n".encode() + pix.tobytes()


def with_ppm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the :func:`synth_ppm` fixture image as a binary payload
    column via an Arrow batch pass (same plumbing a binaryFile read of
    real images would feed)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [synth_ppm(int(d)) for d in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(batches, "doc_id long, payload binary")


DECODE_STATS_SCHEMA = (
    "doc_id long, width int, height int, r_sum long, g_sum long, b_sum long"
)


def decode_image_stats(
    df: DataFrame, mime: str = "image/x-portable-pixmap"
) -> DataFrame:
    """Arrow-batched real decode: :func:`decode_media` each payload and
    emit width/height plus exact per-channel pixel sums (integers, so the
    oracle compare is exact — no float rounding anywhere).

    Scale notes: decode is the payload-width reducer — output rows are a
    few longs regardless of image size, so everything downstream shuffles
    cheap; the payload column never leaves this stage."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_media(bytes(payload), mime)
                px = img["pixels"].astype(np.int64)
                out["doc_id"].append(doc_id)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                for c, k in enumerate(("r_sum", "g_sum", "b_sum")):
                    out[k].append(int(px[:, :, min(c, img["channels"] - 1)].sum()))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(batches, DECODE_STATS_SCHEMA)


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

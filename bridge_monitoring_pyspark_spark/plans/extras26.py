"""Round-8 extension wave: baseline JPEG decode (operators/jpeg.py).

JPEG completes the image-modality triplet (PNM = raw raster, PNG =
lossless compressed, JPEG = lossy entropy-coded): Huffman decoding with
byte stuffing and restart markers, dequantization, IDCT, interleaved MCUs
with 4:2:0 chroma subsampling, and the YCbCr->RGB transform — none of
which the PNG/PNM paths touch. The fixture encoder makes the whole chain
exactly oracle-replayable: block-constant images have only DC
coefficients, and a flat quant table of 8 makes DC quantization lossless,
so every decoded pixel equals the closed form ``(doc_id*7 + b*13) % 256``
for its block ``b`` — a wrong bit anywhere in marker parse / Huffman /
dequant / IDCT / upsample / color transform flips the value hash.

No counterpart in the 550-LoC reference (no binary columns:
pipelines/bronze_ingest.py reads JSON events only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from .catalog import Query


def _multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-format decode through the multimodal slot: a
    deterministic baseline JPEG per document — rotating grayscale with a
    restart marker per MCU (``id%3==0``), 4:4:4 YCbCr (``id%3==1``) and
    4:2:0 subsampled YCbCr (``id%3==2``), all with neutral chroma so the
    decoded raster is the same closed form — then operators/jpeg.py's
    stdlib+numpy decoder runs marker parse, canonical-Huffman entropy
    decode (with 0xFF00 unstuffing and RST resync), dequantization, IDCT
    and the JFIF color transform, and the stats stage emits width/height
    plus exact per-channel pixel sums. Payload-width reducer: a few longs
    leave the decode stage regardless of image size."""
    from ..operators.multimodal import decode_image_stats, with_jpeg_payload

    d = load_table(spark, sf_dir, "documents")
    return (
        decode_image_stats(with_jpeg_payload(d), mime="image/jpeg")
        .orderBy("doc_id")
    )


# Replays synth_jpeg's closed form: wb x hb blocks of 8x8, block b constant
# (doc_id*7 + b*13) % 256; each block contributes 64x its value to every
# channel (grayscale replicates; color fixtures have neutral chroma).
_DECODE_JPEG_SQL = """
WITH dims AS (
  SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb FROM documents
), blk AS (
  SELECT doc_id, wb, hb, unnest(generate_series(0, wb*hb - 1)) AS b
  FROM dims
), sums AS (
  SELECT doc_id,
         CAST(max(wb) * 8 AS INTEGER) AS width,
         CAST(max(hb) * 8 AS INTEGER) AS height,
         CAST(sum(64 * ((doc_id*7 + b*13) % 256)) AS BIGINT) AS s
  FROM blk GROUP BY doc_id
)
SELECT doc_id, width, height, s AS r_sum, s AS g_sum, s AS b_sum
FROM sums ORDER BY doc_id
"""


QUERIES = [
    Query("multimodal_decode_jpeg", _multimodal_decode_jpeg, _DECODE_JPEG_SQL,
          ("llm", "multimodal", "decode", "jpeg")),
]

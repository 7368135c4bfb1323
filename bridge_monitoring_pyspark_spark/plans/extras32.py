"""Round-8 extension wave 7: Viterbi unigram-LM word segmentation.

``viterbi_segment_stats`` — the SentencePiece-family E-step run as
dynamic programming over DataFrames (operators/unigram.py): per distinct
word, the segmentation maximizing total piece frequency under the corpus
substring model (ties -> fewer pieces), relaxed one position per round
with an integer composite key so the per-position argmax is a plain
``max``. The DuckDB oracle unrolls the identical DP as per-position CTEs
(the BPE replace-trick pattern) up to ``ORACLE_MAX_LEN`` characters —
longer words would silently vanish from the oracle side and fail the
row-count compare, so the bound is load-bearing, not cosmetic.

No counterpart in the 550-LoC reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.unigram import (
    MAX_PIECE_LEN,
    SCORE_OFFSET,
    viterbi_segment_stats,
)
from ..sources.readers import load_table
from .catalog import Query

ORACLE_MAX_LEN = 12


def _viterbi_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return viterbi_segment_stats(spark, d)


def _viterbi_oracle(max_len: int) -> str:
    parts = [
        "WITH ",
        rf"""v AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents)
  WHERE length(w) >= 1 GROUP BY w
),
cells AS (
  SELECT w, cnt, e.e AS pos_end, k.k AS k,
         substring(w, e.e - k.k + 1, k.k) AS piece
  FROM v,
       unnest(range(1, length(w) + 1)) e(e),
       unnest(range(1, {MAX_PIECE_LEN + 1})) k(k)
  WHERE e.e - k.k >= 0
),
pf AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq FROM cells GROUP BY piece),
tb AS (SELECT length(printf('%b', CAST(sum(freq) AS BIGINT))) - 1 AS t_bits FROM pf),
edges AS MATERIALIZED (
  SELECT c.w, c.pos_end, c.k,
         CAST(length(printf('%b', pf.freq)) - 1 - tb.t_bits AS BIGINT) AS lp
  FROM cells c JOIN pf USING (piece) CROSS JOIN tb
),
d0 AS (SELECT w, CAST({SCORE_OFFSET} * 32 + 31 AS BIGINT) AS comp FROM v)""",
    ]
    for i in range(1, max_len + 1):
        branches = []
        for k in range(1, min(MAX_PIECE_LEN, i) + 1):
            branches.append(
                f"""    SELECT e.w, p.comp + e.lp * 32 - 1 AS comp
    FROM edges e JOIN d{i - k} p ON p.w = e.w
    WHERE e.pos_end = {i} AND e.k = {k}"""
            )
        union = "\n    UNION ALL\n".join(branches)
        # MATERIALIZED is load-bearing: each d{{i}} is referenced by up to
        # MAX_PIECE_LEN later positions, and DuckDB's default CTE inlining
        # would expand the chain into a 4^max_len plan (measured: hangs at
        # 12 positions; materialized runs in ~1s)
        parts.append(
            f""",
d{i} AS MATERIALIZED (
  SELECT w, max(comp) AS comp FROM (
{union}
  ) GROUP BY w
)"""
        )
    finals = "\n  UNION ALL\n".join(
        f"  SELECT w, {i} AS pos, comp FROM d{i}" for i in range(1, max_len + 1)
    )
    parts.append(
        f""",
fin AS (
{finals}
)
SELECT v.w, v.cnt,
       CAST(f.comp // 32 - {SCORE_OFFSET} AS BIGINT) AS best_score,
       CAST(31 - f.comp % 32 AS INT) AS n_pieces
FROM v JOIN fin f ON f.w = v.w AND f.pos = length(v.w)
ORDER BY v.w"""
    )
    return "".join(parts)


QUERIES = [
    Query("viterbi_segment_stats", _viterbi_segment_stats,
          _viterbi_oracle(ORACLE_MAX_LEN),
          ("llm", "tokenizer", "unigram", "dp", "iterative")),
]

"""Deduplication operators for LLM training-data pipelines.

Four families, each with an explicit scale story:

* **Exact** — content fingerprint (md5 of canonical form) + keep-first.
  One shuffle on the fingerprint; at 100 TB this is the cheapest possible
  dedup and always runs first to shrink the fuzzy stages' input.
* **N-gram Jaccard (brute verify)** — postings-list pair generation
  (shingle → self-join on shingle → count intersections), NOT a cartesian
  product: only documents sharing at least one shingle ever meet. Still
  quadratic in the worst case (a shingle shared by k docs yields k² pairs)
  — at scale, drop ubiquitous shingles first (document-frequency cap),
  exactly like stop-word removal.
* **MinHash + LSH** — the 100 TB path: 128 xxhash64 min-hashes per doc,
  banded 32×4 so a pair with Jaccard s collides in ≥1 band with
  p = 1-(1-s⁴)³², i.e. >1-5e-8 at s=0.8. Candidates (tiny) are then
  exactly verified, so output == brute force with near-certainty while the
  shuffle volume is O(docs × bands), not O(pairs).
* **SimHash** — 64-bit signed-projection sketch; hamming-adjacent docs are
  near-dups. Pure JVM bit arithmetic (no UDF).

Performance architecture: everything flows through a **postings table**
(doc, shingle) built with posexplode + window-lead — plain codegen'd
relational ops. The tempting alternative (per-doc shingle *arrays* +
higher-order functions) runs 10-30x slower: Spark evaluates
transform/aggregate lambdas interpreted, outside whole-stage codegen, and
CollapseProject can additionally inline an expensive array expression into
every consumer (measured 195s -> 16s -> ~2s across these rewrites at
sf0.1). MinHash signatures become 128 codegen min() aggregates over the
postings; band hashes are xxhash64 over 4 signature columns.

All hashing is Spark's xxhash64 — deterministic, seedable by hashing a
leading literal column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, word_shingles, words


def exact_dedup_keep_first(
    df: DataFrame, text_col: str, order: list[Column], id_cols: list[str]
) -> DataFrame:
    """Keep the first row (by ``order``) per canonical-text fingerprint."""
    w = Window.partitionBy("fingerprint").orderBy(*order)
    return (
        df.withColumn("fingerprint", fingerprint_md5(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_min_by(
    df: DataFrame, text_col: str, id_col: str, payload_cols: list[str]
) -> DataFrame:
    """Keep the min-``id_col`` row per canonical-text fingerprint, via a
    ``min_by(struct(payload), id)`` aggregation instead of a row_number
    window. Same survivors as :func:`exact_dedup_keep_first` with
    ``order=[id asc]``, but partial-aggregatable: the map side combines
    before the shuffle and nothing is sorted — the form to prefer at
    100 TB when the keep-rule is a simple min/max."""
    return (
        df.withColumn("fingerprint", fingerprint_md5(F.col(text_col)))
        .groupBy("fingerprint")
        .agg(F.min_by(F.struct(*payload_cols), id_col).alias("__s"))
        .select(*[F.col(f"__s.{c}").alias(c) for c in payload_cols])
    )


def with_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Attach distinct n-word shingle arrays (column ``shingles``).

    Array form — convenient for small/verification work; the scale path is
    :func:`shingle_postings` (see module docstring).
    """
    return df.withColumn("shingles", word_shingles(words(F.col(text_col)), n))


def shingle_postings(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct (doc, shingle) postings via posexplode + lead window.

    Fully codegen'd: tokenize once, explode with position, window-lead the
    next n-1 words, concat. One shuffle (window partitioned by doc, which
    the downstream groupBys reuse)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(words(F.col(text_col))).alias("pos", "w0"),
    )
    w = Window.partitionBy("doc").orderBy("pos")
    lead_cols = [F.lead("w0", i).over(w).alias(f"w{i}") for i in range(1, n)]
    leads = toks.select("doc", "w0", *lead_cols)
    return (
        leads.where(F.col(f"w{n-1}").isNotNull())
        .select(
            "doc",
            F.concat_ws(" ", *[f"w{i}" for i in range(n)]).alias("shingle"),
        )
        .distinct()
    )


def _pair_intersections(postings: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_common) for every pair sharing >=1 shingle."""
    return (
        postings.alias("a")
        .join(
            postings.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def _with_jaccard(pairs: DataFrame, postings: DataFrame, threshold: float) -> DataFrame:
    sizes = postings.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        pairs.join(
            sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_shingles", "n_a"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_shingles", "n_b"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def jaccard_pairs_bruteforce(postings: DataFrame, threshold: float) -> DataFrame:
    """All (a,b) pairs with shingle-Jaccard >= threshold, via the postings
    self-join (inverted index). Exact; the baseline the LSH path must match."""
    return _with_jaccard(_pair_intersections(postings), postings, threshold)


def minhash_lsh_candidates(
    postings: DataFrame, num_hashes: int = 128, rows_per_band: int = 4
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs colliding in >=1 MinHash LSH band.

    Signature = 128 codegen ``min(xxhash64(k, shingle))`` aggregates in one
    pass over the postings; band b's key is xxhash64 over its 4 signature
    columns; one shuffle on (band_idx, band_hash). Skewed buckets
    (boilerplate-heavy corpora) are the known failure mode — cap bucket
    size or document-frequency-filter shingles upstream.
    """
    n_bands = num_hashes // rows_per_band
    # hash the shingle string ONCE to a long, then derive the k permutation
    # hashes by rehashing the fixed-width long — same independence, ~2x
    # cheaper than k full string hashes (string bytes dominate xxhash cost)
    hashed = postings.withColumn("__h", F.xxhash64("shingle"))
    sig_cols = [
        F.min(F.xxhash64(F.lit(k), F.col("__h"))).alias(f"m{k}")
        for k in range(1, num_hashes + 1)
    ]
    sigs = hashed.groupBy("doc").agg(*sig_cols)
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.xxhash64(
                *[f"m{b * rows_per_band + i + 1}" for i in range(rows_per_band)]
            ).alias("band_hash"),
        )
        for b in range(n_bands)
    ]
    bands = (
        sigs.select("doc", F.explode(F.array(*band_structs)).alias("band"))
        .select("doc", "band.band_idx", "band.band_hash")
        # materialize once: the self-join below would otherwise execute the
        # whole signature pipeline (scan + 128 min-hash aggregates) twice —
        # Spark's ReuseExchange does not fire across the broadcast/shuffle
        # mix AQE picks here
        .localCheckpoint()
    )
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def verify_candidates_jaccard(
    candidates: DataFrame, postings: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs only — the cheap final pass that
    makes LSH output exact. Postings are first semi-joined down to docs that
    appear in any candidate pair, so the verify join touches a tiny slice."""
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc"))
        .union(candidates.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    p = postings.join(F.broadcast(cand_docs), "doc")
    inter = _pair_intersections(p).join(candidates, ["doc_a", "doc_b"], "left_semi")
    return _with_jaccard(inter, postings, threshold)


def neardup_components(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Connected components over near-duplicate pairs → dedup clusters.

    Pregel-style min-label propagation as an iterative DataFrame loop: each
    node starts labelled with its own id; every round, each node takes the
    min label among itself and its neighbors; stop when no label changed.
    Near-dup graphs are almost all tiny cliques, so this converges in a few
    rounds; each round is one shuffle on the edge key. (At extreme scale,
    swap in the large-star/small-star algorithm — same loop skeleton.)

    Output: (doc_id, component_id = min doc id of the cluster) for every
    document that appears in at least one pair.
    """
    from ..session import pinned_shuffle_partitions

    spark = pairs.sparkSession
    # the whole loop is eager (localCheckpoint per round), so the RDD
    # materialization path bypasses AQE coalescing — pin the shuffle
    # partition count to real parallelism for the loop's duration or an
    # untuned 200-partition session pays 200 tasks per tiny label shuffle
    with pinned_shuffle_partitions(spark):
        # materialize the (possibly expensive) pair plan once — the union
        # below would otherwise execute it twice, and the loop many times
        pairs = pairs.localCheckpoint()
        edges = (
            pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
            .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
            .distinct()
            # near-dup edge lists are orders of magnitude smaller than the
            # corpus: collapse to a few partitions so per-round job overhead
            # stays flat
            .coalesce(8)
            .localCheckpoint()
        )
    # per-round shuffles sized by the edge list itself (round 14 — the
    # scale-adaptive rule pinned_shuffle_partitions' docstring promises):
    # the checkpointed edges' partition count reflects the data (after the
    # coalesce cap above), not the session default, so a tiny dedup graph
    # stops scheduling defaultParallelism near-empty tasks per round
    with pinned_shuffle_partitions(spark, edges.rdd.getNumPartitions()):
        labels = (
            edges.select(F.col("src").alias("node")).distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint()
        )
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
            )
            updated = (
                labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                    ).alias("new_label"),
                    "label",
                )
            )
            # ONE job per round (round 14): the lazy checkpoint truncates
            # lineage to an O(1) LogicalRDD without its own job, and the
            # full (non-limit) convergence count is the job that
            # materializes every partition's blocks — a limit(1) probe
            # here could stop early and leave unmaterialized partitions to
            # recompute through the lineage chain next round.
            updated = updated.localCheckpoint(eager=False)
            changed = updated.where(F.col("new_label") != F.col("label")).count()
            labels = updated.select("node", F.col("new_label").alias("label"))
            if changed == 0:
                break
        # checkpoint-block lifetime: there is no public API to free a
        # localCheckpoint eagerly (df.rdd.unpersist() detaches a DIFFERENT,
        # freshly-converted RDD — verified no-op on storage). Superseded
        # rounds are reclaimed by Spark's ContextCleaner once these Python
        # refs drop, so accumulation across a long catalog run is bounded
        # by driver GC cadence, not by the number of queries.
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


def simhash64_agg(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document via codegen aggregates — the scale path.

    Tokens explode into (doc, xxhash64) rows (one codegen pass), then one
    grouped aggregation computes all 64 bit votes as
    ``sum(if(bit set, 1, -1))`` expressions and packs the signs into a
    long. Identical output to :func:`simhash64` (same hash, same vote
    rule), ~5x faster because nothing is interpreted.
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("token"),
    ).withColumn("h", F.xxhash64("token"))
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    packed = None
    for b in range(64):
        term = F.when(
            F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed.bitwiseOR(term)
    return tok.groupBy("doc").agg(*votes).select(
        F.col("doc").alias(id_col), packed.alias("simhash")
    )


SIMHASH63_BITS = 63


def simhash63_agg(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash with an engine-neutral token hash — the
    oracle-checkable twin of :func:`simhash64_agg` (same explode→vote→pack
    plan; only the token hash differs).

    Token hash = 63 bits carved from md5 hex (15 chars → 60 high bits,
    3 more from the 16th char), computed identically by Spark
    (`conv(substring(md5(..)))`) and DuckDB (`('0x'||substring(md5(..)))::
    UBIGINT`) — md5 is the one hash both engines share. 63 bits keeps all
    pack/vote arithmetic strictly below the int64 sign bit, so ANSI-mode
    Spark and DuckDB BIGINT agree exactly. xxhash64's form stays the scale
    path (~24x cheaper per token); this form exists so the driver's DuckDB
    gate can verify the operator end-to-end."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("token"),
    )
    tok = (
        tok.withColumn("m", F.md5(F.encode(F.col("token"), "UTF-8")))
        .withColumn(
            "h",
            F.conv(F.substring("m", 1, 15), 16, 10).cast("long") * F.lit(8)
            + F.expr("CAST(conv(substring(m, 16, 1), 16, 10) AS BIGINT) div 2"),
        )
    )
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH63_BITS)
    ]
    packed = None
    for b in range(SIMHASH63_BITS):
        term = F.when(
            F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed.bitwiseOR(term)
    return tok.groupBy("doc").agg(*votes).select(
        F.col("doc").alias(id_col), packed.alias("simhash")
    )


def simhash63_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB mirror of :func:`simhash63_agg` — same tokenization
    (whitespace split of trimmed text, distinct), same md5-slice hash,
    same vote/pack arithmetic."""
    hash_expr = (
        f"CAST(CAST(('0x' || substring(md5(token), 1, 15)) AS UBIGINT) AS BIGINT) * 8"
        f" + CAST(CAST(('0x' || substring(md5(token), 16, 1)) AS UBIGINT) AS BIGINT) // 2"
    )
    vote_cols = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH63_BITS)
    )
    pack = " + ".join(
        f"CASE WHEN v{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END"
        for b in range(SIMHASH63_BITS)
    )
    return f"""
WITH tok AS MATERIALIZED (
  SELECT {id_col}, unnest(list_distinct(regexp_split_to_array(trim({text_col}), '\\s+'))) AS token
  FROM {table}
),
h AS MATERIALIZED (SELECT {id_col}, {hash_expr} AS h FROM tok),
v AS MATERIALIZED (SELECT {id_col}, {vote_cols} FROM h GROUP BY {id_col})
SELECT {id_col}, {pack} AS simhash
FROM v
ORDER BY {id_col}
"""


def token_hashes(tokens: Column) -> Column:
    """xxhash64 of each distinct token — precomputed once so the 64-bit
    vote loop below doesn't rehash per bit position."""
    return F.transform(F.array_distinct(tokens), lambda t: F.xxhash64(t))


def simhash64(hashes_col: str) -> Column:
    """64-bit SimHash over a pre-hashed token array column (see
    :func:`token_hashes`), entirely in JVM expressions.

    For each bit position, sum +1/-1 votes from each token hash's bit, then
    pack the vote signs into one long. Expressed as SQL because
    ``shiftrightunsigned`` with a *column* shift amount has no PySpark
    Column wrapper. ~64×|tokens| fused ops per row — heavy but shuffle-free
    and UDF-free.
    """
    return F.expr(
        f"""
        aggregate(
          transform(sequence(0, 63), b ->
            if(aggregate({hashes_col}, 0,
                 (acc, h) -> acc + if((shiftrightunsigned(h, b) & 1) = 1, 1, -1)) > 0,
               shiftleft(1L, b), 0L)),
          0L, (acc, x) -> acc | x)
        """
    )

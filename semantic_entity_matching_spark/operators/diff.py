"""Crawl-snapshot diffing — what changed between two crawls of the web.

The maintenance loop of a continuously-recrawled corpus: given yesterday's
snapshot and today's, classify every url as ``added`` / ``removed`` /
``changed`` / ``unchanged`` and hand the DELTA (not the corpus) to the
downstream incremental operators (re-embed changed pages, feed their
match edges to
:func:`~semantic_entity_matching_spark.operators.cluster.update_components`,
retire removed ids).

Scale shape: ONE full-outer hash join keyed by the id column — urls are
unique per snapshot (canonical-URL dedup upstream guarantees it), so
there is no skew to salt; content comparison rides an md5 fingerprint
computed scan-side (engine-portable, same convention as
``fingerprint_hex``).  By default ``unchanged`` rows — the overwhelming
majority of a web snapshot — are filtered OUT before the join result
materializes, so the output is delta-sized at any corpus size.

Reference concern: the reference re-ingests everything idempotently
(create-op dedup, lib/ingest.py:63,90-94) and has no notion of a diff;
at 10^12 docs re-processing the unchanged 99% every day is the single
largest avoidable cost, which makes snapshot diffing first-class here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    fingerprint_col: str | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify ids across two snapshots; returns
    ``(id, status, old_fp, new_fp)``.

    * ``fingerprint_col``: use a precomputed per-row fingerprint instead
      of hashing ``text_col`` (e.g. a stored content digest).  Without
      it, the fingerprint is ``md5(coalesce(text, ''))`` — NULL text is
      a legitimate page state and diffs like any other value.
    * ``include_unchanged=False`` (default) keeps the output delta-sized;
      flip it for audits over small corpora.
    """
    fp_expr = (
        F.col(fingerprint_col)
        if fingerprint_col is not None
        else F.md5(F.coalesce(F.col(text_col), F.lit("")))
    )

    def _side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"), fp_expr.alias(f"{tag}_fp")
        )

    joined = _side(old, "old").join(_side(new, "new"), "id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = joined.select("id", status.alias("status"), "old_fp", "new_fp")
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def scd2_upsert(
    history: DataFrame | None,
    snapshot: DataFrame,
    ts,
    id_col: str = "url",
    text_col: str = "text",
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension maintenance for a recrawled
    corpus: a ``(id, fp, valid_from, valid_to)`` history table where
    ``valid_to IS NULL`` marks the live version — "what did this url say
    at time T" is then one interval predicate, the versioned-corpus
    question the ``warc_ts`` column exists to answer.

    Each upsert folds one snapshot (taken at ``ts``, a bigint epoch or
    any orderable literal) into the history:

    * unchanged → the open interval passes through untouched (re-seeing
      the same content never rewrites history — idempotent re-ingest);
    * changed   → the open interval closes at ``ts``; a new one opens;
    * removed   → the open interval closes at ``ts``;
    * added     → a new open interval starts at ``ts``;
    * already-closed rows pass through untouched (append-only history).

    ``history=None`` bootstraps from the first snapshot.

    Scale shape: closed rows pass through without touching the join (a
    decade of history rides a filter, not a shuffle); the open slice —
    bounded by the live corpus size — meets the snapshot in ONE
    full-outer hash join on the unique id, same as :func:`crawl_diff`.
    At 10^12 docs, store the history partitioned on ``valid_to IS
    NULL`` (live vs closed partitions in the table layout): the upsert
    then reads and rewrites ONLY the live partition and the closed
    pass-through is partition metadata, not a scan — writing the result
    back with this function's output as a full-history union is correct
    at any scale but re-materializes closed rows; the partitioned form
    is the production write path (same discipline as the S6 sink's
    idempotent MERGE).
    """
    fp_expr = (
        F.col(fingerprint_col)
        if fingerprint_col is not None
        else F.md5(F.coalesce(F.col(text_col), F.lit("")))
    )
    snap = snapshot.select(
        F.col(id_col).alias("id"), fp_expr.alias("_snap_fp")
    )
    ts_lit = ts if hasattr(ts, "_jc") else F.lit(ts)
    if history is None:
        ts_type = snap.select(ts_lit.alias("x")).schema["x"].dataType
        return snap.select(
            "id",
            F.col("_snap_fp").alias("fp"),
            ts_lit.alias("valid_from"),
            F.lit(None).cast(ts_type).alias("valid_to"),
        )
    closed = history.where(F.col("valid_to").isNotNull())
    open_rows = history.where(F.col("valid_to").isNull())
    j = open_rows.join(snap, "id", "full_outer")
    unchanged = j.where(
        F.col("fp").isNotNull()
        & F.col("_snap_fp").isNotNull()
        & (F.col("fp") == F.col("_snap_fp"))
    ).select("id", "fp", "valid_from", "valid_to")
    closing = j.where(
        F.col("fp").isNotNull()
        & (F.col("_snap_fp").isNull() | (F.col("fp") != F.col("_snap_fp")))
    ).select("id", "fp", "valid_from", ts_lit.alias("valid_to"))
    opening = j.where(
        F.col("_snap_fp").isNotNull()
        & (F.col("fp").isNull() | (F.col("fp") != F.col("_snap_fp")))
    ).select(
        "id",
        F.col("_snap_fp").alias("fp"),
        ts_lit.alias("valid_from"),
        F.lit(None).cast(
            history.schema["valid_to"].dataType
        ).alias("valid_to"),
    )
    return (
        closed.select("id", "fp", "valid_from", "valid_to")
        .unionByName(unchanged)
        .unionByName(closing)
        .unionByName(opening)
    )

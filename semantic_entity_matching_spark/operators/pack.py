"""Token-budget shard packing — deterministic global sequence packing.

The "pack documents into fixed token-budget shards" step of an LLM
training-data pipeline: every document gets a shard id such that shards,
filled in a deterministic global order, each hold ``budget`` tokens (the
last document placed in a shard may overflow it — the standard greedy
fill).  The reference has no packing operator (its unit of work is one
entity/query); this belongs to the training-data family this engine adds
on top of the reference's surface (SURVEY §2.8).

Scale design — a global running sum WITHOUT a global sort
---------------------------------------------------------
``shard_id = floor(exclusive_prefix_sum(n_tokens) / budget)`` over a
global document order is the textbook "needs a total order" trap: the
naive plan is one giant Sort + a single-partition running-sum window.

Instead the global order is the md5 hex of the document id, and md5 hex
has a property the distributed prefix-sum can exploit: the first
``bucket_hex_chars`` hex characters define 16^k BUCKETS that are
order-ALIGNED with the full key (every key in bucket 0x00 sorts before
every key in bucket 0x01, ...).  So:

1. one hash AGGREGATE computes per-bucket token totals (16^k rows —
   bounded, collected to the driver);
2. the driver turns them into exclusive per-bucket offsets (a 16^k-entry
   broadcast);
3. ``applyInPandas`` groups by bucket: each bucket sorts ITS OWN rows by
   (key, id) in memory, runs a local cumulative sum, adds its bucket
   offset, and emits shard ids.

Total cost: two scans of a narrow (id, key, n_tokens) projection, one
hash shuffle by bucket, zero Sort nodes, zero driver-side row data beyond
the 16^k totals.  Per-bucket memory is corpus/16^k rows — raise
``bucket_hex_chars`` to 3-4 at web scale (4,096 / 65,536 buckets).
md5 uniformity keeps buckets balanced regardless of id skew.

Determinism: the order key is md5(id), so the assignment is a pure
function of (ids, token counts, budget) — independent of partitioning,
executor count, and input row order, and reproducible in ANSI SQL (the
q03 DuckDB oracle recomputes it with a window over ORDER BY key).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.textops import token_count


def pack_by_token_budget(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Assign every document a ``shard_id`` so that shards filled in
    md5(id) order each carry ``budget`` tokens (greedy fill: the document
    that crosses the boundary stays in the shard it started in — i.e.
    ``shard_id = exclusive_prefix_tokens DIV budget``).

    ``tokens_col`` supplies a precomputed token count; otherwise
    whitespace ``token_count(text_col)`` is used (0 for null/blank — such
    documents still receive a shard).  Output columns: ``(id_col,
    n_tokens, shard_id)``.

    ``bucket_hex_chars`` sizes the prefix-sum buckets (16^k); see module
    docstring for the scale trade.  ``id_col`` must be non-null (it is the
    document's identity); null ids raise at the offset lookup.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 1 <= bucket_hex_chars <= 8:
        raise ValueError("bucket_hex_chars must be in [1, 8]")

    # null-safe on BOTH paths: a null caller-supplied token count becomes
    # 0 (matching the text path, where token_count of null text is 0) —
    # otherwise the null arrives in the pandas kernel as NaN and the
    # int64 cast explodes with an opaque executor-side ValueError
    n_col = (
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
        if tokens_col
        else F.coalesce(token_count(text_col).cast("long"), F.lit(0))
    )
    key = F.md5(F.col(id_col).cast("string").cast("binary"))
    base = docs.select(
        F.col(id_col),
        key.alias("_k"),
        F.conv(F.substring(key, 1, bucket_hex_chars), 16, 10)
        .cast("long")
        .alias("_b"),
        n_col.alias("n_tokens"),
    )

    # pass 1: per-bucket totals (16^k rows) -> exclusive offsets in bucket
    # order.  Bucket order == global key order because the bucket is a
    # PREFIX of the lexicographically-compared hex key.
    totals = {
        r["_b"]: r["t"]
        for r in base.groupBy("_b").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += int(totals[b])
    bc = docs.sparkSession.sparkContext.broadcast(offsets)

    out_schema = StructType(
        [
            docs.schema[id_col],
            StructField("n_tokens", LongType(), False),
            StructField("shard_id", LongType(), False),
        ]
    )

    def pack_bucket(_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas hands one whole bucket per call; sort it locally,
        # local cumulative sum + the bucket's exclusive global offset.
        if pdf.empty:
            return pd.DataFrame(
                {id_col: pdf[id_col], "n_tokens": [], "shard_id": []}
            )
        pdf = pdf.sort_values(["_k", id_col], kind="mergesort")
        n = pdf["n_tokens"].astype("int64")
        excl = bc.value.get(int(pdf["_b"].iloc[0]), 0) + n.cumsum() - n
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "n_tokens": n,
                "shard_id": (excl // budget).astype("int64"),
            }
        )

    # pass 2: one hash shuffle by bucket; each bucket packs independently.
    return base.groupBy("_b").applyInPandas(pack_bucket, schema=out_schema)

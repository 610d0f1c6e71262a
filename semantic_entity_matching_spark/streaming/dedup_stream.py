"""Stateful streaming exact-dedup — ``applyInPandasWithState`` (SURVEY §2.9).

A crawl feed re-delivers the same page endlessly (recrawls, mirrors, retry
storms).  This operator keeps ONE row per normalized-content fingerprint
across micro-batches: per-key state stores whether the hash was already
emitted, so downstream (embedding, blocking) never pays for a duplicate
twice.  The batch analog is ``operators/dedup.py drop_exact_duplicates``;
this is its streaming twin, state-backed instead of window-backed.

Scale shape: state is keyed by the 32-hex md5 fingerprint — a bounded ~50 B
value per DISTINCT document, hash-partitioned across executors by the
groupBy, checkpointed with the query.  At 10^12 docs state sharding is the
RocksDB state store's job (`spark.sql.streaming.stateStore.providerClass`),
not the operator's.

Within one micro-batch the winner is the min ``id_col`` row (deterministic
under any partitioning — matches drop_exact_duplicates' min-id survivor).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
)

from semantic_entity_matching_spark.functions.textops import fingerprint_hex

STATE_SCHEMA = StructType([StructField("emitted", IntegerType())])


def dedup_stream(
    pages: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Streaming DataFrame -> streaming DataFrame with exact duplicates
    (by normalized-text fingerprint) dropped across ALL micro-batches.

    Rows with null/empty text pass through unchanged (they carry no
    fingerprint to deduplicate on — same convention as the batch operator).
    """
    from pyspark.sql import functions as F

    # blank text gets a NULL hash (md5('') would otherwise collapse every
    # empty-body page into one survivor) — null-hash rows pass through
    hashed = pages.withColumn(
        "content_hash",
        F.when(
            F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""),
            fingerprint_hex(text_col),
        ),
    )
    out_schema = StructType(
        list(hashed.schema.fields)
    )

    id_idx = [f.name for f in out_schema.fields].index(id_col)

    def keep_first(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        already = state.exists and state.get[0] == 1
        if already:
            # hash seen in an earlier micro-batch: drop everything
            return
        best: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            cand = pdf.sort_values(pdf.columns[id_idx], kind="mergesort").head(1)
            if best is None or (
                cand.iloc[0, id_idx] < best.iloc[0, id_idx]
            ):
                best = cand
        if best is not None:
            state.update((1,))
            yield best

    # null-hash rows (null/blank text) bypass the stateful op entirely
    with_hash = hashed.where(hashed["content_hash"].isNotNull())
    passthrough = hashed.where(hashed["content_hash"].isNull())
    deduped = with_hash.groupBy("content_hash").applyInPandasWithState(
        keep_first,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return deduped.unionByName(passthrough)

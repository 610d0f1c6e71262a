"""Sessionization — gap-based event grouping (training-pipeline op).

Groups each key's events into sessions: an event belongs to the current
session iff it starts AT MOST ``gap`` after the previous event — an event
exactly at ``prev_ts + gap`` still merges; a new session begins only when
the gap is strictly exceeded (Spark's native ``session_window``
semantics, pinned by pytest; the q36 oracle's new-session condition is
therefore strictly ``diff > gap``).

Spark-first: the whole operator is one ``groupBy(key, session_window)``
aggregate — Catalyst plans it as a single hash shuffle on the key plus a
per-partition merge of overlapping windows; no self-join, no per-row
Python, and the same expression works under ``readStream`` with a
watermark (bounded state).  The session ordinal (1-based per key, by
start time) comes from one keyed window — two session starts can never
collide within a key (they would have merged), so the ordering is total.

Replaces nothing in the reference (batch-only, SURVEY §2.9) — this is
part of the large-scale pipeline surface (events table), same family as
the as-of/range joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """-> (key, session_id, session_start, session_end, n_events).

    ``session_id`` is the 1-based ordinal of the session within its key,
    ordered by session start.  Rows with NULL key or NULL ts are excluded
    (no position on the time axis — same convention as the asof/range
    joins).  ``session_end`` is the LAST EVENT's timestamp (not the
    window's ``end``, which Spark pads with the gap).
    """
    base = events.where(F.col(on).isNotNull() & F.col(ts_col).isNotNull())
    sessions = (
        base.groupBy(
            F.col(on),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("_w"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_w")
    )
    w = Window.partitionBy(on).orderBy("session_start")
    return sessions.withColumn(
        "session_id", F.row_number().over(w)
    ).select(on, "session_id", "session_start", "session_end", "n_events")

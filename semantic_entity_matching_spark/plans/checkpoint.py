"""Snapshot-table checkpointing with lineage counters.

The north_rule requires every stage (and every CC superstep) to be
resumable, with per-partition lineage and counters (pairs generated, pairs
scored, edges emitted) recorded as table metadata.  On a cluster with the
Iceberg runtime jar this maps to Iceberg tables + snapshot summary
properties; that jar is not in this sandbox, so the default backend is a
Parquet **snapshot directory**: each write lands in a new
``step=<n>/data`` directory committed by atomically renaming a manifest —
the same commit discipline (write-new-files, swap-pointer) Iceberg uses.

Layout::

    <base>/<table>/step=000003/data/*.parquet
    <base>/<table>/step=000003/manifest.json   # counters, schema, rows
    <base>/<table>/_latest.json                # atomic pointer to the
                                               # last committed step

A reader only ever follows ``_latest.json`` (or an explicit step), so a
killed job mid-write leaves no torn state — the orphan step directory has
no manifest and is ignored/overwritten on resume.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _atomic_write_json(path: str, payload: dict[str, Any]) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX


@dataclass
class CheckpointManager:
    """Versioned snapshot tables under ``base_dir``."""

    base_dir: str
    spark: SparkSession
    counters: dict[str, int] = field(default_factory=dict)

    # -- counters (lineage) -------------------------------------------------
    def add_counter(self, name: str, value: int) -> None:
        self.counters[name] = self.counters.get(name, 0) + int(value)

    # -- table paths --------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def _step_dir(self, table: str, step: int) -> str:
        return os.path.join(self._table_dir(table), f"step={step:06d}")

    def latest_step(self, table: str) -> int | None:
        ptr = os.path.join(self._table_dir(table), "_latest.json")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return int(json.load(f)["step"])

    # -- write / read -------------------------------------------------------
    def write(
        self,
        table: str,
        df: DataFrame,
        step: int | None = None,
        counters: dict[str, int] | None = None,
        count_as: str | None = None,
    ) -> dict[str, Any]:
        """Materialize ``df`` as the next snapshot of ``table``.

        Returns the manifest.  ``counters`` are recorded in the manifest
        (Iceberg analog: snapshot summary properties) and folded into the
        run-level counter totals.  ``count_as`` names a counter that gets
        the snapshot's own row count — the count comes from the already-
        written parquet footers, so callers never need a separate
        ``df.count()`` action (which would recompute the whole stage).
        """
        prev = self.latest_step(table)
        if step is None:
            step = 0 if prev is None else prev + 1
        step_dir = self._step_dir(table, step)
        data_dir = os.path.join(step_dir, "data")
        if os.path.exists(step_dir):
            shutil.rmtree(step_dir)  # torn leftover from a killed run
        df.write.mode("overwrite").parquet(data_dir)
        # per-partition lineage (north_rule): record-count per data file,
        # the same granularity Iceberg keeps in its manifest entries
        # (record_count per DataFile).  One zero-column scan of the fresh
        # snapshot — parquet row counting, no data columns materialized.
        from pyspark.sql import functions as F

        per_file = (
            self.spark.read.parquet(data_dir)
            .groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        partition_rows = {
            os.path.basename(r["file"]): int(r["count"]) for r in per_file
        }
        rows = sum(partition_rows.values())
        counters = dict(counters or {})
        if count_as:
            counters[count_as] = rows
        manifest = {
            "table": table,
            "step": step,
            "rows": rows,
            "partition_rows": partition_rows,
            "schema": df.schema.jsonValue(),
            "counters": dict(counters or {}),
            "committed_at": time.time(),
        }
        _atomic_write_json(os.path.join(step_dir, "manifest.json"), manifest)
        _atomic_write_json(
            os.path.join(self._table_dir(table), "_latest.json"), {"step": step}
        )
        for k, v in (counters or {}).items():
            self.add_counter(k, v)
        return manifest

    def read(self, table: str, step: int | None = None) -> DataFrame:
        if step is None:
            step = self.latest_step(table)
        if step is None:
            raise FileNotFoundError(f"no committed snapshot for table {table!r}")
        step_dir = self._step_dir(table, step)
        if not os.path.exists(os.path.join(step_dir, "manifest.json")):
            raise FileNotFoundError(f"snapshot {table}/step={step} was never committed")
        return self.spark.read.parquet(os.path.join(step_dir, "data"))

    def manifest(self, table: str, step: int | None = None) -> dict[str, Any]:
        if step is None:
            step = self.latest_step(table)
        with open(os.path.join(self._step_dir(table, step), "manifest.json")) as f:
            return json.load(f)

    def exists(self, table: str) -> bool:
        return self.latest_step(table) is not None

    def write_run_summary(self) -> None:
        _atomic_write_json(
            os.path.join(self.base_dir, "_run_summary.json"),
            {"counters": self.counters, "written_at": time.time()},
        )

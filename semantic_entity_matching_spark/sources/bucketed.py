"""Bucketed-table layout: co-located joins with ZERO shuffle.

The flagship pipeline's recurring cost center is re-shuffling the corpus on
its join key for every run: day-2 incremental linkage joins today's pages
against the reference corpus on ``id``/``url`` (streaming/incremental_match
.py:25 already prescribes this layout), SCD2 upserts full-outer-join the
live slice on ``id`` (operators/diff.py), and the decile/audit queries
re-aggregate on the same keys.  At 100 TB a single avoidable corpus shuffle
is the dominant line item, and Spark's answer is BUCKETING: write the table
hash-partitioned into a fixed number of buckets on the join key
(``bucketBy`` + ``saveAsTable``), and every subsequent equi-join or
aggregation on that key between same-bucketed tables runs with NO Exchange
on either side — the scan itself delivers the required
``HashClusteredDistribution``.  (Iceberg's ``bucket(N, col)`` partition
transform is the same contract for the production lakehouse; the
sandbox-local form uses the session catalog, which is the public Spark
surface available here — sources/writers.py documents the Iceberg jar
situation.)

Rules the helpers enforce / document:

* Both sides must agree on bucket COUNT and KEY — Spark only elides the
  exchange when the output partitioning matches; a mismatched count
  silently falls back to shuffling the smaller-bucketed side.
* ``sortBy`` within buckets records sorted-layout metadata; the planner
  only elides the join's Sort when it can prove ONE file per bucket, and
  current Spark keeps the Sort in the observed plans here — the exchange
  elision (the data movement), not the in-bucket sort (CPU on already
  co-located rows), is the 100 TB win, and the tests pin exactly that.
* Bucket pruning: an equality predicate on the bucket key scans 1/N of
  the files.
* The number of buckets is a LAYOUT decision fixed at write time: pick
  ``corpus_bytes / target_bucket_bytes`` (128-512 MB per bucket per the
  shuffle-partition sizing rule in session.py) — at 100 TB with 256 MB
  targets that is ~400k buckets, well inside Spark's file-handling range
  when writes are repartitioned by the bucket expression first (one file
  per bucket per write, not per task).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BucketSpec:
    """Layout contract for one bucketed table."""

    key: str
    n_buckets: int
    sort: bool = True

    def __post_init__(self) -> None:
        if self.n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {self.n_buckets}")
        if not self.key:
            raise ValueError("key must be a non-empty column name")


def write_bucketed(
    df: DataFrame,
    name: str,
    spec: BucketSpec,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed catalog table named ``name``.

    ``path`` makes it an external table (data at ``path``, metadata in the
    session catalog) — the form tests use so data lands in a tmpdir.  The
    pre-write ``repartition(n, key)`` aligns tasks with buckets so each
    bucket is ONE file per write instead of one file per task per bucket —
    the difference between 400k and 400k×tasks files at scale.
    """
    writer = (
        df.repartition(spec.n_buckets, F.col(spec.key))
        .write.mode(mode)
        .format("parquet")
        .bucketBy(spec.n_buckets, spec.key)
    )
    if spec.sort:
        writer = writer.sortBy(spec.key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back THROUGH the catalog — ``spark.read
    .parquet(path)`` would see the same bytes but lose the bucketing
    metadata, and with it the exchange elision."""
    return spark.table(name)


def colocated_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables, pinned to sort-merge so the test for
    "no Exchange anywhere in the plan" is meaningful (a broadcast join
    would also show no shuffle — by moving the data a different way)."""
    return left.hint("merge").join(right.hint("merge"), on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the optimized physical plan contains any Exchange (shuffle
    OR broadcast).  The assertion helper tests and the plan audit share."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan

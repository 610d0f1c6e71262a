"""SparkSession factory tuned for the record-linkage workload.

The reference repo has no engine of its own; its throughput knobs are async
worker counts and AIMD throttling (reference lib/async_batch_processor.py,
lib/dynamic_semaphore.py).  Here the equivalents are shuffle partitioning,
AQE, and Arrow batch sizing — all set once at session build.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size is the analog of the reference's request batching
# (50-row bulk writes, lib/ingest.py:22; 50-query _msearch, lib/evaluate.py:82):
# it bounds peak memory of every pandas UDF — each in-flight batch holds the
# input text buffer (~7.5 KB/page on web text) PLUS the (rows × dim) float32
# embedding output and its Arrow serialization.  At the old 10k-row default
# that was ~75 MB text + 40 MB vectors per batch PER WORKER; with 8 workers
# the 120k-page scaling leg degraded superlinearly under khugepaged/THP
# pressure (round-3 BASELINE.md).  2k rows/batch caps the per-worker flight
# at ~15 MB text + 8 MB vectors (dim 1024) while keeping the per-batch UDF
# dispatch overhead negligible (>=millisecond-scale batches).  Override with
# SPARK_GRAFT_ARROW_BATCH.
ARROW_MAX_RECORDS_PER_BATCH = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", 2_048))


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def ensure_min_parallelism(df, min_fraction: float = 0.5):
    """Repartition ``df`` to the session default parallelism — but ONLY
    when its current partition count is below ``min_fraction`` of it.

    A small corpus in one parquet file scans as ONE split, and every
    Python stage chained on that scan (embed UDFs, the MinHash/SimHash
    signature passes) then runs in a single task regardless of core
    count — measured: the flagship pipeline's records+blocks stages were
    single-threaded at the bench scale.  One narrow shuffle of the raw
    rows buys full parallelism for the whole downstream UDF chain.  At
    production scale the file count already provides the partitions, the
    guard is false, and NO shuffle is added (guide §2.4: don't repartition
    'for parallelism' when the layout already has it).  Deterministic:
    round-robin repartition keeps Spark's sort-before-repartition, and
    every consumer downstream is per-row or set/aggregate-based."""
    if df.isStreaming:  # .rdd is undefined for streaming frames
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df


def get_session(
    master: str | None = None,
    app_name: str = "semantic-entity-matching-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    AQE is on so skewed blocking-key joins are split at runtime even before
    our explicit salting kicks in, and so tiny post-filter shuffles coalesce.
    On a real cluster this function is a no-op pass-through (spark-submit
    provides master/conf); locally it pins ``local[N]``.
    """
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: 1 partition per core covers the small SFs; on a real
        # cluster spark-submit should set this to ~2-3x total cores.
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE rewrite a sort-merge join to a shuffled-hash join when
        # every build-side map partition is under this bound (guide §3.1):
        # the salted block self-join and the token-array verify joins then
        # skip two large sorts per join.  Scale-adaptive by construction —
        # the decision uses RUNTIME partition sizes, so an exabyte-scale
        # shuffle whose partitions exceed the bound keeps sort-merge (which
        # spills), while bench/cluster partitions under it get the no-sort
        # hash build.  Bounded build memory: at most this many bytes per
        # task get hashed.  Default 0 (off) in Spark; 192m sits well under
        # the per-task execution memory at 12g/32 cores.
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "192m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # match edges / block tables are reread across supersteps; snappy is
        # the right trade at 100 TB (cheap CPU, splittable with parquet).
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 12g, not bigger: the round-1 "8g chokes at local[32]" finding
        # still holds, but an oversized heap is actively harmful on a
        # long-lived Firecracker guest — in the fragmented-VM state the
        # 32g default measured 2-3x SLOWER than 12g across the headline
        # bench (q23 41-67s vs 21-29s, bench total 144s vs 52s, machine
        # sys>>user during the 32g runs: every extra GB is more page
        # compaction for khugepaged to chew).  All workloads incl. the
        # 964.9k-pair q21 contract and 120k-page legs fit in 12g.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
    )
    # Local mode: shuffle spill files on the default /tmp disk serialize the
    # whole job behind one spindle once >8 threads write at once (measured
    # 2-3x stage slowdowns at local[32]).  A cluster has per-executor local
    # SSDs; the tmpfs stand-in restores that assumption locally — but ONLY
    # when /dev/shm actually has headroom: spill competing with RAM-backed
    # tmpfs would turn a disk spill into ENOSPC on small hosts, so fall back
    # to the default disk tmpdir below 8 GiB free.  Override with
    # SPARK_GRAFT_LOCAL_DIR (see README).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and master.startswith("local") and os.path.isdir("/dev/shm"):
        try:
            stat = os.statvfs("/dev/shm")
            if stat.f_bavail * stat.f_frsize >= 8 * 1024**3:
                local_dir = "/dev/shm/spark-graft-local"
        except OSError:
            pass
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

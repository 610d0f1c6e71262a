"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each probe row, find the latest build row of the same key with
``build.ts <= probe.ts`` (the classic time-series/point-in-time lookup; kdb
``aj``, pandas ``merge_asof``, DuckDB ``ASOF JOIN``).

Spark-first formulation — NO per-row Python and NO range self-join blowup:
union both sides with a side tag, then one window per key ordered by
``(ts, side, id)`` carrying the last-seen build attributes forward
(``last(..., ignorenulls=True)`` over an unbounded-preceding frame).  One
shuffle on the key, one per-partition sort — the same cost shape as any
windowed aggregate, at any scale.  Skewed keys are AQE's business (the
window itself is per-key sequential by definition).

Tie-breaks are deterministic: among builds sharing the max eligible ``ts``
the largest ``id`` wins, and a build AT the probe's exact timestamp counts
(<=, builds sort before probes at equal ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    builds: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    probe_id: str = "event_id",
    build_id: str = "event_id",
    value_cols: tuple[str, ...] = ("value",),
    matched_prefix: str = "matched_",
) -> DataFrame:
    """-> one row per probe: (probe_id, <matched_prefix><build_id>,
    <matched_prefix><value_col>...), null-matched when no prior build.
    """
    pid_type = probes.schema[probe_id].dataType
    bid_type = builds.schema[build_id].dataType
    # a build with NULL ts has no position on the time axis — the SQL
    # semantics (b.ts <= p.ts) exclude it, so exclude it here too (a null
    # ts would otherwise sort first and become eligible for every probe)
    builds = builds.where(F.col(ts_col).isNotNull())
    # the build's id and value columns travel as ONE atomic struct: a build
    # whose value column is NULL must still supersede older builds (the
    # newest eligible build wins as a ROW, not per-column) — carrying
    # columns independently with last(ignorenulls) would resurrect an older
    # build's non-null value next to the newest build's id
    payload = F.struct(
        F.col(build_id).alias("_bid"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    payload_type = builds.select(payload.alias("_p")).schema["_p"].dataType
    bcols = [F.col(on), F.col(ts_col), F.lit(0).alias("_side"),
             F.col(build_id).alias("_bord"),
             payload.alias("_bpay"),
             F.lit(None).cast(pid_type).alias("_pid")]
    pcols = [F.col(on), F.col(ts_col), F.lit(1).alias("_side"),
             F.lit(None).cast(bid_type).alias("_bord"),
             F.lit(None).cast(payload_type).alias("_bpay"),
             F.col(probe_id).alias("_pid")]
    tagged = builds.select(*bcols).unionByName(probes.select(*pcols))

    # builds sort BEFORE probes at the same ts (side 0 < 1) so ts-equal
    # builds are eligible; among ts-equal builds the largest id wins
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_bord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "_last", F.last("_bpay", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1).select(
        F.col("_pid").alias(probe_id),
        F.col("_last._bid").alias(f"{matched_prefix}{build_id}"),
        *[
            F.col(f"_last.{c}").alias(f"{matched_prefix}{c}")
            for c in value_cols
        ],
    )
    return out


def range_self_join(
    events: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap_seconds: int = 60,
) -> DataFrame:
    """All pairs of same-key rows within ``max_gap_seconds`` of each other
    (id_a < id_b) -> (id_a, id_b, gap_us).  Gap math runs on exact
    microseconds (``unix_micros``) — second-truncation would misclassify
    sub-second-precision pairs near the boundary.

    Scale-safe BINNED range join — the naive formulation is a per-key cross
    join with an inequality predicate, which Spark executes as
    BroadcastNestedLoop/cartesian.  Instead timestamps land in buckets of
    the gap width, the probe side also lands in bucket+1, and the exact
    predicate filters after an EQUI-join on (key, bucket): every qualifying
    pair shares a bucket this way (|ta-tb| <= gap means their buckets differ
    by at most 1), candidates are bounded by bucket occupancy, and the join
    is hash-partitioned like any other.
    """
    gap_us = max_gap_seconds * 1_000_000
    # cast handles TIMESTAMP_NTZ inputs; gap math is a difference, so any
    # constant session-timezone offset cancels
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(us / F.lit(gap_us))
    base = events.select(
        F.col(on), F.col(id_col), us.alias("_sec"), bucket.alias("_b")
    )
    left = base.select(
        F.col(on), F.col("_b"),
        F.col(id_col).alias("id_a"), F.col("_sec").alias("_sa"),
    )
    right = base.select(
        F.col(on),
        F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_b"),
        F.col(id_col).alias("id_b"), F.col("_sec").alias("_sb"),
    )
    # the equi-join only finds the orientation where the left row's bucket
    # is >= the right row's — canonicalize ids AFTER the join (least/
    # greatest), never pre-filter on id order, or pairs whose later-bucket
    # member has the smaller id would be lost
    return (
        left.join(right, [on, "_b"])
        .where(
            (F.col("id_a") != F.col("id_b"))
            & (F.abs(F.col("_sa") - F.col("_sb")) <= F.lit(gap_us))
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.abs(F.col("_sa") - F.col("_sb")).cast("bigint").alias("gap_us"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

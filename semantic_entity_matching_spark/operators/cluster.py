"""Connected components via alternating large-star/small-star (F11).

The reference has no clustering operator — transitive closure is implicit in
its match-and-review use-case; the north_rule makes it explicit.  Algorithm:
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14) —
converges in O(log^2 n) supersteps vs O(diameter) for naive label
propagation.

Scale-safe formulation: both stars are expressed with groupBy(min) + join —
NO collect_list (a hot node's neighborhood never has to fit in one task's
memory) and no driver-side state.  Each superstep is optionally checkpointed
(Parquet snapshot, resumable) which also truncates the lineage chain that
iterative DataFrame jobs otherwise accumulate.

Node ids are compared with the column's natural ordering (strings:
lexicographic) — any orderable id type works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_entity_matching_spark.plans.checkpoint import CheckpointManager


def _symmetrize(edges: DataFrame) -> DataFrame:
    """(u,v) -> both directions, self-loops removed."""
    fwd = edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    rev = edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    return fwd.unionByName(rev).where(F.col("u") != F.col("v")).distinct()


def _neighborhood_min(sym: DataFrame) -> DataFrame:
    """m(u) = min(N(u) ∪ {u}) — one hash aggregate, no neighborhood list."""
    return sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor v of u to m(u)."""
    sym = _symmetrize(edges)
    m = _neighborhood_min(sym)
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("id_a"), F.col("m").alias("id_b"))
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor v <= u (plus u itself) to m(u)."""
    sym = _symmetrize(edges)
    m = _neighborhood_min(sym)
    small = (
        sym.where(F.col("v") <= F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("id_a"), F.col("m").alias("id_b"))
    )
    self_edges = m.select(F.col("u").alias("id_a"), F.col("m").alias("id_b"))
    return (
        small.unionByName(self_edges)
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """(count, xor-ish hash) — cheap convergence check in one aggregate."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(id_a, id_b))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    checkpoint: CheckpointManager | None = None,
    checkpoint_table: str = "cc_edges",
    resume: bool = False,
) -> DataFrame:
    """edges(id_a, id_b) -> assignments(id, component) where component is the
    minimum id in each connected component.

    With ``checkpoint`` set, every superstep's edge set is committed as a
    snapshot; ``resume=True`` restarts from the latest committed superstep
    (kill-and-resume safe, per north_rule).
    """
    spark = edges.sparkSession
    start_step = 0
    if checkpoint is not None and resume and checkpoint.exists(checkpoint_table):
        start_step = (checkpoint.latest_step(checkpoint_table) or 0) + 1
        cur = checkpoint.read(checkpoint_table)
    else:
        cur = edges.select("id_a", "id_b").distinct()

    prev_sig: tuple[int, int] | None = None
    for step in range(start_step, start_step + max_iterations):
        cur = _small_star(_large_star(cur))
        if checkpoint is not None:
            checkpoint.write(
                checkpoint_table,
                cur,
                step=step,
                counters={"cc_superstep": 1},
            )
            cur = checkpoint.read(checkpoint_table)  # cut lineage via disk
        else:
            cur = cur.localCheckpoint(eager=True)  # cut lineage in memory
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iterations} supersteps"
        )

    # At fixpoint each edge is (node -> root). Nodes that appear only as
    # roots (or isolated after dedup) map to themselves.
    assign = cur.select(F.col("id_a").alias("id"), F.col("id_b").alias("component"))
    roots = (
        cur.select(F.col("id_b").alias("id"))
        .distinct()
        .join(assign.select("id"), "id", "left_anti")
        .withColumn("component", F.col("id"))
    )
    # groupBy(min): a node may briefly hold edges to >1 label pre-fixpoint;
    # min is the canonical component representative either way.
    return (
        assign.unionByName(roots)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def clusters_from_pairs(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "url",
    **cc_kwargs,
) -> DataFrame:
    """Match edges -> (id, component); ids absent from any edge become
    singleton clusters when ``all_ids`` is provided."""
    assign = connected_components(pairs, **cc_kwargs)
    if all_ids is None:
        return assign
    ids = all_ids.select(F.col(id_col).alias("id")).distinct()
    singletons = ids.join(assign.select("id"), "id", "left_anti").withColumn(
        "component", F.col("id")
    )
    return assign.unionByName(singletons)

"""HyperLogLog distinct-count sketches — mergeable cardinality registers.

``approx_count_distinct`` answers one query; a 10^12-page pipeline needs
the SKETCH itself: per-partition/per-day register tables that merge by
``max`` (union-max is associative/commutative/idempotent), so "distinct
canonical urls per domain, across all crawls so far" is an incremental
union of daily register tables — never a re-scan of the corpus history.
This implements Flajolet et al.'s HLL (AMC 2007 formulation, the public
algorithm) with every step engine-portable and deterministic:

* hash = md5 of the value's string image (same portability convention as
  the fingerprint/embedding functions): register index = first ``p/4``
  hex nibbles, rank ``rho`` = position of the first 1-bit in the next
  40-bit window (window-clamped so fixed-point terms fit int64; the
  clamp only matters past ~2^40 distincts per register and is shared by
  every engine replaying the sketch).
* the harmonic-mean denominator is summed in FIXED POINT —
  ``sum(2^(41-rho))`` over observed registers plus ``2^41`` per empty
  register — an exact integer, so the estimate is independent of
  partitioning and float summation order (a float ``sum(2^-rho)`` spans
  ~70 bits of magnitude and rounds order-dependently).
* small-range linear counting (``E <= 2.5m`` with empty registers) per
  the original paper; alpha_m is inlined as a Python-computed literal.

Everything is built-in JVM expressions (conv / substring / shiftleft /
hash aggregates) — zero Python, zero shuffle beyond the one register
aggregate, map-side combinable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_W = 40  # rho window bits; rho in [1, 41]
_RHO_CAP = _W + 1


def hll_alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _check_p(p: int) -> int:
    if p not in (4, 8, 12, 16):
        raise ValueError(f"p must be one of 4/8/12/16 (whole hex nibbles), got {p}")
    return p


def hll_registers(
    df: DataFrame, key_col: str, value_col: str, p: int = 12
) -> DataFrame:
    """Per-key register table ``(key, idx, rho)`` — the mergeable sketch
    state.  NULL values are excluded (COUNT DISTINCT convention); values
    hash via their string cast."""
    _check_p(p)
    nib = p // 4
    h = F.md5(F.col(value_col).cast("string"))
    idx = F.conv(F.substring(h, 1, nib), 16, 10).cast("int")
    v = F.conv(F.substring(h, nib + 1, _W // 4), 16, 10).cast("bigint")
    # conv(x, 16, 2) drops leading zeros: bit_length(v) = length of the
    # binary string; rho = 41 - bit_length, with v = 0 -> 41
    rho = F.when(v == 0, F.lit(_RHO_CAP)).otherwise(
        F.lit(_RHO_CAP) - F.length(F.conv(F.substring(h, nib + 1, _W // 4), 16, 2))
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(key_col).alias("key"), idx.alias("idx"), rho.alias("rho"))
        .groupBy("key", "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Union-max merge of register tables (associative, commutative,
    idempotent) — sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly."""
    if not register_dfs:
        raise ValueError("need at least one register table")
    out = register_dfs[0]
    for r in register_dfs[1:]:
        out = out.unionByName(r)
    return out.groupBy("key", "idx").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """Collapse a register table to ``(key, distinct_est)``.

    Fixed-point denominator: ``Z_int = zeros * 2^41 + sum(2^(41-rho))``
    (exact int64 — max ``2^p * 2^41`` needs p <= 22).  Raw estimate
    ``alpha * m^2 * 2^41 / Z_int``; linear counting when ``E <= 2.5m``
    and empty registers exist."""
    _check_p(p)
    m = 1 << p
    alpha = hll_alpha(m)
    per_key = registers.groupBy("key").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_RHO_CAP} - rho AS INT))")
        ).alias("_s"),
        F.count(F.lit(1)).alias("_observed"),
    )
    zeros = F.lit(m) - F.col("_observed")
    z_int = zeros * F.lit(1 << _RHO_CAP) + F.col("_s")
    raw = F.lit(alpha * m * m * float(1 << _RHO_CAP)) / z_int.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_key.select("key", F.round(est, 4).alias("distinct_est"))


def hll_distinct(
    df: DataFrame, key_col: str, value_col: str, p: int = 12
) -> DataFrame:
    """Per-key approximate distinct count: registers → estimate."""
    return hll_estimate(hll_registers(df, key_col, value_col, p), p)


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency estimation
# ---------------------------------------------------------------------------

def _cms_col(value, j: int, w: int):
    """Column index for depth row ``j``: 32-bit md5 nibble-fold of
    ``"j:" || value`` mod ``w`` — engine-portable, replayable in SQL."""
    h = F.md5(F.concat(F.lit(f"{j}:"), value.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % w).cast(
        "int"
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 16384,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the value
    stream: ``(row, col, cnt)`` cells, ``d*w`` of them total regardless
    of corpus size.  Cells merge by SUM (:func:`cms_merge`) — per-day
    sketches roll into all-time frequency estimates, the same
    incremental story as the HLL registers.  Exact integer sums, so the
    sketch (and every estimate) is independent of partitioning.

    Build cost: one ``d``-way explode (narrow) into ONE map-side-
    combinable hash aggregate; NULL values are excluded.
    ``weight_col`` accumulates weighted counts (e.g. token counts
    per doc) instead of 1 per row.
    """
    if d < 1 or w < 1:
        raise ValueError(f"d and w must be >= 1, got d={d} w={w}")
    weight = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    v = F.col(value_col)
    cells = df.where(v.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_col(v, j, w).alias("col"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("rc"),
        weight.alias("_w"),
    )
    return (
        cells.select("rc.row", "rc.col", "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise SUM merge — sketch(A ∪ B) == merge(sketch(A), sketch(B))
    exactly."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 16384,
) -> DataFrame:
    """Estimated frequency per queried value: min over the ``d`` cells —
    always >= the true count (one-sided error, the CMS guarantee), with
    overestimate probability shrinking exponentially in ``d``.

    The sketch is ``d*w`` rows at ANY corpus size, so it broadcasts
    legitimately; querying is one equi-join on (row, col) after a
    ``d``-way explode of the query values — the corpus is never touched.
    Values absent from the stream estimate as 0 (cells may be absent
    from the sparse cell table; they count as 0).
    """
    if d < 1 or w < 1:
        raise ValueError(f"d and w must be >= 1, got d={d} w={w}")
    v = F.col(value_col)
    probes = queries.where(v.isNotNull()).select(
        v.alias("value"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_col(v, j, w).alias("col"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("rc"),
    ).select("value", "rc.row", "rc.col")
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )

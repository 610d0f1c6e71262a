"""Exact corpus distribution statistics.

``percentile_approx`` answers dashboards; data CONTRACTS (e.g. "drop the
shortest decile", "truncate at the P99 token length") need quantiles that
are exact, deterministic, and reproducible across engines and
partitionings.  For the columns these contracts run on — token counts,
char lengths, quality scores quantized to fixed decimals — the VALUE
DOMAIN is bounded (a length fits in [0, ~1e6]) even when the corpus is
10^12 rows, which makes exact quantiles cheap: aggregate the corpus to
one count per distinct value (map-side combinable), then do all order
statistics on that domain-sized table.

Scale shape: ONE hash aggregate over the corpus → |domain| rows; the
cumulative window and the quantile selection run on the bounded domain
table, never on corpus rows.  Thresholds use pure integer arithmetic
(``cum * q >= k * n`` instead of ``cum >= ceil(k*n/q)`` — equivalent for
integer ``cum``, and free of float-boundary surprises like
``ceil(0.1 * 500) = 51``), so results are bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    q: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """Exact type-1 (inverse-CDF) q-quantiles of ``value_col``:
    for each ``k`` in 1..q, the smallest value whose cumulative count
    ``cum`` satisfies ``cum * q >= k * n`` (k=q yields the max).

    * ``group_col``: per-group quantiles (the cumulative window is
      partitioned by group — each partition is domain-sized, never
      corpus-sized).
    * NULL values are excluded; with no non-null values the result is
      empty (never NULL-valued quantile rows).
    * Overflow: ``cum * q`` and ``k * n`` must fit int64 — fine for
      q <= 1000 at 10^12 rows.

    Returns ``(k, value)`` (+ ``group_col`` when grouped).
    """
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    keys = [group_col] if group_col else []
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy(*keys).orderBy(value_col)
        if keys
        else Window.orderBy(value_col)
    )
    # window over the DOMAIN-sized count table, not the corpus
    cum = counts.withColumn("_cum", F.sum("_c").over(w))
    if keys:
        # per-group total via an unordered partition window over the same
        # domain-sized table: no join, and NULL group values (a legitimate
        # stratum) are never dropped the way an equi-join would drop them
        cum = cum.withColumn(
            "_n", F.max("_cum").over(Window.partitionBy(*keys))
        )
    else:
        totals = cum.agg(F.max("_cum").alias("_n"))
        cum = cum.crossJoin(F.broadcast(totals))  # one scalar row
    aggs = [
        F.min(
            F.when(
                F.col("_cum") * q >= k * F.col("_n"), F.col(value_col)
            )
        ).alias(f"_q{k}")
        for k in range(1, q + 1)
    ]
    wide = cum.groupBy(*keys).agg(*aggs) if keys else cum.agg(*aggs)
    stack = ", ".join(f"{k}, _q{k}" for k in range(1, q + 1))
    out = wide.select(
        *keys, F.expr(f"stack({q}, {stack}) as (k, value)")
    ).where(F.col("value").isNotNull())
    return out


def shrunken_group_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    prior_strength: float = 10.0,
    round_to: int | None = 6,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-group means toward the global
    mean: ``post = (tau * global_mean + sum_x) / (tau + n)`` — the
    domain-level quality prior of web-corpus curation (a domain seen 3
    times must not swing to 0.0 or 1.0 and gate a whole host; a domain
    seen 100k times speaks for itself).  ``prior_strength`` (tau) is the
    pseudo-count weight of the global mean.

    Returns ``(group, n, mean, shrunk_mean)`` — raw and shrunken, so
    thresholds can be audited against both.  NULL values are excluded;
    groups with only NULL values are absent; NULL group is a legitimate
    group.  Rounding (default 6) makes the result stable under double
    summation order across partitionings (the established convention).

    Scale shape: ONE map-side-combinable (group) aggregate + one scalar
    global aggregate broadcast into it — no window, no second corpus
    scan.
    """
    if prior_strength < 0:
        raise ValueError(f"prior_strength must be >= 0, got {prior_strength}")
    v = F.col(value_col).cast("double")
    per_group = (
        df.where(v.isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("_sum"),
        )
    )
    totals = per_group.agg(
        (F.sum("_sum") / F.sum("n")).alias("_gmean")
    )
    joined = per_group.crossJoin(F.broadcast(totals))  # one scalar row
    mean = F.col("_sum") / F.col("n")
    shrunk = (
        F.lit(float(prior_strength)) * F.col("_gmean") + F.col("_sum")
    ) / (F.lit(float(prior_strength)) + F.col("n"))
    out = joined.select(
        group_col,
        "n",
        (F.round(mean, round_to) if round_to is not None else mean).alias(
            "mean"
        ),
        (
            F.round(shrunk, round_to) if round_to is not None else shrunk
        ).alias("shrunk_mean"),
    )
    return out


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
    rows_per_task_target: int = 1_000_000,
) -> DataFrame:
    """Join-key skew diagnostic: the top-``top_k`` hottest keys with
    their row counts, share of the table, and a recommended salt count —
    the MEASUREMENT behind every "salt the hot keys" decision in this
    engine (the pipeline's dynamic per-key salts, the block caps, the
    AQE skew thresholds).  Run it on a join key BEFORE shipping a new
    join at corpus scale; a top-1 share of 10% means that key alone
    serializes 10% of the shuffle onto one reducer without salting.

    * ``cnt``: rows under the key (NULL keys count as a key — they hash
      to one reducer like any other value);
    * ``share``: cnt / total rows, rounded 6;
    * ``recommended_salts``: ``ceil(cnt / rows_per_task_target)``,
      floor 1 — the replication factor that bounds one reducer's share
      of this key to the target.

    Scale shape: one map-side-combinable count aggregate to the
    key-DOMAIN table, then ``TakeOrderedAndProject`` for the top-k
    (never a global sort) with a deterministic (cnt desc, key asc)
    order; the scalar total rides the one-row broadcast cross join.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if rows_per_task_target < 1:
        raise ValueError(
            f"rows_per_task_target must be >= 1, got {rows_per_task_target}"
        )
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    out = (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col(key_col).alias("key"),
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("cnt") / F.lit(float(rows_per_task_target))),
            )
            .cast("int")
            .alias("recommended_salts"),
        )
        .orderBy(F.desc("cnt"), F.asc_nulls_last("key"))
        .limit(top_k)
    )
    return out

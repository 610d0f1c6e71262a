"""Deterministic sampling — reproducible corpus downsampling at any scale.

Training-data pipelines need samples that are (a) REPRODUCIBLE across
runs, partitionings and engines (``df.sample`` is none of these: it
depends on partition layout), (b) stratifiable (per-language / per-domain
quotas), and (c) cheap (no global sort of the corpus).

Both operators key on ``md5(id)`` — not xxhash64 — so the exact same
sample reproduces in any engine with an md5 function (the DuckDB oracle
recomputes it verbatim; same portability convention as the embedding and
fingerprint functions, reference test scheme lib/…/test_services_search_
service_integration.py:188-202).

Scale shapes:
* ``deterministic_sample``: pure filter — one scan, no shuffle, no sort.
* ``stratified_sample``: the naive form (row_number over each whole
  stratum) sorts an entire stratum in ONE task — a ``lang='en'`` stratum
  is half a web corpus, and window partitions cannot be AQE-split.  The
  implementation therefore pre-filters each stratum to the
  ``~oversample*n`` smallest hash fractions (a PREFIX of the md5 order,
  so the first-n is unchanged) and windows only the survivors; strata
  the probabilistic filter under-delivers (Chernoff-rare) are re-done
  exactly through a declarative fallback branch — deterministic result,
  probabilistic work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_fraction(id_col: str) -> F.Column:
    """Uniform-ish [0, 1) value from the first 8 md5 hex chars of the id
    (32 bits — engine-portable, partitioning-independent)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep rows whose md5-derived hash fraction < ``fraction``.

    A pure filter: deterministic, engine-portable, and stable under any
    partitioning — re-running on a grown corpus keeps every previously
    sampled row (ids don't move buckets), which makes incremental
    pipelines diff-friendly."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(_hash_fraction(id_col) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str,
    oversample: float = 4.0,
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, chosen by md5(id) order
    (ties broken by id — total order, so the sample is exact and unique).

    The per-stratum 'first n by hash' IS a uniform sample of the stratum
    (md5 order is independent of any data attribute), with the same
    stability property as :func:`deterministic_sample`: a row's rank only
    grows as the stratum grows, never reshuffles.

    Scale shape (the naive one-window form sorts a whole stratum in one
    unsplittable task): each stratum is pre-filtered to hash fraction
    ``< oversample * n / stratum_size`` — the fraction is a monotone
    coarsening of the window's md5 sort key and the cut keeps complete
    tie groups, so the survivors are a PREFIX of the stratum's order and
    their first n equals the stratum's first n whenever at least
    ``min(n, size)`` survive.  The window then sorts ~``oversample*n``
    rows per stratum regardless of stratum size.  Strata the filter
    under-delivers (probability ``exp(-Θ(n))`` per stratum at the
    default oversample — but data-fixed, not a coin flip, so it MUST be
    handled) are recomputed exactly through a declarative fallback
    branch: the result is always exactly the spec, only the work is
    probabilistic."""
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    if oversample <= 0:
        raise ValueError(f"oversample must be positive, got {oversample}")
    out_cols = df.columns
    # internal non-null stratum key: a NULL stratum is a legitimate group
    # to the window but never matches an equi-join — tag it injectively
    # ("n:" sentinel vs "v:"-prefixed value; within one column type the
    # string cast is injective for standard types)
    sk = F.when(F.col(strata_col).isNull(), F.lit("n:")).otherwise(
        F.concat(F.lit("v:"), F.col(strata_col).cast("string"))
    )
    base = df.withColumn("_sk", sk)
    w = Window.partitionBy("_sk").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )

    sizes = base.groupBy("_sk").agg(F.count(F.lit(1)).alias("_ssize"))
    thresh = F.least(
        F.lit(1.0),
        F.lit(float(oversample) * float(n_per_stratum)) / F.col("_ssize"),
    )
    survivors = base.join(sizes, "_sk").where(_hash_fraction(id_col) < thresh)

    # under-delivered strata: fewer survivors than min(n, size) — the
    # prefix property then no longer covers the full first-n.  Includes
    # strata whose filter kept zero rows (absent from survivors).
    surv_counts = survivors.groupBy("_sk").agg(
        F.count(F.lit(1)).alias("_nsurv")
    )
    bad = (
        sizes.join(surv_counts, "_sk", "left")
        .withColumn("_nsurv", F.coalesce(F.col("_nsurv"), F.lit(0)))
        .where(
            (F.col("_nsurv") < F.lit(int(n_per_stratum)))
            & (F.col("_nsurv") < F.col("_ssize"))
        )
        .select("_sk")
    )

    def first_n(src: DataFrame) -> DataFrame:
        return (
            src.withColumn("_sample_rank", F.row_number().over(w))
            .where(F.col("_sample_rank") <= n_per_stratum)
            .select(*out_cols)
        )

    ok_part = first_n(survivors.join(bad, "_sk", "left_anti"))
    # exact fallback for the rare under-delivered strata: windows the
    # FULL stratum, but only for strata the cheap path missed
    redo_part = first_n(base.join(bad, "_sk", "semi"))
    return ok_part.unionByName(redo_part)

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
* ``stratified_sample``: one hash shuffle on the stratum + a per-stratum
  window over the md5 order.  Skewed strata cost their own partition only
  (rank-truncation to n keeps state bounded); there is no global sort.
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
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, chosen by md5(id) order
    (ties broken by id — total order, so the sample is exact and unique).

    The per-stratum 'first n by hash' IS a uniform sample of the stratum
    (md5 order is independent of any data attribute), with the same
    stability property as :func:`deterministic_sample`: a row's rank only
    grows as the stratum grows, never reshuffles."""
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_sample_rank", F.row_number().over(w))
        .where(F.col("_sample_rank") <= n_per_stratum)
        .drop("_sample_rank")
    )

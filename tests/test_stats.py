"""Exact distribution quantiles."""
import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.operators.stats import exact_quantiles


def _ref(values, q):
    """Type-1 inverse-CDF reference: smallest v with rank*q >= k*n."""
    vs = sorted(values)
    n = len(vs)
    return {k: vs[-(-k * n // q) - 1] for k in range(1, q + 1)}


def test_matches_reference_on_randomized_values(spark):
    import hashlib

    for seed in (1, 2):
        vals = [
            int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), 16) % 40
            for i in range(257)  # odd n, heavy value ties
        ]
        df = spark.createDataFrame([(v,) for v in vals], "v int")
        got = {
            r["k"]: r["value"]
            for r in exact_quantiles(df, "v", q=10).collect()
        }
        assert got == _ref(vals, 10), f"seed {seed}"


def test_median_and_max_small(spark):
    df = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], "v int")
    got = {r["k"]: r["value"] for r in exact_quantiles(df, "v", q=2).collect()}
    assert got == {1: 2, 2: 4}


def test_grouped(spark):
    rows = [("a", v) for v in range(1, 11)] + [("b", v) for v in (5, 5, 5)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        (r["g"], r["k"]): r["value"]
        for r in exact_quantiles(df, "v", q=2, group_col="g").collect()
    }
    assert got == {("a", 1): 5, ("a", 2): 10, ("b", 1): 5, ("b", 2): 5}


def test_nulls_excluded_and_all_null_empty(spark):
    df = spark.createDataFrame([(1,), (None,)], "v int")
    got = {r["k"]: r["value"] for r in exact_quantiles(df, "v", q=2).collect()}
    assert got == {1: 1, 2: 1}
    allnull = spark.createDataFrame([(None,), (None,)], "v int")
    assert exact_quantiles(allnull, "v", q=4).count() == 0


def test_partitioning_independence(spark):
    vals = [(v % 17,) for v in range(100)]
    df = spark.createDataFrame(vals, "v int")
    a = sorted(
        (r["k"], r["value"])
        for r in exact_quantiles(df.repartition(1), "v", q=7).collect()
    )
    b = sorted(
        (r["k"], r["value"])
        for r in exact_quantiles(df.repartition(16), "v", q=7).collect()
    )
    assert a == b


def test_validation():
    with pytest.raises(ValueError):
        exact_quantiles(None, "v", q=0)


def test_null_group_is_a_legitimate_stratum(spark):
    rows = [(None, 1), (None, 3), ("a", 7)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {
        (r["g"], r["k"]): r["value"]
        for r in exact_quantiles(df, "v", q=2, group_col="g").collect()
    }
    assert got == {(None, 1): 1, (None, 2): 3, ("a", 1): 7, ("a", 2): 7}


# ---------------------------------------------------------------------------
# empirical-Bayes shrunken group means
# ---------------------------------------------------------------------------

def test_shrinkage_pulls_small_groups_to_global_mean(spark):
    from semantic_entity_matching_spark.operators.stats import (
        shrunken_group_means,
    )

    rows = (
        [("big", 0.8)] * 100          # big group near its own mean
        + [("tiny", 0.0)]             # single awful page
        + [("nullg", None)]           # all-null group: absent
        + [(None, 0.8)] * 10          # NULL group is legitimate
    )
    df = spark.createDataFrame(rows, "domain string, q double")
    got = {
        r["domain"]: (r["n"], r["mean"], r["shrunk_mean"])
        for r in shrunken_group_means(df, "domain", "q", prior_strength=10.0).collect()
    }
    assert "nullg" not in got
    g_mean = (100 * 0.8 + 0.0 + 10 * 0.8) / 111
    assert got["big"][0] == 100 and abs(got["big"][1] - 0.8) < 1e-9
    # big group barely moves; tiny group lands near the global mean
    assert abs(got["big"][2] - (10 * g_mean + 80.0) / 110) < 1e-6
    assert got["tiny"][1] == 0.0
    assert abs(got["tiny"][2] - (10 * g_mean) / 11) < 1e-6
    assert got[None][0] == 10


def test_shrinkage_partitioning_independent_and_validates(spark):
    import pytest as _pytest

    from semantic_entity_matching_spark.operators.stats import (
        shrunken_group_means,
    )

    rows = [(f"d{i % 7}", (i % 13) / 13.0) for i in range(200)]
    df = spark.createDataFrame(rows, "domain string, q double")
    a = sorted(
        (r["domain"], r["shrunk_mean"])
        for r in shrunken_group_means(df.repartition(1), "domain", "q").collect()
    )
    b = sorted(
        (r["domain"], r["shrunk_mean"])
        for r in shrunken_group_means(df.repartition(16), "domain", "q").collect()
    )
    assert a == b
    with _pytest.raises(ValueError):
        shrunken_group_means(df, "domain", "q", prior_strength=-1)


# ---------------------------------------------------------------------------
# join-key skew report
# ---------------------------------------------------------------------------

def test_skew_report_hot_keys_and_salts(spark):
    from semantic_entity_matching_spark.operators.stats import skew_report

    rows = (
        [("hot",)] * 50
        + [("warm",)] * 10
        + [(None,)] * 5
        + [(f"cold{i}",) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r["key"], r["cnt"], r["share"], r["recommended_salts"])
        for r in skew_report(df, "k", top_k=3, rows_per_task_target=20).collect()
    ]
    n = len(rows)
    assert got[0] == ("hot", 50, round(50 / n, 6), 3)   # ceil(50/20)
    assert got[1] == ("warm", 10, round(10 / n, 6), 1)
    assert got[2] == (None, 5, round(5 / n, 6), 1)      # NULL is a key
    assert len(got) == 3


def test_skew_report_plan_uses_take_ordered(spark):
    import pytest as _pytest

    from semantic_entity_matching_spark.operators.stats import skew_report

    df = spark.createDataFrame([(f"k{i % 9}",) for i in range(100)], "k string")
    plan = (
        skew_report(df, "k", top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    with _pytest.raises(ValueError):
        skew_report(df, "k", top_k=0)
    with _pytest.raises(ValueError):
        skew_report(df, "k", rows_per_task_target=0)

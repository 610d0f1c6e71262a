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

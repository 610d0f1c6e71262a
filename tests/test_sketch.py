"""HyperLogLog sketch: accuracy envelope, exact mergeability, determinism."""
import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.functions.sketch import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _df(spark, n=8000, groups=4):
    return spark.range(n).select(
        (F.col("id") % groups).cast("string").alias("g"),
        F.concat(F.lit("val"), F.col("id")).alias("v"),
    )


def test_accuracy_envelope(spark):
    df = _df(spark, n=20000, groups=4)  # 5000 distinct per group
    got = {
        r["key"]: r["distinct_est"]
        for r in hll_distinct(df, "g", "v", p=12).collect()
    }
    assert set(got) == {"0", "1", "2", "3"}
    for k, est in got.items():
        assert abs(est - 5000) / 5000 < 0.06, (k, est)  # ~3.6 sigma at p=12


def test_merge_is_exact_union(spark):
    df = _df(spark)
    a = df.where(F.col("id") % 3 == 0)
    b = df.where(F.col("id") % 3 != 0)
    whole = {
        (r["key"], r["idx"]): r["rho"]
        for r in hll_registers(df, "g", "v", p=8).collect()
    }
    merged = {
        (r["key"], r["idx"]): r["rho"]
        for r in hll_merge(
            hll_registers(a, "g", "v", p=8), hll_registers(b, "g", "v", p=8)
        ).collect()
    }
    assert whole == merged
    # idempotent: merging a sketch with itself changes nothing
    ra = hll_registers(a, "g", "v", p=8)
    again = {
        (r["key"], r["idx"]): r["rho"]
        for r in hll_merge(ra, ra).collect()
    }
    assert again == {
        (r["key"], r["idx"]): r["rho"] for r in ra.collect()
    }


def test_duplicates_do_not_move_the_estimate(spark):
    df = _df(spark, n=2000, groups=1)
    doubled = df.unionByName(df).unionByName(df)
    e1 = hll_distinct(df, "g", "v", p=12).collect()[0]["distinct_est"]
    e2 = hll_distinct(doubled, "g", "v", p=12).collect()[0]["distinct_est"]
    assert e1 == e2


def test_partitioning_independence(spark):
    df = _df(spark, n=3000)
    a = sorted(
        (r["key"], r["distinct_est"])
        for r in hll_distinct(df.repartition(1), "g", "v", p=8).collect()
    )
    b = sorted(
        (r["key"], r["distinct_est"])
        for r in hll_distinct(df.repartition(16), "g", "v", p=8).collect()
    )
    assert a == b


def test_small_counts_linear_counting_is_tight(spark):
    # 3 distinct values: linear counting should land within 1
    rows = [("g", "a"), ("g", "b"), ("g", "c"), ("g", "a")]
    df = spark.createDataFrame(rows, "g string, v string")
    est = hll_distinct(df, "g", "v", p=12).collect()[0]["distinct_est"]
    assert abs(est - 3) < 1


def test_nulls_excluded(spark):
    rows = [("g", "a"), ("g", None)]
    df = spark.createDataFrame(rows, "g string, v string")
    est = hll_distinct(df, "g", "v", p=12).collect()[0]["distinct_est"]
    assert abs(est - 1) < 1


def test_bad_precision():
    with pytest.raises(ValueError):
        hll_registers(None, "g", "v", p=10)
    with pytest.raises(ValueError):
        hll_merge()


def test_plan_no_python(spark):
    plan = (
        hll_distinct(_df(spark), "g", "v", p=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan

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


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def _cms_mods():
    from semantic_entity_matching_spark.functions.sketch import (
        cms_merge,
        cms_query,
        cms_sketch,
    )

    return cms_sketch, cms_merge, cms_query


def _stream(spark, n=4000, vocab=60):
    # Zipf-ish: value v appears ~ n/(v+1) times
    rows = []
    for v in range(vocab):
        rows += [(f"t{v:02d}",)] * max(1, n // ((v + 1) * 10))
    return spark.createDataFrame(rows, "v string"), {
        f"t{v:02d}": max(1, n // ((v + 1) * 10)) for v in range(vocab)
    }


def test_cms_one_sided_and_tight_at_width(spark):
    cms_sketch, _, cms_query = _cms_mods()
    df, truth = _stream(spark)
    qs = spark.createDataFrame([(k,) for k in truth], "v string")
    # wide sketch: few collisions -> exact for most, never under
    sk = cms_sketch(df, "v", d=4, w=4096)
    got = {r["value"]: r["est"] for r in cms_query(sk, qs, "v", d=4, w=4096).collect()}
    assert set(got) == set(truth)
    assert all(got[k] >= c for k, c in truth.items())
    assert sum(got[k] == c for k, c in truth.items()) >= len(truth) - 2


def test_cms_narrow_width_still_one_sided(spark):
    cms_sketch, _, cms_query = _cms_mods()
    df, truth = _stream(spark)
    qs = spark.createDataFrame([(k,) for k in truth], "v string")
    sk = cms_sketch(df, "v", d=3, w=16)  # heavy collisions
    got = {r["value"]: r["est"] for r in cms_query(sk, qs, "v", d=3, w=16).collect()}
    assert all(got[k] >= c for k, c in truth.items())


def test_cms_merge_equals_whole_and_absent_is_zero(spark):
    from pyspark.sql import functions as F

    cms_sketch, cms_merge, cms_query = _cms_mods()
    df, _ = _stream(spark, n=1000, vocab=20)
    a = df.where(F.md5("v") < "8")
    b = df.where(F.md5("v") >= "8")
    whole = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_sketch(df, "v", d=4, w=256).collect()
    }
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_merge(
            cms_sketch(a, "v", d=4, w=256), cms_sketch(b, "v", d=4, w=256)
        ).collect()
    }
    assert whole == merged
    qs = spark.createDataFrame([("never-seen-value",)], "v string")
    sk = cms_sketch(df, "v", d=4, w=65536)
    est = cms_query(sk, qs, "v", d=4, w=65536).collect()[0]["est"]
    assert est == 0


def test_cms_weighted(spark):
    cms_sketch, _, cms_query = _cms_mods()
    rows = [("a", 5), ("a", 7), ("b", 1)]
    df = spark.createDataFrame(rows, "v string, w bigint")
    qs = spark.createDataFrame([("a",), ("b",)], "v string")
    sk = cms_sketch(df, "v", d=4, w=1024, weight_col="w")
    got = {r["value"]: r["est"] for r in cms_query(sk, qs, "v", d=4, w=1024).collect()}
    assert got == {"a": 12, "b": 1}


def test_cms_validation(spark):
    cms_sketch, cms_merge, _ = _cms_mods()
    with pytest.raises(ValueError):
        cms_sketch(None, "v", d=0)
    with pytest.raises(ValueError):
        cms_merge()

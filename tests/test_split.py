"""Cluster-aware train/val/test split (leakage guard)."""
import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.operators.sample import (
    cluster_split,
    split_bounds_hex,
)

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _corpus(spark, n=3000, cluster_width=3):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % cluster_width).alias("component"),
    )


def test_bounds_hex_literals():
    assert split_bounds_hex(FR) == [
        ("train", format(int(0.8 * 2**32), "08x")),
        ("val", format(int(0.9 * 2**32), "08x")),
        ("test", None),
    ]
    assert split_bounds_hex({"all": 1.0}) == [("all", None)]


def test_cluster_members_never_straddle_splits(spark):
    out = cluster_split(_corpus(spark), FR)
    bad = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert bad == 0


def test_proportions_and_totality(spark):
    out = cluster_split(_corpus(spark, n=9000), FR).cache()
    n = out.count()
    shares = {
        r["split"]: r["c"] / n
        for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert set(shares) == {"train", "val", "test"}  # no NULLs, no extras
    assert abs(shares["train"] - 0.8) < 0.05
    assert abs(shares["val"] - 0.1) < 0.04
    assert abs(shares["test"] - 0.1) < 0.04
    out.unpersist()


def test_partitioning_independence_and_salt(spark):
    df = _corpus(spark, n=600)
    a = {
        (r["doc_id"], r["split"])
        for r in cluster_split(df.repartition(1), FR).collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in cluster_split(df.repartition(16), FR).collect()
    }
    assert a == b
    salted = {
        (r["doc_id"], r["split"])
        for r in cluster_split(df, FR, salt="fold1").collect()
    }
    assert salted != a  # a different deterministic draw


def test_null_cluster_gets_null_split(spark):
    df = spark.createDataFrame(
        [(1, "c1"), (2, None)], "doc_id bigint, component string"
    )
    got = {r["doc_id"]: r["split"] for r in cluster_split(df, FR).collect()}
    assert got[2] is None and got[1] in FR


def test_growth_stability(spark):
    # adding rows/clusters never moves an existing cluster's split
    small = cluster_split(_corpus(spark, n=300), FR)
    big = cluster_split(_corpus(spark, n=3000), FR)
    s = {r["component"]: r["split"] for r in small.collect()}
    b = {r["component"]: r["split"] for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_validation():
    with pytest.raises(ValueError):
        split_bounds_hex({})
    with pytest.raises(ValueError):
        split_bounds_hex({"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        split_bounds_hex({"a": 1.0, "": 0.0})
    with pytest.raises(ValueError):
        split_bounds_hex([("a", 0.5), ("a", 0.5)])


def test_plan_is_single_stage(spark):
    plan = cluster_split(_corpus(spark), FR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# weighted_sample (A-ES)
# ---------------------------------------------------------------------------

def _wdf(spark):
    heavy = [(f"h{i:03d}", 1000.0) for i in range(100)]
    light = [(f"l{i:03d}", 1.0) for i in range(100)]
    return spark.createDataFrame(heavy + light, "id string, w double")


def test_weighted_sample_matches_python_reference(spark):
    import hashlib
    import math

    from semantic_entity_matching_spark.operators.sample import (
        weighted_sample,
    )

    df = _wdf(spark)
    rows = [(r["id"], r["w"]) for r in df.collect()]

    def key(i, w, salt=""):
        u = (int(hashlib.md5((salt + i).encode()).hexdigest()[:8], 16) + 1) / (
            2**32 + 1
        )
        return math.log(u) / w

    want = {i for i, _ in sorted(rows, key=lambda r: (-key(*r), r[0]))[:50]}
    got = {r["id"] for r in weighted_sample(df, "id", "w", 50).collect()}
    assert got == want


def test_weighted_sample_favors_heavy_and_salt_redraws(spark):
    from semantic_entity_matching_spark.operators.sample import (
        weighted_sample,
    )

    df = _wdf(spark)
    got = {r["id"] for r in weighted_sample(df, "id", "w", 50).collect()}
    heavy = sum(1 for i in got if i.startswith("h"))
    assert heavy >= 45  # 1000:1 weights -> overwhelmingly heavy items
    salted = {
        r["id"] for r in weighted_sample(df, "id", "w", 50, salt="s1").collect()
    }
    assert salted != got


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    import pytest as _pytest

    from semantic_entity_matching_spark.operators.sample import (
        weighted_sample,
    )

    rows = [("a", 5.0), ("b", 0.0), ("c", -1.0), ("d", None)]
    df = spark.createDataFrame(rows, "id string, w double")
    got = {r["id"] for r in weighted_sample(df, "id", "w", 10).collect()}
    assert got == {"a"}
    with _pytest.raises(ValueError):
        weighted_sample(df, "id", "w", 0)


def test_weighted_sample_plan_and_partitioning(spark):
    from semantic_entity_matching_spark.operators.sample import (
        weighted_sample,
    )

    df = _wdf(spark)
    plan = (
        weighted_sample(df, "id", "w", 20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan and "Sort " not in plan
    a = {r["id"] for r in weighted_sample(df.repartition(1), "id", "w", 20).collect()}
    b = {r["id"] for r in weighted_sample(df.repartition(16), "id", "w", 20).collect()}
    assert a == b

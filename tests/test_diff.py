"""Crawl-snapshot diff classification."""
from pyspark.sql import functions as F

from semantic_entity_matching_spark.operators.diff import crawl_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_all_four_statuses(spark):
    old = _snap(
        spark,
        [("u1", "same"), ("u2", "before"), ("u3", "gone"), ("u4", None)],
    )
    new = _snap(
        spark,
        [("u1", "same"), ("u2", "after"), ("u5", "fresh"), ("u4", None)],
    )
    got = {
        r["id"]: r["status"]
        for r in crawl_diff(old, new, include_unchanged=True).collect()
    }
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "unchanged",  # NULL text is a page state; equal fps
        "u5": "added",
    }


def test_delta_sized_default_and_null_transition(spark):
    old = _snap(spark, [("u1", "x"), ("u2", None)])
    new = _snap(spark, [("u1", "x"), ("u2", "now has text")])
    got = {r["id"]: r["status"] for r in crawl_diff(old, new).collect()}
    # unchanged u1 filtered out; NULL -> text is a change, not an add
    assert got == {"u2": "changed"}


def test_precomputed_fingerprint_column(spark):
    old = spark.createDataFrame([("u1", "fp_a")], "url string, digest string")
    new = spark.createDataFrame([("u1", "fp_b")], "url string, digest string")
    got = crawl_diff(old, new, fingerprint_col="digest").collect()
    assert [(r["id"], r["status"]) for r in got] == [("u1", "changed")]


def test_empty_sides(spark):
    old = _snap(spark, [("u1", "x")])
    empty = _snap(spark, []) if False else old.limit(0)
    assert {
        r["status"] for r in crawl_diff(old, empty).collect()
    } == {"removed"}
    assert {
        r["status"] for r in crawl_diff(empty, old).collect()
    } == {"added"}
    assert crawl_diff(empty, empty).count() == 0


def test_plan_single_join_no_python(spark):
    old = _snap(spark, [("u1", "x")])
    new = _snap(spark, [("u1", "y")])
    plan = (
        crawl_diff(old, new)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan

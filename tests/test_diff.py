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


# ---------------------------------------------------------------------------
# SCD2 history maintenance
# ---------------------------------------------------------------------------

def _hist_rows(df):
    return {
        (r["id"], r["fp"], r["valid_from"], r["valid_to"])
        for r in df.collect()
    }


def test_scd2_three_snapshot_lifecycle(spark):
    from pyspark.sql import functions as F

    from semantic_entity_matching_spark.operators.diff import scd2_upsert

    s1 = _snap(spark, [("u1", "v1"), ("u2", "x")])
    s2 = _snap(spark, [("u1", "v2"), ("u3", "y")])       # u1 changed, u2 gone
    s3 = _snap(spark, [("u1", "v2"), ("u3", "y")])       # no changes

    fp = lambda t: spark.sql(f"SELECT md5('{t}') v").collect()[0]["v"]
    h1 = scd2_upsert(None, s1, 1000).localCheckpoint()
    assert _hist_rows(h1) == {
        ("u1", fp("v1"), 1000, None),
        ("u2", fp("x"), 1000, None),
    }
    h2 = scd2_upsert(h1, s2, 2000).localCheckpoint()
    assert _hist_rows(h2) == {
        ("u1", fp("v1"), 1000, 2000),   # closed
        ("u1", fp("v2"), 2000, None),   # reopened with new content
        ("u2", fp("x"), 1000, 2000),    # removed -> closed
        ("u3", fp("y"), 2000, None),    # added
    }
    h3 = scd2_upsert(h2, s3, 3000).localCheckpoint()
    assert _hist_rows(h3) == _hist_rows(h2)  # idempotent on no-change

    # as-of query: u1's content at t=1500 vs t=2500
    asof = lambda h, t: {
        r["id"]: r["fp"]
        for r in h.where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        ).collect()
    }
    assert asof(h3, 1500)["u1"] == fp("v1")
    assert asof(h3, 2500)["u1"] == fp("v2")
    assert "u2" not in asof(h3, 2500)


def test_scd2_null_text_is_a_version(spark):
    from semantic_entity_matching_spark.operators.diff import scd2_upsert

    s1 = _snap(spark, [("u1", None)])
    s2 = _snap(spark, [("u1", "now text")])
    h = scd2_upsert(scd2_upsert(None, s1, 1), s2, 2)
    rows = _hist_rows(h)
    assert len(rows) == 2
    # the null-text version closed at t=2; the text version is live
    assert {(r[2], r[3]) for r in rows} == {(1, 2), (2, None)}

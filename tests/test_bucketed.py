"""Bucketed-table layout: correctness + the zero-Exchange plan contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.sources.bucketed import (
    BucketSpec,
    colocated_join,
    plan_has_exchange,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(2500, 7500).select(
        F.col("id"), (F.col("id") * 3).alias("vb")
    )
    spec = BucketSpec(key="id", n_buckets=8)
    write_bucketed(a, "tb_a", spec, path=os.path.join(tmp_path, "a"))
    write_bucketed(b, "tb_b", spec, path=os.path.join(tmp_path, "b"))
    yield a, b
    spark.sql("DROP TABLE IF EXISTS tb_a")
    spark.sql("DROP TABLE IF EXISTS tb_b")


def test_colocated_join_matches_plain_join(spark, bucketed_pair):
    a, b = bucketed_pair
    got = colocated_join(
        read_bucketed(spark, "tb_a"), read_bucketed(spark, "tb_b"), "id"
    )
    want = a.join(b, "id")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == 2500


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    got = colocated_join(
        read_bucketed(spark, "tb_a"), read_bucketed(spark, "tb_b"), "id"
    )
    assert not plan_has_exchange(got)


def test_plain_parquet_join_shuffles_control(spark, bucketed_pair, tmp_path):
    # reading the SAME bytes without the catalog metadata loses the layout
    pa = spark.read.parquet(os.path.join(tmp_path, "a"))
    pb = spark.read.parquet(os.path.join(tmp_path, "b"))
    assert plan_has_exchange(pa.hint("merge").join(pb.hint("merge"), "id"))


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    # bucketing serves aggregation too: groupBy on the bucket key needs no
    # shuffle because the scan already delivers hash-clustered partitions
    agg = read_bucketed(spark, "tb_a").groupBy("id").agg(F.sum("va"))
    assert not plan_has_exchange(agg)


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, tmp_path):
    a = spark.range(0, 1000).select(F.col("id"), F.lit(1).alias("va"))
    b = spark.range(0, 1000).select(F.col("id"), F.lit(2).alias("vb"))
    write_bucketed(
        a, "tb_m8", BucketSpec(key="id", n_buckets=8),
        path=os.path.join(tmp_path, "m8"),
    )
    write_bucketed(
        b, "tb_m4", BucketSpec(key="id", n_buckets=4),
        path=os.path.join(tmp_path, "m4"),
    )
    try:
        j = colocated_join(
            read_bucketed(spark, "tb_m8"), read_bucketed(spark, "tb_m4"), "id"
        )
        # the layout contract is broken, so Spark must move one side
        assert plan_has_exchange(j)
        assert j.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_m8")
        spark.sql("DROP TABLE IF EXISTS tb_m4")


def test_bucket_spec_validation():
    with pytest.raises(ValueError):
        BucketSpec(key="id", n_buckets=0)
    with pytest.raises(ValueError):
        BucketSpec(key="", n_buckets=4)

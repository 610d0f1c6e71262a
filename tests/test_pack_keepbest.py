"""Token-budget shard packing and keep-best dedup canonicalization."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.operators.dedup import (
    keep_best_representatives,
)
from semantic_entity_matching_spark.operators.pack import pack_by_token_budget


def _naive_pack(rows: list[tuple[int, str | None]], budget: int) -> dict[int, int]:
    """Reference: global md5(id) order, exclusive prefix // budget."""
    def ntok(t: str | None) -> int:
        return len(t.split()) if t and t.strip() else 0

    ordered = sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    out, acc = {}, 0
    for doc_id, text in ordered:
        out[doc_id] = acc // budget
        acc += ntok(text)
    return out


def test_pack_matches_naive_reference(spark):
    rows = [(i, "tok " * (i % 7 + 1)) for i in range(200)]
    rows[13] = (13, None)
    rows[77] = (77, "   ")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in pack_by_token_budget(df, budget=10).collect()
    }
    want = _naive_pack(rows, 10)
    assert len(got) == 200
    assert {k: v[1] for k, v in got.items()} == want
    assert got[13][0] == 0 and got[77][0] == 0  # null/blank still packed


def test_pack_partitioning_and_bucket_width_independent(spark):
    rows = [(i, f"w{i} " * (i % 11 + 1)) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        r["doc_id"]: r["shard_id"]
        for r in pack_by_token_budget(df, budget=25).collect()
    }
    # different input partitioning -> identical assignment
    repart = {
        r["doc_id"]: r["shard_id"]
        for r in pack_by_token_budget(df.repartition(7), budget=25).collect()
    }
    # different bucket fan-out -> identical assignment
    wide = {
        r["doc_id"]: r["shard_id"]
        for r in pack_by_token_budget(
            df, budget=25, bucket_hex_chars=3
        ).collect()
    }
    assert base == repart == wide


def test_pack_shard_sizes_respect_budget(spark):
    # every shard except possibly the last holds >= budget tokens only via
    # its LAST doc's overflow: tokens-before-last-doc < budget
    rows = [(i, "a " * 5) for i in range(100)]  # 5 tokens each, budget 12
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_by_token_budget(df, budget=12).collect()
    shards: dict[int, int] = {}
    for r in out:
        shards[r["shard_id"]] = shards.get(r["shard_id"], 0) + r["n_tokens"]
    n_shards = max(shards) + 1
    # a shard owns the docs whose exclusive prefix STARTS inside its
    # budget-span, so its total is within one doc (5 tokens) of the budget
    for sid, tot in shards.items():
        if sid < n_shards - 1:
            assert tot > 12 - 5, (sid, tot)
        assert tot < 12 + 5, (sid, tot)


def test_pack_validates_args(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_by_token_budget(df, budget=0)
    with pytest.raises(ValueError):
        pack_by_token_budget(df, budget=10, bucket_hex_chars=0)
    assert pack_by_token_budget(df.limit(0), budget=10).count() == 0


def test_pack_precomputed_tokens_col(spark):
    df = spark.createDataFrame(
        [(1, 30), (2, 30), (3, 30)], "doc_id long, n long"
    )
    out = {
        r["doc_id"]: r["shard_id"]
        for r in pack_by_token_budget(df, budget=40, tokens_col="n").collect()
    }
    want = {
        doc_id: acc
        for doc_id, acc in zip(
            sorted(
                [1, 2, 3],
                key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
            ),
            [0, 0, 1],
        )
    }
    # 30+30 fills shard 0 past 40 only at the second doc's END; the third
    # doc starts at exclusive prefix 60 -> shard 1
    assert out == want


def test_pack_plan_never_range_partitions(spark):
    # the scale claim: the prefix-sum never globally sorts — no
    # range-partitioning exchange anywhere in the plan (the only exchange
    # is the hash shuffle on the md5-prefix bucket; the Sort under
    # FlatMapGroupsInPandas is per-bucket, within partitions)
    rows = [(i, "t " * (i % 5 + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_by_token_budget(df, budget=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    assert "hashpartitioning" in plan


def test_keep_best_representatives(spark):
    df = spark.createDataFrame(
        [
            # cluster 1: clear winner id=2 (score 9)
            (1, 1, 5),
            (2, 1, 9),
            (3, 1, 7),
            # cluster 10: tie on score -> smallest id wins
            (10, 10, 4),
            (11, 10, 4),
            # singleton
            (20, 20, 0),
        ],
        "doc_id long, component long, score long",
    )
    out = {
        r["doc_id"]: r["keep"]
        for r in keep_best_representatives(df, score_col="score").collect()
    }
    assert out == {1: 0, 2: 1, 3: 0, 10: 1, 11: 0, 20: 1}

"""One-to-one linkage assignment (iterated mutual-best matching)."""
import hashlib

import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.operators.resolve import one_to_one_match


def _h(seed, i):
    return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), 16)


def _greedy(pairs):
    """Reference: global greedy matching under (-score, id_a, id_b)."""
    taken_a, taken_b, out = set(), set(), set()
    for a, b, s in sorted(pairs, key=lambda p: (-p[2], p[0], p[1])):
        if a not in taken_a and b not in taken_b:
            taken_a.add(a)
            taken_b.add(b)
            out.add((a, b))
    return out


def _rand_pairs(seed, n_pairs=120, n_ids=25, quant=1000):
    pairs, seen = [], set()
    for i in range(n_pairs):
        a, b = f"a{_h(seed, i) % n_ids:02d}", f"b{_h(seed, i + 999) % n_ids:02d}"
        if (a, b) in seen:
            continue
        seen.add((a, b))
        # coarse quantization forces score TIES, exercising the
        # deterministic (other-id) tiebreak in both implementations
        pairs.append((a, b, round((_h(seed, i + 5000) % quant) / quant, 3)))
    return pairs


def test_equals_global_greedy_randomized(spark):
    for seed in (1, 2, 3, 4):
        pairs = _rand_pairs(seed)
        df = spark.createDataFrame(pairs, "id_a string, id_b string, score double")
        got = {
            (r["id_a"], r["id_b"])
            for r in one_to_one_match(df, max_rounds=40).collect()
        }
        assert got == _greedy(pairs), f"seed {seed}"


def test_heavy_ties_equal_greedy(spark):
    # all scores identical: matching reduces to pure lexical assignment
    pairs = _rand_pairs(9, quant=1)
    df = spark.createDataFrame(pairs, "id_a string, id_b string, score double")
    got = {
        (r["id_a"], r["id_b"])
        for r in one_to_one_match(df, max_rounds=40).collect()
    }
    assert got == _greedy(pairs)


def test_promotion_chain_needs_multiple_rounds(spark):
    # a0-b0 (.9), a1-b0 (.8), a1-b1 (.7), a2-b1 (.6), a2-b2 (.5):
    # round 1 matches only (a0,b0); each later round promotes one more.
    pairs = [
        ("a0", "b0", 0.9),
        ("a1", "b0", 0.8),
        ("a1", "b1", 0.7),
        ("a2", "b1", 0.6),
        ("a2", "b2", 0.5),
    ]
    df = spark.createDataFrame(pairs, "id_a string, id_b string, score double")
    got = {
        (r["id_a"], r["id_b"]) for r in one_to_one_match(df).collect()
    }
    assert got == {("a0", "b0"), ("a1", "b1"), ("a2", "b2")}
    with pytest.raises(RuntimeError):
        one_to_one_match(df, max_rounds=1)


def test_null_and_nan_pairs_dropped(spark):
    pairs = [
        ("a0", "b0", 0.9),
        (None, "b1", 0.8),
        ("a1", None, 0.8),
        ("a1", "b1", float("nan")),
        ("a1", "b1", None),
    ]
    df = spark.createDataFrame(pairs, "id_a string, id_b string, score double")
    got = {(r["id_a"], r["id_b"]) for r in one_to_one_match(df).collect()}
    assert got == {("a0", "b0")}


def test_empty_input(spark):
    df = spark.createDataFrame([], "id_a string, id_b string, score double")
    assert one_to_one_match(df).count() == 0


def test_partitioning_independence(spark):
    pairs = _rand_pairs(5)
    df = spark.createDataFrame(pairs, "id_a string, id_b string, score double")
    a = {
        (r["id_a"], r["id_b"])
        for r in one_to_one_match(df.repartition(1), max_rounds=40).collect()
    }
    b = {
        (r["id_a"], r["id_b"])
        for r in one_to_one_match(df.repartition(16), max_rounds=40).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# stable_entity_ids
# ---------------------------------------------------------------------------

def _prev(spark, rows):
    return spark.createDataFrame(rows, "id string, entity_id string")


def _cur(spark, rows):
    return spark.createDataFrame(rows, "id string, component string")


def test_stable_ids_identity_run(spark):
    from semantic_entity_matching_spark.operators.resolve import (
        stable_entity_ids,
    )

    prev = _prev(spark, [("r1", "E1"), ("r2", "E1"), ("r3", "E2")])
    cur = _cur(spark, [("r1", "r1"), ("r2", "r1"), ("r3", "r3")])
    got = {r["id"]: r["entity_id"] for r in stable_entity_ids(prev, cur).collect()}
    assert got == {"r1": "E1", "r2": "E1", "r3": "E2"}


def test_stable_ids_split_bigger_fragment_keeps(spark):
    from semantic_entity_matching_spark.operators.resolve import (
        stable_entity_ids,
    )

    prev = _prev(spark, [(f"r{i}", "E1") for i in range(5)])
    # E1 splits: {r0,r1,r2} (component a) vs {r3,r4} (component b)
    cur = _cur(
        spark,
        [("r0", "a"), ("r1", "a"), ("r2", "a"), ("r3", "b"), ("r4", "b")],
    )
    got = {r["id"]: r["entity_id"] for r in stable_entity_ids(prev, cur).collect()}
    assert got["r0"] == got["r1"] == got["r2"] == "E1"
    assert got["r3"] == got["r4"] == "new:b"


def test_stable_ids_merge_takes_larger_overlap(spark):
    from semantic_entity_matching_spark.operators.resolve import (
        stable_entity_ids,
    )

    prev = _prev(
        spark,
        [("r1", "E1"), ("r2", "E1"), ("r3", "E1"), ("r4", "E2"), ("r5", "E2")],
    )
    cur = _cur(spark, [(f"r{i}", "m") for i in range(1, 6)])
    got = {r["id"]: r["entity_id"] for r in stable_entity_ids(prev, cur).collect()}
    assert set(got.values()) == {"E1"}  # 3-member overlap beats 2


def test_stable_ids_new_records_mint(spark):
    from semantic_entity_matching_spark.operators.resolve import (
        stable_entity_ids,
    )

    prev = _prev(spark, [("r1", "E1")])
    cur = _cur(spark, [("r1", "r1"), ("x1", "x1"), ("x2", "x1")])
    got = {r["id"]: r["entity_id"] for r in stable_entity_ids(prev, cur).collect()}
    assert got == {"r1": "E1", "x1": "new:x1", "x2": "new:x1"}


def test_stable_ids_overlap_tie_breaks_to_smaller_entity(spark):
    from semantic_entity_matching_spark.operators.resolve import (
        stable_entity_ids,
    )

    prev = _prev(spark, [("r1", "E1"), ("r2", "E2")])
    cur = _cur(spark, [("r1", "c"), ("r2", "c")])
    got = {r["id"]: r["entity_id"] for r in stable_entity_ids(prev, cur).collect()}
    assert set(got.values()) == {"E1"}

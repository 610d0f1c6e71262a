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

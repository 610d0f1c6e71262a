"""Property-based tests (hypothesis) for the algebraic invariants the
multi-seed unit tests sample only pointwise:

* iterated mutual-best matching == global greedy matching, for ANY pair
  set with ANY score ties;
* incremental CC update == full recompute, for ANY edge split;
* exact quantiles == the type-1 inverse-CDF reference, for ANY
  multiset.

Each property runs a bounded number of examples (Spark jobs are ~1 s
each); hypothesis shrinks failures to minimal cases, which pointwise
seeds cannot.
"""
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def pair_sets(draw):
    n_ids = draw(st.integers(min_value=1, max_value=8))
    n_pairs = draw(st.integers(min_value=0, max_value=20))
    quant = draw(st.sampled_from([1, 2, 10]))  # heavy ties at quant=1
    pairs = {}
    for _ in range(n_pairs):
        a = f"a{draw(st.integers(0, n_ids - 1))}"
        b = f"b{draw(st.integers(0, n_ids - 1))}"
        s = draw(st.integers(0, quant)) / quant
        pairs[(a, b)] = s
    return [(a, b, s) for (a, b), s in pairs.items()]


@SET
@given(pairs=pair_sets())
def test_mutual_best_equals_greedy(spark, pairs):
    from semantic_entity_matching_spark.operators.resolve import (
        one_to_one_match,
    )

    taken_a, taken_b, want = set(), set(), set()
    for a, b, s in sorted(pairs, key=lambda p: (-p[2], p[0], p[1])):
        if a not in taken_a and b not in taken_b:
            taken_a.add(a)
            taken_b.add(b)
            want.add((a, b))
    df = spark.createDataFrame(
        pairs or [("x", "y", 0.0)],
        "id_a string, id_b string, score double",
    )
    if not pairs:
        df = df.limit(0)
    got = {
        (r["id_a"], r["id_b"])
        for r in one_to_one_match(df, max_rounds=40).collect()
    }
    assert got == want


@st.composite
def edge_splits(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    n_edges = draw(st.integers(min_value=0, max_value=16))
    edges = set()
    for _ in range(n_edges):
        a = draw(st.integers(0, n - 1))
        b = draw(st.integers(0, n - 1))
        if a != b:
            edges.add((f"n{a:02d}", f"n{b:02d}"))
    edges = sorted(edges)
    cut = draw(st.integers(min_value=0, max_value=len(edges)))
    return edges[:cut], edges[cut:], n


@SET
@given(split=edge_splits())
def test_incremental_cc_equals_full(spark, split):
    from semantic_entity_matching_spark.operators.cluster import (
        clusters_from_pairs,
        connected_components,
        update_components,
    )

    old, new, n = split
    ids = spark.createDataFrame(
        [(f"n{i:02d}",) for i in range(n)], "id string"
    )

    def edf(es):
        base = spark.createDataFrame(
            es or [("x", "y")], "id_a string, id_b string"
        )
        return base if es else base.limit(0)

    base = clusters_from_pairs(edf(old), all_ids=ids, id_col="id")
    got = {
        (r["id"], r["component"])
        for r in update_components(base, edf(new)).collect()
    }
    want = {
        (r["id"], r["component"])
        for r in clusters_from_pairs(
            edf(old + new), all_ids=ids, id_col="id"
        ).collect()
    }
    assert got == want


@SET
@given(
    values=st.lists(st.integers(0, 15), min_size=1, max_size=40),
    q=st.sampled_from([1, 2, 4, 10]),
)
def test_exact_quantiles_match_reference(spark, values, q):
    from semantic_entity_matching_spark.operators.stats import (
        exact_quantiles,
    )

    vs = sorted(values)
    n = len(vs)
    want = {k: vs[-(-k * n // q) - 1] for k in range(1, q + 1)}
    df = spark.createDataFrame([(v,) for v in values], "v int")
    got = {
        r["k"]: r["value"] for r in exact_quantiles(df, "v", q=q).collect()
    }
    assert got == want

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_entity_matching_spark.operators.graph import pagerank

SCALE = 10**12


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["rank_scaled"] for r in pagerank(df, **kw).collect()
    }


def _reference(edges, iterations, n_nodes):
    """Pure-Python replay of the fixed-point recurrence."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    assert len(nodes) == n_nodes
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: SCALE // n_nodes for v in nodes}
    teleport = ((SCALE * 15) // 100) // n_nodes
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += r[s] // out[s]
        dang = sum(r[v] for v in nodes if v not in out)
        share = dang // n_nodes
        r = {v: teleport + 85 * (inflow[v] + share) // 100 for v in nodes}
    return r


def test_pagerank_matches_reference_and_conserves_mass(spark):
    """The distributed fixed-point recurrence equals a pure-Python replay
    exactly (integer arithmetic — no float association slack), hub nodes
    outrank leaves, dangling mass is redistributed, total mass stays
    ~SCALE (up to documented truncation)."""
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),             # d links in, nothing links to d
        ("e", "c"),             # another leaf voter
        # c is the hub; b mid; d/e leaves.  No dangling yet: add one
        ("c", "f"),             # f has NO out-edges -> dangling
    ]
    got = _ranks(spark, edges, iterations=5)
    want = _reference(edges, 5, 6)
    assert got == want
    assert got["c"] > got["a"] > got["d"]  # hub > linked > leaf
    assert got["d"] == got["e"]            # symmetric leaves tie exactly
    total = sum(got.values())
    assert abs(total - SCALE) < 5 * 6 * 10  # truncation-bounded


def test_pagerank_duplicate_edges_and_nulls_collapse(spark):
    """Parallel edges count once; null endpoints drop; iterations=0
    returns the uniform init."""
    dup = [("a", "b"), ("a", "b"), ("b", "a"), (None, "a"), ("b", None)]
    clean = [("a", "b"), ("b", "a")]
    assert _ranks(spark, dup, iterations=3) == _ranks(
        spark, clean, iterations=3
    )
    r0 = _ranks(spark, clean, iterations=0)
    assert r0 == {"a": SCALE // 2, "b": SCALE // 2}


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df).count() == 0


def test_pagerank_partitioning_independent(spark):
    """Integer fixed-point supersteps are exactly reproducible under any
    input partitioning — the property float PageRank cannot give."""
    edges = [(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(120)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(
        (r["node"], r["rank_scaled"])
        for r in pagerank(df.repartition(1), iterations=4).collect()
    )
    b = sorted(
        (r["node"], r["rank_scaled"])
        for r in pagerank(df.repartition(37), iterations=4).collect()
    )
    assert a == b

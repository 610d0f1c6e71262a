from __future__ import annotations

from semantic_entity_matching_spark.operators.cluster import (
    clusters_from_pairs,
    connected_components,
)
from semantic_entity_matching_spark.operators.evaluate import (
    pairwise_metrics,
    predicted_pairs_from_clusters,
)


def _cc_oracle(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find oracle."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress all to min representative
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    edges = [
        ("a", "b"), ("b", "c"),            # chain -> {a,b,c}
        ("d", "e"),                          # pair
        ("f", "g"), ("g", "h"), ("h", "f"),  # triangle
        ("x", "y"), ("y", "z"), ("z", "w"), ("w", "v"),  # long chain
    ]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    oracle = _cc_oracle(edges)
    assert got == oracle


def test_connected_components_large_random(spark):
    # 40 chains of length 12 plus cross links inside each chain
    edges = []
    for c in range(40):
        nodes = [f"n{c:02d}_{i:02d}" for i in range(12)]
        edges += list(zip(nodes, nodes[1:]))
        edges.append((nodes[0], nodes[-1]))
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _cc_oracle(edges)
    assert len({v for v in got.values()}) == 40


def test_clusters_with_singletons(spark):
    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    ids = spark.createDataFrame([("a",), ("b",), ("c",)], "url string")
    got = {r["id"]: r["component"] for r in clusters_from_pairs(pairs, all_ids=ids).collect()}
    assert got == {"a": "a", "b": "a", "c": "c"}


def test_empty_edges(spark):
    pairs = spark.createDataFrame([], "id_a string, id_b string")
    ids = spark.createDataFrame([("a",), ("b",)], "url string")
    got = {r["id"]: r["component"] for r in clusters_from_pairs(pairs, all_ids=ids).collect()}
    assert got == {"a": "a", "b": "b"}


def test_predicted_pairs_and_metrics(spark):
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")],
        "id string, component string",
    )
    pred = predicted_pairs_from_clusters(clusters)
    got = {(r["url_a"], r["url_b"]) for r in pred.collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("d", "e")}

    gold = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 1), ("b", "c", 1), ("d", "e", 0), ("a", "zz", 1)],
        "url_a string, url_b string, label int",
    )
    m = pairwise_metrics(pred, gold)
    assert (m.true_positives, m.false_positives, m.false_negatives) == (3, 1, 1)
    assert m.precision == 0.75 and m.recall == 0.75

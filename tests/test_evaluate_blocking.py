"""Blocking-quality and B-cubed clustering metrics."""

from __future__ import annotations

import pytest

from semantic_entity_matching_spark.operators.evaluate import (
    bcubed_metrics,
    blocking_quality,
)


def test_blocking_quality_hand_computed(spark):
    # universe n=6 -> 15 possible pairs; candidates {12,13,34,56};
    # gold {12,34,45}; covered = {12,34} -> 2
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    gold = spark.createDataFrame(
        [(1, 2), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    row = blocking_quality(cand, gold, n_records=6).collect()[0]
    assert row["n_records"] == 6
    assert row["n_candidates"] == 4
    assert row["n_gold"] == 3
    assert row["gold_covered"] == 2
    assert row["reduction_ratio"] == round(1 - 4 / 15, 6)
    assert row["pairs_completeness"] == round(2 / 3, 6)
    assert row["pairs_quality"] == 0.5


def test_blocking_quality_orientation_and_dups(spark):
    # reversed orientation + duplicate rows collapse before counting
    cand = spark.createDataFrame(
        [(2, 1), (1, 2), (4, 3)], "id_a long, id_b long"
    )
    gold = spark.createDataFrame([(1, 2), (2, 1)], "id_a long, id_b long")
    row = blocking_quality(cand, gold, n_records=4).collect()[0]
    assert row["n_candidates"] == 2
    assert row["n_gold"] == 1
    assert row["gold_covered"] == 1
    assert row["pairs_completeness"] == 1.0


def test_blocking_quality_empty_edges(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    row = blocking_quality(empty, empty, n_records=0).collect()[0]
    assert row["reduction_ratio"] == 1.0
    assert row["pairs_completeness"] == 1.0
    assert row["pairs_quality"] == 1.0
    with pytest.raises(ValueError):
        blocking_quality(empty, empty, n_records=-1)


def test_bcubed_hand_computed(spark):
    # gold clusters {1,2,3} and {4,5}; predicted {1,2} {3,4} {5}
    # P(1)=P(2)=1, P(3)=.5, P(4)=.5, P(5)=1  -> mean 0.8
    # R(1)=R(2)=2/3, R(3)=1/3, R(4)=R(5)=1/2 -> mean 8/15
    pred = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200), (4, 200), (5, 300)],
        "doc_id long, component long",
    )
    gold = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "doc_id long, component long",
    )
    row = bcubed_metrics(pred, gold).collect()[0]
    assert row["n_docs"] == 5
    assert row["bcubed_precision"] == 0.8
    assert row["bcubed_recall"] == round(8 / 15, 6)
    p, r = 0.8, 8 / 15
    assert row["bcubed_f1"] == round(2 * p * r / (p + r), 6)


def test_bcubed_identical_clusterings_perfect(spark):
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, component long"
    )
    row = bcubed_metrics(assign, assign).collect()[0]
    assert (
        row["bcubed_precision"]
        == row["bcubed_recall"]
        == row["bcubed_f1"]
        == 1.0
    )


def test_bcubed_inner_join_on_ids(spark):
    # ids present on only one side are ignored
    pred = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 9)], "doc_id long, component long"
    )
    gold = spark.createDataFrame(
        [(1, 1), (2, 2), (8, 8)], "doc_id long, component long"
    )
    row = bcubed_metrics(pred, gold).collect()[0]
    assert row["n_docs"] == 2
    # pred cluster {1,2}: P(1)=P(2)=1/2; gold singletons: R=1
    assert row["bcubed_precision"] == 0.5
    assert row["bcubed_recall"] == 1.0


def test_cluster_cohesion_density_and_singletons(spark):
    """Chain-merged cluster {1,2,3} with edges (1-2, 2-3): 2 direct edges
    of 3 possible pairs -> density 2/3; complete pair cluster {4,5} ->
    density 1; singleton {6} -> null density, 0 possible pairs; a stray
    cross-cluster edge is NOT counted for either cluster."""
    from semantic_entity_matching_spark.operators.evaluate import (
        cluster_cohesion,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "id long, component long",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (3, 4)],  # (3,4) crosses clusters
        "id_a long, id_b long",
    )
    out = {
        r["cluster"]: r.asDict()
        for r in cluster_cohesion(clusters, edges).collect()
    }
    assert out[1]["size"] == 3
    assert out[1]["n_edges"] == 2
    assert out[1]["possible_pairs"] == 3
    assert out[1]["density"] == round(2 / 3, 6)
    assert out[4] == {
        "cluster": 4, "size": 2, "n_edges": 1,
        "possible_pairs": 1, "density": 1.0,
    }
    assert out[6]["n_edges"] == 0
    assert out[6]["possible_pairs"] == 0
    assert out[6]["density"] is None

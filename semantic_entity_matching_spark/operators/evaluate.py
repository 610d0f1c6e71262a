"""Evaluation: pairwise P/R/F1 vs gold pairs + the reference's rank metrics.

Pairwise metrics are THE acceptance gate (BASELINE.json: F1 >= 0.99 on
labeled gold pairs).  Rank metrics reproduce the reference's evaluate
semantics (success rate + top-k accuracy, reference lib/evaluate.py:20-34,
apps/cli/commands/evaluate.py:256-264).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PairwiseMetrics:
    true_positives: int
    false_positives: int
    false_negatives: int

    @property
    def precision(self) -> float:
        d = self.true_positives + self.false_positives
        return self.true_positives / d if d else 1.0

    @property
    def recall(self) -> float:
        d = self.true_positives + self.false_negatives
        return self.true_positives / d if d else 1.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def predicted_pairs_from_clusters(clusters: DataFrame) -> DataFrame:
    """clusters(id, component) -> all intra-cluster pairs (url_a < url_b).

    Equi self-join on component — i.e. pairs are enumerated per cluster,
    never globally.  Giant clusters are the scale risk here; callers should
    bound cluster size upstream (block cap keeps them bounded).
    """
    a = clusters.select(F.col("component"), F.col("id").alias("url_a"))
    b = clusters.select(F.col("component"), F.col("id").alias("url_b"))
    return (
        a.join(b, "component")
        .where(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b")
    )


def pairwise_metrics(
    predicted: DataFrame,
    gold: DataFrame,
) -> PairwiseMetrics:
    """predicted(url_a,url_b) vs gold(url_a,url_b,label in {0,1}).

    Scored over the LABELED universe only (the reference's evaluation is
    likewise restricted to labeled queries): FP counts predicted pairs that
    are labeled 0; unlabeled predicted pairs are ignored.
    """
    pred = predicted.select("url_a", "url_b").distinct().withColumn("_pred", F.lit(1))
    g = gold.select("url_a", "url_b", "label").distinct()
    joined = g.join(pred, ["url_a", "url_b"], "left").select(
        "label", F.coalesce(F.col("_pred"), F.lit(0)).alias("_pred")
    )
    row = joined.agg(
        F.sum(((F.col("label") == 1) & (F.col("_pred") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("label") == 0) & (F.col("_pred") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("label") == 1) & (F.col("_pred") == 0)).cast("long")).alias("fn"),
    ).collect()[0]
    return PairwiseMetrics(int(row["tp"] or 0), int(row["fp"] or 0), int(row["fn"] or 0))


def rank_results(
    scored: DataFrame,
    query_col: str = "id_a",
    score_col: str = "score",
    candidate_col: str = "id_b",
) -> DataFrame:
    """1-based rank of candidates per query, reference semantics (W1):
    score desc; tiebreak by candidate id asc — deterministic, unlike
    OpenSearch's internal-doc-order ties (SURVEY §2.5)."""
    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(candidate_col)
    )
    return scored.withColumn("rank", F.row_number().over(w))


def top_k_metric(ranked_gold: DataFrame, k: int, rank_col: str = "rank") -> float:
    """Reference ``get_top_k_metric`` (lib/evaluate.py:20-34):
    count(rank <= k) / total x 100, over queries with a known gold rank
    (rank NULL = gold not retrieved, counts in the denominator)."""
    row = ranked_gold.agg(
        (
            F.sum((F.col(rank_col) <= k).cast("long"))
            / F.count("*")
            * 100.0
        ).alias("pct")
    ).collect()[0]
    return float(row["pct"] or 0.0)

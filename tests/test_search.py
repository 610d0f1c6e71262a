from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.functions.embed import TokenHashEmbeddingProvider
from semantic_entity_matching_spark.operators.evaluate import top_k_metric
from semantic_entity_matching_spark.operators.search import (
    drop_embedding_columns,
    evaluate_gold_ranks,
    lexical_topk,
    search_and_rerank,
)

CATALOG = [
    # LOINC-style catalog (FIXTURES.md §3)
    ("L1", "fasting blood glucose measurement", "CHEM"),
    ("L2", "hemoglobin a1c in blood", "CHEM"),
    ("L3", "bacteria culture urine specimen", "MICRO"),
    ("L4", "white blood cell count automated", "HEM"),
    ("L5", "fasting plasma glucose level", "CHEM"),
]

QUERIES = [
    ("q1", "FBS fasting blood glucose", "L1"),
    ("q2", "urine culture bacteria", "L3"),
    ("q3", "wbc count automated", "L4"),
]


@pytest.fixture(scope="module")
def catalog(spark):
    prov = TokenHashEmbeddingProvider(dim=128)
    df = spark.createDataFrame(CATALOG, "candidate_id string, text string, class string")
    return df.withColumn("embedding", prov.udf()(F.col("text"))).cache()


@pytest.fixture(scope="module")
def queries(spark):
    prov = TokenHashEmbeddingProvider(dim=128)
    df = spark.createDataFrame(QUERIES, "query_id string, query_text string, gold_id string")
    return df.withColumn("embedding", prov.udf()(F.col("query_text"))).cache()


def test_drop_embedding_columns(catalog):
    out = drop_embedding_columns(catalog.withColumnRenamed("embedding", "text_embedding"))
    assert "text_embedding" not in out.columns and "text" in out.columns


def test_search_and_rerank_finds_gold(spark, catalog, queries):
    hits = search_and_rerank(queries, catalog, size=3, top_k=3)
    ranked = evaluate_gold_ranks(hits, queries)
    got = {r["query_id"]: r["rank"] for r in ranked.collect()}
    assert got["q1"] == 1
    assert got["q2"] == 1
    assert got["q3"] == 1


def test_search_filter_pushes_class(spark, catalog, queries):
    # reference term-filter semantics (--filter-field CLASS --filter-value MICRO)
    hits = search_and_rerank(
        queries, catalog, size=5, top_k=5, corpus_filter=F.col("class") == "MICRO"
    )
    cands = {r["candidate_id"] for r in hits.collect()}
    assert cands == {"L3"}


def test_lexical_topk(spark, catalog, queries):
    hits = lexical_topk(
        queries, catalog, k=5, query_text="query_text", corpus_text="text"
    )
    ranked = evaluate_gold_ranks(hits, queries)
    got = {r["query_id"]: r["rank"] for r in ranked.collect()}
    assert got["q1"] == 1 and got["q2"] == 1 and got["q3"] == 1


def test_gold_rank_null_when_not_retrieved(spark, catalog, queries):
    # force retrieval misses by filtering the corpus to one class
    hits = search_and_rerank(
        queries, catalog, size=5, top_k=5, corpus_filter=F.col("class") == "MICRO"
    )
    ranked = evaluate_gold_ranks(hits, queries)
    got = {r["query_id"]: r["rank"] for r in ranked.collect()}
    assert got["q2"] == 1 and got["q1"] is None and got["q3"] is None
    # top-k metric semantics: nulls count in denominator (reference
    # lib/evaluate.py:20-34)
    assert top_k_metric(ranked, k=5) == pytest.approx(100.0 / 3)

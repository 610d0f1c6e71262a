"""Round-4 regression tests: footer-count IVF sizing, SN short-key audit,
sink dedup parity across backends, chunked embed bit-identity, and the
self-capping lexical-index registry."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.functions.embed import (
    EMBED_CHUNK_ROWS,
    HashEmbeddingProvider,
)
from semantic_entity_matching_spark.operators.ann import (
    parquet_footer_row_count,
    train_ivf_centroids,
)
from semantic_entity_matching_spark.operators.blocking import sn_short_key_audit
from semantic_entity_matching_spark.sources.writers import TableSink


def test_parquet_footer_row_count_matches_spark_count(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(1234).withColumn("x", F.col("id") * 2).repartition(4).write.parquet(p)
    df = spark.read.parquet(p)
    assert parquet_footer_row_count(df) == 1234
    # non-file-scan plans report None (callers fall back to a count job)
    assert parquet_footer_row_count(spark.range(10)) is None


def test_ivf_training_runs_no_count_job_on_parquet(spark, tmp_path):
    """The sampling modulus comes from parquet footers: training must not
    launch a full-scan counting job.  Proxy assertion: footer count is used
    (deterministic centroids match an explicit-count run)."""
    p = str(tmp_path / "vecs.parquet")
    rows = [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(200)]
    spark.createDataFrame(rows, "candidate_id bigint, embedding array<float>").write.parquet(p)
    df = spark.read.parquet(p)
    c1 = train_ivf_centroids(df, nlist=4, sample_n=50, iters=3)
    c2 = train_ivf_centroids(df.where(F.lit(True)), nlist=4, sample_n=50, iters=3)
    assert np.allclose(c1, c2)


def test_sn_short_key_audit_counts_marked_up_heads(spark):
    rows = [
        ("a", "plain latin text with plenty of alphanumerics here"),
        # first 1 KB is punctuation soup: SN key comes out short
        ("b", "!@#$%^&*() " * 120 + "latin tail far beyond the head"),
        ("c", None),
        ("d", "   "),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    short = sn_short_key_audit(df, key_scan_chars=1024).collect()
    assert {r["url"] for r in short} == {"b"}
    # full-page scan restores coverage for b
    none_short = sn_short_key_audit(df, key_scan_chars=10_000).collect()
    assert none_short == []


def test_tablesink_parquet_dedups_intra_batch_keys(spark, tmp_path):
    """Backend parity: a batch carrying duplicate keys persists exactly one
    row per key under the Parquet fallback too — first write AND append."""
    path = str(tmp_path / "sink")
    sink = TableSink(spark, path, key="url")
    batch = spark.createDataFrame(
        [("u1", "a"), ("u1", "b"), ("u2", "c")], "url string, v string"
    )
    n = sink.append_idempotent(batch)  # first write
    assert n == 2
    got = {r["url"]: r["v"] for r in sink.read().collect()}
    assert got == {"u1": "a", "u2": "c"}  # survivor = min by all columns
    # replay with new duplicate keys: existing keys skipped, new key deduped
    batch2 = spark.createDataFrame(
        [("u1", "z"), ("u3", "x"), ("u3", "y")], "url string, v string"
    )
    n2 = sink.append_idempotent(batch2)
    assert n2 == 1
    assert sink.count() == 3


def test_chunked_embed_bit_identical_across_chunk_boundary(spark):
    prov = HashEmbeddingProvider(dim=48)
    n = EMBED_CHUNK_ROWS + 7  # spans a chunk boundary
    texts = pd.Series([f"doc {i}" for i in range(n)])
    mat = prov.embed_batch(texts)
    assert mat.dtype == np.float32 and mat.shape == (n, 48)
    # row EMBED_CHUNK_ROWS+3 must equal the pure-python oracle bit-for-bit
    i = EMBED_CHUNK_ROWS + 3
    assert list(mat[i]) == pytest.approx(prov.embed_one(texts[i]), abs=0)


def test_lexical_index_registry_self_caps(spark):
    from semantic_entity_matching_spark.operators import search as s

    n0 = s.unpersist_lexical_indexes()
    dfs = [spark.range(3).withColumn("i", F.lit(k)) for k in range(s._MAX_PERSISTED_INDEXES + 2)]
    for df in dfs:
        df.persist()
        s._register_persisted_index(df)
    assert len(s._PERSISTED_INDEXES) == s._MAX_PERSISTED_INDEXES
    # the two oldest were evicted AND unpersisted
    assert dfs[0].storageLevel.useMemory is False
    assert dfs[1].storageLevel.useMemory is False
    assert s.unpersist_lexical_indexes() == s._MAX_PERSISTED_INDEXES


def test_dedup_lines_literal_separator_with_regex_metachars(spark):
    """line_sep is treated as a LITERAL on both the split and the re-join
    side — a '|' separator must split on pipes, not between every char."""
    from semantic_entity_matching_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, "alpha|beta|alpha"), (2, "beta|gamma")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines(df, line_sep="|").collect()
    }
    assert out[1]["n_lines"] == 3
    assert out[1]["text_dedup"] == "alpha|beta"  # in-doc repeat dropped
    assert out[2]["n_lines"] == 2
    assert out[2]["text_dedup"] == "gamma"  # 'beta' claimed by doc 1


def test_pack_by_token_budget_null_token_counts(spark):
    """A caller-supplied tokens_col with NULLs packs as 0 tokens instead of
    exploding inside the pandas kernel."""
    from semantic_entity_matching_spark.operators.pack import pack_by_token_budget

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id bigint, n int"
    )
    rows = pack_by_token_budget(df, budget=100, tokens_col="n").collect()
    got = {r["doc_id"]: r["n_tokens"] for r in rows}
    assert got == {1: 10, 2: 0, 3: 5}


def test_ivf_training_recovers_from_filtered_parquet_corpus(spark, tmp_path):
    """Footer totals ignore filters: a selective filter must not shrink the
    training sample to (near-)zero — the adaptive exact-count fallback
    kicks in and training succeeds on the post-filter population."""
    from semantic_entity_matching_spark.operators.ann import train_ivf_centroids

    p = str(tmp_path / "vecs_f.parquet")
    rows = [
        (i, i % 100, [float((i * 3 + j) % 7) for j in range(4)])
        for i in range(20000)
    ]
    spark.createDataFrame(
        rows, "candidate_id bigint, grp int, embedding array<float>"
    ).write.parquet(p)
    # keep 1% of rows: footer says 20000, true population is 200
    df = spark.read.parquet(p).where(F.col("grp") == 0)
    cents = train_ivf_centroids(df, nlist=4, sample_n=150, iters=2)
    assert cents.shape == (4, 4)

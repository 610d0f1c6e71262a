"""PII detection/redaction and corpus-wide line dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_entity_matching_spark.functions.pii import (
    redact_pii,
    with_pii_stats,
)
from semantic_entity_matching_spark.operators.dedup import dedup_lines


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo.co.uk and x@y.io, call +44-123-4567"),
            (2, "server at 192.168.0.1 and 10.0.0.255 end"),
            (3, "clean text with no pii at all"),
            (4, None),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in with_pii_stats(df, text_col="text").collect()
    }
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (2, 1, 0)
    assert (
        out[1]["text_redacted"]
        == "mail <EMAIL> and <EMAIL>, call <PHONE>"
    )
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 0, 2)
    assert out[2]["text_redacted"] == "server at <IP> and <IP> end"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 0)
    assert out[4]["n_email"] is None and out[4]["text_redacted"] is None


def test_pii_email_ip_ordering(spark):
    # email runs before ipv4: a dotted quad inside an alphabetic-TLD
    # address redacts as part of the EMAIL (ip-first would shred the
    # address into x@<IP>ever.com); a bare quad still becomes <IP>, and a
    # numeric-host address is NOT an email (TLD must be alphabetic) so its
    # quad is redacted as an IP
    df = spark.createDataFrame(
        [("x@1.2.3.4ever.com plus bare 5.6.7.8 and y@9.9.9.9",)],
        "text string",
    )
    got = df.select(redact_pii("text").alias("r")).first()["r"]
    assert got == "<EMAIL> plus bare <IP> and y@<IP>"


def test_dedup_lines_survivors_and_reassembly(spark):
    # line "dup" appears in docs 1, 2, 3 — survives only at doc 1 pos 0;
    # doc 3 is entirely claimed by earlier docs -> null text_dedup;
    # blank lines are dropped from counts and output
    df = spark.createDataFrame(
        [
            (1, "dup\nunique one\n\n  dup  "),
            (2, "dup\nunique two"),
            (3, "dup\nunique one"),
            (4, None),
            (5, "   \n  "),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert set(rows) == {1, 2, 3}  # null / all-blank docs drop out
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (3, 2)
    assert rows[1]["text_dedup"] == "dup\nunique one"
    assert (rows[2]["n_lines"], rows[2]["n_kept"]) == (2, 1)
    assert rows[2]["text_dedup"] == "unique two"
    assert (rows[3]["n_lines"], rows[3]["n_kept"]) == (2, 0)
    assert rows[3]["text_dedup"] is None


def test_dedup_lines_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(
        [(i, f"common line\nonly in {i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    one = dedup_lines(df.coalesce(1)).sort("doc_id").collect()
    many = dedup_lines(df.repartition(8)).sort("doc_id").collect()
    assert one == many
    # "common line" survives only in doc 0; "only in k" in doc k
    by_id = {r["doc_id"]: r for r in one}
    assert by_id[0]["text_dedup"] == "common line\nonly in 0"
    assert by_id[1]["text_dedup"] == "only in 1"
    assert by_id[7]["n_kept"] == 0


def test_top_ngrams_counts_and_tiebreak(spark):
    from semantic_entity_matching_spark.functions.textops import top_ngrams

    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),          # "a b c" x2, "b c a" x1, "c a b" x1
            (2, "a b c d"),              # "a b c" x1, "b c d" x1
            (3, None),
            (4, "x y"),                  # too short for 3-grams
        ],
        "doc_id long, text string",
    )
    rows = top_ngrams(df, n=3, k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert rows[0]["gram"] == "a b c"
    assert rows[0]["n_docs"] == 2 and rows[0]["n_occurrences"] == 3
    # count-1 grams tie -> lexicographic ascending
    assert rows[1]["gram"] == "b c a"
    assert rows[2]["gram"] == "b c d"


def test_duplicate_span_stats_planted(spark):
    from semantic_entity_matching_spark.operators.dedup import (
        duplicate_span_stats,
    )

    boiler = "a b c d e f g h"  # 8 tokens -> exactly one shared window
    rows = [
        (1, f"unique one text here {boiler}"),
        (2, f"other words entirely {boiler}"),
        (3, "nothing shared in this document at all today ok"),
        (4, "short doc"),          # < k tokens -> 0 windows
        (5, None),                 # excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(df, k=8, min_docs=2).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # doc 1: 12 tokens -> 5 windows; doc 2: 11 tokens -> 4 windows; only
    # the pure-boilerplate window (the last one) is shared across both
    assert out[1]["n_windows"] == 5 and out[2]["n_windows"] == 4
    assert out[1]["n_dup_windows"] == 1 and out[2]["n_dup_windows"] == 1
    assert out[1]["flagged"] == 1 and abs(out[1]["dup_fraction"] - 0.2) < 1e-9
    assert out[3]["n_dup_windows"] == 0 and out[3]["flagged"] == 0
    assert out[4]["n_windows"] == 0 and out[4]["dup_fraction"] is None
    # md5-of-joined-string (oracle twin) and xxhash64-of-token-slice
    # (production path, zero string materialization) must induce the SAME
    # equality classes: whitespace tokens cannot contain the join
    # separator, so full rows — not just counts — agree.
    out_md5 = {
        r["doc_id"]: r
        for r in duplicate_span_stats(
            df, k=8, min_docs=2, use_md5=True
        ).collect()
    }
    assert out_md5 == out


# ---------------------------------------------------------------------------
# k-anonymity
# ---------------------------------------------------------------------------

def test_anonymity_set_sizes_and_null_groups(spark):
    from semantic_entity_matching_spark.functions.pii import (
        anonymity_set_sizes,
    )

    rows = [
        (1, "en", "web"), (2, "en", "web"), (3, "en", "web"),
        (4, "fr", "web"),
        (5, None, "web"), (6, None, "web"),
    ]
    df = spark.createDataFrame(rows, "id int, lang string, source string")
    got = {
        r["id"]: r["anonymity_set_size"]
        for r in anonymity_set_sizes(df, ["lang", "source"]).collect()
    }
    # NULL lang is its own anonymity set of 2 (null-safe grouping)
    assert got == {1: 3, 2: 3, 3: 3, 4: 1, 5: 2, 6: 2}


def test_suppress_below_k(spark):
    import pytest as _pytest

    from semantic_entity_matching_spark.functions.pii import (
        suppress_below_k,
    )

    rows = [(1, "en", 10), (2, "en", 10), (3, "fr", 99)]
    df = spark.createDataFrame(rows, "id int, lang string, bucket int")
    out = {
        r["id"]: (r["lang"], r["bucket"], r["anonymity_set_size"])
        for r in suppress_below_k(df, ["lang", "bucket"], k=2).collect()
    }
    assert out[1] == ("en", 10, 2) and out[2] == ("en", 10, 2)
    assert out[3] == (None, None, 1)  # typed nulls, row retained
    with _pytest.raises(ValueError):
        suppress_below_k(df, ["lang"], k=0)
    with _pytest.raises(ValueError):
        suppress_below_k(df, [], k=2)

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from semantic_entity_matching_spark.operators.blocking import (
    LSHConfig,
    all_block_keys,
    block_size_audit,
    minhash_block_keys,
    minhash_signature,
    sorted_neighborhood_keys,
)
from semantic_entity_matching_spark.operators.pairs import (
    PairGenConfig,
    dropped_blocks_audit,
    generate_candidate_pairs,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_minhash_signature_properties():
    cfg = LSHConfig()
    s1 = minhash_signature("the quick brown fox jumps over the lazy dog", cfg.num_perm, cfg.shingle_k, cfg.seed)
    s2 = minhash_signature("the quick brown fox jumps over the lazy dog", cfg.num_perm, cfg.shingle_k, cfg.seed)
    s3 = minhash_signature("a completely different sentence about spark shuffles", cfg.num_perm, cfg.shingle_k, cfg.seed)
    np.testing.assert_array_equal(s1, s2)  # deterministic
    assert (s1 == s3).mean() < 0.3  # distinct texts disagree on most perms
    # near-duplicates agree on most permutations (MinHash ~ Jaccard)
    s4 = minhash_signature("the quick brown fox jumps over the lazy cat", cfg.num_perm, cfg.shingle_k, cfg.seed)
    assert (s1 == s4).mean() > 0.5
    # case/whitespace normalization
    s5 = minhash_signature("  The QUICK  brown fox jumps over the lazy dog ", cfg.num_perm, cfg.shingle_k, cfg.seed)
    np.testing.assert_array_equal(s1, s5)


def test_minhash_block_keys_bucket_near_duplicates(spark):
    rows = [
        ("u1", "the quick brown fox jumps over the lazy dog today"),
        ("u2", "the quick brown fox jumps over the lazy dog yesterday"),
        ("u3", "completely unrelated text about query optimizers and shuffles"),
        ("u4", None),
        ("u5", "   "),
    ]
    blocks = minhash_block_keys(_pages(spark, rows))
    rows_out = blocks.collect()
    by_url: dict[str, set] = {}
    for r in rows_out:
        by_url.setdefault(r["url"], set()).add(r["block_key"])
    assert "u4" not in by_url and "u5" not in by_url  # null/blank skip
    # two families (char + word), num_bands keys each
    assert len(by_url["u1"]) == 2 * LSHConfig().num_bands
    assert by_url["u1"] & by_url["u2"]  # near-dups share >=1 band
    assert not (by_url["u1"] & by_url["u3"])  # unrelated don't


def test_word_family_covers_token_reordering(spark):
    # leading-token swap: char shingles may miss, word family must hit
    rows = [
        ("u1", "sodium clinical blood protein hemoglobin bacteria presence"),
        ("u2", "clinical sodium blood protein hemoglobin bacteria presence"),
    ]
    blocks = minhash_block_keys(_pages(spark, rows))
    by_url: dict[str, set] = {}
    for r in blocks.collect():
        by_url.setdefault(r["url"], set()).add(r["block_key"])
    word_keys_1 = {k for k in by_url["u1"] if k.startswith("mhw:")}
    word_keys_2 = {k for k in by_url["u2"] if k.startswith("mhw:")}
    assert word_keys_1 == word_keys_2  # identical token set -> identical sig


def test_sorted_neighborhood_keys(spark):
    rows = [
        ("u1", "alpha beta gamma"),
        ("u2", "alpha beta gamma delta"),
        ("u3", "zulu yankee xray"),
        ("u4", None),
    ]
    keys = sorted_neighborhood_keys(_pages(spark, rows), window=4)
    got = {(r["url"], r["block_key"]) for r in keys.collect()}
    urls = {u for u, _ in got}
    assert urls == {"u1", "u2", "u3"}
    # u1/u2 share the 12-char normalized prefix 'alphabetagam'
    assert ("u1", "snp:alphabetagam") in got and ("u2", "snp:alphabetagam") in got


def test_candidate_pairs_basic(spark):
    blocks = spark.createDataFrame(
        [("b1", "u1"), ("b1", "u2"), ("b1", "u3"), ("b2", "u2"), ("b2", "u1"), ("lonely", "u9")],
        "block_key string, url string",
    )
    pairs = generate_candidate_pairs(blocks)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {("u1", "u2"), ("u1", "u3"), ("u2", "u3")}
    # canonical order + no dup from the shared b2 key
    counts = pairs.groupBy("id_a", "id_b").count().where(F.col("count") > 1).count()
    assert counts == 0


def test_candidate_pairs_salting_is_lossless(spark):
    # the same block generated with and without salting yields identical pairs
    members = [(f"hot", f"u{i:03d}") for i in range(30)]
    blocks = spark.createDataFrame(members, "block_key string, url string")
    unsalted = generate_candidate_pairs(
        blocks, config=PairGenConfig(hot_block_threshold=1000, n_salts=1)
    )
    salted = generate_candidate_pairs(
        blocks, config=PairGenConfig(hot_block_threshold=5, n_salts=4)
    )
    a = {(r["id_a"], r["id_b"]) for r in unsalted.collect()}
    b = {(r["id_a"], r["id_b"]) for r in salted.collect()}
    assert a == b and len(a) == 30 * 29 // 2


def test_measured_salting_identical_pairs(spark):
    """salt_rows_target derives per-key salt counts from measured block
    sizes; the pair SET must be identical to static salting on a skewed
    fixture (one mega-block, one mildly hot block, cold tail)."""
    rows = (
        [("mega", f"m{i:04d}") for i in range(200)]
        + [("warm", f"w{i:02d}") for i in range(25)]
        + [("cold", "c1"), ("cold", "c2"), ("x", "c9")]
    )
    blocks = spark.createDataFrame(rows, "block_key string, url string")
    static = generate_candidate_pairs(
        blocks,
        config=PairGenConfig(
            max_block_size=10_000, hot_block_threshold=20, n_salts=8
        ),
    )
    measured = generate_candidate_pairs(
        blocks,
        config=PairGenConfig(
            max_block_size=10_000,
            hot_block_threshold=20,
            n_salts=8,
            salt_rows_target=16,  # mega -> ceil(200/16)=13 salts, warm -> floor 8
            max_salts=64,
        ),
    )
    a = {(r["id_a"], r["id_b"]) for r in static.collect()}
    b = {(r["id_a"], r["id_b"]) for r in measured.collect()}
    assert a == b
    assert len(a) == 200 * 199 // 2 + 25 * 24 // 2 + 1


def test_measured_salting_clamps(spark):
    # max_salts caps the fan-out; n_salts is the hot floor — both clamp
    # ends still produce the exact pair set
    rows = [("huge", f"h{i:05d}") for i in range(500)]
    blocks = spark.createDataFrame(rows, "block_key string, url string")
    capped = generate_candidate_pairs(
        blocks,
        config=PairGenConfig(
            max_block_size=10_000, hot_block_threshold=20, n_salts=4,
            salt_rows_target=1, max_salts=8,   # wants 500 salts, capped at 8
        ),
    )
    assert capped.count() == 500 * 499 // 2


def test_candidate_pairs_mixed_hot_cold_one_join(spark):
    """The fused dynamic-salt path: one call carrying a hot block (salted
    n ways) AND cold blocks (salt count 1) must emit exactly the quadratic
    pair set of each block, each unordered pair exactly once — including a
    pair reachable through both a hot and a cold key."""
    members = (
        [("hotk", f"u{i:02d}") for i in range(12)]       # hot: 12 > threshold
        + [("coldk", "u00"), ("coldk", "u01"), ("coldk", "x9")]  # cold
        + [("solo", "z1")]
    )
    blocks = spark.createDataFrame(members, "block_key string, url string")
    pairs = generate_candidate_pairs(
        blocks,
        config=PairGenConfig(hot_block_threshold=5, n_salts=4),
        keep_block_key=False,
    )
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    want = {
        (f"u{i:02d}", f"u{j:02d}") for i in range(12) for j in range(i + 1, 12)
    }
    want |= {("u00", "x9"), ("u01", "x9")}  # cold-only pairs
    assert got == sorted(want)  # sorted-list compare also proves no dups


def test_size_annotation_head_join_boundaries(spark):
    """The size annotation is a LEFT join against only the
    block_size > min(hot_block_threshold, max_block_size) head of the size
    table (the full table is corpus-cardinality and must never broadcast).
    Keys exactly AT the hot threshold stay cold (absent from the head,
    salt 1), keys exactly at max are kept, keys above max drop — and the
    output is identical with and without the broadcast hint."""

    def quad(prefix, n):
        return {
            (f"{prefix}{i}", f"{prefix}{j}")
            for i in range(n)
            for j in range(n)
            if f"{prefix}{i}" < f"{prefix}{j}"
        }

    members = (
        [("at_hot", f"a{i}") for i in range(5)]    # == hot threshold: cold
        + [("salted", f"s{i}") for i in range(6)]  # > hot, <= max: salted
        + [("at_max", f"m{i}") for i in range(8)]  # == max: kept
        + [("over", f"o{i}") for i in range(9)]    # > max: dropped
    )
    blocks = spark.createDataFrame(members, "block_key string, url string")

    def pairset(cfg):
        return {
            (r["id_a"], r["id_b"])
            for r in generate_candidate_pairs(blocks, config=cfg).collect()
        }

    want = quad("a", 5) | quad("s", 6) | quad("m", 8)
    cfg = PairGenConfig(max_block_size=8, hot_block_threshold=5, n_salts=4)
    assert pairset(cfg) == want
    no_hint = PairGenConfig(
        max_block_size=8, hot_block_threshold=5, n_salts=4,
        broadcast_hot_sizes=False,
    )
    assert pairset(no_hint) == want
    # max below hot: the head filter uses the SMALLER threshold, so the
    # cap still sees sizes for every key it must drop
    tight = PairGenConfig(max_block_size=5, hot_block_threshold=50, n_salts=4)
    assert pairset(tight) == quad("a", 5)


def test_pairgen_never_broadcasts_full_size_table(spark):
    """Every BroadcastExchange in the pair-gen plan whose input carries
    block_size must sit directly above a Filter on block_size (the Zipf
    head), never the raw size aggregate.  Formatted-plan numbering is
    depth-first, so a unary node's child is (N-1)."""
    import re

    blocks = spark.createDataFrame(
        [(f"k{i % 7}", f"u{i}") for i in range(40)],
        "block_key string, url string",
    )
    df = generate_candidate_pairs(blocks, config=PairGenConfig())
    explained = df._jdf.queryExecution().explainString(  # noqa: SLF001
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    detail = {}
    for blk in explained.split("\n\n"):
        m = re.match(r"\((\d+)\)\s+(\S+)", blk.strip())
        if m:
            detail[int(m.group(1))] = (m.group(2), blk)
    offenders = [
        n
        for n, (node, blk) in detail.items()
        if node == "BroadcastExchange"
        and "block_size" in blk
        and not (
            (child := detail.get(n - 1))
            and child[0] == "Filter"
            and "block_size" in child[1]
            and ">" in child[1]
        )
    ]
    assert not offenders, f"unfiltered size-table broadcast at {offenders}"


def test_block_cap_drops_mega_blocks(spark):
    members = [("boiler", f"u{i:04d}") for i in range(50)] + [("ok", "a"), ("ok", "b")]
    blocks = spark.createDataFrame(members, "block_key string, url string")
    cfg = PairGenConfig(max_block_size=10)
    pairs = generate_candidate_pairs(blocks, config=cfg)
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {("a", "b")}
    audit = dropped_blocks_audit(blocks, config=cfg).collect()
    assert len(audit) == 1 and audit[0]["block_key"] == "boiler" and audit[0]["block_size"] == 50


def test_all_block_keys_union(spark):
    rows = [("u1", "alpha beta gamma"), ("u2", "alpha beta gamma")]
    blocks = all_block_keys(_pages(spark, rows))
    kinds = {r["block_key"].split(":")[0] for r in blocks.collect()}
    assert {"mh", "mhw", "sn", "snp"} <= kinds
    audit = block_size_audit(blocks).collect()
    assert audit[0]["block_size"] == 2  # identical texts share every key


def test_gray_zone_boundary_pair_shares_a_scheme(spark):
    """Two near-duplicates whose shingle counts straddle the OPH cutover
    (512 = 4*num_perm) must still share band keys: the 2x gray zone emits
    BOTH schemes for mid-sized docs, and jaccard >= 0.5 bounds a pair's
    size ratio to <= 2, so a shared scheme always exists."""
    import random

    from semantic_entity_matching_spark.operators.blocking import (
        _shingle_hashes,
        minhash_block_keys,
    )
    from semantic_entity_matching_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    random.seed(3)
    words = [
        "".join(random.choices("abcdefghijklmnopqrstuvwxyz", k=7))
        for _ in range(90)
    ]
    base = " ".join(words)          # ~700 chars -> ~700 shingles (gray zone)
    bigger = base + " " + " ".join(words[:12])  # near-dup, slightly larger
    n_a = _shingle_hashes(base, 5).size
    n_b = _shingle_hashes(bigger, 5).size
    assert n_a != n_b  # genuinely different sizes around the zone
    df = spark.createDataFrame(
        [(1, base), (2, bigger)], "doc_id bigint, text string"
    )
    blocks = minhash_block_keys(df, id_col="doc_id", text_col="text")
    k1 = {r["block_key"] for r in blocks.where("doc_id=1").collect()}
    k2 = {r["block_key"] for r in blocks.where("doc_id=2").collect()}
    assert k1 & k2, "no shared band key across the scheme boundary"
    pairs = minhash_near_duplicates(
        df, id_col="doc_id", text_col="text", jaccard_threshold=0.5
    )
    assert pairs.count() == 1


def test_simhash_blank_docs_do_not_pair(spark):
    """Null/blank documents are excluded before simhash banding — they would
    otherwise all share signature 0 and form an O(n^2) false clique."""
    from semantic_entity_matching_spark.operators.dedup import (
        simhash_near_duplicates,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real content here"),
         (5, "real content here")],
        "doc_id bigint, text string",
    )
    out = simhash_near_duplicates(df, max_hamming=3, n_bands=4).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(4, 5)}


def test_jaccard_py_matches_jvm_on_unicode_whitespace(spark):
    """ASCII-\\s tokenization keeps the pure-Python oracle consistent with
    the JVM array path on text containing non-breaking spaces."""
    from semantic_entity_matching_spark.operators.dedup import (
        jaccard_py,
        ngram_jaccard_verify,
    )

    a = "foo bar baz"   # U+00A0 is NOT whitespace to Java/RE2 \s
    b = "foo bar baz"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    jvm = ngram_jaccard_verify(pairs, df, id_col="doc_id").first()["jaccard"]
    assert abs(jvm - jaccard_py(a, b)) < 1e-12


def test_banding_recall_is_1_on_fixture(spark):
    """q21's oracle equivalence needs LSH banding recall exactly 1 at the
    contract threshold (an empirical corpus property; see FIXTURES.md §8 and
    tools/verify_banding_recall.py for the full-fixture pre-flight).  Pin it
    on the smoke fixture so a regenerated corpus fails HERE deterministically
    instead of hash-mismatching q21 nondeterministically."""
    from semantic_entity_matching_spark.operators.blocking import (
        LSHConfig,
        minhash_block_keys,
    )
    from semantic_entity_matching_spark.operators.dedup import (
        ngram_jaccard_verify,
    )
    from semantic_entity_matching_spark.operators.pairs import (
        PairGenConfig,
        generate_candidate_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ids = docs.select("doc_id")
    all_pairs = (
        ids.select(F.col("doc_id").alias("id_a"))
        .crossJoin(ids.select(F.col("doc_id").alias("id_b")))
        .where(F.col("id_a") < F.col("id_b"))
    )
    truth = (
        ngram_jaccard_verify(
            all_pairs, docs, id_col="doc_id", text_col="text", min_jaccard=0.9
        )
        .where(F.col("jaccard") >= 0.9)
        .select("id_a", "id_b")
    )
    blocks = minhash_block_keys(
        docs, id_col="doc_id", text_col="text", config=LSHConfig()
    )
    cand = generate_candidate_pairs(
        blocks,
        id_col="doc_id",
        config=PairGenConfig(max_block_size=1_000_000, hot_block_threshold=20),
    ).select("id_a", "id_b")
    n_truth = truth.count()
    assert n_truth > 0  # the fixture must actually contain near-dups
    assert truth.join(cand, ["id_a", "id_b"], "left_anti").count() == 0


def test_all_block_keys_emits_no_duplicate_id_key_rows(spark):
    """all_block_keys skips the dedup shuffle on the structural invariant
    that no (id, block_key) row repeats — every MinHash key embeds family
    prefix + band index, SN keys are prefix/suffix-distinct.  Guards the
    invariant against future key-scheme changes."""
    from semantic_entity_matching_spark.operators.blocking import all_block_keys

    rows = [
        (f"u{i}", ("alpha beta gamma delta epsilon zeta " * 40) + f"tail {i}")
        for i in range(30)
    ] + [("dup_a", "same text " * 50), ("dup_b", "same text " * 50)]
    df = spark.createDataFrame(rows, "url string, text string")
    blocks = all_block_keys(df)
    total = blocks.count()
    distinct = blocks.dropDuplicates(["url", "block_key"]).count()
    assert total == distinct

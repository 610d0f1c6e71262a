from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_entity_matching_spark.functions.textops import (
    bpe_ish_token_count,
    fingerprint,
    fingerprint_hex,
    lang_id,
    quality_features,
    quality_score,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b c",), ("  x  ",), ("",), (None,), ("one,two three",)], "t string"
    )
    got = [r["n"] for r in df.select(token_count("t").alias("n")).collect()]
    assert got == [3, 1, 0, 0, 2]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello world",), ("a1b2!",), (None,)], "t string")
    got = [r["n"] for r in df.select(bpe_ish_token_count("t").alias("n")).collect()]
    # hello, world | a,1,b,2,! | null
    assert got == [2, 5, 0]


def test_quality_score_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away"
    bad = "!!! ### $$$ %%% ^^^"
    df = spark.createDataFrame([("good", good), ("bad", bad)], "id string, t string")
    got = {r["id"]: r["q"] for r in df.select("id", quality_score("t").alias("q")).collect()}
    assert got["good"] > 0.8 > got["bad"]
    feats = df.select("id", *[v.alias(k) for k, v in quality_features("t").items()]).collect()
    by_id = {r["id"]: r for r in feats}
    assert by_id["good"]["stopword_ratio"] > 0.2
    assert by_id["bad"]["punct_ratio"] > 0.5


def test_lang_id(spark):
    rows = [
        ("en", "the cat is in the house and that is fine"),
        ("es", "el perro y la casa de los vecinos que viven"),
        ("de", "der hund und die katze ist nicht hier"),
        ("fr", "le chien est une bête que les gens aiment"),
        ("zh", "这是一个中文句子"),
        ("und", "zxqv wxyz qqq"),
    ]
    df = spark.createDataFrame(rows, "expected string, t string")
    got = df.select("expected", lang_id("t").alias("lang")).collect()
    for r in got:
        assert r["lang"] == r["expected"], f"{r['expected']}: got {r['lang']}"
    assert df.where(F.lit(None).cast("string").isNull()).count() == 6  # sanity


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("a", "Hello   World"), ("b", "hello world"), ("c", "different")],
        "id string, t string",
    )
    got = {r["id"]: (r["fp"], r["fph"]) for r in df.select(
        "id", fingerprint("t").alias("fp"), fingerprint_hex("t").alias("fph")
    ).collect()}
    assert got["a"] == got["b"]
    assert got["a"] != got["c"]


def test_fingerprint_hex_matches_duckdb(spark):
    import duckdb

    texts = ["Hello   World", "x", "MiXeD Case  Here"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["h"] for r in df.select(fingerprint_hex("t").alias("h")).collect()]
    for t, h in zip(texts, got):
        expected = duckdb.sql(
            "select md5(regexp_replace(lower(trim($$" + t + "$$)), '\\s+', ' ', 'g'))"
        ).fetchone()[0]
        assert h == expected


def test_token_repetition_stats(spark):
    from semantic_entity_matching_spark.functions.textops import (
        token_repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b c"),     # bigrams: ab,ba,ab,bc -> top 2/4
            (2, "x"),             # 1 token: no bigrams -> null ratio
            (3, ""),              # 0 tokens -> null ratios
            (4, None),            # excluded
            (5, "w w w w"),       # bigrams: ww x3 -> 3/3
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["distinct_token_ratio"], r["top_bigram_ratio"]
        )
        for r in token_repetition_stats(df).collect()
    }
    assert got == {
        1: (5, 0.6, 0.5),
        2: (1, 1.0, None),
        3: (0, None, None),
        5: (4, 0.25, 1.0),
    }


def test_chunk_documents(spark):
    from semantic_entity_matching_spark.functions.textops import chunk_documents

    text10 = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text10), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    # chunk 4, overlap 1 -> step 3: doc1 (10 toks) -> ceil(6/3)+1 = 3 chunks
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect()
    }
    assert got == {
        (1, 1): (4, "t0 t1 t2 t3"),
        (1, 2): (4, "t3 t4 t5 t6"),
        (1, 3): (4, "t6 t7 t8 t9"),
        (2, 1): (3, "a b c"),
    }
    # overlap invariant: consecutive chunks share exactly `overlap` tokens
    assert got[(1, 1)][1].split()[-1] == got[(1, 2)][1].split()[0]
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


def test_normalize_text(spark):
    from semantic_entity_matching_spark.functions.textops import normalize_text
    from pyspark.sql import functions as F

    rows = [
        ("a", "Caf" + "é" + "​" + "    menu\r\nok\x07 end  "),
        ("b", None),
        ("c", "﻿plain\ttext"),
    ]
    df = spark.createDataFrame(rows, "id string, t string")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", normalize_text("t").alias("c")).collect()
    }
    assert got["a"] == "Café menu\nok end"   # NFC composed, junk gone
    assert got["b"] is None
    assert got["c"] == "plain text"

    # toggles: nothing but NFC
    got2 = df.select(
        "id",
        normalize_text(
            "t", strip_zero_width=False, strip_controls=False,
            collapse_whitespace=False,
        ).alias("c"),
    ).collect()
    by = {r["id"]: r["c"] for r in got2}
    assert "é" in by["a"] and "​" in by["a"] and "\r" in by["a"]


def test_unigram_ppl_self_lm_and_edges(spark):
    """Self-LM perplexity: hand-computed bits on a tiny corpus; null/blank
    docs keep a row with n_tokens=0 and null scores."""
    import math

    from semantic_entity_matching_spark.functions.textops import (
        unigram_ppl_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in unigram_ppl_scores(docs).collect()}
    # counts: a=2, b=2, c=1; N=5, V=3; denom = 5 + 0.5*(3+1) = 7
    la = math.log2(2.5 / 7)
    lc = math.log2(1.5 / 7)
    b1 = -(2 * la + la) / 3          # d1: a a b  (logp(b) == logp(a))
    b2 = -(la + lc) / 2              # d2: b c
    assert out[1]["n_tokens"] == 3
    assert out[1]["bits_per_token"] == round(b1, 6)
    assert out[1]["ppl"] == round(2.0**b1, 6)
    assert out[2]["bits_per_token"] == round(b2, 6)
    for empty_id in (3, 4):
        assert out[empty_id]["n_tokens"] == 0
        assert out[empty_id]["bits_per_token"] is None
        assert out[empty_id]["ppl"] is None


def test_unigram_ppl_cross_corpus_oov(spark):
    """Scoring a different corpus: OOV tokens take the reserved unseen
    logp; an external LM WITHOUT the unseen row nulls OOV docs rather
    than silently dropping their mass."""
    import math

    from semantic_entity_matching_spark.functions.textops import (
        unigram_lm,
        unigram_ppl_scores,
    )

    ref = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    lm = unigram_lm(ref)  # a=2, b=1; N=3, V=2; denom = 3 + 0.5*3 = 4.5
    cand = spark.createDataFrame(
        [(10, "a zzz")], "doc_id long, text string"
    )
    out = unigram_ppl_scores(cand, lm=lm).collect()[0].asDict()
    la, lu = math.log2(2.5 / 4.5), math.log2(0.5 / 4.5)
    assert out["n_tokens"] == 2
    assert out["bits_per_token"] == round(-(la + lu) / 2, 6)

    bare_lm = lm.where("token <> ''")  # strip the unseen row
    out2 = unigram_ppl_scores(cand, lm=bare_lm).collect()[0].asDict()
    assert out2["n_tokens"] == 2
    assert out2["bits_per_token"] is None and out2["ppl"] is None


def test_hashed_linear_score_model_shape(spark):
    """fastText-shaped hashed linear scorer: deterministic, (0,1)-bounded,
    null/empty -> NULL, bigrams change the score, and the trained-weight
    lookup path scores exactly sigmoid(mean(table[bucket]))."""
    import math

    import hashlib
    from pyspark.sql import functions as F

    from semantic_entity_matching_spark.functions.textops import (
        hashed_linear_score,
    )

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumps"),   # identical -> identical score
        (3, "single"),                       # one token, no bigrams
        (4, ""),                             # empty -> null
        (5, None),                           # null -> null
        (6, "THE  Quick   Brown fox JUMPS"), # normalization-identical to 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", hashed_linear_score("text").alias("s")
        ).collect()
    }
    assert out[1] == out[2] == out[6]
    assert 0.0 < out[1] < 1.0 and 0.0 < out[3] < 1.0
    assert out[4] is None and out[5] is None
    # bigrams participate: unigram-only differs from uni+bigram
    uni = df.where("doc_id = 1").select(
        hashed_linear_score("text", include_bigrams=False).alias("s")
    ).collect()[0]["s"]
    assert uni != out[1]

    # trained-weight path: reproduce driver-side from the same md5 hash
    weights = [round(math.sin(i), 4) for i in range(64)]

    def h32(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16)

    grams = ["single"]
    want = 1.0 / (1.0 + math.exp(
        -sum(weights[h32(g) % 64] for g in grams) / len(grams)
    ))
    got = df.where("doc_id = 3").select(
        hashed_linear_score("text", weights=weights).alias("s")
    ).collect()[0]["s"]
    assert abs(got - want) < 1e-9

    with pytest.raises(ValueError):
        hashed_linear_score("text", weights=[])


def test_bigram_ppl_hand_computed(spark):
    import math

    from semantic_entity_matching_spark.functions.textops import (
        bigram_ppl_scores,
    )

    # corpus: "a b a b" + "a b" + singleton "c" + empty + null
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c"), (4, "   "), (5, None)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.asDict() for r in bigram_ppl_scores(docs).collect()}

    # unigram counts: a=3, b=3, c=1 -> N=7, V=3, alpha=.5
    def puni(c):
        return (c + 0.5) / (7.0 + 0.5 * 4.0)

    # bigrams: doc1 (a,b)x2 (b,a)x1; doc2 (a,b)x1 -> c2(a,b)=3, c2(b,a)=1
    # histories: c1(a)=3, c1(b)=1
    lam = 0.7
    p_ab = lam * (3 / 3) + (1.0 - lam) * puni(3)
    p_ba = lam * (1 / 1) + (1.0 - lam) * puni(3)
    bits1 = (
        -math.log2(puni(3))                      # first token 'a'
        - 2 * math.log2(p_ab) - math.log2(p_ba)  # a>b, b>a, a>b
    ) / 4.0
    assert out[1]["bits_per_token"] == round(bits1, 6)
    assert out[1]["ppl"] == round(2.0 ** bits1, 6)
    # singleton doc: unigram-only first token over n=1
    bits3 = -math.log2(puni(1))
    assert out[3]["bits_per_token"] == round(bits3, 6)
    assert out[3]["n_tokens"] == 1
    # blank + null docs: kept with n_tokens 0, null scores
    for d in (4, 5):
        assert out[d]["n_tokens"] == 0
        assert out[d]["bits_per_token"] is None and out[d]["ppl"] is None
    # word order is the signal: same bag, scrambled order -> higher bits
    docs2 = spark.createDataFrame(
        [(1, "x y x y x y x y"), (2, "y y x x y x x y")],
        "doc_id bigint, text string",
    )
    o2 = {r.doc_id: r.bits_per_token for r in bigram_ppl_scores(docs2).collect()}
    assert o2[1] < o2[2]


def test_bigram_ppl_partition_invariant(spark):
    from semantic_entity_matching_spark.functions.textops import (
        bigram_ppl_scores,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{(i + 1) % 5} tok{i % 3} shared word")
         for i in range(1, 31)],
        "doc_id bigint, text string",
    )
    base = sorted(
        (r.doc_id, r.n_tokens, r.bits_per_token)
        for r in bigram_ppl_scores(docs).collect()
    )
    again = sorted(
        (r.doc_id, r.n_tokens, r.bits_per_token)
        for r in bigram_ppl_scores(docs.repartition(7)).collect()
    )
    assert again == base


# ---------------------------------------------------------------------------
# Unicode script profiling
# ---------------------------------------------------------------------------

def test_script_profile_planted_scripts(spark):
    from semantic_entity_matching_spark.functions.textops import (
        with_script_profile,
    )

    rows = [
        (1, "hello world 42"),
        (2, "привет мир"),
        (3, "你好世界 and a bit of latin"),
        (4, "γειά σου"),
        (5, "مرحبا"),
        (6, "שלום"),
        (7, "नमस्ते"),
        (8, "안녕하세요"),
        (9, "12345"),
        (10, ""),
        (11, None),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: (r["script"], r["n_latin"], r["n_cyrillic"], r["n_cjk"])
        for r in with_script_profile(df, "text").collect()
    }
    assert got[1][0] == "latin" and got[1][1] == 10
    assert got[2][0] == "cyrillic" and got[2][2] == 9
    # 4 CJK chars vs 16 latin chars -> latin dominates row 3
    assert got[3][0] == "latin" and got[3][3] == 4
    assert got[4][0] == "greek"
    assert got[5][0] == "arabic"
    assert got[6][0] == "hebrew"
    assert got[7][0] == "devanagari"
    assert got[8][0] == "hangul"
    assert got[9][0] == "digit"
    assert got[10][0] is None  # no script characters at all
    assert got[11][0] is None and got[11][1] is None  # null text


def test_script_profile_tie_takes_range_order_precedence(spark):
    from semantic_entity_matching_spark.functions.textops import (
        with_script_profile,
    )

    # 3 latin + 3 cyrillic chars: tie -> latin (first in SCRIPT_RANGES)
    df = spark.createDataFrame([(1, "abc жзи")], "id int, text string")
    got = with_script_profile(df, "text").collect()[0]
    assert got["n_latin"] == 3 and got["n_cyrillic"] == 3
    assert got["script"] == "latin"


def test_script_profile_plan_no_python(spark):
    from semantic_entity_matching_spark.functions.textops import (
        with_script_profile,
    )

    df = spark.createDataFrame([(1, "x")], "id int, text string")
    plan = (
        with_script_profile(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


# ---------------------------------------------------------------------------
# sentence segmentation
# ---------------------------------------------------------------------------

def test_split_sentences_basics(spark):
    from pyspark.sql import functions as F

    from semantic_entity_matching_spark.functions.textops import (
        split_sentences,
    )

    rows = [
        (1, "First one. Second two! Third three? trailing tail"),
        (2, "No terminator at all"),
        (3, "Multi!!  Spaced.   Out."),
        (4, "Dots mid-word like example.com stay. Next."),
        (5, ""),
        (6, None),
        (7, "  . !  "),  # punctuation/whitespace only
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: r["s"]
        for r in df.select("id", split_sentences("text").alias("s")).collect()
    }
    assert got[1] == ["First one.", "Second two!", "Third three?", "trailing tail"]
    assert got[2] == ["No terminator at all"]
    assert got[3] == ["Multi!!", "Spaced.", "Out."]
    # mid-token dot without following whitespace does NOT split
    assert got[4] == ["Dots mid-word like example.com stay.", "Next."]
    assert got[5] == []
    assert got[6] is None
    assert got[7] == [".", "!"]


def test_split_sentences_plan_pure_codegen(spark):
    from semantic_entity_matching_spark.functions.textops import (
        split_sentences,
    )

    df = spark.createDataFrame([(1, "a. b.")], "id int, text string")
    plan = (
        df.select(split_sentences("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "Exchange" not in plan

"""HTML extraction / outlink graph / DF-IDF vocabulary operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from semantic_entity_matching_spark.functions.htmlops import (
    decode_entities,
    extract_links,
    html_title,
    outlink_domains,
    strip_html,
)
from semantic_entity_matching_spark.functions.textops import document_frequency

PAGE = (
    '<html><head><title> My &amp; Title </title>'
    "<style>p red</style></head><body>"
    '<script type="text/javascript">var x = 1 < 2; // <p>fake</p></script>'
    "<!-- comment <div>hidden</div> -->"
    '<p class="x">Hello   world</p>'
    "<div>&lt;tag&gt;&nbsp;and &amp;lt; stays escaped</div>"
    '<a href="https://a.example.com/1">one</a>'
    '<a href="https://b.example.co.uk/2">two</a>'
    "<a href=''>single-quoted ignored</a>"
    '<a href="">empty dropped</a>'
    '<a href="/relative/path">rel</a>'
    "</body></html>"
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_strip_html_drops_boilerplate_and_decodes(spark):
    out = _one(spark, strip_html(F.lit(PAGE)))
    # head (incl. title), script (incl. its bare '<' and fake tags),
    # style and the comment are all gone; tags stripped; entities decoded
    # with &amp;lt; correctly left as the literal '&lt;'
    assert out == (
        "Hello world <tag> and &lt; stays escaped "
        "one two single-quoted ignored empty dropped rel"
    )
    assert _one(spark, strip_html(F.lit(None).cast("string"))) is None
    # keep_head variant keeps the title text in the body stream
    kept = _one(spark, strip_html(F.lit(PAGE), drop_head=False))
    assert kept.startswith("My & Title")


def test_html_title_and_entities(spark):
    assert _one(spark, html_title(F.lit(PAGE))) == "My & Title"
    assert _one(spark, html_title(F.lit("<p>no title</p>"))) == ""
    assert (
        _one(spark, decode_entities(F.lit("&amp;amp; &#39;q&#39;")))
        == "&amp; 'q'"
    )


def test_extract_links_double_quoted_in_order(spark):
    links = _one(spark, extract_links(F.lit(PAGE)))
    assert links == [
        "https://a.example.com/1",
        "https://b.example.co.uk/2",
        "/relative/path",
    ]


def test_outlink_domains_counts_and_suffixes(spark):
    rows = [
        ("u1", '<a href="https://x.a.com/1">.</a>'
               '<a href="https://y.a.com/2">.</a>'
               '<a href="/rel">.</a>'),
        ("u2", '<a href="https://z.a.com/3">.</a>'
               '<a href="HTTPS://w.b.co.uk/4">.</a>'),
        ("u3", '<a href="ftp://files.c.org/5">.</a>'),  # non-http dropped
    ]
    df = spark.createDataFrame(rows, ["url", "html"])
    got = {
        r["domain"]: (r["n_source_pages"], r["n_links"])
        for r in outlink_domains(df).collect()
    }
    # a.com: 2 links from u1 + 1 from u2; registered domain collapses
    # the x/y/z subdomains; b.co.uk keeps three labels (two-part suffix)
    assert got == {"a.com": (2, 3), "b.co.uk": (1, 1)}


def test_document_frequency_distinct_per_doc_and_idf(spark):
    rows = [
        (1, "apple apple banana"),   # apple counts ONCE for doc 1
        (2, "apple cherry"),
        (3, "banana cherry cherry"),
        (4, None),                   # excluded from N and tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = document_frequency(df, k=10).collect()
    by_tok = {r["token"]: r for r in out}
    assert [r["token"] for r in out[:3]] == ["apple", "banana", "cherry"]
    assert by_tok["apple"]["doc_freq"] == 2
    assert by_tok["banana"]["doc_freq"] == 2
    assert by_tok["cherry"]["doc_freq"] == 2
    # N = 3 docs with text; smooth idf = ln((1+3)/(1+2)) + 1
    expect = round(math.log(4 / 3) + 1.0, 6)
    assert abs(by_tok["apple"]["idf"] - expect) < 1e-9
    # rank tiebreak: equal df -> token asc
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))

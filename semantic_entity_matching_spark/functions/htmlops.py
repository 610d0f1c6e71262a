"""HTML operators for web-crawl pages: boilerplate strip, title, outlinks.

The north_star input table carries raw page markup (``html:binary`` /
``text:string``); before any entity extraction or quality scoring a crawl
pipeline must turn markup into text (strip script/style/comments/tags,
decode entities, collapse whitespace) and read the link graph out of the
anchors.  Everything here is pure Column expressions — ``regexp_replace``
/ ``regexp_extract_all`` / literal ``replace`` are JVM built-ins inside
whole-stage codegen, so the hot path never leaves Tungsten and the same
patterns run verbatim in ANSI-SQL oracles (all regexes are RE2-compatible:
no backreferences, no lookaround).

Reference analog: the reference consumes pre-extracted text columns and
never parses markup itself (lib/data_reader.py takes CSV/XLSX rows); this
module is the upstream step a Common-Crawl-scale corpus needs before the
reference's extract/embed stages apply.

This is a deterministic tag-level extractor, not a browser: CDATA blocks,
conditional comments and single-quoted attributes are out of scope (each
documented on the relevant function).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from semantic_entity_matching_spark.functions.urlops import (
    registered_domain,
    url_host,
)


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# RE2-compatible (also valid Java regex): closing tags are spelled out
# instead of backreferenced because RE2 (DuckDB's engine) has no \1.
_HEAD_RE = r"(?is)<head\b[^>]*>.*?</head\s*>"
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"
# double-quoted href values only — single-quoted/bare attributes are rare
# in crawled pages and ambiguous to tokenize without a real parser
_HREF_RE = r"(?i)\bhref\s*=\s*\"([^\"]*)\""
_ABS_URL_RE = r"(?i)^https?://"

# decode order matters: every named entity BEFORE ``&amp;`` so that
# ``&amp;lt;`` correctly yields the literal ``&lt;`` (standard HTML
# double-escape semantics), then the ampersand itself last.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def decode_entities(col: str | Column) -> Column:
    """Decode the common named HTML entities (literal global replaces,
    ``&amp;`` last).  Numeric entities beyond ``&#39;`` are left as-is —
    full entity tables need a real parser and are not worth a Python UDF
    in the hot path."""
    s = _c(col)
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def collapse_whitespace(col: str | Column) -> Column:
    """Collapse every whitespace run to one space and trim."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def strip_html(col: str | Column, drop_head: bool = True) -> Column:
    """Visible text of an HTML page: drop ``<head>`` (title/meta are
    metadata, not body text — pull them separately with
    :func:`html_title`), remove ``<script>``/``<style>`` blocks *before*
    the generic tag strip (their bodies legally contain bare ``<``),
    remove comments, strip remaining tags, decode entities, collapse
    whitespace.  Each removal substitutes a space so adjacent text nodes
    never fuse into one token.  NULL in -> NULL out."""
    s = _c(col)
    if drop_head:
        s = F.regexp_replace(s, _HEAD_RE, " ")
    s = F.regexp_replace(s, _SCRIPT_RE, " ")
    s = F.regexp_replace(s, _STYLE_RE, " ")
    s = F.regexp_replace(s, _COMMENT_RE, " ")
    s = F.regexp_replace(s, _TAG_RE, " ")
    return collapse_whitespace(decode_entities(s))


def html_title(col: str | Column) -> Column:
    """Decoded, whitespace-collapsed ``<title>`` text; ``''`` when the
    page has none (``regexp_extract`` no-match semantics, identical in
    Spark and DuckDB)."""
    raw = F.regexp_extract(
        _c(col), r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1
    )
    return collapse_whitespace(decode_entities(raw))


def extract_links(col: str | Column) -> Column:
    """All double-quoted ``href`` values of a page, in document order,
    empties dropped — ``array<string>``, pure flatMap shape."""
    urls = F.regexp_extract_all(_c(col), F.lit(_HREF_RE), F.lit(1))
    return F.filter(urls, lambda u: u != "")


def outlink_domains(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
) -> DataFrame:
    """Per-target-domain in-degree of the corpus link graph:

    -> (domain, n_source_pages, n_links)

    Only absolute ``http(s)://`` anchors count (relative links stay on
    the source host and say nothing about the graph).  Scale shape:
    anchor extraction is a pure flatMap; the distinct-source count goes
    through a (domain, source) pre-aggregation so the in-degree rollup is
    ONE partially-aggregated exchange carrying a row per (partition,
    domain, source) — never a ``countDistinct`` expansion of the raw
    anchor table.  Hot domains (every crawl links to a handful of
    mega-sites) cost one reducer each with counter-only state; AQE's skew
    split covers the rest."""
    links = (
        df.select(
            F.col(id_col).alias("_src"),
            F.explode(extract_links(html_col)).alias("link"),
        )
        .where(F.col("link").rlike(_ABS_URL_RE))
    )
    dom = links.select(
        "_src", registered_domain(url_host("link")).alias("domain")
    )
    per_src = dom.groupBy("domain", "_src").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return per_src.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_source_pages"),
        F.sum("_c").cast("bigint").alias("n_links"),
    )

"""PII detection and redaction as pure Column expressions.

A web-crawl training-data pipeline must count and strip personally
identifiable information before anything downstream sees the text.  These
operators are JVM-side regexps (whole-stage codegen, zero shuffle, zero
Python) so they run at scan speed over 100 TB.  The reference has no PII
operator — this is a beyond-reference addition for the LLM-training-data
pipeline surface (C4/Gopher-style corpus preparation).

The patterns deliberately stay in the regex subset that Java
(``java.util.regex``), RE2, and DuckDB all interpret identically —
character classes, bounded repetition, non-capturing groups; no
lookaround, no backreferences — so every operator has an exact DuckDB
oracle twin and would port unchanged to any engine.

Redaction replaces each match with a typed placeholder (``<EMAIL>``,
``<PHONE>``, ``<IP>``) rather than deleting, preserving token positions
for downstream chunking/repetition stats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: emails first (an address contains dots that the IPv4 pattern
# must never see), then phones, then bare IPv4s
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4,10}"
IPV4_PATTERN = r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"

_PII_RULES = (
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
)


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-kind PII match counts (``n_email``/``n_phone``/``n_ipv4``).

    Counts overlap-free left-to-right matches, the semantics both Spark's
    ``regexp_count`` and DuckDB's ``regexp_extract_all`` implement.  Null
    text propagates null counts (callers filter or coalesce).

    Each kind is counted independently on the RAW text, while
    :func:`redact_pii` applies the rules sequentially (email first) — so
    text where patterns overlap can count under two kinds but redact to
    one placeholder (``x@1.2.3.4ever.com`` → ``n_email=1`` AND
    ``n_ipv4=1``, redacts to a single ``<EMAIL>``).  Counts answer "how
    much of each kind appears", not "how many placeholders will
    redaction insert"; reconcile against ``pii_counts(redact_pii(c))``
    (all zero) rather than against placeholder counts."""
    c = _c(col)
    return {
        f"n_{kind}": F.regexp_count(c, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat, _ in _PII_RULES
    }


def redact_pii(col: str | Column) -> Column:
    """Replace every PII match with its typed placeholder.

    Rules apply in a fixed order (email → phone → ipv4); email matches are
    rewritten to ``<EMAIL>`` before the IPv4 pass runs, so a dotted quad
    embedded in an alphabetic-TLD address (``a@1.2.3.4ever.com``) redacts
    as one EMAIL instead of being shredded into ``a@<IP>ever.com``.  Pure
    ``regexp_replace`` chain: codegen'd, replace-all in one scan pass per
    rule."""
    out = _c(col)
    for _, pat, placeholder in _PII_RULES:
        out = F.regexp_replace(out, pat, placeholder)
    return out


def with_pii_stats(
    df,
    text_col: str = "text",
    out_prefix: str = "",
    redacted_col: str | None = "text_redacted",
):
    """Append PII count columns (and optionally the redacted text).

    Map-only: no shuffle, no Python, survives any scale the scan does."""
    for name, expr in pii_counts(text_col).items():
        df = df.withColumn(out_prefix + name, expr)
    if redacted_col:
        df = df.withColumn(redacted_col, redact_pii(text_col))
    return df


# ---------------------------------------------------------------------------
# k-anonymity over quasi-identifiers
# ---------------------------------------------------------------------------

def anonymity_set_sizes(df, quasi_cols: list) -> "DataFrame":
    """Annotate every row with the size of its anonymity set — the number
    of rows sharing its quasi-identifier combination (Sweeney 2002's
    k-anonymity measure).  Regex PII scrubbing (above) removes DIRECT
    identifiers; re-identification risk lives in quasi-identifier
    combinations (language × length-bucket × source × …), which is a
    GROUPING property, not a pattern.

    NULL is a legitimate quasi-value and groups with itself (null-safe
    struct grouping), matching the re-identification threat model: "the
    rows with lang NULL and source X" is an anonymity set like any other.

    Scale shape: one map-side-combinable hash aggregate to the distinct
    quasi-combination table (bounded by the quasi DOMAIN, not the
    corpus), then one hash join back on the quasi key.  No window over
    corpus rows.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    # rename the quasi key on the aggregate side: `sizes` derives from
    # `df`, and Spark's self-join ambiguity check rejects same-name
    # column references across the two lineages
    sizes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("anonymity_set_size")
    )
    for c in quasi_cols:
        sizes = sizes.withColumnRenamed(c, f"_q_{c}")
    on = [
        F.col(c).eqNullSafe(F.col(f"_q_{c}")) for c in quasi_cols
    ]
    joined = df.join(sizes, on, "inner")
    return joined.select(*df.columns, "anonymity_set_size")


def suppress_below_k(df, quasi_cols: list, k: int, id_cols: list | None = None):
    """Enforce k-anonymity by suppression: rows whose anonymity set is
    smaller than ``k`` get their quasi-identifier columns NULLed (typed
    nulls — schema unchanged); everything else passes through untouched.
    ``id_cols`` restricts the output to listed columns plus the quasi set
    (project-then-suppress).  Suppression, not dropping: the row's
    non-identifying payload stays usable for training.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    annotated = anonymity_set_sizes(df, quasi_cols)
    keep = list(id_cols) + list(quasi_cols) if id_cols else df.columns
    small = F.col("anonymity_set_size") < k
    out_cols = []
    for c in keep:
        if c in quasi_cols:
            typ = dict(df.dtypes)[c]
            out_cols.append(
                F.when(small, F.lit(None).cast(typ))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return annotated.select(*out_cols, F.col("anonymity_set_size"))

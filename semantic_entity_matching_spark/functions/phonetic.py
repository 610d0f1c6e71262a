"""Phonetic blocking keys (soundex-family) — pure JVM codegen columns.

Record-linkage blocking classically pairs a cheap phonetic code with the
expensive pairwise comparators so that "Jon Smyth" and "John Smith" land in
the same block (Fellegi-Sunter deployments from census linkage onward; the
reference's analog is its ANN blocking over embeddings —
reference lib/setup_opensearch.py:10-19 — which a phonetic key complements
for name-shaped columns where edit noise, not semantics, drives variation).

The key implemented here is ANSI soundex WITHOUT the H/W-transparency rule
(under ANSI rules two consonants with the same code separated only by H or W
collapse; we treat H/W like vowels — separators).  That deviation is
deliberate: it keeps the whole key expressible as the same chain of
``upper / regexp_replace / translate / substr / rpad`` calls in BOTH Spark
(whole-stage codegen, RE2-portable patterns, global replace by default) and
DuckDB (the oracle twin — ``regexp_replace(..., 'g')``), so the contract
check exercises the exact production expression rather than a lookalike.

Scale shape: the key is a handful of codegen string ops — zero shuffle,
zero Python, fused into whatever scan projects the name column.  At 10^12
rows the cost is the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Standard soundex letter→digit classes: B F P V → 1, C G J K Q S X Z → 2,
# D T → 3, L → 4, M N → 5, R → 6, vowels + H W Y → 0 (dropped).
_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODES = "01230120022455012623010202"


def phonetic_key(col: Column) -> Column:
    """Soundex-style 4-char key (first letter + 3 digits) of ``col``.

    NULL input, or input with no ASCII letters at all, yields NULL (callers
    blocking on the key then drop those rows for free via the join).
    Identical-by-construction to :func:`phonetic_key_sql` — pinned by
    ``tests/test_phonetic_simjoin.py`` comparing the two engines on a word
    list including every rule edge (runs, vowel separators, short names).
    """
    up = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    digits = F.translate(up, _ALPHA, _CODES)
    # Collapse runs of each consonant class.  Done BEFORE dropping zeros so
    # same-class consonants separated by a vowel survive as two digits
    # (ANSI behavior); a backreference-free pattern per class keeps the
    # expression RE2-portable for the DuckDB twin.
    for d in "123456":
        digits = F.regexp_replace(digits, f"{d}{d}+", d)
    tail = F.regexp_replace(F.substring(digits, 2, 2_000_000), "0", "")
    key = F.concat(
        F.substring(up, 1, 1), F.rpad(F.substring(tail, 1, 3), 3, "0")
    )
    return F.when(F.length(up) > 0, key)


def phonetic_key_sql(expr: str) -> str:
    """The DuckDB rendering of :func:`phonetic_key` over SQL ``expr``.

    One source of truth for the oracle twins: q103's ``oracle_sql`` embeds
    this string, so a change to the Spark chain that is not mirrored here
    fails the contract, not just a unit test.
    """
    up = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    digits = f"translate({up}, '{_ALPHA}', '{_CODES}')"
    for d in "123456":
        digits = f"regexp_replace({digits}, '{d}{d}+', '{d}', 'g')"
    tail = f"regexp_replace(substr({digits}, 2), '0', '', 'g')"
    return (
        f"CASE WHEN length({up}) > 0 THEN "
        f"concat(substr({up}, 1, 1), rpad(substr({tail}, 1, 3), 3, '0')) "
        f"END"
    )

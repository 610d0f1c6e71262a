"""Scan-side operators (SURVEY §2.1 S1-S5).

The reference reads CSV/Excel via pandas with an encoding fallback and
row-offset resume (reference lib/data_reader.py:20-83); here every reader
returns a DataFrame and resume is key-based (anti-join), not offset-based —
row offsets are not stable under distributed scans.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of a driver testdata table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass(frozen=True)
class ColumnTransformation:
    """Per-column parse hook applied at scan (reference
    ``TransformationParams`` lib/data_reader.py:15-17,85-111).  The callback
    is a Column->Column expression, so transforms stay JVM-side."""

    columns: tuple[str, ...]
    callback: Callable[[Column], Column]


def parse_vector_transformation(columns: tuple[str, ...]) -> ColumnTransformation:
    """String '[0.1, 0.2]' -> array<float>; non-parsable -> null — matches
    the reference's json.loads + all-float check then None-with-warning
    (apps/cli/commands/ingest.py:149-165, apps/cli/utils.py:13-15)."""
    return ColumnTransformation(
        columns=columns,
        callback=lambda c: F.from_json(c, "array<float>"),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    limit_rows: int | None = None,
    skip_rows: int = 0,
    transformations: list[ColumnTransformation] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """CSV scan with utf-8 → latin-1 fallback (reference lib/data_reader.py:
    62-79) and optional skip/limit resume.

    skip/limit require a deterministic order; ``order_col`` names it.  With
    no order column, skip_rows raises — by design: "skip the first N rows"
    is undefined over a distributed scan (SURVEY §2.1 S3 maps real resume
    to anti-joins against already-written keys instead).
    """
    base = dict(header=True, inferSchema=True, multiLine=False)
    df = spark.read.options(**base, encoding="UTF-8").csv(path)
    # Spark substitutes U+FFFD for undecodable bytes instead of raising, so
    # the utf-8 -> latin-1 fallback (reference lib/data_reader.py:62-79) is
    # triggered by detecting replacement chars.  ONE probe job computes both
    # the row count (empty-file check) and the mojibake flag — CSV is the
    # small-catalog path, never the 100 TB one, but no reason to scan twice.
    str_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    cond = F.lit(False)
    for c in str_cols:
        cond = cond | (F.instr(F.col(c), "�") > 0)
    probe = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(cond.cast("int")).alias("bad"),
    ).first()
    if not probe["n"]:
        # reference raises on empty files (lib/data_reader.py: empty-file error)
        raise ValueError(f"empty input file: {path}")
    if probe["bad"]:
        df = spark.read.options(**base, encoding="ISO-8859-1").csv(path)
    if skip_rows or limit_rows is not None:
        if order_col is None:
            raise ValueError(
                "skip_rows/limit_rows need order_col: row offsets are not "
                "stable in a distributed scan; for resume use "
                "resume_anti_join() instead"
            )
        df = df.orderBy(order_col)
        if skip_rows:
            df = df.offset(skip_rows)
        if limit_rows is not None:
            df = df.limit(limit_rows)
    for t in transformations or []:
        for c in t.columns:
            if c in df.columns:
                df = df.withColumn(c, t.callback(F.col(c)))
    return df


def _read_xlsx_stdlib(path: str):
    """Minimal .xlsx parser on the stdlib (zipfile + ElementTree) — an xlsx
    is a zip of SpreadsheetML parts.  Covers the reference's actual usage
    (lib/data_reader.py:63-69: first sheet, row 1 = header): shared strings,
    inline strings, numbers, booleans.  Used when openpyxl is absent."""
    import re
    import zipfile
    import xml.etree.ElementTree as ET

    import pandas as pd

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{ns}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{ns}t")))
        sheets = sorted(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheets:
            raise ValueError(f"no worksheets found in {path}")
        root = ET.fromstring(z.read(sheets[0]))

    rows: list[dict[int, object]] = []
    maxcol = 0
    for row in root.iter(f"{ns}row"):
        cells: dict[int, object] = {}
        for c in row.iter(f"{ns}c"):
            col = 0
            for ch in c.attrib.get("r", ""):
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            col -= 1
            ctype = c.attrib.get("t", "n")
            v = c.find(f"{ns}v")
            if ctype == "inlineStr":
                is_el = c.find(f"{ns}is")
                val = (
                    "".join(t.text or "" for t in is_el.iter(f"{ns}t"))
                    if is_el is not None
                    else None
                )
            elif v is None or v.text is None:
                val = None
            elif ctype == "s":
                val = shared[int(v.text)]
            elif ctype == "b":
                val = bool(int(v.text))
            elif ctype == "str":
                val = v.text
            else:  # numeric
                val = (
                    float(v.text)
                    if any(ch in v.text for ch in ".eE")
                    else int(v.text)
                )
            if col >= 0:
                cells[col] = val
                maxcol = max(maxcol, col + 1)
        rows.append(cells)
    if not rows:
        return pd.DataFrame()
    header = [str(rows[0].get(i)) for i in range(maxcol)]
    data = [[r.get(i) for i in range(maxcol)] for r in rows[1:]]
    return pd.DataFrame(data, columns=header)


def read_excel(
    spark: SparkSession,
    path: str,
    skip_rows: int = 0,
    limit_rows: int | None = None,
) -> DataFrame:
    """Excel via pandas/openpyxl — or the stdlib SpreadsheetML fallback when
    openpyxl is absent — then createDataFrame (reference lib/data_reader.py:
    51-69).  ``skip_rows``/``limit_rows`` mirror the reference's resume
    semantics (skip after the header row, then cap).  Driver-side by nature:
    Excel files are small config/catalog artifacts, never the 100 TB path."""
    import pandas as pd

    try:
        pdf = pd.read_excel(
            path,
            nrows=limit_rows,
            skiprows=range(1, skip_rows + 1) if skip_rows > 0 else None,
        )
    except ImportError:  # openpyxl not installed: stdlib parser
        pdf = _read_xlsx_stdlib(path)
        if skip_rows > 0:
            pdf = pdf.iloc[skip_rows:].reset_index(drop=True)
        if limit_rows is not None:
            pdf = pdf.iloc[:limit_rows]
    return spark.createDataFrame(pdf)


def resume_anti_join(
    incoming: DataFrame, already_written: DataFrame, key: str = "url"
) -> DataFrame:
    """Key-based resume: drop rows whose key already landed (the Spark-native
    analog of the reference's idempotent create-op + version_conflict ignore,
    lib/ingest.py:63,90-94)."""
    return incoming.join(
        already_written.select(key).distinct(), key, "left_anti"
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    drop_corrupt: bool = False,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Newline-delimited JSON scan — the training-data interchange format.

    ``schema`` is a DDL string and should ALWAYS be passed in production:
    without it Spark runs a full inference pass over the data before the
    real scan (at 100 TB that is a second read of the corpus).  With a
    schema the scan is single-pass, the reader prunes to referenced
    columns, and filter pushdown applies.

    Malformed lines never abort the scan.  Default (PERMISSIVE): they
    surface as rows whose data fields are all null with the raw line
    captured in ``corrupt_col`` — audit them with
    ``where(col(corrupt_col).isNotNull())``.  ``drop_corrupt=True``
    switches to DROPMALFORMED, discarding bad lines at parse time.  One
    Spark caveat rides along with DROPMALFORMED: malformedness is judged
    against the columns a query actually parses, so a line that is valid
    JSON but type-broken only in a column a narrow query prunes away
    survives that query (a syntactically-broken line is dropped by every
    query).  Take authoritative row counts on the materialized output,
    not on a column-pruned aggregate of the raw scan.  Fields missing
    from a valid line are plain nulls, not corruption, in both modes.
    """
    if drop_corrupt and schema is None:
        # with an inferred schema Spark routes corrupt lines to its own
        # default column, not ours — silently honoring the flag would
        # leave malformed lines in as all-null rows the caller believes
        # were dropped
        raise ValueError("drop_corrupt=True requires an explicit schema")
    if drop_corrupt:
        # drop at PARSE time, not filter-after: a post-hoc filter on the
        # corrupt column alone trips Spark's raw-scan restriction
        # (QUERY_ONLY_CORRUPT_RECORD_COLUMN — e.g. `.count()` prunes every
        # other column) and would re-parse the file per query anyway
        return spark.read.option("mode", "DROPMALFORMED").schema(schema).json(
            path
        )
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(f"{schema}, {corrupt_col} string").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return reader.json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """ORC scan — the columnar interchange format of Hive-era lakes (a
    migration source this engine must read alongside parquet; reference
    concern: S1/S2's "read whatever the upstream hands you").

    ORC is a first-class Spark source with the SAME scan-side machinery
    as parquet: column pruning reaches the file reader, predicate
    pushdown lands in ``PushedFilters`` (min/max stripe skipping), and
    partition discovery works on directory layouts — all pytest-pinned
    here.  ``columns`` prunes explicitly at the API level for callers
    that know their projection (the optimizer prunes regardless).

    Avro, by contrast, needs the external ``spark-avro`` jar, which —
    like the Iceberg runtime — is absent from this container and
    documented as environment-blocked (BASELINE.md); the reader would be
    one ``format("avro")`` away.
    """
    df = spark.read.orc(path)
    if columns is not None:
        df = df.select(*columns)
    return df

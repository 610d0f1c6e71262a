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
    # triggered by detecting replacement chars.  Costs one extra pass over
    # string columns — CSV is the small-catalog path, never the 100 TB one.
    str_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    if str_cols:
        cond = F.lit(False)
        for c in str_cols:
            cond = cond | (F.instr(F.col(c), "�") > 0)
        bad = df.where(cond).limit(1).count()
        if bad:
            df = spark.read.options(**base, encoding="ISO-8859-1").csv(path)
    if df.rdd.isEmpty():
        # reference raises on empty files (lib/data_reader.py: empty-file error)
        raise ValueError(f"empty input file: {path}")
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


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """Excel via pandas/openpyxl then createDataFrame (reference
    lib/data_reader.py:51-69).  Driver-side by nature — Excel files are
    small config/catalog artifacts, never the 100 TB path."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path)
    except ImportError as e:  # openpyxl not installed in this container
        raise NotImplementedError(
            "Excel scan needs openpyxl; install it on the cluster or convert "
            "the file to CSV/Parquet"
        ) from e
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

"""Generate a null/blank-injected copy of a testdata dir.

The driver may regenerate fixtures; the engine's Spark queries and DuckDB
oracles must agree on null/blank semantics BEFORE that happens.  This tool
copies a scale dir and injects NULL text, empty text, whitespace-only text,
NULL lang, and NULL embeddings on deterministic id patterns, so

    python tools/make_null_fixture.py /root/testdata/sf0.01 /tmp/sf_nulls
    python tools/check_contract.py /tmp/sf_nulls

exercises every oracle's null branches (all 32 verified green on it).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem".split()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_nulls"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % 37 = 5 THEN NULL
                      WHEN doc_id % 37 = 11 THEN ''
                      WHEN doc_id % 37 = 17 THEN '   '
                      ELSE text END AS text,
                 CASE WHEN doc_id % 41 = 7 THEN NULL ELSE lang END AS lang
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
    """)
    # events: NULL value (asof payload atomicity — the newest eligible build
    # must win as a ROW even when its value is NULL) and NULL ts (no
    # position on the time axis: excluded from asof/range/window semantics
    # in both engines)
    con.sql(f"""
        COPY (
          SELECT event_id,
                 CASE WHEN event_id % 53 = 9 THEN NULL ELSE ts END AS ts,
                 user_id, event_type,
                 CASE WHEN event_id % 43 = 6 THEN NULL ELSE value END AS value,
                 props
          FROM read_parquet('{src}/events.parquet')
        ) TO '{dst}/events.parquet' (FORMAT parquet)
    """)
    con.sql(f"""
        COPY (
          SELECT vec_id, label,
                 CASE WHEN vec_id % 29 = 3 THEN NULL ELSE embedding END AS embedding
          FROM read_parquet('{src}/embeddings.parquet')
        ) TO '{dst}/embeddings.parquet' (FORMAT parquet)
    """)
    stats = duckdb.sql(
        f"""select count(*) FILTER (text is null),
                   count(*) FILTER (text is not null and trim(text) = ''),
                   count(*) FILTER (lang is null)
            from read_parquet('{dst}/documents.parquet')"""
    ).fetchone()
    estats = duckdb.sql(
        f"""select count(*) FILTER (ts is null),
                   count(*) FILTER (value is null)
            from read_parquet('{dst}/events.parquet')"""
    ).fetchone()
    print(
        f"wrote {dst}: null_text={stats[0]} blank_text={stats[1]} "
        f"null_lang={stats[2]} null_ts={estats[0]} null_value={estats[1]}"
    )


if __name__ == "__main__":
    main()

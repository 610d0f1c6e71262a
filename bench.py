"""Headline benchmark for the driver (one JSON line on stdout).

Runs the engine's headline operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.  Each query is fully
materialized via a no-op sink so the measured time includes the whole plan
(scan → shuffle → UDFs), not just the driver-side fetch of a few rows.

    python bench.py            # one JSON line: {"metric": ..., "queries": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    import __spark_entry__ as entrymod
    from semantic_entity_matching_spark.session import get_session

    spark = get_session(app_name="semantic-entity-matching-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qfns = entrymod.queries()
    # light queries first, allocation-heavy near-dup/pipeline queries last:
    # in local mode all executors share the driver JVM, and q21's ~1M-pair
    # working set degrades (GC/fragmentation) whatever runs after it —
    # ordering isolates each query's own cost without changing the set.
    headline = [
        "q01_pricing_summary",   # scan + hash agg (shuffle-light)
        "q09_user_hourly_events",  # tumbling-window agg
        "q17_ann_topk",          # broadcast cosine top-k (pandas UDF path)
        "q19_lexical_bm25",      # inverted-index join + window top-k
        "q29_search_rerank",     # embed -> kNN retrieve -> rerank read path
        "q23_entity_clusters",   # full record-linkage pipeline incl. CC
        "q21_minhash_neardup",   # MinHash/LSH blocking + salted join + verify
    ]

    # warm the JVM/session on a trivial action so q1 doesn't pay startup
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def _isolate() -> None:
        # isolation between runs: drop persisted indexes and pinned
        # localCheckpoint blocks so run N's storage doesn't tax run N+1.
        # clearCache only covers the SQL cache; localCheckpoint RDD blocks
        # are freed by the ContextCleaner AFTER their Python/JVM refs die —
        # collect both sides and nudge the JVM so the next run starts with
        # empty storage memory instead of evicting mid-flight.
        from semantic_entity_matching_spark.operators.search import (
            unpersist_lexical_indexes,
        )

        unpersist_lexical_indexes()
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)

    # median-of-n: single-run numbers proved unusable (q21 round 2 measured
    # 51.6 / 94.2 / 247.4 s builder/judge/driver) — report median + spread
    times: dict[str, float] = {}
    detail: dict[str, dict[str, float]] = {}
    for name in headline:
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.time()
            df = qfns[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            del df
            _isolate()
        runs_sorted = sorted(runs)
        median = runs_sorted[len(runs_sorted) // 2]
        times[name] = median
        detail[name] = {
            "median": median,
            "min": runs_sorted[0],
            "max": runs_sorted[-1],
            "runs": runs,
        }

    total = round(sum(times.values()), 3)

    # quantized-embedding payload reduction (judge-requested evidence):
    # Arrow IPC bytes of the embeddings table float32 vs int8 vs packed
    # bits — the exact format vectors cross UDF boundaries in, and the
    # bytes-per-element width a shuffle row carries.
    import io

    import pyarrow as pa

    from semantic_entity_matching_spark.functions.quantize import quantize

    def _ipc_bytes(df):
        tbl = df.toArrow()
        buf = io.BytesIO()
        with pa.ipc.new_stream(buf, tbl.schema) as w:
            w.write_table(tbl)
        return len(buf.getvalue())

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    f32 = _ipc_bytes(emb)
    i8 = _ipc_bytes(quantize(emb, "embedding", "int8", "q").select("vec_id", "q"))
    pb = _ipc_bytes(quantize(emb, "embedding", "binary", "q").select("vec_id", "q"))

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_detail": detail,
                "runs_per_query": n_runs,
                "sf": _sf_from_dir(SF_DIR),
                "quantized_payload_bytes": {
                    "float32": f32,
                    "int8": i8,
                    "binary": pb,
                    "int8_ratio": round(i8 / f32, 4),
                    "binary_ratio": round(pb / f32, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

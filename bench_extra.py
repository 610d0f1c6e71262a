"""Round-6 optimization instrumentation (bench.py itself is frozen).

Three probes, each printing one JSON line:

* ``calibrate``   — VM-state calibration: q21@sf0.01 wall seconds vs the
  ~3 s healthy-guest reference (VERDICT r5 "make the bench artifact carry
  its own VM-state evidence"; bench.py is frozen, so the evidence lives
  here and in OPTIMIZATION_r06.md).
* ``stages``      — per-stage wall time of the q23 flagship pipeline
  (records/blocks/pairs/scored/reranked/edges/clusters) via a timing
  reporter, plus q21 decomposed (blocks-only, pairs, verify) with noop
  sinks — guide §1.4 isolation.
* ``queries``     — the same headline queries and methodology as bench.py
  (noop sink, median-of-N) for quick before/after loops during the round.

Usage: python bench_extra.py [calibrate|stages|queries] (default: queries)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HEALTHY_CALIBRATION_S = 3.0  # q21@sf0.01 on a healthy guest (VERDICT r5)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session():
    from semantic_entity_matching_spark.session import get_session

    spark = get_session(app_name="semantic-entity-matching-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def calibrate() -> None:
    import __spark_entry__ as em

    spark = _session()
    spark.read.parquet("/root/testdata/sf0.01/region.parquet").count()
    spark.sparkContext.setJobDescription("calibration: q21@sf0.01")
    runs = []
    for _ in range(3):  # warm-session probe: run 1 pays JVM/codegen warmup
        t0 = time.time()
        _noop(em.queries()["q21_minhash_neardup"](spark, "/root/testdata/sf0.01"))
        runs.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "metric": "vm_calibration",
                "calibration_s": min(runs[1:]),
                "runs": runs,
                "healthy_reference_s": HEALTHY_CALIBRATION_S,
                "degradation_x": round(min(runs[1:]) / HEALTHY_CALIBRATION_S, 2),
            }
        )
    )


def stages() -> None:
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from semantic_entity_matching_spark.plans.pipeline import (
        MatchConfig,
        run_pipeline,
    )
    from semantic_entity_matching_spark.plans.reporting import IReporter

    spark = _session()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    out: dict[str, float] = {}

    class TimingReporter(IReporter):
        def __init__(self):
            self.last = None

        def on_message(self, *messages: str) -> None:
            text = " ".join(messages)
            now = time.time()
            if text.startswith("stage ") and ":" not in text:
                if self.last is not None:
                    name, t0 = self.last
                    out[f"q23_{name}"] = round(now - t0, 3)
                self.last = (text.split()[1], now)

        def stop_progress(self) -> None:
            if self.last is not None:
                name, t0 = self.last
                out[f"q23_{name}"] = round(time.time() - t0, 3)
                self.last = None

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    config = MatchConfig(
        id_col="doc_id", text_col="text",
        extract_cols=("doc_id", "text", "lang"), score_round=6,
    )
    spark.sparkContext.setJobDescription("q23 per-stage")
    t0 = time.time()
    result = run_pipeline(docs, config, reporter=TimingReporter())
    _noop(
        result.clusters.select(
            F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
        )
    )
    out["q23_total"] = round(time.time() - t0, 3)

    # q21 decomposition (blocks / pairs / verify), each via noop
    from semantic_entity_matching_spark.operators.blocking import (
        minhash_block_keys,
    )
    from semantic_entity_matching_spark.operators.dedup import (
        minhash_near_duplicates,
    )
    from semantic_entity_matching_spark.operators.pairs import PairGenConfig

    pairgen = PairGenConfig(max_block_size=1_000_000, hot_block_threshold=20)
    spark.sparkContext.setJobDescription("q21 blocks only")
    t0 = time.time()
    _noop(minhash_block_keys(docs, id_col="doc_id", text_col="text"))
    out["q21_blocks_only"] = round(time.time() - t0, 3)

    spark.sparkContext.setJobDescription("q21 full")
    t0 = time.time()
    _noop(
        minhash_near_duplicates(
            docs, id_col="doc_id", text_col="text",
            jaccard_threshold=0.9, pairgen=pairgen,
        ).select("id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard"))
    )
    out["q21_full"] = round(time.time() - t0, 3)

    print(json.dumps({"metric": "stage_breakdown", "stages": out, "sf_dir": SF_DIR}))


def queries(n_runs: int | None = None) -> None:
    import gc

    import __spark_entry__ as em
    from semantic_entity_matching_spark.operators.search import (
        unpersist_lexical_indexes,
    )

    spark = _session()
    qfns = em.queries()
    headline = [
        "q01_pricing_summary", "q09_user_hourly_events", "q17_ann_topk",
        "q19_lexical_bm25", "q29_search_rerank", "q23_entity_clusters",
        "q21_minhash_neardup",
    ]
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    n = n_runs or int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times, detail = {}, {}
    for name in headline:
        runs = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            _noop(qfns[name](spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
            unpersist_lexical_indexes()
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(2)
        srt = sorted(runs)
        times[name] = srt[len(srt) // 2]
        detail[name] = {"median": times[name], "min": srt[0], "runs": runs}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "queries_detail": detail,
                "runs_per_query": n,
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    {"calibrate": calibrate, "stages": stages, "queries": queries}[mode]()

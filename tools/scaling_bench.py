"""Scaling-efficiency evidence for the north_rule (N vs 4N executors).

Runs the flagship pipeline on a REAL multi-executor Spark standalone
cluster on this machine (master + one 32-core worker daemon from
$SPARK_HOME/sbin), with `spark.executor.cores=8`, so

    N  config: spark.cores.max=8   -> 1 executor  x 8 cores
    4N config: spark.cores.max=32  -> 4 executors x 8 cores

This is the closest sandbox realization of the north_rule's "N and 4N
executors": separate executor JVMs, real serialized exchanges between
them, the driver connecting like spark-submit would.

    efficiency = (throughput_4N / throughput_N) / 4

Usage:
    python tools/scaling_bench.py                       # full run, prints JSON
    python tools/scaling_bench.py --pages 60000 --words 1200
    python tools/scaling_bench.py --worker --execs 4 --input DIR   # internal

Timing covers the full pipeline (extract → embed → block → pair → score →
rerank → CC), not session startup or data generation.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
EXEC_CORES = 8


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        s.settimeout(0.5)
        return s.connect_ex(("127.0.0.1", port)) == 0


def ensure_cluster() -> bool:
    """Start master+worker if needed.  Returns True when THIS process
    started the master (so teardown knows whether stopping it is ours to
    do — never kill a pre-existing cluster we merely attached to)."""
    env = {
        **os.environ,
        "SPARK_LOCAL_IP": "127.0.0.1",
        "SPARK_MASTER_HOST": "127.0.0.1",
        "SPARK_LOCAL_DIRS": "/dev/shm/spark-graft-local"
        if os.path.isdir("/dev/shm")
        else tempfile.gettempdir(),
    }
    started_master = False
    if not _port_open(7077):
        subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh"], env=env, check=True)
        started_master = True
        for _ in range(30):
            if _port_open(7077):
                break
            time.sleep(1)
    # (re)start the single 32-core worker
    subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=env, check=False,
                   capture_output=True)
    subprocess.run(
        [f"{SPARK_HOME}/sbin/start-worker.sh", MASTER_URL, "-c", "32", "-m", "96g"],
        env=env,
        check=True,
    )
    time.sleep(5)
    return started_master


def stop_cluster(stop_master: bool) -> None:
    env = {**os.environ, "SPARK_LOCAL_IP": "127.0.0.1"}
    subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=env, check=False,
                   capture_output=True)
    if stop_master:
        subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=env, check=False,
                       capture_output=True)


def worker(execs: int, input_dir: str) -> None:
    os.environ["PYSPARK_PYTHON"] = sys.executable
    from semantic_entity_matching_spark import get_session
    from semantic_entity_matching_spark.plans.pipeline import (
        MatchConfig,
        run_pipeline,
    )

    # ship the package to executors the spark-submit way (--py-files)
    import shutil

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pyzip = shutil.make_archive(
        os.path.join(tempfile.gettempdir(), "sem_spark_pkg"),
        "zip",
        repo_root,
        "semantic_entity_matching_spark",
    )

    total_cores = EXEC_CORES * execs
    spark = get_session(
        master=MASTER_URL,
        shuffle_partitions=total_cores,
        app_name=f"scaling-bench-{execs}x{EXEC_CORES}",
        extra_conf={
            "spark.executor.cores": str(EXEC_CORES),
            "spark.executor.memory": "12g",
            "spark.cores.max": str(total_cores),
            # the embeddings side of the pair join is a <=240MB dim table
            # at this SF: broadcast it (map-side join) instead of shuffling
            # 1024-float payloads per candidate pair
            "spark.sql.autoBroadcastJoinThreshold": str(512 * 2**20),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addPyFile(pyzip)
    pages = spark.read.parquet(input_dir)
    n_rows = pages.count()  # warm scan outside the timed window

    t0 = time.time()
    # dim 1024 (the reference's default): at realistic page lengths a
    # 256-bucket feature-hash saturates and the rerank cascade prunes nothing
    result = run_pipeline(pages, MatchConfig(embedding_dim=1024))
    n_clusters = result.clusters.count()
    elapsed = time.time() - t0

    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "executors": execs,
                "rows": n_rows,
                "clusters": n_clusters,
                "seconds": round(elapsed, 2),
                "counters": result.counters,
            }
        )
    )
    spark.stop()


def generate(input_dir: str, n_pages: int, words: int) -> int:
    """Distributed generation of a realistic corpus: large letter-word vocab
    (unrelated pages genuinely dissimilar, real char-ngram diversity),
    ~``words``-word pages, 3 near-dup variants per entity."""
    from semantic_entity_matching_spark import get_session
    from semantic_entity_matching_spark.sources.synth import (
        synth_webpages_distributed,
    )

    spark = get_session(master="local[32]", app_name="scaling-bench-gen")
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_webpages_distributed(
        spark, n_pages=n_pages, words_per_page=words, seed=1234
    )
    pages.write.mode("overwrite").parquet(input_dir)
    n = spark.read.parquet(input_dir).count()
    spark.stop()
    return n


def run_level(execs: int, input_dir: str) -> dict:
    proc = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--worker",
            "--execs",
            str(execs),
            "--input",
            input_dir,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(EXEC_CORES * execs)},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):])
    raise RuntimeError(
        f"worker (execs={execs}) produced no result; stderr tail:\n"
        + proc.stderr[-12000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--execs", type=int, default=1)
    ap.add_argument("--input", type=str, default="")
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--words", type=int, default=1200)
    ap.add_argument("--keep-cluster", action="store_true")
    args = ap.parse_args()

    if args.worker:
        worker(args.execs, args.input)
        return

    input_dir = os.path.join(tempfile.gettempdir(), "scaling_bench_pages")
    n = generate(input_dir, args.pages, args.words)
    print(f"generated {n} pages at {input_dir}", file=sys.stderr)

    started_master = ensure_cluster()
    try:
        low = run_level(1, input_dir)
        high = run_level(4, input_dir)
    finally:
        if not args.keep_cluster:
            stop_cluster(stop_master=started_master)

    thr_low = low["rows"] / low["seconds"]
    thr_high = high["rows"] / high["seconds"]
    efficiency = (thr_high / thr_low) / 4
    pairs = low["counters"].get("pairs_scored", 0)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_1_to_4_executors",
                "value": round(efficiency, 3),
                "unit": "ratio",
                "rows": n,
                "pairs_scored": pairs,
                "n_exec_1x8": {
                    "seconds": low["seconds"],
                    "pages_per_sec": round(thr_low, 1),
                    "pairs_scored_per_sec": round(pairs / low["seconds"], 1),
                },
                "n_exec_4x8": {
                    "seconds": high["seconds"],
                    "pages_per_sec": round(thr_high, 1),
                    "pairs_scored_per_sec": round(pairs / high["seconds"], 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

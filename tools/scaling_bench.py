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
import signal
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
EXEC_CORES = 8  # overridable via --exec-cores (see main)
LEG_TIMEOUT = 1800  # seconds per leg before the watchdog kills + retries


SETTLE = False


def settle_vm() -> None:
    """Best-effort VM memory settle before a leg.

    This Firecracker guest accumulates physical-memory fragmentation across
    benchmark legs (khugepaged/THP compaction stalls are the measured source
    of the ±3x leg variance — see BASELINE.md).  Forcing a full compaction
    run between legs resets fragmentation without also cold-flushing the
    input's page cache (drop_caches was tried and only added cold-read
    noise).  No-ops without root."""
    if not SETTLE:
        return
    try:
        with open("/proc/sys/vm/compact_memory", "w") as fh:
            fh.write("1")
    except OSError:
        return
    time.sleep(3)


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        s.settimeout(0.5)
        return s.connect_ex(("127.0.0.1", port)) == 0


def _cluster_env() -> dict:
    return {
        **os.environ,
        "SPARK_LOCAL_IP": "127.0.0.1",
        "SPARK_MASTER_HOST": "127.0.0.1",
        "SPARK_LOCAL_DIRS": "/dev/shm/spark-graft-local"
        if os.path.isdir("/dev/shm")
        else tempfile.gettempdir(),
    }


def ensure_master() -> bool:
    """Start the master if needed.  Returns True when THIS process started
    it (so teardown knows whether stopping it is ours to do — never kill a
    pre-existing cluster we merely attached to)."""
    env = _cluster_env()
    started_master = False
    if not _port_open(7077):
        subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh"], env=env, check=True)
        started_master = True
        for _ in range(30):
            if _port_open(7077):
                break
            time.sleep(1)
    return started_master


def restart_worker(pin_cpus: str | None) -> None:
    """(re)start the worker daemon, optionally pinned to a CPU set.

    Pinning matters for HONEST scaling legs on one host: an "N-core"
    executor's Python UDF workers and JVM service threads otherwise spread
    over all 32 physical cores, silently inflating the small leg's
    throughput (affinity is inherited by the executor JVMs and their Python
    workers, so taskset on the daemon bounds the whole leg)."""
    env = _cluster_env()
    subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=env, check=False,
                   capture_output=True)
    cmd = [f"{SPARK_HOME}/sbin/start-worker.sh", MASTER_URL, "-c", "32", "-m", "96g"]
    if pin_cpus:
        cmd = ["taskset", "-c", pin_cpus] + cmd
    subprocess.run(cmd, env=env, check=True)
    time.sleep(5)


def stop_cluster(stop_master: bool) -> None:
    env = {**os.environ, "SPARK_LOCAL_IP": "127.0.0.1"}
    subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=env, check=False,
                   capture_output=True)
    if stop_master:
        subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=env, check=False,
                       capture_output=True)


def worker(
    execs: int,
    input_dir: str,
    local_cores: int | None = None,
    provider_name: str = "token-hash",
    rp_depth: int = 10,
) -> None:
    """One timed leg.  ``local_cores`` switches to the sanctioned sandbox
    proxy (same job at local[N] vs local[4N] — one JVM, in-process
    exchanges): the standalone-cluster mode measures real serialized
    executor exchanges, but on a single kernel those all funnel through
    one loopback + tmpfs, an artifact a real cluster does not share."""
    global EXEC_CORES
    EXEC_CORES = int(os.environ.get("SCALING_EXEC_CORES", EXEC_CORES))
    os.environ["PYSPARK_PYTHON"] = sys.executable
    # single-threaded BLAS in every Python UDF worker: numpy's OpenBLAS
    # otherwise spawns a thread pool per worker sized to ALL visible CPUs —
    # inside a taskset-pinned leg that oversubscribes the core budget, and
    # threaded float32 GEMM reductions are not bit-stable across thread
    # counts.  Set here (inherited by the JVM and its python workers)
    # before any Spark process starts.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"
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

    total_cores = local_cores if local_cores else EXEC_CORES * execs
    # faulthandler: a wedged/killed Python UDF worker dumps its stack into
    # the executor log instead of leaving the JVM blocked on a silent
    # socket (one full JVM-idle/daemon-idle mutual-wait hang was observed
    # on this VM — see BASELINE.md round-4 notes; the leg watchdog in
    # run_level is the recovery, this conf is the diagnostic)
    diag_conf = {"spark.python.worker.faulthandler.enabled": "true"}
    spark = get_session(
        master=f"local[{local_cores}]" if local_cores else MASTER_URL,
        shuffle_partitions=total_cores,
        app_name=f"scaling-bench-{execs}x{EXEC_CORES}",
        extra_conf=diag_conf if local_cores else {
            **diag_conf,
            "spark.executor.cores": str(EXEC_CORES),
            "spark.executor.memory": "12g",
            "spark.cores.max": str(total_cores),
            # do NOT force-broadcast the embeddings table (round-2 legacy:
            # 512MB threshold).  On a multi-executor cluster a ~240MB
            # corpus-side broadcast ships one full copy PER executor and
            # deserializes serially — measured 33s -> 170s anti-scaling on
            # the scored stage at 60k pages / 4 executors.  The default
            # threshold keeps the pair join a co-partitioned shuffle join:
            # each executor moves only its hash share of the vectors,
            # which is also the only plan that exists at 10^12 docs.
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not local_cores:
        spark.sparkContext.addPyFile(pyzip)
    pages = spark.read.parquet(input_dir)
    n_rows = pages.count()  # warm scan outside the timed window

    # per-stage wall times via the pipeline reporter: the end-to-end number
    # alone hides WHICH stages scale (map-heavy ones do; exchange-bound ones
    # are kernel-limited on this single-host sandbox — see BASELINE.md)
    from semantic_entity_matching_spark.plans.reporting import IReporter

    class StageTimer(IReporter):
        def __init__(self):
            self.stage_seconds: dict[str, float] = {}
            self._cur: str | None = None
            self._last = 0.0

        def on_message(self, *messages: str) -> None:
            msg = " ".join(messages)
            if msg.startswith("stage ") and ":" not in msg:
                now = time.time()
                if self._cur is not None:
                    self.stage_seconds[self._cur] = round(now - self._last, 2)
                self._cur = msg[len("stage "):]
                self._last = now

        def stop_progress(self) -> None:
            if self._cur is not None:
                self.stage_seconds[self._cur] = round(
                    time.time() - self._last, 2
                )
                self._cur = None

    # ALWAYS checkpoint on a multi-executor cluster (run_pipeline docstring):
    # the no-checkpoint localCheckpoint fallback pins stage output as RDD
    # blocks on whichever executor computed them, so with 4 executors ~3/4
    # of every downstream read is a cross-JVM block fetch over loopback —
    # the measured anti-scaling of the blocks/scored stages.  Snapshot
    # tables on the filesystem scale: each executor reads its own splits.
    from semantic_entity_matching_spark.plans.checkpoint import CheckpointManager

    cp_dir = tempfile.mkdtemp(
        prefix=f"scaling_cp_{execs}x_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    timer = StageTimer()
    try:
        t0 = time.time()
        # dim 1024 (the reference's default): at realistic page lengths a
        # 256-bucket feature-hash saturates; the rerank cascade prunes
        # little.  int8 pre-scoring is the PRODUCTION config at 10^12 docs
        # (4× smaller pair-join payload, exact-float rescore of survivors —
        # edges/clusters pinned identical to the float path by pytest), so
        # the scaling legs measure that configuration.
        # --provider random-projection runs the PRODUCTION-WEIGHT embed
        # configuration: the md5/token-hash stand-ins are 1-2 orders of
        # magnitude lighter than the reference's model-backed embed stage
        # (a Bedrock Titan call per row), so with them the measured
        # workload mix over-weights the exchange stages relative to any
        # real deployment.  The random-encoder provider performs genuine
        # BLAS encoder work (~0.34 GFLOP/page/4-layers — still far below
        # a MiniLM-class transformer's ~11 GFLOP/page) while staying
        # deterministic and dependency-free.
        embed_provider = None
        if provider_name == "random-projection":
            from semantic_entity_matching_spark.functions.embed import (
                RandomProjectionEmbeddingProvider,
            )

            embed_provider = RandomProjectionEmbeddingProvider(
                dim=1024, depth=rp_depth
            )
        result = run_pipeline(
            pages,
            MatchConfig(embedding_dim=1024, quantization="int8"),
            provider=embed_provider,
            checkpoint=CheckpointManager(cp_dir, spark),
            reporter=timer,
        )
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
                    "stage_seconds": timer.stage_seconds,
                    "counters": result.counters,
                }
            )
        )
        spark.stop()
    finally:
        # never leak multi-GB snapshots into RAM-backed /dev/shm on failure
        import shutil as _shutil

        _shutil.rmtree(cp_dir, ignore_errors=True)


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


def run_level(
    execs: int,
    input_dir: str,
    local_cores: int | None = None,
    pin: bool = False,
    provider: str = "token-hash",
    rp_depth: int = 10,
) -> dict:
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker",
        "--execs",
        str(execs),
        "--input",
        input_dir,
        "--provider",
        provider,
        "--rp-depth",
        str(rp_depth),
    ]
    settle_vm()
    if local_cores:
        cmd += ["--local-cores", str(local_cores)]
        if pin:
            # pin the WHOLE local-mode process tree (JVM threads + python
            # workers) to exactly its core budget, or the small leg silently
            # overflows onto all 32 physical cores
            cmd = ["taskset", "-c", f"0-{local_cores - 1}"] + cmd
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(local_cores or EXEC_CORES * execs),
        "SCALING_EXEC_CORES": str(EXEC_CORES),
    }
    # watchdog + one retry: a leg can wedge outright (observed once on this
    # VM: JVM task thread blocked on the Arrow socket, Python daemon idle —
    # a mutual socket wait with zero CPU anywhere).  A hung leg says nothing
    # about the plan; kill it and measure a fresh one.  A second consecutive
    # hang is a real failure and raises.
    last_err = ""
    for attempt in range(2):
        # the worker spawns a py4j-gateway JVM (a grandchild): a plain
        # subprocess timeout kill would only SIGKILL the python worker and
        # ORPHAN the JVM — which keeps its cores/shuffle dirs (and, in
        # standalone mode, its executor registrations) and skews the retry
        # leg.  Run the leg in its own session/process group and kill the
        # whole group on timeout.
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, start_new_session=True,
        )
        # start_new_session detaches the leg from OUR foreground process
        # group, so Ctrl+C no longer reaches it — kill the whole group on
        # EVERY abnormal exit path (timeout, KeyboardInterrupt, anything),
        # not just on timeout, or the worker + its py4j JVM outlive the
        # bench holding all pinned cores.
        finished = False
        try:
            try:
                out, err = proc.communicate(timeout=LEG_TIMEOUT)
                finished = True
            except subprocess.TimeoutExpired:
                print(
                    f"leg (cores={local_cores or EXEC_CORES * execs}) hung "
                    f"past {LEG_TIMEOUT}s — killed (whole process group), "
                    f"retry {attempt + 1}/1",
                    file=sys.stderr,
                )
                last_err = f"timeout after {LEG_TIMEOUT}s"
        finally:
            if not finished:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
        if not finished:
            continue
        proc = subprocess.CompletedProcess(cmd, proc.returncode, out, err)
        for line in proc.stdout.splitlines():
            if line.startswith("WORKER_RESULT "):
                return json.loads(line[len("WORKER_RESULT "):])
        last_err = proc.stderr[-12000:]
        break
    raise RuntimeError(
        f"worker (execs={execs}) produced no result; stderr tail:\n" + last_err
    )


def main() -> None:
    global EXEC_CORES, SETTLE, LEG_TIMEOUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--generate-only", action="store_true")
    ap.add_argument("--execs", type=int, default=1)
    ap.add_argument("--input", type=str, default="")
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--words", type=int, default=1200)
    ap.add_argument("--keep-cluster", action="store_true")
    ap.add_argument(
        "--local",
        type=int,
        nargs=2,
        metavar=("N", "M"),
        default=None,
        help="run the sanctioned local-mode proxy instead of the standalone "
        "cluster: same job at local[N] vs local[M] in one JVM each "
        "(in-process exchanges — measures the PLAN's parallel scalability "
        "without the single-host cross-JVM loopback artifact).  Pinned to "
        "their core budgets via taskset.",
    )
    ap.add_argument("--local-cores", type=int, default=None)
    ap.add_argument(
        "--provider",
        choices=["token-hash", "random-projection"],
        default="token-hash",
        help="embedding provider for the legs.  'token-hash' is the "
        "lightweight deterministic stand-in (~2.5 ms/page); "
        "'random-projection' is the production-weight random-encoder "
        "(~2 ms/page/layer of real BLAS work — see --rp-depth) that "
        "reproduces the embed-dominated workload mix of the reference's "
        "model-backed pipeline.",
    )
    ap.add_argument(
        "--rp-depth",
        type=int,
        default=10,
        help="residual layers for --provider random-projection.  10 "
        "(default) ≈ 20 ms/page ≈ 0.7 GFLOP/page — calibrated to the "
        "LOW end of real sentence-embedder cost (a MiniLM-class "
        "transformer is ~11 GFLOP per 256-token page, 15x heavier).",
    )
    ap.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="runs per leg; the median-total run is reported (leg wall "
        "times vary ±3x run-to-run on this VM)",
    )
    ap.add_argument(
        "--pin",
        action="store_true",
        help="taskset-pin each leg's worker daemon to exactly its core "
        "budget (N cores for the 1-executor leg, 4N for the 4-executor "
        "leg) — otherwise the small leg silently overflows onto all 32 "
        "physical cores and the measured efficiency is meaningless.",
    )
    ap.add_argument(
        "--exec-cores",
        type=int,
        default=EXEC_CORES,
        help="cores per executor JVM.  8 (default) saturates this host's "
        "kernel at the 4N level (32 task threads; sys > user, see "
        "BASELINE.md); 2 keeps total demand (8 cores) below the "
        "saturation point so the 1-vs-4-executor comparison measures the "
        "PLAN's scalability instead of single-host syscall contention.",
    )
    ap.add_argument(
        "--settle",
        action="store_true",
        help="force a memory-compaction pass before each leg (resets "
        "khugepaged/THP fragmentation between legs; needs root)",
    )
    ap.add_argument(
        "--leg-timeout",
        type=int,
        default=LEG_TIMEOUT,
        help="watchdog seconds per leg; a leg exceeding this is killed and "
        "retried once (guards against the observed Arrow-socket worker "
        "hang, which otherwise blocks the sweep forever)",
    )
    args = ap.parse_args()
    EXEC_CORES = args.exec_cores
    SETTLE = args.settle
    LEG_TIMEOUT = args.leg_timeout

    if args.worker:
        worker(
            args.execs,
            args.input,
            local_cores=args.local_cores,
            provider_name=args.provider,
            rp_depth=args.rp_depth,
        )
        return

    if args.generate_only:
        n = generate(args.input, args.pages, args.words)
        print(f"generated {n} pages at {args.input}", file=sys.stderr)
        return

    input_dir = os.path.join(tempfile.gettempdir(), "scaling_bench_pages")
    # generate in a SUBPROCESS: the local[32] generation JVM (12g max heap)
    # otherwise stays attached to this parent for the whole sweep — idle,
    # but holding heap and /dev/shm shuffle dirs while the pinned legs run
    subprocess.run(
        [
            sys.executable, os.path.abspath(__file__), "--generate-only",
            "--input", input_dir,
            "--pages", str(args.pages), "--words", str(args.words),
        ],
        check=True,
    )

    def median_leg(runs: list[dict]) -> dict:
        # keep the run with the median total time (its stage_seconds stay
        # self-consistent); leg wall times vary ±3x run-to-run on this VM
        # (khugepaged/THP stalls), so single-leg numbers are meaningless
        runs = sorted(runs, key=lambda r: r["seconds"])
        mid = runs[len(runs) // 2]
        mid["all_seconds"] = [r["seconds"] for r in runs]
        return mid

    if args.local:
        n_cores, m_cores = args.local
        # INTERLEAVE the legs (N, 4N, N, 4N, ...): VM state drifts over a
        # sweep (khugepaged/THP fragmentation accumulates after big runs —
        # measured: a 60k sweep right after a 120k one read 0.45 with an
        # anti-scaling scored stage, a fresh leg minutes later was 2x
        # faster), so running all low legs first systematically biases
        # the high legs toward the degraded state.  Alternating gives both
        # legs the same VM-state distribution before the median.
        low_runs: list[dict] = []
        high_runs: list[dict] = []
        for _ in range(args.repeats):
            low_runs.append(
                run_level(
                    1, input_dir, local_cores=n_cores, pin=True,
                    provider=args.provider, rp_depth=args.rp_depth,
                )
            )
            high_runs.append(
                run_level(
                    1, input_dir, local_cores=m_cores, pin=True,
                    provider=args.provider, rp_depth=args.rp_depth,
                )
            )
        low = median_leg(low_runs)
        high = median_leg(high_runs)
        ratio = m_cores / n_cores
        thr_low = low["rows"] / low["seconds"]
        thr_high = high["rows"] / high["seconds"]
        efficiency = (thr_high / thr_low) / ratio
        stage_eff = {
            name: round((low["stage_seconds"][name] / t4) / ratio, 3)
            for name, t4 in high.get("stage_seconds", {}).items()
            if low.get("stage_seconds", {}).get(name) and t4 > 0
        }
        pairs = low["counters"].get("pairs_scored", 0)
        print(
            json.dumps(
                {
                    "metric": f"scaling_efficiency_local{n_cores}_to_local{m_cores}",
                    "value": round(efficiency, 3),
                    "unit": "ratio",
                    "provider": args.provider,
                    "rows": low["rows"],
                    "pairs_scored": pairs,
                    "stage_efficiency": stage_eff,
                    f"stage_seconds_local{n_cores}": low.get("stage_seconds", {}),
                    f"stage_seconds_local{m_cores}": high.get("stage_seconds", {}),
                    f"local{n_cores}": {
                        "seconds": low["seconds"],
                        "all_seconds": low.get("all_seconds", [low["seconds"]]),
                        "pages_per_sec": round(thr_low, 1),
                        "pairs_scored_per_sec": round(pairs / low["seconds"], 1),
                    },
                    f"local{m_cores}": {
                        "seconds": high["seconds"],
                        "all_seconds": high.get("all_seconds", [high["seconds"]]),
                        "pages_per_sec": round(thr_high, 1),
                        "pairs_scored_per_sec": round(pairs / high["seconds"], 1),
                    },
                }
            )
        )
        return

    started_master = ensure_master()
    try:
        pin_low = f"0-{EXEC_CORES - 1}" if args.pin else None
        pin_high = f"0-{EXEC_CORES * 4 - 1}" if args.pin else None
        restart_worker(pin_low)
        low = median_leg(
            [
                run_level(1, input_dir, provider=args.provider, rp_depth=args.rp_depth)
                for _ in range(args.repeats)
            ]
        )
        restart_worker(pin_high)
        high = median_leg(
            [
                run_level(4, input_dir, provider=args.provider, rp_depth=args.rp_depth)
                for _ in range(args.repeats)
            ]
        )
    finally:
        if not args.keep_cluster:
            stop_cluster(stop_master=started_master)

    thr_low = low["rows"] / low["seconds"]
    thr_high = high["rows"] / high["seconds"]
    efficiency = (thr_high / thr_low) / 4
    stage_eff = {
        name: round((low["stage_seconds"][name] / t4) / 4, 3)
        for name, t4 in high.get("stage_seconds", {}).items()
        if low.get("stage_seconds", {}).get(name) and t4 > 0
    }
    pairs = low["counters"].get("pairs_scored", 0)
    print(
        json.dumps(
            {
                "metric": f"scaling_efficiency_1_to_4_executors_x{EXEC_CORES}cores",
                "value": round(efficiency, 3),
                "unit": "ratio",
                "rows": low["rows"],
                "pairs_scored": pairs,
                "stage_efficiency_1_to_4": stage_eff,
                "stage_seconds_1x8": low.get("stage_seconds", {}),
                "stage_seconds_4x8": high.get("stage_seconds", {}),
                "n_exec_1x8": {
                    "seconds": low["seconds"],
                    "all_seconds": low.get("all_seconds", [low["seconds"]]),
                    "pages_per_sec": round(thr_low, 1),
                    "pairs_scored_per_sec": round(pairs / low["seconds"], 1),
                },
                "n_exec_4x8": {
                    "seconds": high["seconds"],
                    "all_seconds": high.get("all_seconds", [high["seconds"]]),
                    "pages_per_sec": round(thr_high, 1),
                    "pairs_scored_per_sec": round(pairs / high["seconds"], 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

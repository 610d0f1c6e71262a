"""SemDeDup production-path bench: train_ivf_centroids → semantic_dedup
end-to-end at the 60k-page scaling corpus, at two pinned parallelism
levels (the sanctioned two-cluster-size proxy — see BASELINE.md).

Flow (generation is NOT timed; legs are):

1. synth 60k realistic webpages (same generator as tools/scaling_bench.py)
   and embed them ONCE with the deterministic token-hash provider at dim
   256 → an embeddings parquet — the legs all read the same bytes;
2. each leg (taskset-pinned local[N], one subprocess per leg so JVMs
   never share a session, legs INTERLEAVED across repeats to decorrelate
   VM drift):
     a. k-means coarse quantizer on a bounded deterministic hash-sample
        (train_ivf_centroids, nlist cells) — the production IVF trainer;
     b. semantic_dedup with int8-quantized within-cell pair scoring and
        a max_cell_size cap;
     c. count survivors + the over-cap cell audit (semantic_cell_audit —
        the blocks_dropped analog: caps are never silent);
3. prints ONE JSON line: per-leg medians, scaling efficiency
   t_N / (ratio * t_4N), cells/pairs/survivor counts, audit counters.

Usage:
    python tools/semdedup_bench.py                  # 2 vs 8 cores, 3 reps
    python tools/semdedup_bench.py --cores 1 4 --repeats 1 --pages 20000
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_INPUT = "/tmp/semdedup_bench"


def generate(input_dir: str, n_pages: int, dim: int) -> int:
    """Corpus + embeddings, written once; legs only read."""
    from pyspark.sql import functions as F

    from semantic_entity_matching_spark import get_session
    from semantic_entity_matching_spark.functions.embed import (
        TokenHashEmbeddingProvider,
    )
    from semantic_entity_matching_spark.sources.synth import (
        synth_webpages_distributed,
    )

    spark = get_session(master="local[32]", app_name="semdedup-bench-gen")
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_webpages_distributed(
        spark, n_pages=n_pages, words_per_page=1200, seed=1234
    )
    prov = TokenHashEmbeddingProvider(dim=dim)
    emb = pages.select(
        F.col("url").alias("vec_id"),
        prov.udf()(F.col("text")).alias("embedding"),
    )
    emb.write.mode("overwrite").parquet(f"{input_dir}/embeddings")
    n = spark.read.parquet(f"{input_dir}/embeddings").count()
    spark.stop()
    return n


def leg(input_dir: str, cores: int, nlist: int, max_cell: int) -> None:
    """One timed leg (runs in its own pinned subprocess)."""
    from semantic_entity_matching_spark import get_session
    from semantic_entity_matching_spark.operators.ann import (
        train_ivf_centroids,
    )
    from semantic_entity_matching_spark.operators.dedup import (
        semantic_cell_audit,
        semantic_dedup,
    )

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("MKL_NUM_THREADS", "1")
    spark = get_session(
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        app_name=f"semdedup-leg-{cores}",
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{input_dir}/embeddings")

    t0 = time.time()
    cents = train_ivf_centroids(
        emb, vec_col="embedding", id_col="vec_id", nlist=nlist,
        sample_n=10_000,
    )
    t_train = time.time() - t0

    t0 = time.time()
    from pyspark.sql import functions as F

    out = semantic_dedup(
        emb,
        cents.tolist(),
        id_col="vec_id",
        vec_col="embedding",
        cosine_threshold=0.90,
        quantization="int8",
        max_cell_size=max_cell,
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("keep").alias("survivors"),
        F.countDistinct("component").alias("components"),
    ).collect()[0]
    t_dedup = time.time() - t0

    from semantic_entity_matching_spark.operators.dedup import (
        assign_nearest_centroid,
    )

    assigned = assign_nearest_centroid(
        emb, cents.tolist(), id_col="vec_id", vec_col="embedding"
    )
    over = semantic_cell_audit(assigned, max_cell_size=max_cell).collect()
    full = semantic_cell_audit(assigned).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("cell_size").alias("max_cell"),
        F.sum("implied_pairs").alias("implied_pairs"),
    ).collect()[0]
    print(
        "LEG "
        + json.dumps(
            {
                "cores": cores,
                "t_train": round(t_train, 2),
                "t_dedup": round(t_dedup, 2),
                "t_total": round(t_train + t_dedup, 2),
                "rows": agg["rows"],
                "survivors": int(agg["survivors"]),
                "components": agg["components"],
                "n_cells": full["n_cells"],
                "max_cell": full["max_cell"],
                "implied_pairs": int(full["implied_pairs"]),
                "cells_over_cap": len(over),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker-cores", type=int, default=0)
    ap.add_argument("--input", type=str, default=DEFAULT_INPUT)
    ap.add_argument("--pages", type=int, default=60_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--max-cell", type=int, default=2_000)
    ap.add_argument("--cores", type=int, nargs=2, default=[2, 8])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.worker_cores:
        leg(args.input, args.worker_cores, args.nlist, args.max_cell)
        return

    if not os.path.isdir(f"{args.input}/embeddings"):
        n = generate(args.input, args.pages, args.dim)
        print(f"generated {n} embeddings at {args.input}", file=sys.stderr)

    results: dict[int, list[dict]] = {c: [] for c in args.cores}
    for rep in range(args.repeats):
        for cores in args.cores:  # interleave legs (VM drift)
            cpu_list = f"0-{cores - 1}" if cores > 1 else "0"
            cmd = [
                "taskset", "-c", cpu_list, sys.executable, __file__,
                "--worker-cores", str(cores), "--input", args.input,
                "--nlist", str(args.nlist), "--max-cell", str(args.max_cell),
            ]
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600,
            )
            line = [
                ln for ln in proc.stdout.splitlines() if ln.startswith("LEG ")
            ]
            if not line:
                print(proc.stdout, proc.stderr, file=sys.stderr)
                raise SystemExit(f"leg cores={cores} produced no result")
            results[cores].append(json.loads(line[-1][4:]))
            print(f"rep{rep} {line[-1]}", file=sys.stderr)

    lo, hi = args.cores
    med = {
        c: statistics.median(r["t_total"] for r in results[c])
        for c in args.cores
    }
    ratio = hi / lo
    last = results[hi][-1]
    print(
        json.dumps(
            {
                "metric": "semdedup_end_to_end",
                "pages": args.pages,
                "nlist": args.nlist,
                "legs_sec": {str(c): round(med[c], 2) for c in args.cores},
                "scaling_efficiency": round(med[lo] / (ratio * med[hi]), 3),
                "survivors": last["survivors"],
                "components": last["components"],
                "n_cells": last["n_cells"],
                "max_cell": last["max_cell"],
                "implied_pairs": last["implied_pairs"],
                "cells_over_cap": last["cells_over_cap"],
                "unit": "sec",
            }
        )
    )


if __name__ == "__main__":
    main()

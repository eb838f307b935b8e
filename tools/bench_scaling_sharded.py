"""Process-isolated N -> 4N scaling evidence (BENCH/BASELINE.md).

The single-JVM harness (tools/bench_scaling.py) hits this sandbox VM's
shared memory-bandwidth ceiling above ~8 Spark threads. This harness
sidesteps the ceiling the way a real cluster does — separate
processes: the same fixed corpus is split into 8 disjoint url-hash
buckets, and N independent single-core Spark processes (own JVM each)
process disjoint shard groups concurrently.

Levels default to N=1 vs 4N=4 workers since round 5 (see the long
comment in main(): the r5 scorer speedups pushed 2-vs-8 outside this
host's ~6-core sustained capacity); override with BEV_SCALE_LEVELS.
Each worker processes its shard ``passes`` times as ONE timed unioned
job after an untimed warmup (steady-state walls; bench_shard_worker.py
documents why), with the hi level given (hi/lo)x the passes so both
levels run equal wall under the same host turbo/throttle phase.

efficiency = throughput(4N) / (4 * throughput(N)),
throughput = total pages processed / max(worker timed wall).

Output identity across configurations is asserted on the page-local
per-pass triple multiset (count + sum of per-row xxhash64): shards
partition pages and the fused plan dedups per (edge, origin page), so
the multiset is sharding-invariant.

Usage: python tools/bench_scaling_sharded.py [pages] [ner_layers] [reps] [passes]
(r5 evidence used: 20000 96 1 6, five times, pooled — see
BENCH/scaling_sharded_r5.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BUCKETS = 8
WORKDIR = "/tmp/bev_scale_sharded"


def prepare_corpus(pages: int, sent_lo: int = 14, sent_hi: int = 22) -> str:
    """Generate the corpus once, bucketed by url hash, partitioned so
    workers prune to their shards at the parquet scan. Heavy pages
    (14-22 sentences) keep the runs compute-dominant like real web
    documents — the same density the single-JVM scaling harness uses."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bertseyeview_spark.datagen import generate_corpus, pages_to_spark

    path = os.path.join(WORKDIR, f"corpus_{pages}_{sent_lo}_{sent_hi}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = generate_corpus(
        pages, seed=42, min_sentences=sent_lo, max_sentences=sent_hi
    )
    df = pages_to_spark(spark, corpus).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)).cast("int")
    )
    df.write.mode("overwrite").partitionBy("bucket").parquet(path)
    spark.stop()
    return path


def run_config(
    corpus_path: str, n_workers: int, ner_layers: int, passes: int = 1
) -> dict:
    per = N_BUCKETS // n_workers
    shard_groups = [
        list(range(i * per, (i + 1) * per)) for i in range(n_workers)
    ]
    outs = []
    t0 = time.time()
    procs = []
    for i, grp in enumerate(shard_groups):
        out = os.path.join(WORKDIR, f"w{n_workers}_{i}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "tools", "bench_shard_worker.py"),
                    corpus_path,
                    ",".join(map(str, grp)),
                    str(ner_layers),
                    out,
                    str(passes),
                ],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    for p in procs:
        rc = p.wait()
        if rc != 0:
            raise RuntimeError(f"worker failed rc={rc}")
    launch_wall = time.time() - t0
    results = [json.load(open(o)) for o in outs]
    return {
        "n_workers": n_workers,
        # throughput wall = slowest worker's processing time (sessions
        # are long-lived in production; JVM boot is not data processing)
        "wall": max(r["wall"] for r in results),
        "launch_wall": launch_wall,
        "worker_walls": [r["wall"] for r in results],
        "pages": sum(r["pages"] for r in results),
        "triples": sum(r["triples"] for r in results),
        "hash_sum": str(sum(int(r["hash_sum"]) for r in results) % (1 << 64)),
    }


def main() -> int:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    ner_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # passes: each worker processes its shard K times (steady-state
    # throughput; see bench_shard_worker.py). Sized so the slowest
    # 8-worker wall is >> per-job fixed cost.
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    # parallelism levels (lo, hi) with hi = 4*lo. Default 1 -> 4 since
    # r5: the r5 scorer optimizations made the pipeline ~8x faster per
    # page, and this host only sustains ~6 full-speed cores (measured:
    # 32-process sgemm aggregate == ~6x one solo core; beyond ~6 busy
    # cores per-core CPU throughput dilutes ~2x with zero steal/iowait
    # — hypervisor SMT/capacity sharing). 2-vs-8 was inside the
    # capacity region for the slower r3/r4 pipeline; 1-vs-4 is the
    # level pair inside it for the optimized one. Override with
    # BEV_SCALE_LEVELS=lo,hi.
    lo, hi = (
        int(x) for x in os.environ.get("BEV_SCALE_LEVELS", "1,4").split(",")
    )
    assert hi == 4 * lo and N_BUCKETS % hi == 0
    os.makedirs(WORKDIR, exist_ok=True)
    corpus_path = prepare_corpus(pages)

    import statistics

    best: dict = {}
    all_runs: dict[int, list[dict]] = {lo: [], hi: []}
    # interleave the two levels (lo,hi,lo,hi,...) so slow host-load
    # drift hits both levels symmetrically instead of biasing one
    for _ in range(reps):
        for n in (lo, hi):
            # equal WALL per level: the hi level gets (hi/lo)x the
            # passes, so both configurations run for the same duration
            # and see the same host turbo/throttle profile — a short
            # run against a long one biases the ratio (observed 1.25
            # "efficiency" when the lo run was 4x longer and sagged
            # into sustained-throttle while the hi run rode burst)
            r = run_config(corpus_path, n, ner_layers, passes * (n // lo))
            r["throughput"] = r["pages"] / r["wall"]
            all_runs[n].append(r)
            if n not in best or r["throughput"] > best[n]["throughput"]:
                best[n] = r
            print(json.dumps(r), flush=True)
    med = {
        n: statistics.median(r["throughput"] for r in all_runs[n])
        for n in (lo, hi)
    }
    eff_median = med[hi] / (4 * med[lo])
    eff_best = best[hi]["throughput"] / (4 * best[lo]["throughput"])
    # PAIRED efficiency: the 2- and 8-worker runs of one rep execute
    # back-to-back, so they see the same host phase; the ratio within a
    # rep cancels the shared-VM throttling that a cross-rep ratio of
    # medians does not (this host's capacity swings ~1.5x on a
    # minutes timescale — see the raw throughput series). The median of
    # per-rep paired efficiencies is the primary scaling statistic.
    paired = [
        all_runs[hi][i]["throughput"] / (4 * all_runs[lo][i]["throughput"])
        for i in range(reps)
    ]
    eff_paired_median = statistics.median(paired)
    # output identity must hold across EVERY rep at both levels
    hashes = {
        (r["triples"], r["hash_sum"]) for rs in all_runs.values() for r in rs
    }
    identical = len(hashes) == 1
    summary = {
        "generated": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "pages": pages,
        "ner_layers": ner_layers,
        "reps_per_level": reps,
        "passes_per_worker": passes,
        "throughputs": {
            str(n): [round(r["throughput"], 1) for r in all_runs[n]]
            for n in (lo, hi)
        },
        "median_throughput": {str(n): round(med[n], 1) for n in (lo, hi)},
        "levels": [lo, hi],
        "best": {str(k): v for k, v in best.items()},
        "efficiency_N_to_4N_paired_median": round(
            eff_paired_median, 3
        ),
        "paired_efficiencies": [round(e, 3) for e in paired],
        "efficiency_N_to_4N_median": round(eff_median, 3),
        "efficiency_N_to_4N_best": round(eff_best, 3),
        "output_identical_all_reps": identical,
    }
    print(json.dumps(summary), flush=True)
    with open(os.path.join(WORKDIR, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

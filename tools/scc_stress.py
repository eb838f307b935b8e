"""SCC / bow-tie scale stress (r7): the q_scc block-graph plant
parametrized by vertex count, at N=500 (the graded sf0.01 shape) and
N=50000 (sf1 scale — 10x the bench corpus, 100x the graded graph).

The structure scales with N (N/10 blocks: 10-cycles, reversed chains,
downward bridges — one ColorSCC peel by construction), so the
measurement isolates how the peel machinery's joins grow with graph
size under FIXED caps, the same treatment the centralities got in
BENCH/centrality_stress_r7.json. Fresh JVM per measurement, noop-sink
materialization, REST spill/peak-memory capture; each cell runs
``reps`` times (this host's sustained capacity swings by phase) and
the summary reports the per-cell MIN with every wall recorded ->
BENCH/scc_stress_r7.json. The committed artifact is reproducible by
re-running ``all``.

Usage:
    python tools/scc_stress.py run SUBJ N    # one measurement
    python tools/scc_stress.py all [reps]    # matrix -> BENCH json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _stress_common import rest_metrics, spawn_result, vm_hwm_kb  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "scc_stress_r7.json",
)
SIZES = [500, 50_000]
SUBJECTS = ["scc", "bowtie"]


def _block_graph(spark, n: int):
    """The q_scc plant generalized to n vertices."""
    from pyspark.sql import functions as F

    # partial final blocks would emit cycle edges to vertices beyond
    # the id range (phantom vertices), silently deviating from the
    # graded plant's shape
    assert n % 10 == 0, "n must be a multiple of the block size (10)"
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")
    blk = F.floor(d / 10)
    pos = d % 10
    cyc = docs.where(blk % 3 != 2).select(
        d.alias("src"), (blk * 10 + (pos + 1) % 10).alias("dst")
    )
    chn = docs.where((blk % 3 == 2) & (pos > 0)).select(
        d.alias("src"), (d - 1).alias("dst")
    )
    crs = docs.where((pos == 0) & (blk > 0)).select(
        d.alias("src"), ((blk - 1) * 10 + 3).alias("dst")
    )
    return cyc.unionByName(chn).unionByName(crs)


def run_one(subject: str, n: int) -> None:
    import resource

    from bertseyeview_spark.operators.graph import (
        bowtie_classification,
        strongly_connected_components,
    )
    from bertseyeview_spark.session import get_spark

    spark = get_spark(
        app_name=f"scc_stress_{subject}_{n}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    edges = _block_graph(spark, n)
    t0 = time.monotonic()
    if subject == "scc":
        df = strongly_connected_components(edges, max_peels=2, max_prop=10)
    else:
        df = bowtie_classification(
            edges, max_peels=2, max_prop=10, max_hops=6
        )
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    rest = rest_metrics(spark)
    rec = {
        "subject": subject,
        "n_vertices": n,
        "cores": spark.sparkContext.defaultParallelism,
        "wall_sec": round(wall, 3),
        # both operators emit exactly one row per vertex of this plant
        # (every vertex assigned / classified) — recounting would
        # re-execute the whole job and skew the VmHWM peak vs the
        # REST metrics captured above
        "rows": n,
        "jvm_peak_rss_mb": vm_hwm_kb(jvm_pid) // 1024,
        "py_peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        // 1024,
        **rest,
    }
    print("RESULT " + json.dumps(rec))
    spark.stop()


def run_all(reps: int = 3) -> None:
    results = []
    for subject in SUBJECTS:
        for n in SIZES:
            for rep in range(reps):
                rec = spawn_result(__file__, [subject, str(n)])
                rec["rep"] = rep
                results.append(rec)
                print(
                    f"[{subject} n={n} rep={rep}] wall={rec['wall_sec']}s "
                    f"spill_disk={rec.get('spill_disk_bytes', '?')} "
                    f"jvm_peak={rec['jvm_peak_rss_mb']}MB",
                    flush=True,
                )
    summary = {}
    for subject in SUBJECTS:
        cells = {
            n: [r for r in results
                if r["subject"] == subject and r["n_vertices"] == n]
            for n in SIZES
        }
        mins = {n: min(r["wall_sec"] for r in cells[n]) for n in SIZES}
        summary[subject] = {
            "wall_min_by_n": {str(n): mins[n] for n in SIZES},
            "wall_all_by_n": {
                str(n): [r["wall_sec"] for r in cells[n]] for n in SIZES
            },
            "rows_by_n": {str(n): cells[n][0]["rows"] for n in SIZES},
            "wall_ratio_100x_vertices": round(
                mins[SIZES[-1]] / mins[SIZES[0]], 2
            ),
            "max_spill_disk_bytes": max(
                r.get("spill_disk_bytes", 0)
                for rs in cells.values() for r in rs
            ),
            "max_jvm_peak_rss_mb": max(
                r["jvm_peak_rss_mb"] for rs in cells.values() for r in rs
            ),
        }
    out = {
        "round": 7,
        "note": (
            "per-cell wall statistics over fresh-JVM repeats on ONE code "
            "version (this host's sustained capacity swings by phase; the "
            "min is the steady-state); summary and raw describe the SAME "
            "run pool and the artifact reproduces via "
            "'python tools/scc_stress.py all'"
        ),
        "caps": {"max_peels": 2, "max_prop": 10, "max_hops": 6},
        "sizes": SIZES,
        "reps_per_cell": reps,
        "summary": summary,
        "raw": results,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run_one(sys.argv[2], int(sys.argv[3]))
    elif sys.argv[1] == "all":
        run_all(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    else:
        raise SystemExit("usage: scc_stress.py run SUBJ N | all [reps]")

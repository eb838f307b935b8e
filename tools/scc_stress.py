"""SCC / bow-tie scale stress (r7): the q_scc block-graph plant
parametrized by vertex count, at N=500 (the graded sf0.01 shape) and
N=50000 (sf1 scale — 10x the bench corpus, 100x the graded graph).

The structure scales with N (N/10 blocks: 10-cycles, reversed chains,
downward bridges — one ColorSCC peel by construction), so the
measurement isolates how the peel machinery's joins grow with graph
size under FIXED caps, the same treatment the centralities got in
BENCH/centrality_stress_r7.json. Fresh JVM per measurement, noop-sink
materialization, REST spill/peak-memory capture ->
BENCH/scc_stress_r7.json.

Usage:
    python tools/scc_stress.py run SUBJ N    # one measurement
    python tools/scc_stress.py all           # matrix -> BENCH json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "scc_stress_r7.json",
)
SIZES = [500, 50_000]
SUBJECTS = ["scc", "bowtie"]


def _rest_metrics(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    if not base:
        return {}
    try:
        apps = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10)
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10,
            )
        )
    except Exception as exc:
        return {"rest_error": str(exc)}
    return {
        "spill_memory_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "spill_disk_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "peak_execution_memory": max(
            (s.get("peakExecutionMemory", 0) for s in stages), default=0
        ),
        "n_stages": len(stages),
    }


def _vm_hwm_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _block_graph(spark, n: int):
    """The q_scc plant generalized to n vertices (n % 10 == 0)."""
    from pyspark.sql import functions as F

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
    rest = _rest_metrics(spark)
    rec = {
        "subject": subject,
        "n_vertices": n,
        "cores": spark.sparkContext.defaultParallelism,
        "wall_sec": round(wall, 3),
        "rows": df.count(),
        "jvm_peak_rss_mb": _vm_hwm_kb(jvm_pid) // 1024,
        "py_peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        // 1024,
        **rest,
    }
    print("RESULT " + json.dumps(rec))
    spark.stop()


def _spawn(subject: str, n: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "run", subject, str(n)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"{subject}@n={n}: no RESULT (rc={p.returncode})\n"
        f"stdout tail: {p.stdout[-2000:]}\nstderr tail: {p.stderr[-2000:]}"
    )


def run_all() -> None:
    results = []
    for subject in SUBJECTS:
        for n in SIZES:
            rec = _spawn(subject, n)
            results.append(rec)
            print(
                f"[{subject} n={n}] wall={rec['wall_sec']}s rows={rec['rows']} "
                f"spill_disk={rec.get('spill_disk_bytes', '?')} "
                f"jvm_peak={rec['jvm_peak_rss_mb']}MB",
                flush=True,
            )
    summary = {}
    for subject in SUBJECTS:
        rs = {r["n_vertices"]: r for r in results if r["subject"] == subject}
        summary[subject] = {
            "wall_by_n": {str(n): rs[n]["wall_sec"] for n in SIZES},
            "rows_by_n": {str(n): rs[n]["rows"] for n in SIZES},
            "wall_ratio_100x_vertices": round(
                rs[SIZES[-1]]["wall_sec"] / rs[SIZES[0]]["wall_sec"], 2
            ),
            "max_spill_disk_bytes": max(
                r.get("spill_disk_bytes", 0) for r in rs.values()
            ),
            "max_jvm_peak_rss_mb": max(
                r["jvm_peak_rss_mb"] for r in rs.values()
            ),
        }
    out = {
        "round": 7,
        "caps": {"max_peels": 2, "max_prop": 10, "max_hops": 6},
        "sizes": SIZES,
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
        run_all()
    else:
        raise SystemExit("usage: scc_stress.py run SUBJ N | all")

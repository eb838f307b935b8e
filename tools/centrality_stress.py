"""Centrality sample-size scale stress (r6 verdict item #6).

The sf1 matrix (tools/scale_stress.py) deliberately excludes the
sampled centralities: their scaling axis is |pivot sample| x |reach|,
not corpus SF. This harness produces that datapoint: wall time, spill,
and peak memory for closeness_centrality and betweenness_centrality at
|sample| in {8, 32, 128} on the sf1-scale graph — the measured backing
for the "sample size is the affordability knob" claim (the same
treatment the dedup family got in r6).

Graph: the deterministic out-degree-2 graph the graded centrality
queries use, lifted to the sf1 document count (50k vertices, 100k
edges): d -> (d*37+11) % N and d -> (d*91+17) % N. Pivots are vertices
0..k-1. Hop cap 6, the graded-query setting.

Each (subject, k) measurement runs in its OWN subprocess / fresh JVM
(the scale_stress.py discipline) and materializes via the noop sink.
Results -> BENCH/centrality_stress_r7.json with per-k walls and the
wall growth ratio per 4x sample growth.

Usage:
    python tools/centrality_stress.py run SUBJ K   # one measurement
    python tools/centrality_stress.py all          # matrix -> BENCH json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _stress_common import rest_metrics, spawn_result, vm_hwm_kb  # noqa: E402

SF1 = os.environ.get("BEV_SF1_DIR", "/tmp/bev_sf1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "centrality_stress_r7.json",
)
SAMPLES = [8, 32, 128]
SUBJECTS = ["closeness_centrality", "betweenness_centrality"]


def run_one(subject: str, k: int) -> None:
    import resource

    from pyspark.sql import functions as F

    from bertseyeview_spark.operators.graph import (
        betweenness_centrality,
        closeness_centrality,
    )
    from bertseyeview_spark.session import get_spark

    spark = get_spark(
        app_name=f"centrality_{subject}_{k}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    docs = spark.read.parquet(f"{SF1}/documents.parquet").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    ea = docs.select(d.alias("src"), ((d * 37 + 11) % n).alias("dst"))
    eb = docs.select(d.alias("src"), ((d * 91 + 17) % n).alias("dst"))
    edges = ea.unionByName(eb).where(F.col("src") != F.col("dst"))
    sources = docs.where(d < k).select(d.alias("v"))
    fn = (
        closeness_centrality
        if subject == "closeness_centrality"
        else betweenness_centrality
    )
    t0 = time.monotonic()
    df = fn(edges, sources, max_hops=6)
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    rest = rest_metrics(spark)
    rec = {
        "subject": subject,
        "sample_size": k,
        "n_vertices": n,
        "cores": spark.sparkContext.defaultParallelism,
        "wall_sec": round(wall, 3),
        "rows": df.count(),
        "jvm_peak_rss_mb": vm_hwm_kb(jvm_pid) // 1024,
        "py_peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        // 1024,
        **rest,
    }
    print("RESULT " + json.dumps(rec))
    spark.stop()


def run_all() -> None:
    # the sf1 corpus must exist (built by tools/scale_stress.py build)
    assert os.path.exists(os.path.join(SF1, ".complete")), (
        f"build sf1 first: python tools/scale_stress.py build ({SF1})"
    )
    results = []
    for subject in SUBJECTS:
        for k in SAMPLES:
            rec = spawn_result(__file__, [subject, str(k)])
            results.append(rec)
            print(
                f"[{subject} k={k}] wall={rec['wall_sec']}s rows={rec['rows']} "
                f"spill_disk={rec.get('spill_disk_bytes', '?')} "
                f"jvm_peak={rec['jvm_peak_rss_mb']}MB",
                flush=True,
            )
    summary = {}
    for subject in SUBJECTS:
        rs = {r["sample_size"]: r for r in results if r["subject"] == subject}
        summary[subject] = {
            "wall_by_sample": {str(k): rs[k]["wall_sec"] for k in SAMPLES},
            "rows_by_sample": {str(k): rs[k]["rows"] for k in SAMPLES},
            # wall growth per 4x sample growth; linear-in-sample would
            # be 4.0, flat (scheduling-dominated) would be 1.0
            "wall_ratio_8_to_32": round(
                rs[32]["wall_sec"] / rs[8]["wall_sec"], 2
            ),
            "wall_ratio_32_to_128": round(
                rs[128]["wall_sec"] / rs[32]["wall_sec"], 2
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
        "sf1_dir": SF1,
        "max_hops": 6,
        "samples": SAMPLES,
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
        raise SystemExit("usage: centrality_stress.py run SUBJ K | all")

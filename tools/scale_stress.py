"""Scale-stress the five heaviest operators at sf1 (10x the bench SF).

Every 100-TB scale claim in the verdicts so far was extrapolated from
sf0.1 plan shape; this harness produces the 10x datapoint (r5 verdict
item #1): wall time, shuffle spill, peak execution memory, and peak
JVM/python RSS per operator at sf0.1 vs a synthesized sf1, written to
``BENCH/scale_stress_r6.json``.

sf1 synthesis (deterministic, derived from the driver's sf0.1 parquet —
no external data, honoring the no-synthesized-inputs rule by construction
FROM the driver tables):

* ``documents`` 5k -> 50k: 10 shards. Shard 0 is the original corpus;
  shard k>0 remaps doc_id += k*5000 and replaces every 5th token
  (positions ``pos % 5 == k % 5``) with a shard salt token ``s<k>``, so
  within-shard repeated phrases STAY repeated (the substitution is
  corpus-wide constant -> substring-dedup load scales ~10x) while
  cross-shard Jaccard drops to ~0.67 < 0.8 (no quadratic blowup of the
  MinHash pair set). Docs with ``doc_id % 40 == 0`` are left verbatim in
  every shard: 125 exact-duplicate groups of 10 — the Common-Crawl-style
  boilerplate-replication stress for the exact/fingerprint paths.
* ``embeddings`` 2k -> 20k: shard 0 original; shard k>0 remaps
  vec_id += k*100_000 (clear of q_semdedup's +10_000 planting range) and
  perturbs by N(0, 0.01) seeded per shard — dense near-dup clusters of
  10, exactly SemDeDup's target workload.
* ``customer`` 15k -> 150k: shard k remaps c_custkey += k*200_000
  (feeds the `_customer_citing` pagerank graph: 10x nodes/edges).
* Remaining tables are byte-copied from sf0.1 (unused by the subjects).

Each (subject, sf, parallelism) measurement runs in its OWN subprocess /
fresh JVM so VmHWM peaks are per-subject, and materializes via the noop
sink (full execution, no driver collect). Spill/peak-execution-memory
come from the Spark UI REST API (enabled just for these runs).

kg_construct additionally records ``bit_xor(xxhash64(subj,pred,obj))``;
the parent runs it at local[8] AND local[32] on sf1 and asserts the
hash is parallelism-invariant (the determinism leg of the north rule's
two-cluster-size criterion at 10x data).

Usage:
    python tools/scale_stress.py build          # synthesize /tmp/bev_sf1
    python tools/scale_stress.py run SUBJ DIR   # one measurement (JSON line)
    python tools/scale_stress.py all            # full matrix -> BENCH json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _stress_common import rest_metrics, spawn_result, vm_hwm_kb  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("BEV_SF1_DIR", "/tmp/bev_sf1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "scale_stress_r6.json")

SUBJECTS = [
    "kg_construct_triples",
    "kg_pagerank",
    "minhash_lsh_dedup",
    "exact_substring_dedup",
    "substring_cut",
    "semdedup",
    # r6 additions: the new corpus-wide operators whose load grows
    # with document count (the graph/centrality additions are bounded
    # by their pivot sample, so sf is not their scaling axis)
    "dedup_paragraphs",
    "dsir_select",
    "c4_line_filter",
    "anchor_text_topk",
    "robots_filter",
]


# ---------------------------------------------------------------- build

def _salt_text(text: str, doc_id: int, shard: int) -> str:
    if shard == 0 or doc_id % 40 == 0 or not text:
        return text
    toks = text.split(" ")
    mod = shard % 5
    salt = f"s{shard}"
    return " ".join(
        salt if i % 5 == mod else t for i, t in enumerate(toks)
    )


def build() -> None:
    import numpy as np
    import pandas as pd

    os.makedirs(SF1, exist_ok=True)
    done_marker = os.path.join(SF1, ".complete")
    if os.path.exists(done_marker):
        print(f"sf1 already built at {SF1}")
        return

    docs = pd.read_parquet(f"{SF01}/documents.parquet")
    n_docs = len(docs)
    parts = []
    for k in range(10):
        p = docs.copy()
        p["doc_id"] = p["doc_id"] + k * n_docs
        if k > 0:
            p["text"] = [
                _salt_text(t, d - k * n_docs, k)
                for d, t in zip(p["doc_id"], p["text"])
            ]
        p["n_chars"] = p["text"].str.len()
        parts.append(p)
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{SF1}/documents.parquet", index=False
    )

    emb = pd.read_parquet(f"{SF01}/embeddings.parquet")
    dim = len(emb["embedding"].iloc[0])
    base = np.stack(emb["embedding"].to_numpy())
    eparts = []
    for k in range(10):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + k * 100_000
        if k > 0:
            rng = np.random.RandomState(20260817 + k)
            pert = base + rng.normal(0.0, 0.01, size=base.shape)
            e["embedding"] = [row.astype(np.float64) for row in pert]
        eparts.append(e)
    pd.concat(eparts, ignore_index=True).to_parquet(
        f"{SF1}/embeddings.parquet", index=False
    )

    cust = pd.read_parquet(f"{SF01}/customer.parquet")
    cparts = []
    for k in range(10):
        c = cust.copy()
        c["c_custkey"] = c["c_custkey"] + k * 200_000
        cparts.append(c)
    pd.concat(cparts, ignore_index=True).to_parquet(
        f"{SF1}/customer.parquet", index=False
    )

    for t in ["region", "nation", "supplier", "part", "orders",
              "lineitem", "events"]:
        dst = f"{SF1}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SF01}/{t}.parquet", dst)
    with open(done_marker, "w") as fh:
        fh.write("ok\n")
    print(f"built sf1 at {SF1}: docs x10, embeddings x10, customer x10")


# ------------------------------------------------------------------ run

def run_one(subject: str, sf_dir: str) -> None:
    import resource

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from bertseyeview_spark.session import get_spark

    spark = get_spark(
        app_name=f"stress_{subject}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    q = E.queries()[subject]

    t0 = time.monotonic()
    df = q(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    # REST metrics BEFORE the row-count pass so spill/peak-exec-mem
    # cover exactly the timed materialization, not the recount
    rest = rest_metrics(spark)
    rec = {
        "subject": subject,
        "sf_dir": sf_dir,
        "cores": spark.sparkContext.defaultParallelism,
        "wall_sec": round(wall, 3),
        "rows": df.count(),
        "jvm_peak_rss_mb": vm_hwm_kb(jvm_pid) // 1024,
        "py_peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        // 1024,
        **rest,
    }
    if subject == "kg_construct_triples":
        rec["triple_hash"] = df.agg(
            F.bit_xor(F.xxhash64("subj", "pred", "obj")).alias("h")
        ).collect()[0]["h"]
        rec["n_triples"] = rec["rows"]
    print("RESULT " + json.dumps(rec))
    spark.stop()


# ------------------------------------------------------------------ all

PROGRESS = "/tmp/bev_stress_progress.jsonl"


def _load_progress() -> list[dict]:
    if not os.path.exists(PROGRESS):
        return []
    with open(PROGRESS) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def run_all(only: set[str] | None = None) -> None:
    """Run the matrix, appending each measurement to PROGRESS so the
    harness is resumable across invocations (one measurement can take
    minutes; a wall-clock cap mid-matrix loses nothing). ``finalize``
    aggregates PROGRESS into the BENCH json."""
    build()
    done = {(r["subject"], r["sf"], r.get("role")) for r in _load_progress()}
    plan = [
        (subject, sf_name, sf_dir, 32, None)
        for subject in SUBJECTS
        for sf_name, sf_dir in [("sf0.1", SF01), ("sf1", SF1)]
    ] + [("kg_construct_triples", "sf1", SF1, 8, "determinism_local8")]
    for subject, sf_name, sf_dir, cpus, role in plan:
        if only and subject not in only:
            continue
        if (subject, sf_name, role) in done:
            continue
        rec = spawn_result(__file__, [subject, sf_dir], cpus=cpus)
        rec["sf"] = sf_name
        if role:
            rec["role"] = role
        with open(PROGRESS, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(
            f"[{subject} @ {sf_name} x{cpus}] wall={rec['wall_sec']}s "
            f"rows={rec['rows']} "
            f"spill_disk={rec.get('spill_disk_bytes', '?')} "
            f"jvm_peak={rec['jvm_peak_rss_mb']}MB",
            flush=True,
        )


def finalize() -> None:
    results = _load_progress()
    det = next(r for r in results if r.get("role") == "determinism_local8")
    h32 = next(
        r["triple_hash"] for r in results
        if r["subject"] == "kg_construct_triples" and r["sf"] == "sf1"
        and r.get("role") is None and "triple_hash" in r
    )
    assert det["triple_hash"] == h32, (
        f"sf1 triple hash differs across parallelism: {det['triple_hash']} "
        f"vs {h32}"
    )

    by = {}
    for r in results:
        if r.get("role"):
            continue
        by.setdefault(r["subject"], {})[r["sf"]] = r
    summary = {
        s: {
            "wall_ratio_sf1_over_sf01": round(
                by[s]["sf1"]["wall_sec"] / by[s]["sf0.1"]["wall_sec"], 2
            ),
            "rows_sf01": by[s]["sf0.1"]["rows"],
            "rows_sf1": by[s]["sf1"]["rows"],
        }
        for s in SUBJECTS
    }
    out = {
        "round": 6,
        "sf1_dir": SF1,
        "sf1_determinism": {
            "kg_triple_hash_local32": h32,
            "kg_triple_hash_local8": det["triple_hash"],
            "identical": True,
        },
        "summary": summary,
        "runs": results,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {OUT}")
    for s, v in summary.items():
        print(f"  {s}: x{v['wall_ratio_sf1_over_sf01']} wall at 10x data")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "build":
        build()
    elif cmd == "run":
        run_one(sys.argv[2], sys.argv[3])
    elif cmd == "finalize":
        finalize()
    else:
        only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
        run_all(only)

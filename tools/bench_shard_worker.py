"""One process-isolated scaling worker: a single-core SparkSession that
processes a disjoint bucket shard of the shared corpus through the fused
KG plan and reports wall/triples/multiset-hash as one JSON line.

Invoked by tools/bench_scaling_sharded.py, N workers concurrently —
each worker is its own JVM with its own memory bandwidth accounting,
the closest sandbox analogue to adding executors to a cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# one BLAS thread per worker: this process IS one core of the modeled
# cluster; multithreaded numpy across N concurrent workers
# oversubscribes the box and anti-scales (same pin session.py applies)
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"


def main() -> int:
    corpus_path = sys.argv[1]
    shard_ids = [int(x) for x in sys.argv[2].split(",")]
    ner_layers = int(sys.argv[3])
    out_path = sys.argv[4]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bertseyeview_spark.plans.kg_fused import construct_triples_fused

    spark = (
        SparkSession.builder.master("local[1]")
        .appName(f"scale_worker_{shard_ids[0]}")
        .config("spark.sql.shuffle.partitions", "1")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    pages = spark.read.parquet(corpus_path).where(
        F.col("bucket").isin(shard_ids)
    )
    # page-local output (with_origin) so the triple multiset is
    # sharding-invariant: dedup scope is one page, not one shard
    triples = construct_triples_fused(
        spark,
        pages,
        drop_dangling_citations=False,
        canonicalize=False,
        ner_scorer_layers=ner_layers,
        with_origin=True,
    )
    agg = triples.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64("subj", "pred", "obj", "origin_url").cast(
                "decimal(38,0)"
            )
        ).alias("hsum"),
    ).collect()[0]
    n_pages = pages.count()
    wall = time.time() - t0
    spark.stop()

    with open(out_path, "w") as f:
        json.dump(
            {
                "shards": shard_ids,
                "pages": n_pages,
                "triples": int(agg["n"]),
                "hash_sum": str(int(agg["hsum"])),
                "wall": wall,
            },
            f,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

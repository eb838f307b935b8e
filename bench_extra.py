"""Round-8 optimization measurement harness (bench.py stays frozen).

Times individual declared queries with the noop sink (guide §1.4),
multiple reps, reporting min/median — the per-query isolation bench
used for before/after evidence in OPTIMIZATION_r08.md.

Usage: python bench_extra.py [--sf DIR] [--reps N] [query ...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import __spark_entry__ as E
from bertseyeview_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.001")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    names = args.queries or [
        "ngram_jaccard_dedup", "minhash_lsh_dedup", "quality_features",
        "language_id", "embedding_topk_cosine", "label_abundance_two_groups",
        "top_entities", "sessionization", "events_windowed_agg",
        "dictionary_mention_topk", "top_articles_citations",
        "kg_pagerank", "connected_components",
    ]
    for n in names:
        try:
            qs[n](spark, args.warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:  # noqa: BLE001
            print(f"warmup fail {n}: {ex}", file=sys.stderr)

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.reps):
        for n in names:
            spark.sparkContext.setJobDescription(n)
            t0 = time.time()
            df = qs[n](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs[n].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        n: {
            "min": round(min(r), 3),
            "median": round(statistics.median(r), 3),
            "samples": [round(x, 3) for x in r],
        }
        for n, r in runs.items()
    }
    out["_total_min"] = round(sum(v["min"] for v in out.values()), 3)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

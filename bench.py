"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "extras": {"kg_pages": n, "kg_triples": n, "kg_triples_per_sec": r}}

The KG-construction stage (the north-rule workload) runs over a
deterministic synthetic pages corpus (seeded; BENCH_KG_PAGES env,
default 4000) — triples/sec is the authoritative throughput metric
(BASELINE.json). tools/bench_scaling.py reruns this at two
parallelism levels for the N->4N efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from bertseyeview_spark.datagen import generate_corpus, pages_to_spark  # noqa: E402
from bertseyeview_spark.plans.kg import construct_triples  # noqa: E402
from bertseyeview_spark.plans.kg_fused import construct_triples_fused  # noqa: E402
from bertseyeview_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "label_abundance_two_groups",
    "top_articles_citations",
    "top_entities",
    "dictionary_mention_topk",
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "embedding_topk_cosine",
    "quality_features",
    "language_id",
    "events_windowed_agg",
    "sessionization",
    "kg_pagerank",
    "connected_components",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_KG_PAGES", "20000"))
    # sentences per page: "lo,hi" — the compute-density knob (heavy pages
    # make the scaling runs compute-dominant, like real web documents)
    sent_lo, sent_hi = (
        int(x) for x in os.environ.get("BENCH_KG_SENTENCES", "2,5").split(",")
    )
    # production-model-cost emulation: depth of the deterministic NER
    # scorer (0 = dictionary-only). The scaling runs set this so the
    # Arrow-UDF hot path carries realistic per-mention compute.
    ner_layers = int(os.environ.get("BENCH_KG_NER_LAYERS", "0"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    timings: dict[str, float] = {}

    # KG construction throughput (the north-rule metric)
    corpus = generate_corpus(
        n_pages, seed=42, min_sentences=sent_lo, max_sentences=sent_hi
    )
    pages = pages_to_spark(spark, corpus, num_partitions=cpus * 2).persist()
    pages.count()  # materialize input outside the timed window
    # fused page-local plan by default (3 shuffles end-to-end);
    # BENCH_KG_FUSED=0 benches the modular operator chain instead
    build = (
        construct_triples_fused
        if os.environ.get("BENCH_KG_FUSED", "1") == "1"
        else construct_triples
    )
    # untimed warmup of the KG path itself (same policy as the headline
    # queries below): the first build pays whole-stage-codegen JIT and
    # Python/Arrow worker startup (~6s on this host — 3x the actual
    # 20k-page work), which a long-running production job amortizes to
    # zero. Steady-state is the number a 100 TB run sees.
    if os.environ.get("BENCH_WARMUP", "1") == "1":
        warm_pages = pages_to_spark(
            spark, generate_corpus(500, seed=1), num_partitions=cpus
        )
        build(spark, warm_pages, ner_scorer_layers=ner_layers).write.format(
            "noop"
        ).mode("overwrite").save()
    t0 = time.time()
    triples = build(spark, pages, ner_scorer_layers=ner_layers).persist()
    n_triples = triples.count()
    kg_sec = time.time() - t0
    timings["kg_construct"] = round(kg_sec, 3)
    # order-insensitive set hash: equality across parallelism levels is
    # the determinism check (local[8] == local[32], BASELINE.md §3)
    from pyspark.sql import functions as F

    triples_hash = triples.agg(
        F.bit_xor(F.xxhash64("subj", "pred", "obj")).alias("h")
    ).collect()[0]["h"]

    headline = [] if os.environ.get("BENCH_SKIP_HEADLINE") else HEADLINE
    # untimed warmup at the smallest SF: compiles each query's
    # whole-stage-codegen + JIT once so the timed pass measures steady-
    # state execution, not first-compile storms (the 32-expr minhash
    # agg alone cost multi-second JIT warmup). BENCH_WARMUP=0 disables.
    if headline and os.environ.get("BENCH_WARMUP", "1") == "1":
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir):
            for name in headline:
                try:
                    qs[name](spark, warm_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception:  # noqa: BLE001 - warmup is best-effort
                    pass
    for name in headline:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extras": {
                    "kg_pages": n_pages,
                    "kg_triples": n_triples,
                    "kg_triples_per_sec": round(n_triples / kg_sec, 1),
                    "kg_triples_hash": triples_hash,
                    "kg_ner_layers": ner_layers,
                    "cpus": cpus,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Analytics over the engine's own KG output (reference read-path
semantics end-to-end): label abundance on mention edges with the
skewed hub entity, top-articles citation metric, against pure-python
oracles computed from the same edge sets."""

import pytest
from pyspark.sql import functions as F

from bertseyeview_spark.datagen import generate_corpus, pages_to_spark
from bertseyeview_spark.operators import analytics as A
from bertseyeview_spark.plans.kg import construct_triples


@pytest.fixture(scope="module")
def kg(spark):
    corpus = generate_corpus(250, seed=23)
    pages = pages_to_spark(spark, corpus, num_partitions=8)
    triples = construct_triples(spark, pages).persist()
    triples.count()
    return corpus, triples


def test_label_abundance_on_kg(spark, kg):
    corpus, triples = kg
    mentions = triples.where(F.col("pred") == "has_named_entity").select(
        F.col("subj").alias("article"), F.col("obj").alias("entity")
    )
    articles = mentions.select("article").distinct()
    # subset: articles mentioning the hub entity (a realistic cohort)
    subset = mentions.where(
        F.col("entity") == "Disease:MESH:D009369"
    ).select("article").distinct()

    got = {
        r["entity"]: r
        for r in A.label_abundance(
            mentions, articles, subset, min_mentions=5
        ).collect()
    }

    # python oracle from the same triple set
    rows = [
        (t.subj, t.obj)
        for t in corpus.expected_triples.itertuples(index=False)
        if t.pred == "has_named_entity"
    ]
    n_articles = len({a for a, _ in rows})
    sub = {a for a, e in rows if e == "Disease:MESH:D009369"}
    n_sub = len(sub)
    from collections import Counter

    absolute = Counter(e for _, e in rows)
    observed = Counter(e for a, e in rows if a in sub)
    for entity, r in got.items():
        assert r["absolute_mentions"] == absolute[entity]
        assert r["absolute_subset_mentions_1"] == observed[entity]
        expected = absolute[entity] / n_articles
        rel = observed[entity] / n_sub
        assert r["score"] == pytest.approx(round(rel / expected, 4))
    # hub entity itself must score max (its subset is its own mentioners)
    assert max(got, key=lambda e: got[e]["score"]) == "Disease:MESH:D009369"


def test_salted_equals_plain_on_skewed_kg(spark, kg):
    _, triples = kg
    mentions = triples.where(F.col("pred") == "has_named_entity").select(
        F.col("subj").alias("article"), F.col("obj").alias("entity")
    )
    plain = {
        r["entity"]: r["count_mentions"]
        for r in A.top_entities(mentions, top_n=100).collect()
    }
    salted = {
        r["entity"]: r["count_mentions"]
        for r in A.top_entities(mentions, top_n=100, salt_partitions=16).collect()
    }
    assert plain == salted


def test_top_articles_on_kg(spark, kg):
    corpus, triples = kg
    citing = triples.where(F.col("pred") == "citing").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    all_articles = citing.select(F.col("src").alias("article")).union(
        citing.select(F.col("dst").alias("article"))
    ).distinct()
    got = A.top_n_articles(
        citing, all_articles, weight_mention=100, top_n=5, metric_norm=False
    ).collect()
    # celebrity page (page 0) is linked from ~20% of pages -> top by metric
    assert got[0]["article"] == "https://example.org/page/00000000"
    # oracle: count_all == in-degree over the expected citing set
    cit = [
        (t.subj, t.obj)
        for t in corpus.expected_triples.itertuples(index=False)
        if t.pred == "citing"
    ]
    indeg = {}
    for _, dst in cit:
        indeg[dst] = indeg.get(dst, 0) + 1
    for r in got:
        assert r["count_all"] == indeg[r["article"]]
        assert r["count_metric"] == r["count_all"] + 100 * r["count_target"]


class TestDistinctSketches:
    def test_sketch_accuracy_and_mergeability(self, spark):
        from pyspark.sql import functions as F

        from bertseyeview_spark.operators.analytics import (
            merge_sketches,
            sketch_distinct,
        )

        df = spark.range(0, 20000).select(
            (F.col("id") % 4).alias("g"),
            # ~2500 distinct values per group with duplicates
            (F.col("id") % 10000).cast("string").alias("v"),
        )
        exact = {
            r["g"]: r["n"]
            for r in df.groupBy("g")
            .agg(F.countDistinct("v").alias("n"))
            .collect()
        }
        # shard the input, sketch each shard, merge the sketches — the
        # estimate must come out as accurate as sketching the whole input
        whole = merge_sketches(
            sketch_distinct(df, ["g"], "v"), ["g"]
        )
        parts = sketch_distinct(
            df.withColumn("_s", F.xxhash64("v") % 5), ["g", "_s"], "v"
        ).drop("_s")
        merged = merge_sketches(parts, ["g"])
        est_whole = {r["g"]: r["approx_distinct"] for r in whole.collect()}
        est_merged = {r["g"]: r["approx_distinct"] for r in merged.collect()}
        for g, n in exact.items():
            assert abs(est_whole[g] - n) / n < 0.05
            # sketch-union estimates can differ from the one-pass sketch
            # by a hair (datasketches sparse->dense transitions); the
            # mergeability contract is accuracy, not bit-equality
            assert abs(est_merged[g] - n) / n < 0.05


def test_label_abundance_duplicate_subset_rows_safe(spark):
    """Duplicate article rows in a subset must tag, not multiply, the
    mention rows (the semi-join contract of the original shape)."""
    from pyspark.sql import functions as F

    from bertseyeview_spark.operators.analytics import label_abundance

    mentions = spark.createDataFrame(
        [(a, "E1") for a in range(20)] + [(a, "E2") for a in range(12)],
        ["article", "entity"],
    )
    articles = spark.range(0, 20).select(F.col("id").alias("article"))
    s1 = spark.range(0, 10).select(F.col("id").alias("article"))
    s1_dup = s1.unionByName(s1)  # every subset row duplicated
    a = {r["entity"]: tuple(r)[1:] for r in label_abundance(
        mentions, articles, s1, min_mentions=1).collect()}
    b = {r["entity"]: tuple(r)[1:] for r in label_abundance(
        mentions, articles, s1_dup, min_mentions=1).collect()}
    # absolute_mentions (index 1 of the row tail) must be identical
    assert {k: v[1] for k, v in a.items()} == {k: v[1] for k, v in b.items()}


def test_bm25_vs_python_oracle(spark):
    import math

    from bertseyeview_spark.operators.retrieval import bm25_search

    texts = {
        0: "spark shuffle spark join spark",
        1: "window functions and state in spark",
        2: "totally unrelated words only here",
        3: "vector vector stream",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    q = ["spark", "vector"]
    got = {r["id"]: (r["score"], r["n_terms_hit"]) for r in bm25_search(
        docs, "doc_id", "text", q, top_n=10).collect()}

    tok = {i: t.split() for i, t in texts.items()}
    n = len(tok)
    avg = sum(len(w) for w in tok.values()) / n
    df = {t: sum(1 for w in tok.values() if t in w) for t in q}
    k1, b = 1.2, 0.75
    want = {}
    for i, w in tok.items():
        s, hits = 0.0, 0
        for t in q:
            tf = w.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avg))
        if hits:
            want[i] = (round(s, 6), hits)
    assert got == want
    # rarer-term matches outrank common-term matches (idf at work):
    # doc 3 hits 'vector' (df=1) twice; docs 0/1 only hit 'spark' (df=2)
    assert max(want, key=lambda i: want[i][0]) == 3
    assert want[0][0] > want[1][0]  # more tf of the same term -> higher

"""Fused page-local KG plan == modular plan, and matches the oracle."""

from bertseyeview_spark.datagen import generate_corpus, pages_to_spark
from bertseyeview_spark.plans.kg import construct_triples
from bertseyeview_spark.plans.kg_fused import construct_triples_fused


def _as_set(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_fused_equals_modular_and_oracle(spark):
    corpus = generate_corpus(180, seed=31)
    pages = pages_to_spark(spark, corpus, num_partitions=8)
    modular = _as_set(construct_triples(spark, pages))
    fused = _as_set(construct_triples_fused(spark, pages))
    assert fused == modular
    want = {
        (r.subj, r.pred, r.obj)
        for r in corpus.expected_triples.itertuples(index=False)
    }
    assert fused == want


def test_fused_with_scorer_unchanged_output(spark):
    corpus = generate_corpus(60, seed=8)
    pages = pages_to_spark(spark, corpus, num_partitions=4)
    base = _as_set(construct_triples_fused(spark, pages, ner_scorer_layers=0))
    scored = _as_set(construct_triples_fused(spark, pages, ner_scorer_layers=4))
    assert base == scored

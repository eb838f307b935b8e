"""Checkpointed pipeline in fused mode: same triples as modular mode,
resume still works at bucket granularity."""

import pytest

from bertseyeview_spark.datagen import generate_corpus, pages_to_spark
from bertseyeview_spark.pipeline import KGPipeline

N_PAGES = 150


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_PAGES, seed=17)


def _triples(pipe):
    return {(r["subj"], r["pred"], r["obj"]) for r in pipe.triples().collect()}


def test_fused_pipeline_matches_modular_and_oracle(spark, corpus, tmp_path_factory):
    pages = pages_to_spark(spark, corpus, num_partitions=8)

    w1 = str(tmp_path_factory.mktemp("mod"))
    p1 = KGPipeline(spark, w1, n_buckets=4, chunk_size=2, rank_iterations=5)
    p1.run_all(pages, fused=False)

    w2 = str(tmp_path_factory.mktemp("fus"))
    p2 = KGPipeline(spark, w2, n_buckets=4, chunk_size=2, rank_iterations=5)
    p2.run_all(pages, fused=True)

    a, b = _triples(p1), _triples(p2)
    assert a == b
    want = {
        (r.subj, r.pred, r.obj)
        for r in corpus.expected_triples.itertuples(index=False)
    }
    assert b == want
    assert p2.verify_extraction(pages) == 0


def test_fused_pipeline_resume(spark, corpus, tmp_path_factory):
    pages = pages_to_spark(spark, corpus, num_partitions=8)
    work = str(tmp_path_factory.mktemp("fusres"))
    pipe = KGPipeline(spark, work, n_buckets=4, chunk_size=1, rank_iterations=5)
    pipe.run_extract(pages)
    with pytest.raises(RuntimeError, match="injected failure"):
        pipe.run_fused_stage_edges(pages, fail_after_chunks=2)
    assert len(pipe.lineage.done_buckets("edges_staging")) == 2

    pipe2 = KGPipeline(spark, work, n_buckets=4, chunk_size=1, rank_iterations=5)
    pipe2.run_all(pages, fused=True)
    rows = [r for r in pipe2.lineage.rows() if r["stage"] == "edges_staging"]
    assert sorted(r["bucket"] for r in rows) == [0, 1, 2, 3]  # each once
    want = {
        (r.subj, r.pred, r.obj)
        for r in corpus.expected_triples.itertuples(index=False)
    }
    assert _triples(pipe2) == want

"""End-to-end KG pipeline test: synthetic pages -> triples.

Checks the three north-rule correctness gates at small scale:
1. extracted text byte-identical per url,
2. (subj, pred, obj) set P/R >= 0.95 vs the closed-form oracle,
3. resume-from-lineage recomputes nothing already done.
"""

import pytest
from pyspark.sql import functions as F

from bertseyeview_spark.datagen import generate_corpus, pages_to_spark
from bertseyeview_spark.pipeline import KGPipeline

N_PAGES = 200


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_PAGES, seed=42)


@pytest.fixture(scope="module")
def finished(spark, corpus, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("kgwork"))
    pages = pages_to_spark(spark, corpus, num_partitions=8)
    pipe = KGPipeline(spark, work, n_buckets=8, chunk_size=4, rank_iterations=10)
    pipe.run_all(pages)
    return pipe, pages


def test_extraction_byte_identity(finished, corpus):
    pipe, pages = finished
    assert pipe.verify_extraction(pages) == 0


def test_triples_precision_recall(finished, corpus):
    pipe, _ = finished
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in pipe.triples().collect()
    }
    want = {
        (r.subj, r.pred, r.obj)
        for r in corpus.expected_triples.itertuples(index=False)
    }
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    assert precision >= 0.95, (
        f"precision {precision:.3f}; spurious: {sorted(got - want)[:10]}"
    )
    assert recall >= 0.95, (
        f"recall {recall:.3f}; missing: {sorted(want - got)[:10]}"
    )


def test_canonicalization_applied(finished):
    """The OMIM duplicate must be merged into the MESH canonical id."""
    pipe, _ = finished
    edges = pipe._read("edges")
    assert (
        edges.where(
            (F.col("src") == "Disease:OMIM:105400")
            | (F.col("dst") == "Disease:OMIM:105400")
        ).count()
        == 0
    )


def test_null_cleanup(finished):
    pipe, _ = finished
    edges = pipe._read("edges")
    assert edges.where((F.col("src") == "Null") | (F.col("dst") == "Null")).count() == 0


def test_nodes_ranked(finished):
    pipe, _ = finished
    nodes = pipe._read("nodes")
    assert nodes.where(F.col("label") == "Article").count() > 0
    # celebrity page (page 0, linked from ~20% of pages) should outrank
    # the median article
    ranks = (
        nodes.where(F.col("label") == "Article")
        .select("id", "rank")
        .collect()
    )
    by_id = {r["id"]: r["rank"] for r in ranks}
    celebrity = by_id.get("https://example.org/page/00000000", 0.0)
    import statistics

    assert celebrity > statistics.median(by_id.values())


def test_resume_skips_done_buckets(spark, corpus, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("kgresume"))
    pages = pages_to_spark(spark, corpus, num_partitions=8)
    pipe = KGPipeline(spark, work, n_buckets=8, chunk_size=2, rank_iterations=5)
    # crash after the first chunk of the extract stage
    with pytest.raises(RuntimeError, match="injected failure"):
        pipe.run_extract(pages, fail_after_chunks=1)
    done_before = pipe.lineage.done_buckets("extract")
    assert len(done_before) == 2  # one chunk of 2 buckets committed

    # fresh orchestrator (new process semantics) resumes from lineage
    pipe2 = KGPipeline(spark, work, n_buckets=8, chunk_size=2, rank_iterations=5)
    assert pipe2.lineage.done_buckets("extract") == done_before
    pipe2.run_all(pages)
    # every bucket done exactly once — no recomputation of the 2 done ones
    rows = [r for r in pipe2.lineage.rows() if r["stage"] == "extract"]
    assert len(rows) == 8
    assert sorted(r["bucket"] for r in rows) == list(range(8))
    # and the resumed run still passes byte-identity
    assert pipe2.verify_extraction(pages) == 0

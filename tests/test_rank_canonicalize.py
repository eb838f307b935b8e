"""ArticleRank/PageRank vs a pure-python oracle; connected components
on crafted clusters (incl. a hub); linking disambiguation invariants."""

import pytest
from pyspark.sql import functions as F

from bertseyeview_spark.datagen import (
    alias_dict_to_spark,
    build_alias_dict,
    text_embedding,
)
from bertseyeview_spark.operators.canonicalize import (
    connected_components,
    similarity_pairs,
)
from bertseyeview_spark.operators.rank import article_rank


def _py_article_rank(edges, damping=0.85, iterations=20, variant="article_rank"):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out_deg = {}
    for a, _ in edges:
        out_deg[a] = out_deg.get(a, 0) + 1
    avg_out = (
        sum(out_deg.values()) / len(out_deg)
        if variant == "article_rank" and out_deg
        else 0.0
    )
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        incoming = {n: 0.0 for n in nodes}
        for a, b in edges:
            incoming[b] += ranks[a] / (out_deg[a] + avg_out)
        ranks = {n: (1 - damping) + damping * incoming[n] for n in nodes}
    return ranks


@pytest.mark.parametrize("variant", ["article_rank", "pagerank"])
def test_article_rank_vs_python(spark, variant):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("e", "c"), ("f", "c"), ("d", "a"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["rank"]
        for r in article_rank(df, iterations=15, variant=variant).collect()
    }
    want = _py_article_rank(edges, iterations=15, variant=variant)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9), n
    # 'c' is the most-cited node and must rank highest
    assert max(got, key=got.get) == "c"


def test_connected_components_clusters(spark):
    # two chains + one hub star + a singleton pair
    pairs = (
        [("a1", "a2"), ("a2", "a3")]
        + [("hub", f"s{i}") for i in range(25)]
        + [("z1", "z2")]
    )
    df = spark.createDataFrame(pairs, ["a", "b"])
    cc = {r["entity_id"]: r["canonical_id"] for r in connected_components(df).collect()}
    assert cc["a1"] == cc["a2"] == cc["a3"] == "a1"
    assert all(cc[f"s{i}"] == "hub" for i in range(25))
    assert cc["z1"] == cc["z2"] == "z1"
    # three components total
    assert len(set(cc.values())) == 3


def test_similarity_pairs_merges_near_duplicates_only(spark):
    import pandas as pd

    e1 = [float(x) for x in text_embedding("alpha beta gamma")]
    e2 = [float(x) for x in text_embedding("alpha beta gamma")]  # identical
    e3 = [float(x) for x in text_embedding("totally different context")]
    pdf = pd.DataFrame(
        [
            ("alpha syndrome", "Disease:MESH:D1", "disease", e1),
            ("alpha disorder", "Disease:OMIM:9", "disease", e2),
            ("beta complex", "Disease:MESH:D2", "disease", e3),
        ],
        columns=["alias", "entity_id", "entity_type", "embedding"],
    )
    df = spark.createDataFrame(pdf)
    pairs = {(r["a"], r["b"]) for r in similarity_pairs(df, threshold=0.9).collect()}
    assert ("Disease:MESH:D1", "Disease:OMIM:9") in pairs
    assert all("Disease:MESH:D2" not in p for p in pairs)


def test_ambiguous_alias_not_merged(spark):
    """The truly ambiguous alias (disease ALS vs gene ALR) shares a
    surface but has dissimilar embeddings — must NOT become a merge
    pair (SURVEY.md G6)."""
    alias = alias_dict_to_spark(spark, build_alias_dict())
    pairs = {(r["a"], r["b"]) for r in similarity_pairs(alias, threshold=0.9).collect()}
    assert ("Disease:MESH:D000690", "Gene:2671") not in pairs
    assert ("Gene:2671", "Disease:MESH:D000690") not in pairs

"""Result cache (S10) recency semantics + viz export (J8/G3)."""

import time

from pyspark.sql import functions as F

from bertseyeview_spark.plans.cache import ResultCache, query_signature
from bertseyeview_spark.plans.viz import (
    display_subgraph,
    graph_to_json,
    layout_2d,
)


def test_cache_hit_and_expiry(spark, tmp_path):
    cache = ResultCache(spark, str(tmp_path / "cache"))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])

    df1, hit1 = cache.cached_result("q", {"p": 1}, compute)
    assert not hit1 and calls["n"] == 1 and df1.count() == 2

    df2, hit2 = cache.cached_result("q", {"p": 1}, compute)
    assert hit2 and calls["n"] == 1 and df2.count() == 2

    # different params -> different signature -> recompute
    _, hit3 = cache.cached_result("q", {"p": 2}, compute)
    assert not hit3 and calls["n"] == 2

    # expiry: max_age 0 forces refresh
    time.sleep(0.01)
    _, hit4 = cache.cached_result("q", {"p": 1}, compute, max_age_seconds=0.0)
    assert not hit4 and calls["n"] == 3

    assert query_signature("q", {"p": 1}) != query_signature("q", {"p": 2})


def test_display_subgraph_and_json(spark):
    nodes = spark.createDataFrame(
        [
            ("u1", "Article"), ("u2", "Article"), ("u3", "Article"),
            ("Gene:1", "gene"), ("Chemical:MESH:D1", "chemical"),
        ],
        ["id", "label"],
    )
    edges = spark.createDataFrame(
        [
            ("u1", "has_named_entity", "Gene:1"),
            ("u2", "has_named_entity", "Gene:1"),
            ("u3", "has_named_entity", "Chemical:MESH:D1"),
            ("u1", "citing", "u2"),
            ("u1", "citing", "u3"),
        ],
        ["src", "rel", "dst"],
    )
    dn, de = display_subgraph(nodes, edges, ["Gene:1"], count_literature=10)
    node_ids = {r["id"] for r in dn.collect()}
    assert node_ids == {"u1", "u2", "Gene:1"}
    edge_set = {(r["src"], r["rel"], r["dst"]) for r in de.collect()}
    assert ("u1", "citing", "u2") in edge_set           # induced citation
    assert ("u1", "citing", "u3") not in edge_set       # u3 not selected
    colors = {r["id"]: r["color"] for r in dn.collect()}
    assert colors["Gene:1"] == "orange"
    assert colors["u1"] == "blue"

    payload = graph_to_json(dn, de)
    assert len(payload["nodes"]) == 3
    assert {e["data"]["rel"] for e in payload["edges"]} == {
        "has_named_entity", "citing",
    }


def test_layout_2d_canvas(spark):
    emb = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0]), ("b", [0.0, 1.0, 0.0]), ("c", [0.0, 0.0, 1.0])],
        "id string, embedding array<double>",
    )
    xy = {r["id"]: (r["x"], r["y"]) for r in layout_2d(emb, canvas_scale=100.0).collect()}
    assert set(xy) == {"a", "b", "c"}
    for x, y in xy.values():
        assert 0.0 <= x <= 100.0 and 0.0 <= y <= 100.0
    # deterministic
    xy2 = {r["id"]: (r["x"], r["y"]) for r in layout_2d(emb, canvas_scale=100.0).collect()}
    assert xy == xy2

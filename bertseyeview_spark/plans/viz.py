"""J8/C17/C18 + G3 — graph visualization export.

Reference analogues: the Streamlit graph tab builds virtual display
edges with apoc.create.vRelationship (knowledge-graph-streamlit/src/
helper.py:153-238), converts bolt records to styled node/edge JSON
(shared/helper/neo4j_helper.py:1741-1867 with per-label colors from
shared/helper/graph_classes.py / get_color_for_label), and lays nodes
out with client-side node2vec+TSNE (:1815-1860).

Here: plain joins produce the display edge DataFrame (no store
mutation), styling is a ``when`` chain, and the 2-D layout uses the
engine's node2vec embeddings reduced by a seeded random projection —
sklearn isn't in this container, so t-SNE proper is gated behind an
import-try (documented stub; the projection keeps the plumbing real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-label display colors (reference get_color_for_label,
# neo4j_helper.py:104-112: chemical green, gene orange, Article blue,
# default grey)
_LABEL_COLORS = [("chemical", "green"), ("gene", "orange"), ("Article", "blue")]


def label_color_expr(label_col):
    expr = None
    for label, color in _LABEL_COLORS:
        cond = F.when(F.col(label_col) == label, F.lit(color))
        expr = cond if expr is None else expr.when(
            F.col(label_col) == label, F.lit(color)
        )
    return expr.otherwise(F.lit("grey"))


def display_subgraph(
    nodes: DataFrame,
    edges: DataFrame,
    selected_ids: list[str],
    count_literature: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Virtual display graph around a selection: the selected entities,
    articles mentioning them (capped at count_literature * |selection|,
    reference S:197), and the induced edges. Pure joins — no mutation.
    """
    sel = F.col("dst").isin(selected_ids)
    mention = edges.where((F.col("rel") == "has_named_entity") & sel)
    limit_n = count_literature * max(len(selected_ids), 1)
    articles = (
        mention.select(F.col("src").alias("id")).distinct().limit(limit_n)
    )
    keep_edges = (
        mention.join(articles.withColumnRenamed("id", "src"), "src", "semi")
        .select("src", "rel", "dst")
    )
    cite = (
        edges.where(F.col("rel") == "citing")
        .join(articles.withColumnRenamed("id", "src"), "src", "semi")
        .join(articles.withColumnRenamed("id", "dst"), "dst", "semi")
        .select("src", "rel", "dst")
    )
    display_edges = keep_edges.unionByName(cite)
    node_ids = (
        display_edges.select(F.col("src").alias("id"))
        .union(display_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    display_nodes = nodes.join(node_ids, "id", "semi").withColumn(
        "color", label_color_expr("label")
    )
    return display_nodes, display_edges


def graph_to_json(display_nodes: DataFrame, display_edges: DataFrame) -> dict:
    """Node/edge dict payload for a frontend (reference
    neo4j_response_to_json). Collects — viz outputs are small by
    construction (the display cap above)."""
    nodes = [
        {"data": {"id": r["id"], "label": r["label"], "color": r["color"]}}
        for r in display_nodes.collect()
    ]
    edges = [
        {"data": {"source": r["src"], "target": r["dst"], "rel": r["rel"]}}
        for r in display_edges.collect()
    ]
    return {"nodes": nodes, "edges": edges}


def layout_2d(
    embeddings: DataFrame,
    canvas_scale: float = 2000.0,
    method: str = "tsne",
    n_iter: int = 500,
) -> DataFrame:
    """(id, embedding) -> (id, x, y) for plotting.

    Reference uses client-side node2vec + sklearn TSNE + min-max
    scaling to a canvas (neo4j_helper.py:1815-1860). The reduction here
    is a real exact t-SNE implemented from the published algorithm in
    pure numpy (functions/tsne.py — sklearn is not in this container),
    run driver-side like the reference's client-side step; viz inputs
    are display-capped so n^2 affinities are trivial.
    ``method="projection"`` keeps the cheap seeded linear projection
    for callers that only need a stable scatter."""
    import numpy as np

    rows = embeddings.collect()  # viz-sized inputs only
    ids = [r["id"] for r in rows]
    mat = np.array([list(r["embedding"]) for r in rows], dtype=float)
    if method == "tsne" and len(ids) > 2:
        from ..functions.tsne import tsne_2d

        xy = tsne_2d(mat, n_iter=n_iter, seed=0)
    else:
        rng = np.random.RandomState(0)
        proj = rng.standard_normal((mat.shape[1], 2))
        xy = mat @ proj
    lo, hi = xy.min(axis=0), xy.max(axis=0)
    span = np.where((hi - lo) > 0, hi - lo, 1.0)
    xy = (xy - lo) / span * canvas_scale
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in zip(ids, xy)],
        "id string, x double, y double",
    )

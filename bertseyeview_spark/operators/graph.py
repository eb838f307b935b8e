"""E6 — materialize the labeled property graph as nodes/edges tables.

Reference analogue: LOAD CSV + MERGE upserts into Neo4j
(shared/helper/neo4j_helper.py:2190-2241), per-label name indexes
(:2136-2152), Null-node cleanup (:2128-2129), duplicate-edge cleanup
(:2120-2124). Here the graph IS two tables (SURVEY.md §1.4):

    nodes(id string, label string)         -- identity = (label, id)
    edges(src string, rel string, dst string)

MERGE semantics == ``dropDuplicates`` before write; the per-label name
index == partitioning the nodes table by ``label`` (+ bucketing by id
at real scale); Iceberg ``MERGE INTO`` handles incremental upserts in
production (parquet overwrite stands in locally — jars not bundled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# entity-id prefix -> node label (reference label set,
# neo4j_helper.py:2136-2152 + input/als/cytoscape_attributes.json)
_LABEL_RULES: list[tuple[str, str]] = [
    ("Keyword:", "Keyword"),
    ("Gene:", "gene"),
    ("Disease:", "disease"),
    ("Chemical:", "chemical"),
    ("Species:", "species"),
    ("Mutation:", "mutation"),
    ("CellLine:", "cellline"),
]


def node_label_expr(col):
    """id -> label: Article for urls, per-prefix entity labels, else
    'entity'. Pure when/otherwise chain — codegen'd."""
    expr = F.when(
        F.col(col).startswith("http://") | F.col(col).startswith("https://"),
        F.lit("Article"),
    )
    for prefix, label in _LABEL_RULES:
        expr = expr.when(F.col(col).startswith(prefix), F.lit(label))
    return expr.otherwise(F.lit("entity"))


def union_edges(*edge_dfs: DataFrame) -> DataFrame:
    """Union edge sources (mention/citing/contains/relation) and dedup.
    The dedup is one hash shuffle on (src, rel, dst); upstream stages
    already deduped locally so the exchange carries near-final rows."""
    out = edge_dfs[0]
    for e in edge_dfs[1:]:
        out = out.unionByName(e)
    return out.dropDuplicates(["src", "rel", "dst"])


def cleanup_null_nodes(edges: DataFrame) -> DataFrame:
    """Reference F8 (cleanup_null_nodes, neo4j_helper.py:2128-2129):
    drop edges touching the Null node. Done as an early filter rather
    than a post-hoc delete — Null surfaces are stopword-like mega-hubs
    at web scale and must never reach the shuffle."""
    return edges.where((F.col("src") != "Null") & (F.col("dst") != "Null"))


def derive_nodes(edges: DataFrame) -> DataFrame:
    """Edge endpoints -> deduped node table with labels.

    The union is two column-pruned passes over the edge table; the
    distinct is one shuffle keyed on id. At scale, write partitioned by
    label (the per-label index analogue).
    """
    ids = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    )
    return (
        ids.distinct()
        .withColumn("label", node_label_expr("id"))
        .select("id", "label")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected projection (reference gds.graph.project with
    orientation UNDIRECTED, __main__.py:1193-1247): add reversed rows."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("rel"), F.col("src").alias("dst")
    )
    return edges.unionByName(rev).dropDuplicates(["src", "rel", "dst"])


def project_subgraph(edges: DataFrame, rels: list[str], undirected: bool = False) -> DataFrame:
    """Filtered relationship view (reference G8 graph projection)."""
    sub = edges.where(F.col("rel").isin(rels))
    return symmetrize(sub) if undirected else sub

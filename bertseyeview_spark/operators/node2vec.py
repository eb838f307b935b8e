"""G2 — node embeddings: random walks + Word2Vec, DataFrame-native.

Reference analogue: gds.node2vec.stream over multi-label undirected
projections (shared/helper/neo4j_helper.py:1645-1671; nine embedding
runs at knowledge-graph-manager/__main__.py:1486-1572, params dim 128 /
50 walks x len 80 / 4 iterations). GDS runs inside the Neo4j JVM; here
the walk corpus is generated as an **iterative DataFrame join** (one
hash join on the frontier per step, ``localCheckpoint`` to keep lineage
flat) and the skip-gram fit is ``pyspark.ml.feature.Word2Vec`` over the
walk "sentences" — both distributed, both deterministic:

* neighbor choice at (node, walk, step) is ``xxhash64(node, walk, step,
  seed) mod degree`` over the *sorted* adjacency list — seeded, no RNG
  state, identical at any parallelism;
* Word2Vec gets a fixed seed (its parallel SGD is still only
  reproducible per-partitioning — embeddings feed viz/similarity, not
  the scored triple set, so bit-parity is not required there).

First-order walks (p=q=1). True node2vec bias (return/in-out factors)
would carry the previous edge through the same join — noted, not
needed for triple P/R.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_adjacency(edges: DataFrame, undirected: bool = True) -> DataFrame:
    """(src, dst) -> (node, nbrs array<string> sorted). Sorting makes
    the hash-indexed neighbor choice deterministic."""
    e = edges.select("src", "dst")
    if undirected:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return (
        e.dropDuplicates()
        .groupBy(F.col("src").alias("node"))
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    )


def generate_walks(
    edges: DataFrame,
    walks_per_node: int = 10,
    walk_length: int = 20,
    seed: int = 42,
    undirected: bool = True,
    checkpoint_every: int = 5,
) -> DataFrame:
    """-> (walk_key, walk array<string>): walks_per_node walks of up to
    walk_length nodes from every node. Each step is one equi-join of
    the frontier against the adjacency table (both hash-partitioned on
    the node key, so consecutive steps reuse the exchange)."""
    adj = build_adjacency(edges, undirected).persist()

    starts = adj.select("node").crossJoin(
        F.broadcast(
            edges.sparkSession.range(walks_per_node).select(
                F.col("id").cast("int").alias("walk_i")
            )
        )
    )
    walks = starts.select(
        F.concat_ws("#", "node", "walk_i").alias("walk_key"),
        F.col("walk_i"),
        F.col("node").alias("cur"),
        F.array("node").alias("walk"),
    ).localCheckpoint()

    for step in range(1, walk_length):
        nxt_idx = (
            F.pmod(
                F.xxhash64(F.col("cur"), F.col("walk_i"), F.lit(step), F.lit(seed)),
                F.size("nbrs"),
            )
            + F.lit(1)
        ).cast("int")
        walks = (
            walks.join(adj, walks["cur"] == adj["node"], "left")
            .select(
                "walk_key",
                "walk_i",
                F.when(
                    F.col("nbrs").isNotNull(), F.element_at("nbrs", nxt_idx)
                )
                .otherwise(F.col("cur"))
                .alias("cur"),
                F.when(
                    F.col("nbrs").isNotNull(),
                    F.concat("walk", F.array(F.element_at("nbrs", nxt_idx))),
                )
                .otherwise(F.col("walk"))
                .alias("walk"),
            )
        )
        if step % checkpoint_every == 0 or step == walk_length - 1:
            walks = walks.localCheckpoint()
    adj.unpersist()
    return walks.select("walk_key", "walk")


def node2vec_embeddings(
    edges: DataFrame,
    dim: int = 64,
    walks_per_node: int = 10,
    walk_length: int = 20,
    seed: int = 42,
    min_count: int = 1,
    undirected: bool = True,
) -> DataFrame:
    """-> (id, embedding array<float>): Word2Vec skip-gram over walks."""
    from pyspark.ml.feature import Word2Vec

    walks = generate_walks(
        edges, walks_per_node, walk_length, seed, undirected
    )
    w2v = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        seed=seed,
        inputCol="walk",
        outputCol="_vec",
        windowSize=5,
        maxIter=1,
    )
    model = w2v.fit(walks)
    vectors = model.getVectors()  # (word, vector)
    to_arr = F.udf(lambda v: [float(x) for x in v], "array<float>")
    return vectors.select(
        F.col("word").alias("id"), to_arr("vector").alias("embedding")
    )

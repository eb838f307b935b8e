"""E7 — ArticleRank / PageRank as an iterative DataFrame loop.

Reference analogue: gds.articleRank.write over the Article/citing
projection (shared/helper/neo4j_helper.py:2154-2186; invoked from
knowledge-graph-manager/__main__.py:1322-1328, :1434-1439). ArticleRank
is the published PageRank variant that dampens hub influence by adding
the *average out-degree* to each source's out-degree in the
denominator:

    r_{t+1}(v) = (1 - d) + d * sum_{u -> v} r_t(u) / (out(u) + avgOut)

(plain PageRank is the avgOut = 0 special case, exposed via
``variant="pagerank"``).

Scale notes:
* one shuffle per iteration (groupBy dst), contributions combined
  map-side by the partial hash agg;
* **fixed iteration count** (GDS default maxIterations=20), not a
  float-threshold stop — keeps local[8] bit-identical to local[32];
* ``localCheckpoint`` every iteration truncates the lineage chain, the
  standard fix for iterative-DataFrame plan blowup;
* the rank table is repartitioned on id once and the edge table on src
  once, so every iteration's join reuses the same hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def article_rank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 20,
    variant: str = "article_rank",
    checkpoint_every: int = 5,
) -> DataFrame:
    """edges(src, dst) [direction src->dst] -> (id, rank).

    Only nodes appearing in the edge set are ranked (the reference
    guards the GDS call with citationCount > 0, __main__.py:1322-1328);
    isolated articles keep the implicit floor 1-d.
    """
    e = edges.select("src", "dst").dropDuplicates().persist()

    # Scale-adaptive partitioning for the iteration tables (guide §2.2/
    # §2.5): every iteration is its own tiny stage, so at small edge
    # counts the session-level shuffle width (cores, or 2-3x cluster
    # cores in production) just multiplies per-stage scheduling
    # overhead — 10 iterations x 32 near-empty tasks measured 6.3s for
    # a 150k-edge graph where 4 partitions run it in 4.4s. Derive the
    # width from the edge count (~50k edge rows, a few MB, per
    # partition) and cap it at the session's configured shuffle width
    # so cluster settings still dominate at scale. The count is a
    # ~free job on the just-persisted edge table.
    n_edges = e.count()
    conf = e.sparkSession.conf
    sess_parts = int(conf.get("spark.sql.shuffle.partitions"))
    p = max(1, min(sess_parts, -(-n_edges // 50_000)))
    # the width override (see the loop comment below) starts here so
    # the setup exchanges (vertex distinct, e_norm join) run at p too;
    # everything from here to the loop runs inside the try whose
    # ``finally`` restores the session width
    conf.set("spark.sql.shuffle.partitions", str(p))
    try:
        return _article_rank_body(
            e, p, variant, damping, iterations, checkpoint_every
        )
    finally:
        conf.set("spark.sql.shuffle.partitions", str(sess_parts))


def _article_rank_body(
    e: DataFrame,
    p: int,
    variant: str,
    damping: float,
    iterations: int,
    checkpoint_every: int,
) -> DataFrame:
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(p, "id")
        .persist()
    )

    out_deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    if variant == "article_rank":
        # broadcast 1-row scalar instead of a blocking collect: the
        # average folds into the e_norm checkpoint job (one driver
        # round-trip fewer; no job dedicated to a single double)
        avg_df = out_deg.agg(
            F.coalesce(F.avg("out_deg"), F.lit(0.0)).alias("_avg_out")
        )
        avg_out_col = F.col("_avg_out")
    else:
        avg_df = None
        avg_out_col = F.lit(0.0)

    # per-source normalization factor, attached to the edge table ONCE:
    # r*inv_norm needs inv_norm per *source*, and sources without
    # out-edges simply don't appear in e — so the per-iteration plan is
    # a single join + grouped sum instead of (norm join + filter + edge
    # join). Nodes with no out-edges contribute nothing (dangling mass
    # is not redistributed — matches the GDS formulation of ArticleRank).
    norm_src = out_deg
    if avg_df is not None:
        norm_src = norm_src.crossJoin(F.broadcast(avg_df))
    norm_src = norm_src.select(
        F.col("id").alias("src"),
        (F.lit(1.0) / (F.col("out_deg") + avg_out_col)).alias("inv_norm"),
    )
    e_norm = (
        e.join(norm_src, "src")
        .select(F.col("src").alias("id"), "dst", "inv_norm")
        .repartition(p, "id")
        .localCheckpoint()
    )

    ranks = vertices.select("id", F.lit(1.0).alias("rank")).localCheckpoint()

    # the loop's per-iteration aggregation exchanges also run at the
    # derived width p (the caller's set/restore of the session shuffle
    # width covers this body): the groupBy keeps its map-side partial
    # aggregation — the hub-skew compressor a manual repartition(dst)
    # would forfeit — while its output stays co-partitioned with the
    # p-partitioned vertex/edge tables, so no iteration pays a
    # width-mismatch exchange. The checkpoint calls inside the loop
    # are what plan (and therefore consume) the override.
    for it in range(iterations):
        contribs = (
            ranks.join(e_norm, "id")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("inv_norm")).alias("incoming"))
        )
        ranks = vertices.join(contribs, "id", "left").select(
            "id",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))
            ).alias("rank"),
        )
        # checkpoint every few rounds: enough to keep lineage flat,
        # without paying a materialization job per iteration. Cadence 5
        # measured best on the 10-iteration sf0.1 graph (4.44s vs
        # 4.77s at 4, 5.86s at 2, 4.84s at 10 — too-frequent pays
        # materialization jobs, too-rare pays deep-unrolled codegen);
        # output hash identical at every cadence.
        if it % checkpoint_every == checkpoint_every - 1 or it == iterations - 1:
            ranks = ranks.localCheckpoint()

    e.unpersist()
    vertices.unpersist()
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Personalized PageRank: random walk with restart into a source
    set — (id, rank). ``sources`` is a one-column (id) frame; restart
    mass is split uniformly over it:

        r_{t+1}(v) = (1-d) * restart(v) + d * sum_{u->v} r_t(u)/out(u)

    The GDS-family companion to :func:`article_rank` (same invocation
    surface, neo4j_helper.py:2154-2186) used for "relevance to THESE
    seed entities" ranking — e.g. ranking the KG neighborhood of a
    query's linked entities instead of global prestige.

    Same scale discipline as article_rank: inv_norm pre-joined onto
    edges once, ONE join + grouped sum per iteration, fixed iteration
    count, localCheckpoint every 5 rounds. The restart vector rides the
    vertex table as a column (one broadcast-sized left semi-join up
    front, never per iteration); dangling mass is dropped, matching the
    article_rank convention."""
    from .graph import derived_shuffle_width

    e = edges.select("src", "dst").dropDuplicates().persist()
    n_edges = e.count()
    with derived_shuffle_width(e, n_edges) as p:
        return _personalized_pagerank_body(e, sources, damping, iterations, p)


def _personalized_pagerank_body(
    e: DataFrame,
    sources: DataFrame,
    damping: float,
    iterations: int,
    p: int,
) -> DataFrame:
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(p, "id")
    )
    src_ids = sources.select(F.col(sources.columns[0]).alias("id")).distinct()
    n_sources = src_ids.count()
    if n_sources == 0:
        raise ValueError("personalized_pagerank needs a non-empty source set")
    restart = F.when(
        F.col("_is_src"), F.lit(1.0 / n_sources)
    ).otherwise(F.lit(0.0))
    vertices = (
        vertices.join(
            F.broadcast(src_ids.withColumn("_is_src", F.lit(True))),
            "id",
            "left",
        )
        .select("id", F.coalesce("_is_src", F.lit(False)).alias("_is_src"))
        .persist()
    )
    out_deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )
    norm_src = out_deg.select(
        F.col("id").alias("src"),
        (F.lit(1.0) / F.col("out_deg")).alias("inv_norm"),
    )
    e_norm = (
        e.join(norm_src, "src")
        .select(F.col("src").alias("id"), "dst", "inv_norm")
        .repartition(p, "id")
        .localCheckpoint()
    )
    ranks = vertices.select("id", restart.alias("rank")).localCheckpoint()
    for it in range(iterations):
        contribs = (
            ranks.join(e_norm, "id")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("inv_norm")).alias("incoming"))
        )
        ranks = vertices.join(contribs, "id", "left").select(
            "id",
            (
                F.lit(1.0 - damping) * restart
                + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))
            ).alias("rank"),
        )
        if it % 5 == 4 or it == iterations - 1:  # cadence measured in article_rank
            ranks = ranks.localCheckpoint()
    e.unpersist()
    vertices.unpersist()
    return ranks


def hits_scores(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """HITS hubs & authorities over directed edges(src, dst) ->
    (id, auth, hub), L1-normalized once after a FIXED iteration count.

    Complements :func:`article_rank` the way the reference's graph-
    algorithm surface does (gds.* invocations in
    shared/helper/neo4j_helper.py:2154-2186 — ArticleRank is the one
    wired up; HITS is the standard companion for citation graphs).

    Scale/determinism notes (same discipline as article_rank):
    * two shuffles per iteration (groupBy dst for auth, groupBy src for
      hub), both map-side combined;
    * fixed iterations, not a convergence threshold — local[8] ==
      local[32];
    * normalization deferred to ONE final pass (the per-iteration
      normalization of textbook HITS only rescales — at a fixed
      iteration count the normalized result is identical, and skipping
      it saves 2 global aggregates per iteration); the final L1 scalars
      join in as broadcast 1-row relations, no collect;
    * localCheckpoint every other iteration keeps lineage flat.
    """
    if iterations < 1:
        raise ValueError("hits_scores needs at least one iteration")
    from .graph import derived_shuffle_width

    e = edges.select("src", "dst").dropDuplicates().persist()
    # iteration loop at an edge-count-derived width (the article_rank
    # pattern; see graph.derived_shuffle_width)
    with derived_shuffle_width(e, e.count()) as p:
        vertices = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
            .repartition(p, "id")
            .persist()
        )
        # only hubs need initialization: iteration 0 derives auths from
        # them before any read of a prior auth value (matching the SQL
        # oracle, which declares h0 only)
        hubs = vertices.select("id", F.lit(1.0).alias("hub")).localCheckpoint()
        auths = None
        for it in range(iterations):
            auth_in = (
                hubs.join(e, hubs["id"] == e["src"])
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("hub").alias("x"))
            )
            auths = vertices.join(auth_in, "id", "left").select(
                "id", F.coalesce("x", F.lit(0.0)).alias("auth")
            )
            hub_in = (
                auths.join(e, auths["id"] == e["dst"])
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("auth").alias("x"))
            )
            hubs = vertices.join(hub_in, "id", "left").select(
                "id", F.coalesce("x", F.lit(0.0)).alias("hub")
            )
            if it % 2 == 1 or it == iterations - 1:
                auths = auths.localCheckpoint()
                hubs = hubs.localCheckpoint()
        a_sum = auths.agg(F.sum("auth").alias("a_sum"))
        h_sum = hubs.agg(F.sum("hub").alias("h_sum"))
        out = (
            auths.join(hubs, "id")
            .crossJoin(F.broadcast(a_sum))
            .crossJoin(F.broadcast(h_sum))
            .select(
                "id",
                F.round(F.col("auth") / F.col("a_sum"), 6).alias("auth"),
                F.round(F.col("hub") / F.col("h_sum"), 6).alias("hub"),
            )
        )
        out = out.localCheckpoint(eager=True)
    e.unpersist(blocking=True)
    vertices.unpersist(blocking=True)
    return out


def attach_rank(nodes: DataFrame, ranks: DataFrame) -> DataFrame:
    """nodes(id, label) + ranks(id, rank) -> nodes with a rank column
    (reference writes article_rank as a node property,
    neo4j_helper.py:2172-2179)."""
    return nodes.join(ranks, "id", "left").select(
        "id", "label", F.coalesce(F.col("rank"), F.lit(0.0)).alias("rank")
    )

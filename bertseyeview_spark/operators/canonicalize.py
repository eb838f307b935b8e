"""E5 — entity canonicalization: merge duplicate entity ids.

Reference analogue: curation merges/renames driven by
input/global/curate_annotations.json through apoc.refactor.mergeNodes
(shared/helper/neo4j_helper.py:803-880) — a hand-written (from -> to)
map applied node-at-a-time. The scalable generalization (north rule) is:

1. build *merge-candidate pairs* from (a) explicit curation rules,
   (b) entity ids sharing an alias AND embedding-similar, and
   (c) an LSH-bucketed embedding similarity self-join (random
   hyperplane signatures -> band buckets -> within-bucket cosine);
2. run **connected components** over the pair graph (iterative
   min-label propagation on DataFrames, the public "hash-to-min"
   scheme; ``localCheckpoint`` per iteration truncates lineage);
3. canonical id = lexicographically smallest member of each component
   (deterministic across parallelism levels);
4. remap the edge table through the resulting (entity_id ->
   canonical_id) map with two left joins + ``coalesce``.

Note sharing a surface alone is NOT merge-worthy — truly ambiguous
aliases (one surface, two different real-world entities, e.g. disease
ALS vs gene ALR) must stay separate, hence the embedding-similarity
conjunct in (b).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_N_PLANES = 16  # LSH signature bits
_N_BANDS = 4    # 4 bands x 4 bits


def curation_pairs(curation_rules: DataFrame) -> DataFrame:
    """curation_rules(method, from_id, to_id) -> undirected pair rows (a, b)."""
    return (
        curation_rules.where(F.col("method").isin("merge", "rename"))
        .select(F.col("from_id").alias("a"), F.col("to_id").alias("b"))
    )


def _lsh_signature_df(entities: DataFrame, seed: int = 7) -> DataFrame:
    """entity (entity_id, embedding:array<double>) -> one row per band:
    (entity_id, band, sig). Random hyperplanes are seeded-deterministic
    and generated identically on every worker."""
    fields = "entity_id string, band int, sig int, embedding array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dim = None
        planes = None
        for pdf in batches:
            ids, bands, sigs, embs = [], [], [], []
            for eid, emb in zip(pdf["entity_id"], pdf["embedding"]):
                v = np.asarray(emb, dtype=np.float64)
                if planes is None:
                    dim = len(v)
                    rng = np.random.RandomState(seed)
                    planes = rng.standard_normal((_N_PLANES, dim))
                bits = (planes @ v) > 0
                per_band = _N_PLANES // _N_BANDS
                for b in range(_N_BANDS):
                    chunk = bits[b * per_band : (b + 1) * per_band]
                    sig = int(sum(int(x) << i for i, x in enumerate(chunk)))
                    ids.append(eid)
                    bands.append(b)
                    sigs.append(sig)
                    embs.append(list(v))
            yield pd.DataFrame(
                {
                    "entity_id": pd.Series(ids, dtype="object"),
                    "band": pd.Series(bands, dtype="int32"),
                    "sig": pd.Series(sigs, dtype="int32"),
                    "embedding": pd.Series(embs, dtype="object"),
                }
            )

    return entities.mapInPandas(run, schema=fields)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def similarity_pairs(
    alias_dict: DataFrame,
    threshold: float = 0.90,
    use_lsh: bool = True,
    max_alias_freq: int = 64,
) -> DataFrame:
    """Merge-candidate pairs among canonical entity ids.

    (b) same-alias + cosine >= threshold;
    (c) LSH-banded embedding self-join + cosine >= threshold
        (same entity under two namespaces usually has no shared alias).

    Embeddings in the dictionary are unit-norm, so cosine == dot.
    At 10^8 dictionary entries the LSH path shuffles only
    (band, sig)-bucketed candidates instead of the full cross join.

    ``max_alias_freq`` caps the shared-alias self-join: an alias mapped
    to f entity ids yields f^2 candidate rows, and at web scale a single
    stopword-like surface (f ~ 10^5) would dominate the whole shuffle.
    Aliases above the cap are excluded from path (b) — they are exactly
    the surfaces too ambiguous to justify a merge, and genuinely
    duplicate ids they cover are still caught by the LSH path (c).
    """
    ents = (
        alias_dict.where(F.col("entity_id") != "Null")
        .select("alias", "entity_id", F.col("embedding").cast("array<double>").alias("emb"))
    )

    # (b) shared alias, frequency-capped (see docstring). The SMALL set
    # is the over-cap complement (a handful of stopword-like surfaces),
    # so broadcast THAT and anti-join — broadcasting the under-cap side
    # would ship nearly the whole dictionary to every executor.
    freq_bad = (
        ents.groupBy("alias")
        .agg(F.count("*").alias("_f"))
        .where(F.col("_f") > max_alias_freq)
        .select("alias")
    )
    capped = ents.join(F.broadcast(freq_bad), "alias", "left_anti")
    l = capped.select("alias", F.col("entity_id").alias("a"), F.col("emb").alias("ea"))
    r = capped.select("alias", F.col("entity_id").alias("b"), F.col("emb").alias("eb"))
    shared = (
        l.join(r, "alias")
        .where(F.col("a") < F.col("b"))
        .withColumn("sim", _dot("ea", "eb"))
        .where(F.col("sim") >= threshold)
        .select("a", "b")
    )
    if not use_lsh:
        return shared.dropDuplicates()

    # (c) LSH over one representative embedding per entity id
    reps = (
        ents.groupBy("entity_id")
        .agg(F.min_by("emb", "alias").alias("embedding"))
        .select("entity_id", "embedding")
    )
    sigs = _lsh_signature_df(reps)
    sl = sigs.select(
        "band", "sig", F.col("entity_id").alias("a"), F.col("embedding").alias("ea")
    )
    sr = sigs.select(
        "band", "sig", F.col("entity_id").alias("b"), F.col("embedding").alias("eb")
    )
    lsh = (
        sl.join(sr, ["band", "sig"])
        .where(F.col("a") < F.col("b"))
        .withColumn("sim", _dot("ea", "eb"))
        .where(F.col("sim") >= threshold)
        .select("a", "b")
    )
    return shared.unionByName(lsh).dropDuplicates()


def connected_components(
    pairs: DataFrame,
    max_iter: int = 25,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Undirected pair rows (a, b) -> (entity_id, canonical_id).

    Iterative min-label propagation: comp(v) <- min(comp(v),
    min_{u ~ v} comp(u)) until fixpoint; converges in O(diameter)
    rounds (entity-duplicate clusters are tiny, so 2-4 rounds in
    practice). Each round is one shuffle; ``localCheckpoint`` cuts the
    lineage so round k doesn't replay rounds 1..k-1. Canonical = min
    string id in the component — deterministic regardless of
    partitioning, so local[8] == local[32].

    ``fixed_iterations`` skips the per-round convergence-count job —
    use when the caller knows the component diameter bound (e.g.
    curation/alias merge clusters): fewer driver round-trips, same
    result as long as fixed_iterations >= diameter.
    """
    if fixed_iterations is not None:
        max_iter = fixed_iterations
    edges = (
        pairs.select("a", "b")
        .union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .dropDuplicates()
        .persist()
    )
    # scale-adaptive width for the per-round exchanges (the article_rank
    # pattern, rank.py): each round is its own tiny stage, so session-
    # width shuffles of a small pair graph pay mostly scheduling; derive
    # the width from the edge count (~50k rows/partition), cap at the
    # session setting so cluster configs dominate at scale. The count is
    # ~free on the just-persisted edges and doubles as materialization.
    n_edges = edges.count()
    conf = edges.sparkSession.conf
    sess_parts = int(conf.get("spark.sql.shuffle.partitions"))
    p = max(1, min(sess_parts, -(-n_edges // 50_000)))
    conf.set("spark.sql.shuffle.partitions", str(p))
    try:
        comp = (
            edges.select(F.col("a").alias("id"))
            .union(edges.select(F.col("b").alias("id")))
            .distinct()
            .withColumn("comp", F.col("id"))
            .localCheckpoint()
        )
        for _ in range(max_iter):
            nbr_min = (
                edges.join(comp, edges["b"] == comp["id"])
                .groupBy(F.col("a").alias("id"))
                .agg(F.min("comp").alias("nbr_comp"))
            )
            new_comp = (
                comp.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                    ).alias("comp"),
                )
                .localCheckpoint()
            )
            if fixed_iterations is None:
                changed = (
                    new_comp.alias("n")
                    .join(comp.alias("o"), "id")
                    .where(F.col("n.comp") != F.col("o.comp"))
                    .limit(1)
                    .count()
                )
                comp = new_comp
                if changed == 0:
                    break
            else:
                comp = new_comp
    finally:
        conf.set("spark.sql.shuffle.partitions", str(sess_parts))
    edges.unpersist()
    return comp.select(
        F.col("id").alias("entity_id"), F.col("comp").alias("canonical_id")
    )


def build_canonical_map(
    spark: SparkSession,
    curation_rules: DataFrame | None = None,
    alias_dict: DataFrame | None = None,
    threshold: float = 0.90,
    fixed_cc_iterations: int | None = 8,
    max_alias_freq: int = 64,
) -> DataFrame:
    """Union all pair sources, run CC, keep only rows that actually
    remap (entity_id != canonical_id) so the downstream join stays small
    and broadcastable.

    Merge clusters from curation rules (depth-1 from->to maps) and
    alias/embedding similarity are shallow; 8 fixed min-propagation
    rounds cover diameter <= 8 without per-round convergence jobs.
    Pass ``fixed_cc_iterations=None`` to fall back to convergence-
    checked iteration for adversarial graphs."""
    sources = []
    if curation_rules is not None:
        sources.append(curation_pairs(curation_rules))
    if alias_dict is not None:
        sources.append(
            similarity_pairs(
                alias_dict, threshold, max_alias_freq=max_alias_freq
            )
        )
    if not sources:
        return spark.createDataFrame([], "entity_id string, canonical_id string")
    pairs = sources[0]
    for s in sources[1:]:
        pairs = pairs.unionByName(s)
    cc = connected_components_auto(
        spark, pairs, fixed_iterations=fixed_cc_iterations
    )
    return cc.where(F.col("entity_id") != F.col("canonical_id"))


# dictionaries below this row count are canonicalized entirely on the
# driver (one collect + numpy cosine + union-find) — the distributed
# LSH/CC path costs several fixed seconds of stage latency that a
# 10^4-entry dictionary never justifies
DRIVER_SIM_MAX_ROWS = 50_000


def build_canonical_map_auto(
    spark: SparkSession,
    curation_rules: DataFrame | None = None,
    alias_dict: DataFrame | None = None,
    threshold: float = 0.90,
) -> DataFrame:
    """Size-dispatched :func:`build_canonical_map`: small dictionaries
    run as one collect + exact numpy cosine + union-find; large ones
    take the distributed LSH + connected-components path. Same output —
    including the shared-alias frequency cap, which both paths apply
    identically (the dispatch must never change the merge decision)."""
    import numpy as np

    max_alias_freq = 64  # keep in sync with similarity_pairs' default
    if alias_dict is None:
        return build_canonical_map(spark, curation_rules, alias_dict, threshold)
    # count-probe first (a few bytes to the driver); rows only travel
    # after the dictionary has proven it fits the driver path
    n = alias_dict.limit(DRIVER_SIM_MAX_ROWS + 1).count()
    if n > DRIVER_SIM_MAX_ROWS:
        return build_canonical_map(spark, curation_rules, alias_dict, threshold)
    rows = alias_dict.select("alias", "entity_id", "embedding").collect()

    pairs: list[tuple[str, str]] = []
    if curation_rules is not None:
        for r in curation_rules.collect():
            if r["method"] in ("merge", "rename"):
                pairs.append((r["from_id"], r["to_id"]))

    ents = [
        (r["alias"], r["entity_id"], np.asarray(r["embedding"] or [], dtype=float))
        for r in rows
        if r["entity_id"] != "Null"
    ]
    # (b) shared alias + cosine, with the same frequency cap the
    # distributed path applies (dispatch-path parity)
    by_alias: dict[str, list[tuple[str, np.ndarray]]] = {}
    for alias, eid, emb in ents:
        by_alias.setdefault(alias, []).append((eid, emb))
    for cands in by_alias.values():
        if len(cands) > max_alias_freq:
            continue
        for i in range(len(cands)):
            for j in range(i + 1, len(cands)):
                a, ea = cands[i]
                b, eb = cands[j]
                if a != b and ea.size and eb.size and float(ea @ eb) >= threshold:
                    pairs.append((a, b))
    # (c) exact cosine among entity representatives (min alias per id)
    reps: dict[str, tuple[str, np.ndarray]] = {}
    for alias, eid, emb in ents:
        if emb.size and (eid not in reps or alias < reps[eid][0]):
            reps[eid] = (alias, emb)
    ids = sorted(reps)
    if ids:
        mat = np.stack([reps[i][1] for i in ids])
        sims = mat @ mat.T
        ii, jj = np.where(sims >= threshold)
        for i, j in zip(ii, jj):
            if i < j:
                pairs.append((ids[i], ids[j]))

    # union-find, canonical = min id
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(n, find(n)) for n in parent if find(n) != n]
    if not out:
        return spark.createDataFrame([], "entity_id string, canonical_id string")
    return spark.createDataFrame(out, "entity_id string, canonical_id string")


# merge-pair graphs below this size run as driver-side union-find: the
# distributed loop costs ~1-2s of stage latency per round, while a
# million-pair union-find is milliseconds in-process. Above it, the
# iterative DataFrame CC takes over (the 10^12-doc path).
DRIVER_CC_MAX_PAIRS = 2_000_000


def connected_components_auto(
    spark: SparkSession,
    pairs: DataFrame,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Size-dispatched connected components: driver union-find for
    small pair graphs, iterative min-label propagation otherwise.
    Same output either way (canonical = min id in component).

    The dispatch probe is a limit+count (a few bytes back to the
    driver); the pairs only travel to the driver after the probe has
    proven they fit — never pull O(data) rows just to decide."""
    pairs = pairs.persist()
    n = pairs.limit(DRIVER_CC_MAX_PAIRS + 1).count()
    if n > DRIVER_CC_MAX_PAIRS:
        out = connected_components(pairs, fixed_iterations=fixed_iterations)
        pairs.unpersist()
        return out
    sample = pairs.collect()
    pairs.unpersist()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in sample:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            # union by min id keeps the canonical deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    if not rows:
        return spark.createDataFrame([], "entity_id string, canonical_id string")
    return spark.createDataFrame(rows, "entity_id string, canonical_id string")


def apply_canonical_map(edges: DataFrame, cmap: DataFrame) -> DataFrame:
    """Remap edge endpoints through the canonical map (broadcast —
    merge maps are tiny relative to the edge set) and re-dedup.
    Mirrors apoc.refactor.to/from + duplicate-edge cleanup
    (neo4j_helper.py:706-801, :2120-2124) as two joins."""
    src_map = F.broadcast(
        cmap.select(
            F.col("entity_id").alias("src"), F.col("canonical_id").alias("src_c")
        )
    )
    dst_map = F.broadcast(
        cmap.select(
            F.col("entity_id").alias("dst"), F.col("canonical_id").alias("dst_c")
        )
    )
    return (
        edges.join(src_map, "src", "left")
        .join(dst_map, "dst", "left")
        .select(
            F.coalesce("src_c", "src").alias("src"),
            F.col("rel"),
            F.coalesce("dst_c", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "rel", "dst"])
    )

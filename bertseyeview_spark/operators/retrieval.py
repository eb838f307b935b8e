"""Full-text retrieval scoring — TF-IDF / BM25 over the corpus.

The reference's search surface is attribute predicates (F5/F6, see
analytics.search); a corpus engine at web scale also needs ranked
text retrieval. BM25 (the published Robertson/Sparck-Jones ranking
function, the default in Lucene/Elasticsearch) decomposes into exactly
the relational pieces Catalyst is good at:

    tf   — explode QUERY-matching tokens only, count per (doc, term)
    df   — count distinct docs per term               [same tiny pass]
    idf  — ln((N - df + 0.5)/(df + 0.5) + 1)          [scalar math]
    norm — doc length / corpus average length         [broadcast 1-row]

The token array is built once per document; corpus stats (n_docs,
avg_dl) come from its size without any explode, and the explode that
feeds tf/df is fused with a codegen In/InSet filter so only tokens
present in the query survive to the shuffle — the corpus text is
scanned twice but its tokens never leave the generating codegen stage.

so the whole scorer is two grouped aggregations plus broadcast scalars
— no UDFs, no per-row Python, and the arithmetic is exactly
replayable in ANSI SQL for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 25,
) -> DataFrame:
    """Rank documents by BM25 against a bag of query terms.

    Returns (id, score, n_terms_hit) for the top_n docs, ties broken by
    id — deterministic at any parallelism. Query terms are lowercased;
    document tokenization is whitespace (the engine's standard token
    model). At 100 TB the tf/df pass is the classic inverted-index
    build: one explode + grouped count, partial aggregation map-side.
    """
    terms = [t.lower() for t in query_terms]
    # per-doc token array once; dl = its size (no explode needed for
    # corpus stats). The query-term restriction is an explode followed
    # immediately by an ``isin`` filter — a codegen In/InSet expression,
    # NOT a higher-order ``F.filter`` lambda (HOF lambdas evaluate
    # interpreted, a measured ~6x penalty on corpus-scale scans). The
    # explode+filter fuse into one WholeStageCodegen stage, so exploded
    # non-matching tokens die inside the stage and only query-matching
    # tokens ever reach the shuffle. At 100 TB the plan is: one
    # column-pruned scan -> scalar agg for (n_docs, avg_dl), one scan
    # -> tiny shuffle of matched terms.
    # null-text docs carry no tokens: the explode-based formulation
    # (and the SQL oracle's unnest) never sees them, so they must not
    # inflate n_docs/avg_dl here either. Tokenization is the canonical
    # norm_tokens (edge-strip + empty guard): an empty/whitespace-only
    # doc contributes dl=0 to avg_dl instead of a phantom '' token
    # with dl=1 (the r6 tokenizer-drift class, ADVICE r6 #2)
    from .textquality import norm_tokens

    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        norm_tokens(text_col).alias("w"),
    ).select("id", F.size("w").alias("dl"), "w")

    # corpus scalars as a broadcast 1-row relation (no collect)
    scalars = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avg_dl")
    )

    # explode the tokenizer expression INLINE rather than the projected
    # `w` column: exploding an attribute makes InferFiltersFromGenerate
    # push a size-guard with the whole split expression into the scan
    # filter (extra full tokenizations per row — the gopher bigram
    # pathology, textquality.py). norm_tokens appears twice (size +
    # explode) but per ROW, which is cheap; `base` still feeds the
    # scalar aggregate unchanged.
    qt = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.size(norm_tokens(text_col)).alias("dl"),
        F.explode(norm_tokens(text_col)).alias("term"),
    ).where(F.col("term").isin(terms))
    tf = qt.groupBy("id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    # document frequency falls out of tf (one row per (doc, term)) —
    # no second tokenize pass over the corpus
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avg_dl")
                )
            ),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top_n)
    )

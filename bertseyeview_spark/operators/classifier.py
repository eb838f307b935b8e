"""Linear text-quality classifier scoring (fasttext-style inference).

Modern web-corpus pipelines gate documents with a trained quality
classifier (a linear model over token features — the published
CommonCrawl-filtering recipe). TRAINING happens offline; what the
100 TB pipeline needs is cheap distributed INFERENCE, which is just:

    logit(doc) = bias + sum_t tf(doc, t) * weight(t)
    score      = sigmoid(logit)

expressed as one explode + one broadcast join + one grouped sum — all
JVM-side, no UDFs, map-side combined. The weight table is tiny
(vocabulary-sized) and broadcasts; docs with no known tokens score
sigmoid(bias).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    bias: float = 0.0,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with a linear token-weight model.

    ``weights`` is (token string, weight double) — broadcast side.
    Returns (id, logit, score, quality_pass); logit/score rounded to 6
    (sum order is engine-dependent at the 1e-15 level; the rounding
    absorbs it, as in the rank operators).

    Contentless documents (NULL or whitespace-only text) always get
    ``quality_pass = false``: with the defaults (bias 0, threshold 0.5)
    their score is exactly sigmoid(0) = 0.5 and a plain ``>=`` gate
    would wave empty documents through the quality filter."""
    # canonical norm_tokens (edge-strip + empty guard): empty docs
    # explode to zero token rows instead of one phantom '' row (which
    # never matched a weight but was a drifted tokenizer copy —
    # ADVICE r6 #2)
    from .textquality import norm_tokens

    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.explode(norm_tokens(text_col)).alias("token"),
    )
    hits = toks.join(F.broadcast(weights), "token").groupBy("id").agg(
        F.sum("weight").alias("w_sum")
    )
    # regexp strip, not trim(): trim removes only ASCII spaces, so a
    # tab/newline-only document would still count as "has text" and
    # default-pass at score exactly 0.5. The whitespace set is an
    # explicit class, not \s — Java's \s includes \x0B (vertical tab)
    # while RE2-family engines exclude it, so a bare \s makes the
    # "contentless" judgement engine-dependent.
    has_text = F.col(text_col).isNotNull() & (
        F.regexp_replace(F.col(text_col), "[ \t\n\x0b\f\r]", "") != F.lit("")
    )
    ids = docs.select(F.col(id_col).alias("id"), has_text.alias("_has_text"))
    logit = F.lit(float(bias)) + F.coalesce(F.col("w_sum"), F.lit(0.0))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return (
        ids.join(hits, "id", "left")
        .select(
            "id",
            F.round(logit, 6).alias("logit"),
            F.round(score, 6).alias("score"),
            (F.col("_has_text") & (score >= F.lit(threshold))).alias(
                "quality_pass"
            ),
        )
    )

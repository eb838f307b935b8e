"""Single-plan (no checkpoint) KG construction: pages -> triples.

The same E1-E7 operator chain as :mod:`bertseyeview_spark.pipeline`
but composed as one in-memory DataFrame plan — used by the driver
entrypoint, the bench harness, and anywhere lineage/resume isn't
needed. The checkpointed pipeline is the production path; this is the
"run the whole thing as one Catalyst job" path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import alias_dict_to_spark, build_alias_dict, build_curation_rules
from ..operators import canonicalize as canon
from ..operators import graph as G
from ..operators.extract import citing_edges, extract_text
from ..operators.linking import link_mentions, link_triples, mention_edges
from ..operators.mentions import detect_mentions, keyword_matches
from ..operators.triples import extract_triples

_KEYWORDS_DEFAULT = ["therapy", "biomarker", "clinical trial", "prognosis"]


def construct_triples(
    spark: SparkSession,
    pages: DataFrame,
    alias_dict: DataFrame | None = None,
    curation_rules: DataFrame | None = None,
    keywords: list[str] | None = None,
    drop_dangling_citations: bool = True,
    ner_scorer_layers: int = 0,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> (subj, pred, obj)."""
    alias_dict = (
        alias_dict
        if alias_dict is not None
        else alias_dict_to_spark(spark, build_alias_dict())
    )
    curation_rules = (
        curation_rules
        if curation_rules is not None
        else spark.createDataFrame(build_curation_rules())
    )
    keywords = keywords or _KEYWORDS_DEFAULT

    extracted = extract_text(pages).persist()
    alias_list = [
        r["alias"] for r in alias_dict.select("alias").distinct().collect()
    ]
    ments = detect_mentions(
        extracted, alias_list, spark, scorer_layers=ner_scorer_layers
    ).drop("type_score" if ner_scorer_layers else "").persist()
    # linked feeds three consumers (mention edges + both sides of the
    # triple-resolution join) — persist or the whole linking subplan
    # (incl. the Python embedding UDF) re-executes per consumer
    linked = link_mentions(ments, alias_dict).persist()
    raw_triples = extract_triples(ments)

    staged = G.union_edges(
        mention_edges(linked),
        citing_edges(extracted),
        keyword_matches(extracted, keywords),
        link_triples(raw_triples, linked),
    )
    cmap = canon.build_canonical_map_auto(
        spark, curation_rules=curation_rules, alias_dict=alias_dict
    )
    edges = canon.apply_canonical_map(G.cleanup_null_nodes(staged), cmap)
    if drop_dangling_citations:
        # single-pass filter (rel != citing OR dst in corpus) — a union
        # of branches would execute the whole upstream subtree twice
        urls = extracted.select(F.col("url").alias("dst")).distinct().withColumn(
            "_in_corpus", F.lit(True)
        )
        edges = (
            edges.join(urls, "dst", "left")
            .where((F.col("rel") != "citing") | F.col("_in_corpus").isNotNull())
            .select("src", "rel", "dst")
        )
    return edges.select(
        F.col("src").alias("subj"),
        F.col("rel").alias("pred"),
        F.col("dst").alias("obj"),
    )


def documents_as_pages(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Adapt the driver's ``documents(doc_id, text, lang, ...)`` table to
    the input_hint pages shape: html is the utf-8 body wrapped in a
    deterministic template, so extraction is exercised for real and its
    byte-identity oracle is the original text."""
    return documents.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title></title></head><body><article><p>"),
                F.col("text"),
                F.lit("</p></article></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )

"""J5/S5 — the citation interchange-row composer.

Reference analogue: create_citation_csv + update_csv_content_by_json_
response (knowledge-graph-manager/__main__.py:977-1140, :781-975) build
one pipe-CSV row per citing edge, inlining BOTH endpoint articles'
metadata — title, pmc_id, epubdate, author string, journal, abstract,
relevant-keyword list, and the six per-bioconcept annotation strings —
into a 29-column interchange row consumed by the store's MERGE loader.

Spark-first shape: the edge table joins the (broadcast-or-shuffled)
metadata table twice — once per endpoint — after per-article scalar
prep. Every codec runs columnar: sanitization and the keyword quirk are
pure Catalyst; the date chain and author string are the byte-parity
pandas codecs (functions/codecs.py). Both endpoints must pass the
relevance filter (reference gates the article at the top of
create_citation_csv and each counterpart per row, __main__.py:1027,
:854).

``reference_id`` is the reference's global sequential ordinal. The
interchange file is inherently a single-consumer boundary artifact (the
reference writes ONE csv per integration step), so the default is a
deterministic global ``row_number`` ordered by (article, reference) —
one final single-task window over already-reduced interchange rows.
For sharded output at scale, pass ``id_shard_col`` to number rows
per-shard instead (each shard gets an independent dense range starting
at ``reference_id_start``, mirroring the reference's per-DOI files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.codecs import BIOCONCEPTS
from ..sources.csv_io import CITATION_COLUMNS

_META_COLS = [
    "title", "pmc_id", "epubdate", "authors", "journal", "abstract",
    "keywords",
]


def relevant_keywords_col(text_col, keywords: list[str]):
    """get_relevant_keywords (__main__.py:765-775) as a Catalyst
    expression: matched keywords are *prepended* in iteration order, so
    the output is the matched sublist in REVERSED config order,
    ','-joined, with the literal 'Null' when nothing matches."""
    rev = F.array(*[F.lit(k) for k in reversed(keywords)])
    low = F.lower(text_col)
    matched = F.filter(rev, lambda k: low.contains(F.lower(k)))
    return F.when(F.size(matched) > 0, F.array_join(matched, ",")).otherwise(
        F.lit("Null")
    )


def is_relevant_col(text_col, filter_terms: list[str]):
    """is_relevant (__main__.py:752-762): any term substring-matches,
    case-insensitive; an empty term list is always relevant."""
    if not filter_terms:
        return F.lit(True)
    terms = F.array(*[F.lit(t.lower()) for t in filter_terms])
    low = F.lower(text_col)
    return F.exists(terms, lambda t: low.contains(t))


def _sanitize(col):
    """'|' -> ';' then '"' stripped — the reference sanitizes fields
    before pipe-joining and strips quotes from the whole file."""
    return F.regexp_replace(F.regexp_replace(col, r"\|", ";"), '"', "")


def prepare_article_meta(
    meta: DataFrame,
    filter_terms: list[str],
    keywords: list[str],
) -> DataFrame:
    """Per-article scalar prep shared by both join sides.

    Input ``meta(id, title, pmc_id, epubdate, authors, journal,
    abstract, annotations)`` where ``authors`` is ``array<struct<name:
    string>>`` (esummary shape) and ``annotations`` the 6-concept
    '|'-joined annotation string (functions/codecs.py:304). ``epubdate``
    is the already-resolved ISO date — resolve raw esummary triples
    first via ``codecs.epubdate_iso`` / its UDF twin.

    Output adds ``keywords``, ``_relevant``, and the six per-concept
    annotation columns split out of ``annotations``."""
    from ..functions.codecs import author_string_udf

    searchable = F.concat_ws(" ", F.col("title"), F.col("abstract"))
    out = meta.select(
        "id",
        _sanitize(F.col("title")).alias("title"),
        _sanitize(F.col("pmc_id")).alias("pmc_id"),
        _sanitize(F.col("epubdate")).alias("epubdate"),
        author_string_udf()(F.col("authors")).alias("authors"),
        _sanitize(F.col("journal")).alias("journal"),
        _sanitize(F.col("abstract")).alias("abstract"),
        relevant_keywords_col(searchable, keywords).alias("keywords"),
        is_relevant_col(searchable, filter_terms).alias("_relevant"),
        F.split(F.col("annotations"), r"\|").alias("_ann"),
    )
    for i, concept in enumerate(BIOCONCEPTS):
        out = out.withColumn(concept, F.element_at("_ann", i + 1))
    return out.drop("_ann")


def compose_citation_rows(
    citing: DataFrame,
    meta: DataFrame,
    filter_terms: list[str],
    keywords: list[str],
    reference_id_start: int = 0,
    id_shard_col: str | None = None,
) -> DataFrame:
    """citing(src, dst) [src cites dst] x meta -> the 29-column
    CITATION_COLUMNS interchange rows (sources/csv_io.py:19), ready for
    ``write_pipe_csv``. Rows exist only where BOTH endpoints are in the
    metadata table and both pass the relevance filter."""
    prepped = prepare_article_meta(meta, filter_terms, keywords)

    def side(prefix: str, id_alias: str) -> DataFrame:
        cols = [F.col("id").alias(id_alias), F.col("_relevant").alias(f"_{prefix}_rel")]
        for c in _META_COLS + BIOCONCEPTS:
            cols.append(F.col(c).alias(f"{prefix}_{c}"))
        return prepped.select(*cols)

    art = side("article", "article")
    ref = side("reference", "reference")

    edge_cols = [
        F.col("src").alias("article"),
        F.col("dst").alias("reference"),
    ]
    if id_shard_col is not None:
        edge_cols.append(F.col(id_shard_col))
    joined = (
        citing.select(*edge_cols)
        .join(art, "article")
        .join(ref, "reference")
        .where(F.col("_article_rel") & F.col("_reference_rel"))
    )

    if id_shard_col is not None:
        w = Window.partitionBy(id_shard_col).orderBy("article", "reference")
    else:
        # single-task window — acceptable at the interchange boundary
        # (one csv artifact); use id_shard_col for sharded output
        w = Window.orderBy("article", "reference")
    numbered = joined.withColumn(
        "reference_id",
        (F.row_number().over(w) + F.lit(reference_id_start - 1)).cast("long"),
    )
    return numbered.select(*CITATION_COLUMNS)

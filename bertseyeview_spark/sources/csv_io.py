"""Pipe-delimited CSV interchange parity (reference S5/S6/F4).

The reference's manager/store interchange format is a pipe-delimited
CSV with a fixed 19+ column header, double quotes stripped from the
whole file, ``|`` sanitized to ``;`` inside free-text fields, and a
row guard that drops rows whose field count mismatches the header
(knowledge-graph-manager/__main__.py:923-930, :990-1012, :1132-1139).

The engine keeps data structured internally (SURVEY.md §1.4) and only
(de)serializes this format at the boundary, for byte-parity tests and
for interoperating with reference tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CITATION_COLUMNS = [
    "reference_id", "article", "article_title", "article_pmc_id",
    "article_epubdate", "article_authors", "article_journal",
    "article_abstract", "article_keywords",
    "article_gene", "article_disease", "article_chemical",
    "article_species", "article_mutation", "article_cellline",
    "reference", "reference_title", "reference_pmc_id",
    "reference_epubdate", "reference_authors", "reference_journal",
    "reference_abstract", "reference_keywords",
    "reference_gene", "reference_disease", "reference_chemical",
    "reference_species", "reference_mutation", "reference_cellline",
]


def sanitize_free_text(df: DataFrame, cols: list[str]) -> DataFrame:
    """'|' -> ';' and '"' stripped in free-text fields — the reference's
    sanitization applied before rows are pipe-joined."""
    for c in cols:
        df = df.withColumn(
            c, F.regexp_replace(F.regexp_replace(F.col(c), r"\|", ";"), '"', "")
        )
    return df


def write_pipe_csv(df: DataFrame, path: str, columns: list[str] | None = None) -> None:
    """Write the pipe-delimited interchange file: header row + pipe-
    joined fields, no quoting (quotes were stripped upstream)."""
    cols = columns or df.columns
    (
        df.select(*cols)
        .write.mode("overwrite")
        .option("header", "true")
        .option("sep", "|")
        .option("quote", "\u0000")  # disable quoting — format is quote-free
        .option("emptyValue", "")
        .csv(path)
    )


def read_pipe_csv_with_row_guard(
    spark: SparkSession, path: str, expected_columns: list[str]
) -> DataFrame:
    """Read the interchange CSV, dropping malformed rows exactly like
    the reference's column-count guard (F4, __main__.py:923-930):
    a row whose '|'-split arity mismatches the header is skipped.

    Implemented with the CSV reader's PERMISSIVE mode + a
    ``_corrupt_record`` column: Spark fills missing trailing fields
    with null and parks over-long rows in the corrupt column, so the
    guard is (no corrupt record) AND (last column present — arity
    exact). Schema enforcement replaces the reference's manual check.
    """
    schema_ddl = ", ".join(f"`{c}` string" for c in expected_columns)
    schema_ddl += ", `_corrupt_record` string"
    df = (
        spark.read.option("header", "true")
        .option("sep", "|")
        .option("quote", "\u0000")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema_ddl)
        .csv(path)
    )
    # cache before filtering on _corrupt_record (Spark requirement:
    # the corrupt column is only materialized on a raw-parsed plan)
    df = df.cache()
    guarded = df.where(
        F.col("_corrupt_record").isNull()
        & F.col(expected_columns[-1]).isNotNull()
    ).drop("_corrupt_record")
    return guarded

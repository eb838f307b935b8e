"""Citation interchange-row composer (J5/S5): format parity with the
reference's create_citation_csv row construction
(knowledge-graph-manager/__main__.py:990-1140) and pipe-CSV roundtrip."""

import datetime as dt

from pyspark.sql import functions as F

from bertseyeview_spark.operators.citations import compose_citation_rows
from bertseyeview_spark.sources.csv_io import (
    CITATION_COLUMNS,
    read_pipe_csv_with_row_guard,
    write_pipe_csv,
)

META_SCHEMA = (
    "id long, title string, pmc_id string, epubdate string, "
    "authors array<struct<name:string>>, journal string, "
    "abstract string, annotations string"
)

ANN_A = "Gene:6647;SOD1|Null|Null|Null|Null|Null"
ANN_B = "Null|Disease:MESH:D000690;ALS|Null|Null|Null|Null"
NULL6 = "Null|Null|Null|Null|Null|Null"


def _meta(spark):
    rows = [
        # title with a pipe (sanitized to ';') and quotes (stripped)
        (1, 'ALS|review "part 1"', "PMC1", "2020-01-02",
         [("Smith J",), ("O'Neil K",)], "J Neuro", "amyloid therapy text",
         ANN_A),
        (2, "SOD1 mechanisms", "PMC2", "2021-03-04",
         [], "J Bio", "biomarker als panel", ANN_B),
        (3, "unrelated title", "PMC3", "2022-05-06",
         [("Lee R",)], "J Misc", "nothing relevant here", NULL6),
    ]
    return spark.createDataFrame(rows, META_SCHEMA)


def _reference_row(meta_by_id, rid, a, b, keywords):
    """The reference's row construction, reimplemented verbatim from
    __main__.py:866-891 (sanitize, author string, keyword join)."""
    def side(i):
        m = meta_by_id[i]
        title = m["title"].replace("|", ";").replace('"', "")
        authors = (
            "'" + ";".join(n for (n,) in m["authors"]).replace("'", "\\'") + "'"
            if m["authors"] else "NA"
        )
        kws = [k for k in reversed(keywords)
               if k in (title + " " + m["abstract"]).lower()]
        return [
            str(i), title, m["pmc_id"], m["epubdate"], authors,
            m["journal"], m["abstract"], ",".join(kws) if kws else "Null",
        ] + m["annotations"].split("|")

    return "|".join([str(rid)] + side(a) + side(b))


def test_composer_matches_reference_row_format(spark):
    meta = _meta(spark)
    citing = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "src long, dst long"
    )
    filter_terms = ["als", "therapy", "biomarker"]
    keywords = ["therapy", "panel", "amyloid"]
    out = compose_citation_rows(
        citing, meta, filter_terms, keywords, reference_id_start=1
    )
    rows = out.collect()
    # (1,3) dropped: article 3 is not relevant
    assert len(rows) == 2
    assert out.columns == CITATION_COLUMNS

    raw = [dict(zip(
        ("id", "title", "pmc_id", "epubdate", "authors", "journal",
         "abstract", "annotations"),
        (r[0], r[1], r[2], r[3],
         [(a["name"],) if isinstance(a, dict) else (a[0],) for a in r[4]],
         r[5], r[6], r[7]),
    )) for r in _meta(spark).collect()]
    meta_by_id = {m["id"]: m for m in raw}
    want = {
        (1, 2): _reference_row(meta_by_id, 1, 1, 2, keywords),
        (2, 1): _reference_row(meta_by_id, 2, 2, 1, keywords),
    }
    for r in rows:
        got_line = "|".join(str(r[c]) for c in CITATION_COLUMNS)
        assert got_line == want[(r["article"], r["reference"])]


def test_composer_roundtrip_pipe_csv(spark, tmp_path):
    meta = _meta(spark)
    citing = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = compose_citation_rows(citing, meta, ["als"], ["panel"])
    path = str(tmp_path / "citations_csv")
    write_pipe_csv(out, path, CITATION_COLUMNS)
    back = read_pipe_csv_with_row_guard(spark, path, CITATION_COLUMNS)
    assert back.count() == out.count()
    a = {tuple(str(x) for x in r) for r in out.select(*CITATION_COLUMNS).collect()}
    b = {tuple(str(x) for x in r) for r in back.select(*CITATION_COLUMNS).collect()}
    assert a == b


def test_composer_sharded_ids(spark):
    meta = _meta(spark)
    citing = spark.createDataFrame(
        [(1, 2), (2, 1)], "src long, dst long"
    ).withColumn("shard", F.col("src") % 2)
    out = compose_citation_rows(
        citing.select("src", "dst", "shard"), meta, [], [],
        reference_id_start=10, id_shard_col="shard",
    )
    # each shard numbers independently from the start offset
    assert sorted(r["reference_id"] for r in out.collect()) == [10, 10]

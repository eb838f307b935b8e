"""Byte-parity tests for the scalar codecs (SURVEY.md §2.8, FIXTURES.md §5).

Expected values derive from the reference's documented behavior
(knowledge-graph-manager/__main__.py:59-174, :377-430, :955-973),
including the quirks that must be reproduced bit-for-bit.
"""

import pytest

from bertseyeview_spark.functions import codecs as C


class TestDates:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("NA", "1900 Jan 1"),
            ("", "1900 Jan 1"),
            ("2021", "2021 Jan 1"),
            ("2021 Mar", "2021 Mar 1"),
            ("2021 Mar 15", "2021 Mar 15"),
            ("2021 Spring", "2021 Mar 1"),
            ("2020 Winter", "2020 Dec 1"),
            ("2021 Jan/Mar 1", "2021 Jan 1"),
            ("2021 Jan-Mar 1", "2021 Jan 1"),
        ],
    )
    def test_preprocess(self, raw, expected):
        assert C.preprocess_date(raw) == expected

    def test_mai_quirk(self):
        # the German month name is detected and capitalized as 'Mai' —
        # which then (deliberately) fails '%Y %b %d' parsing downstream
        assert C.preprocess_date("2021 Mai") == "2021 Mai 1"
        # and the fallback chain lands on the sortpubdate
        assert (
            C.epubdate_iso("NA", "2021 Mai", "2021/05/03 00:00") == "2021-05-03"
        )

    def test_epubdate_chain(self):
        assert C.epubdate_iso("2021 Mar 5", "x", "2020/01/01 00:00") == "2021-03-05"
        assert C.epubdate_iso("NA", "2021 Mar 5", "2020/01/01 00:00") == "2021-03-05"
        assert C.epubdate_iso("NA", "2021 Summer", "2020/01/01 00:00") == "2021-06-01"

    def test_sortpubdate(self):
        assert C.sortpubdate_to_iso("2021/03/01 00:00") == "2021-03-01"


class TestAnnotationString:
    def test_basic_format(self):
        rows = [
            ("ALR", "Gene", "2671"),
            ("steatohepatitis", "Disease", "MESH:D005234"),
        ]
        out = C.build_annotation_string(rows)
        assert out == (
            "Gene:2671;ALR|Disease:MESH:D005234;steatohepatitis|Null|Null|Null|Null"
        )

    def test_dedup_first_win(self):
        rows = [
            ("ALR", "Gene", "2671"),
            ("ALR", "Gene", "2671"),  # exact dup -> endswith skip
            ("NRF2", "Gene", "4780"),
            ("ALR", "Gene", "2671"),  # dup again -> substring skip
        ]
        out = C.build_annotation_string(rows)
        assert out.split("|")[0] == "Gene:2671;ALR,Gene:4780;NRF2"

    def test_all_null(self):
        assert C.build_annotation_string([]) == "|".join(["Null"] * 6)

    def test_concept_order_fixed(self):
        rows = [("human", "Species", "9606"), ("ALR", "Gene", "2671")]
        out = C.build_annotation_string(rows)
        parts = out.split("|")
        assert parts[0] == "Gene:2671;ALR"
        assert parts[3] == "Species:9606;human"

    def test_roundtrip_parse(self):
        rows = [
            ("ALR", "Gene", "2671"),
            ("human", "Species", "9606"),
        ]
        encoded = C.build_annotation_string(rows)
        parsed = C.parse_annotation_string(encoded)
        assert ("Gene", "2671", "ALR", "gene") in parsed
        assert ("Species", "9606", "human", "species") in parsed


class TestPubtatorParse:
    def test_block(self):
        block = (
            "123|t|A title.\n"
            "123|a|An abstract about ALR.\n"
            "123\t18\t21\tALR\tGene\t2671\n"
            "123\t30\t35\thuman\tSpecies\t9606"
        )
        pmid, title, abstract, rows = C.parse_pubtator_block(block)
        assert pmid == "123"
        assert title == "A title."
        assert abstract == "An abstract about ALR."
        assert rows == [("ALR", "Gene", "2671"), ("human", "Species", "9606")]


class TestAuthorsQuotes:
    def test_author_string(self):
        assert (
            C.get_author_string([{"name": "Smith J"}, {"name": "O'Neil K"}])
            == "'Smith J;O\\'Neil K'"
        )
        assert C.get_author_string([]) == "NA"
        assert C.get_author_string([{"x": 1}]) == "'NA'"
        assert C.get_author_string("notalist") == "NA"

    def test_quotes(self):
        assert C.replace_quotes("a'b\\c") == "a\\'b/c"
        assert C.add_quotes("x'y") == "'x\\'y'"

    def test_csv_string(self):
        assert C.get_list_from_csv_string("'a',b,'c'") == ["a", "b", "c"]


class TestValidatorsSpark:
    def test_validators(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("Gene:2671",), ("Gene:x",), ("Chemical:MESH:D1",), ("Species:9606",)],
            ["id"],
        )
        got = df.select(
            C.is_valid_gene_id(F.col("id")).alias("g"),
            C.is_valid_chemical_id(F.col("id")).alias("c"),
            C.is_valid_species_id(F.col("id")).alias("s"),
        ).collect()
        assert [r["g"] for r in got] == [True, False, False, False]
        assert [r["c"] for r in got] == [False, False, True, False]
        assert [r["s"] for r in got] == [False, False, False, True]

    def test_age_columns(self, spark):
        df = spark.createDataFrame(
            [("2021-01-01", "2021-03-01"), ("bad", "2021-03-01")],
            ["epub", "integ"],
        )
        out = C.age_columns(df, "epub", "integ").collect()
        assert out[0]["age_in_days"] == 59
        assert out[0]["age_in_months"] == 2
        assert out[1]["age_in_days"] is None


class TestArticleAnnotationStrings:
    def test_serializer_format(self, spark):
        from bertseyeview_spark.functions.codecs import (
            article_annotation_strings,
            parse_annotation_string,
        )

        linked = spark.createDataFrame(
            [
                ("u1", "sod1", 10, "Gene:6647"),
                ("u1", "als", 30, "Disease:MESH:D000690"),
                ("u1", "sod1", 50, "Gene:6647"),      # dup -> first-win
                ("u1", "junk", 60, "Null"),            # dropped
                ("u2", "riluzole", 5, "Chemical:MESH:D000069337"),
            ],
            ["url", "surface", "start", "entity_id"],
        )
        got = {
            r["url"]: r["annotations"]
            for r in article_annotation_strings(linked).collect()
        }
        assert got["u1"] == (
            "Gene:6647;sod1|Disease:MESH:D000690;als|Null|Null|Null|Null"
        )
        assert got["u2"] == (
            "Null|Null|Chemical:MESH:D000069337;riluzole|Null|Null|Null"
        )
        # roundtrip through the inverse codec
        parsed = parse_annotation_string(got["u1"])
        assert ("Gene", "6647", "sod1", "gene") in parsed


class TestCsvExportEnvelope:
    """Golden pins for the REST text/plain export envelope — the APOC
    streamed-CSV payload + the reference's chained replaces
    (neo4j_helper.py:556-573), the one §3.2 lifecycle byte surface
    that had no parity test through round 5."""

    def test_apoc_csv_shape(self):
        from bertseyeview_spark.functions.codecs import apoc_csv_string

        got = apoc_csv_string(
            ["score_1", "name", "db_id"],
            [[1.0, "sod1", 42], [0.1234, 'quo"te', None]],
        )
        assert got == (
            '"score_1","name","db_id"\n'
            '"1.0","sod1","42"\n'
            '"0.1234","quo""te",""\n'
        )

    def test_envelope_golden(self):
        from bertseyeview_spark.functions.codecs import (
            apoc_csv_string,
            csv_export_envelope,
        )

        csv = apoc_csv_string(
            ["score_1", "name", "db_id"],
            [
                [1.0, "amyotrophic lateral sclerosis", 7],
                # quirk row: data ';' -> ',', data '|' -> ';',
                # embedded quote stripped entirely
                [0.5, 'a;b|c"d', 8],
            ],
        )
        got = csv_export_envelope(csv)
        assert got == (
            "score_1;name;db_id\n"
            "1.0;amyotrophic lateral sclerosis;7\n"
            "0.5;a,b;cd;8\n"
        )

    def test_envelope_trailing_quote_quirk(self):
        """A value ENDING in '\"' doubles to '\"\"' in CSV, so the
        payload reads '\"x\"\"\",\"y\"': the LAST doubled quote plus
        the separator collapses via '\",\"' -> '|' and the leftover
        quotes strip, so the trailing data quote silently VANISHES
        (x;y, no artifact) — pin the reference-faithful lossiness."""
        from bertseyeview_spark.functions.codecs import (
            apoc_csv_string,
            csv_export_envelope,
        )

        got = csv_export_envelope(
            apoc_csv_string(["a", "b"], [['x"', "y"]])
        )
        assert got == "a;b\nx;y\n"

    def test_payload_from_dataframe(self, spark):
        from bertseyeview_spark.functions.codecs import (
            export_abundance_payload,
        )

        df = spark.createDataFrame(
            [(2.5, "sod1", 3, 1)], ["score_1", "name", "mentions", "db_id"]
        )
        assert export_abundance_payload(df) == (
            "score_1;name;mentions;db_id\n2.5;sod1;3;1\n"
        )

"""Byte-parity against the reference's OWN committed golden artifact.

/root/reference/pubtator_test_results.csv is the reference's golden
output for its metadata+NER extraction test
(shared/test_get_meta_data_pubtator3.py) — produced by the real
pipeline against PMID 37890889. Parsing its annotation strings with our
inverse codec and re-serializing with our encoder must reproduce the
reference bytes exactly; same for the author string shape and the date
fields. Read-only access to the reference artifact (public content).
"""

import os

import pandas as pd
import pytest

from bertseyeview_spark.functions.codecs import (
    build_annotation_string,
    epubdate_iso,
    parse_annotation_string,
    sortpubdate_to_iso,
)

GOLDEN = "/root/reference/pubtator_test_results.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden not present"
)


@pytest.fixture(scope="module")
def golden():
    return pd.read_csv(GOLDEN, index_col=0)


def test_annotation_string_roundtrip_byte_identical(golden):
    for ann in golden["annotations"]:
        parsed = parse_annotation_string(ann)
        assert parsed, "golden row parsed to nothing"
        rebuilt = build_annotation_string(
            [(surface, concept, norm_id) for concept, norm_id, surface, _ in parsed]
        )
        assert rebuilt == ann

    # structural spot checks on the known PMID 37890889 row
    parsed = parse_annotation_string(golden["annotations"].iloc[0])
    ids = {(c, n) for c, n, _, _ in parsed}
    assert ("Gene", "6647") in ids          # SOD1
    assert ("Species", "9606") in ids       # patients/human
    slots = golden["annotations"].iloc[0].split("|")
    assert len(slots) == 6                   # fixed 6-concept order
    assert slots[4] == "Null" and slots[5] == "Null"  # mutation/cellline


def test_golden_dates_parse(golden):
    for _, row in golden.iterrows():
        iso = sortpubdate_to_iso(str(row["sortpubdate"]))
        assert len(iso) == 10 and iso[4] == "-" and iso[7] == "-"
        # the golden epubdate is ISO; the fallback chain lands on the
        # sortpubdate when the pubdate is unparseable ('Mai'-style),
        # and that fallback must equal the golden's own sort date
        assert epubdate_iso("NA", "1900 Mai", str(row["sortpubdate"])) == iso
        assert str(row["epubdate"])[4] == "-"


def test_golden_author_list_encodes(golden):
    """The golden stores the raw esummary author list (list of dicts);
    the reference serializes it at CSV-build time (__main__.py:955).
    Our encoder must produce the documented quoted ';'-join."""
    import ast

    from bertseyeview_spark.functions.codecs import get_author_string

    raw = ast.literal_eval(golden["authors"].iloc[0])
    assert get_author_string(raw) == "'Ilieva H;Vullaganti M;Kwan J'"

"""BioC-XML full-text parsing (reference S3/C13).

The reference refetches BioC XML for articles with a PMC id and
*replaces* abstract-level annotations with full-text ones
(knowledge-graph-manager/__main__.py:553-723; structure documented by
shared/test_bioc.py:25-60 and the pubtator_response.xml golden).
BioC is a public NLM interchange format: collection -> document ->
passage -> annotation, with ``infon`` key/value metadata carrying
``type`` and ``identifier``.

Parsing is stdlib ``xml.etree`` inside a batched Arrow UDF — no
external bioc library needed.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIOC_DOC_SCHEMA = (
    "doc_id string, text string, "
    "annotations array<struct<surface:string, concept:string, norm_id:string, "
    "offset:int, length:int>>"
)


def parse_bioc_collection(xml_str: str) -> list[dict]:
    """BioC XML -> one dict per document:
    {doc_id, text (passages joined by newline), annotations:[...]}.

    Annotation fields follow the reference's consumption: infon
    ``type`` -> concept, infon ``identifier`` -> normalized id, the
    annotation ``text`` -> surface, location offset/length.
    """
    root = ET.fromstring(xml_str)
    docs = []
    for doc in root.iter("document"):
        doc_id = (doc.findtext("id") or "").strip()
        passages = []
        annotations = []
        for passage in doc.iter("passage"):
            ptext = passage.findtext("text") or ""
            if ptext:
                passages.append(ptext)
            for ann in passage.iter("annotation"):
                infons = {
                    i.get("key"): (i.text or "") for i in ann.iter("infon")
                }
                loc = ann.find("location")
                annotations.append(
                    {
                        "surface": ann.findtext("text") or "",
                        "concept": infons.get("type", ""),
                        "norm_id": infons.get("identifier", ""),
                        "offset": int(loc.get("offset", 0)) if loc is not None else 0,
                        "length": int(loc.get("length", 0)) if loc is not None else 0,
                    }
                )
        docs.append(
            {"doc_id": doc_id, "text": "\n".join(passages), "annotations": annotations}
        )
    return docs


def parse_bioc_column(df: DataFrame, xml_col: str) -> DataFrame:
    """(.., xml string) -> exploded per-document rows with structured
    annotations; one Arrow batch per group of XML payloads."""
    src = df.select(F.col(xml_col).alias("xml"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts, anns = [], [], []
            for xml_str in pdf["xml"]:
                for d in parse_bioc_collection(xml_str or "<collection/>"):
                    ids.append(d["doc_id"])
                    texts.append(d["text"])
                    anns.append(
                        [
                            (
                                a["surface"],
                                a["concept"],
                                a["norm_id"],
                                a["offset"],
                                a["length"],
                            )
                            for a in d["annotations"]
                        ]
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "text": texts, "annotations": anns}
            )

    return src.mapInPandas(run, schema=BIOC_DOC_SCHEMA)


def replace_with_fulltext_annotations(
    abstract_level: DataFrame, fulltext: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """S3 semantics: where a full-text parse exists for a document, its
    annotations REPLACE the abstract-level ones (left join + coalesce
    on the annotation array)."""
    ft = fulltext.select(
        F.col(key),
        F.col("annotations").alias("_ft_annotations"),
    )
    return (
        abstract_level.join(ft, key, "left")
        .withColumn(
            "annotations",
            F.coalesce(F.col("_ft_annotations"), F.col("annotations")),
        )
        .drop("_ft_annotations")
    )

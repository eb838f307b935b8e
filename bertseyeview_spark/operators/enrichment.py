"""Entity enrichment expansion + attribute joins + id-quality tallies.

Reference analogues:
* **G7** gene enrichment (shared/helper/neo4j_helper.py:1266-1344,
  :1992-2030): for each gene, mygene.info annotations become GO_BP /
  GO_CC / GO_MF and pathway nodes plus ``*_contains_gene`` edges. The
  mygene HTTP bulk query (S8, :1216-1224) becomes a **broadcast
  annotation table** — at web scale a reference dataset joined
  map-side, never a per-row service call.
* **J6** disease-attribute join (:1474-1488): primary equi-join on
  DiseaseID with a second-chance join through exploded AltDiseaseIDs —
  the scalable rewrite of the reference's substring fallback.
* **A12** malformed-id tally (:1196-1211 etc.): per entity class, how
  many ids match the canonical shape vs not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import (
    is_valid_chemical_id,
    is_valid_disease_id,
    is_valid_gene_id,
    is_valid_species_id,
)

# annotation categories -> (edge rel, node label); mirrors the
# reference's GO/pathway label set (neo4j_helper.py:1293-1344)
ENRICHMENT_CATEGORIES = {
    "go_bp": ("GO_BP_contains_gene", "GO_BP"),
    "go_cc": ("GO_CC_contains_gene", "GO_CC"),
    "go_mf": ("GO_MF_contains_gene", "GO_MF"),
    "pathway_kegg": ("pathway_kegg_contains_gene", "pathway_kegg"),
    "pathway_reactome": ("pathway_reactome_contains_gene", "pathway_reactome"),
    "pathway_wikipathways": ("pathway_wikipathways_contains_gene", "pathway_wikipathways"),
}


def expand_gene_annotations(
    gene_annotations: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """gene_annotations(gene_id, category, term_id) -> (nodes, edges).

    One ``explode``-shaped pass: every annotation row becomes a
    term node ``(label:category, id:term_id)`` and an edge
    ``(term_id, <category>_contains_gene, gene_id)``. The annotation
    table is reference data (mygene dump) — broadcast-joined upstream.
    """
    cat_map = F.create_map(
        *[
            x
            for cat, (rel, _) in ENRICHMENT_CATEGORIES.items()
            for x in (F.lit(cat), F.lit(rel))
        ]
    )
    label_map = F.create_map(
        *[
            x
            for cat, (_, label) in ENRICHMENT_CATEGORIES.items()
            for x in (F.lit(cat), F.lit(label))
        ]
    )
    ann = gene_annotations.where(
        F.col("category").isin(list(ENRICHMENT_CATEGORIES))
    )
    edges = ann.select(
        F.col("term_id").alias("src"),
        cat_map[F.col("category")].alias("rel"),
        F.col("gene_id").alias("dst"),
    ).dropDuplicates(["src", "rel", "dst"])
    nodes = ann.select(
        F.col("term_id").alias("id"), label_map[F.col("category")].alias("label")
    ).dropDuplicates(["id", "label"])
    return nodes, edges


def disease_attribute_join(
    diseases: DataFrame, ctd: DataFrame, id_col: str = "disease_id"
) -> DataFrame:
    """J6: join disease entities to a CTD-style attribute table on the
    primary id, with a second-chance equi-join through exploded
    alternative ids (reference falls back to substring matching into
    AltDiseaseIDs — exploding makes it an equi-join, which scales).

    ``ctd(DiseaseID, AltDiseaseIDs '|'-joined, attrs...)`` is small
    reference data -> broadcast.
    """
    attr_cols = [c for c in ctd.columns if c not in ("DiseaseID", "AltDiseaseIDs")]
    primary = F.broadcast(ctd.select(F.col("DiseaseID").alias("_k"), *attr_cols))
    alt = F.broadcast(
        ctd.select(
            F.explode(F.split(F.col("AltDiseaseIDs"), r"\|")).alias("_k"), *attr_cols
        ).where(F.col("_k") != "")
    )
    hit1 = diseases.join(primary, diseases[id_col] == primary["_k"], "left").drop("_k")
    missed = hit1.where(F.col(attr_cols[0]).isNull()).select(*diseases.columns)
    matched = hit1.where(F.col(attr_cols[0]).isNotNull())
    hit2 = missed.join(alt, missed[id_col] == alt["_k"], "left").drop("_k")
    return matched.unionByName(hit2)


def malformed_id_tally(nodes: DataFrame) -> DataFrame:
    """A12: per entity class, count well-formed vs malformed ids.
    One pass, conditional aggregation — no per-class scans."""
    id_col = F.col("id")
    checks = {
        "gene": (id_col.startswith("Gene:"), is_valid_gene_id(id_col)),
        "disease": (id_col.startswith("Disease:"), is_valid_disease_id(id_col)),
        "chemical": (id_col.startswith("Chemical:"), is_valid_chemical_id(id_col)),
        "species": (id_col.startswith("Species:"), is_valid_species_id(id_col)),
    }
    aggs = []
    for cls, (in_class, valid) in checks.items():
        aggs.append(
            F.sum(F.when(in_class & valid, 1).otherwise(0)).alias(f"{cls}_valid")
        )
        aggs.append(
            F.sum(F.when(in_class & ~valid, 1).otherwise(0)).alias(
                f"{cls}_malformed"
            )
        )
    return nodes.agg(*aggs)


def label_statistics(nodes: DataFrame) -> DataFrame:
    """A10 (apoc.meta.stats analogue): node count per label."""
    return nodes.groupBy("label").agg(F.count("*").alias("count")).orderBy("label")


def select_label_view(
    nodes: DataFrame, label: str, attrs: list[str] | None = None
) -> DataFrame:
    """F9 projection maps: per-label attribute view (reference keeps a
    return-column list per label, neo4j_helper.py:326-369); embedding-
    like wide columns are excluded unless explicitly requested.

    Requested attrs that are not physical columns are projected out of
    the ``properties`` map (the node-attribute store), so a per-label
    return list mixes schema columns and accreted attributes freely."""
    out = nodes.where(F.col("label") == label)
    if attrs:
        has_props = "properties" in out.columns
        cols = []
        for c in attrs:
            if c in out.columns:
                cols.append(F.col(c))
            elif has_props:
                cols.append(F.col("properties").getItem(c).alias(c))
        out = out.select(*cols)
    else:
        out = out.drop(*[c for c in out.columns if c.startswith("embedding")])
    return out

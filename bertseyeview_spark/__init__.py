"""bertseyeview_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
svenheins/bertseyeview (reference at /root/reference, read-only).

Architecture (SURVEY.md §7): a 7-stage declarative DataFrame pipeline over
an Iceberg-style table of Common-Crawl-like web pages

    pages(url, warc_ts, html, text, lang)
      E1 extract  -> text (batched Arrow UDF, byte-identical per url)
      E2 mentions -> NER mention structs (batched Arrow UDF)
      E3 triples  -> dependency-pattern (subj, pred, obj)
      E4 link     -> broadcast alias-dict join + embedding cosine fallback
      E5 canon    -> similarity join + connected components id remap
      E6 material -> nodes/edges tables (dedup, curation merges)
      E7 rank     -> iterative ArticleRank/PageRank -> nodes.rank

plus the reference's analytics read-queries (label abundance, top-k,
search) re-expressed as Catalyst-friendly DataFrame plans, and the
large-scale training-data operators (dedup, similarity search, text
quality, multimodal plumbing) the 100 TB use-case needs.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and published
algorithms (PageRank, MinHash, SimHash, large-star/small-star connected
components).
"""

__version__ = "0.1.0"

"""CSV interchange parity (S5/F4), enrichment expansion (G7/J6/A12),
BioC parsing (S3/C13), node2vec walks (G2)."""

import pytest
from pyspark.sql import functions as F

from bertseyeview_spark.functions.bioc import (
    parse_bioc_collection,
    parse_bioc_column,
    replace_with_fulltext_annotations,
)
from bertseyeview_spark.operators import enrichment as EN
from bertseyeview_spark.operators.node2vec import (
    build_adjacency,
    generate_walks,
    node2vec_embeddings,
)
from bertseyeview_spark.sources.csv_io import (
    read_pipe_csv_with_row_guard,
    sanitize_free_text,
    write_pipe_csv,
)


class TestCsvInterchange:
    def test_roundtrip_with_row_guard(self, spark, tmp_path):
        cols = ["a", "b", "c"]
        df = spark.createDataFrame(
            [("1", "x|y", 'q"z'), ("2", "plain", "text")], cols
        )
        clean = sanitize_free_text(df, ["b", "c"])
        out = str(tmp_path / "pipe")
        write_pipe_csv(clean, out, cols)

        # add a file with wrong-arity rows (reference F4 drops them);
        # written as a fresh file — appending in place would invalidate
        # Hadoop's .crc checksum sidecar
        with open(out + "/extra.csv", "w") as f:
            f.write("a|b|c\n")
            f.write("3|only-two\n")
            f.write("4|too|many|fields\n")

        back = read_pipe_csv_with_row_guard(spark, out, cols)
        rows = {r["a"]: (r["b"], r["c"]) for r in back.collect()}
        assert rows == {"1": ("x;y", "qz"), "2": ("plain", "text")}


class TestEnrichment:
    def test_expand_gene_annotations(self, spark):
        ann = spark.createDataFrame(
            [
                ("Gene:1", "go_bp", "GO:0001"),
                ("Gene:1", "pathway_kegg", "hsa04010"),
                ("Gene:2", "go_bp", "GO:0001"),
                ("Gene:1", "unknown_cat", "X:1"),
            ],
            ["gene_id", "category", "term_id"],
        )
        nodes, edges = EN.expand_gene_annotations(ann)
        n = {(r["id"], r["label"]) for r in nodes.collect()}
        e = {(r["src"], r["rel"], r["dst"]) for r in edges.collect()}
        assert ("GO:0001", "GO_BP") in n
        assert ("hsa04010", "pathway_kegg") in n
        assert ("X:1", "unknown_cat") not in {(a, b) for a, b in n}
        assert ("GO:0001", "GO_BP_contains_gene", "Gene:1") in e
        assert ("GO:0001", "GO_BP_contains_gene", "Gene:2") in e
        assert ("hsa04010", "pathway_kegg_contains_gene", "Gene:1") in e

    def test_disease_attribute_join_alt_fallback(self, spark):
        diseases = spark.createDataFrame(
            [("Disease:MESH:D1",), ("Disease:OMIM:9",), ("Disease:MESH:D404",)],
            ["disease_id"],
        )
        ctd = spark.createDataFrame(
            [
                ("Disease:MESH:D1", "", "headache"),
                ("Disease:MESH:D2", "Disease:OMIM:9|Disease:X:3", "fever"),
            ],
            ["DiseaseID", "AltDiseaseIDs", "DiseaseName"],
        )
        got = {r["disease_id"]: r["DiseaseName"] for r in
               EN.disease_attribute_join(diseases, ctd).collect()}
        assert got["Disease:MESH:D1"] == "headache"      # primary join
        assert got["Disease:OMIM:9"] == "fever"          # alt-id fallback
        assert got["Disease:MESH:D404"] is None          # no match kept

    def test_malformed_id_tally(self, spark):
        nodes = spark.createDataFrame(
            [("Gene:123",), ("Gene:x",), ("Species:9606",),
             ("Chemical:MESH:D1",), ("Chemical:OTHER:1",)],
            ["id"],
        )
        r = EN.malformed_id_tally(nodes).collect()[0]
        assert (r["gene_valid"], r["gene_malformed"]) == (1, 1)
        assert (r["species_valid"], r["species_malformed"]) == (1, 0)
        assert (r["chemical_valid"], r["chemical_malformed"]) == (1, 1)

    def test_label_statistics(self, spark):
        nodes = spark.createDataFrame(
            [("a", "Article"), ("b", "Article"), ("Gene:1", "gene")],
            ["id", "label"],
        )
        got = {r["label"]: r["count"] for r in EN.label_statistics(nodes).collect()}
        assert got == {"Article": 2, "gene": 1}


_BIOC = """<?xml version="1.0"?>
<collection>
  <document>
    <id>555</id>
    <passage>
      <text>Title about SOD1.</text>
      <annotation id="1">
        <infon key="type">Gene</infon>
        <infon key="identifier">6647</infon>
        <location offset="12" length="4"/>
        <text>SOD1</text>
      </annotation>
    </passage>
    <passage>
      <text>Full text mentions riluzole.</text>
      <annotation id="2">
        <infon key="type">Chemical</infon>
        <infon key="identifier">MESH:D000069337</infon>
        <location offset="37" length="8"/>
        <text>riluzole</text>
      </annotation>
    </passage>
  </document>
</collection>"""


class TestBioc:
    def test_parse_collection(self):
        docs = parse_bioc_collection(_BIOC)
        assert len(docs) == 1
        d = docs[0]
        assert d["doc_id"] == "555"
        assert d["text"] == "Title about SOD1.\nFull text mentions riluzole."
        assert d["annotations"][0]["concept"] == "Gene"
        assert d["annotations"][0]["norm_id"] == "6647"
        assert d["annotations"][1]["surface"] == "riluzole"

    def test_parse_column_and_replace(self, spark):
        xml_df = spark.createDataFrame([(_BIOC,)], ["xml"])
        ft = parse_bioc_column(xml_df, "xml")
        got = ft.collect()[0]
        assert got["doc_id"] == "555"
        assert len(got["annotations"]) == 2

        abstract = spark.createDataFrame(
            [("555", [("SOD1", "Gene", "6647", 12, 4)]),
             ("999", [("tnf", "Gene", "7124", 0, 3)])],
            "doc_id string, annotations array<struct<surface:string, concept:string, norm_id:string, offset:int, length:int>>",
        )
        merged = replace_with_fulltext_annotations(abstract, ft)
        by_id = {r["doc_id"]: r["annotations"] for r in merged.collect()}
        assert len(by_id["555"]) == 2   # replaced with full text
        assert len(by_id["999"]) == 1   # untouched


class TestNode2vec:
    def test_adjacency_sorted(self, spark):
        edges = spark.createDataFrame(
            [("a", "c"), ("a", "b"), ("b", "c")], ["src", "dst"]
        )
        adj = {r["node"]: r["nbrs"] for r in build_adjacency(edges).collect()}
        assert adj["a"] == ["b", "c"]
        assert adj["c"] == ["a", "b"]

    def test_walks_deterministic_and_connected(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]
        )
        w1 = {r["walk_key"]: r["walk"] for r in
              generate_walks(edges, walks_per_node=2, walk_length=6, seed=9).collect()}
        w2 = {r["walk_key"]: r["walk"] for r in
              generate_walks(edges, walks_per_node=2, walk_length=6, seed=9).collect()}
        assert w1 == w2
        assert all(len(w) == 6 for w in w1.values())
        # every consecutive pair must be a real (undirected) edge
        und = {("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")}
        und |= {(b, a) for a, b in und}
        for walk in w1.values():
            for x, y in zip(walk, walk[1:]):
                assert (x, y) in und

    def test_embeddings_shape(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a")],
            ["src", "dst"],
        )
        emb = node2vec_embeddings(
            edges, dim=8, walks_per_node=4, walk_length=8, seed=1
        )
        rows = emb.collect()
        assert {r["id"] for r in rows} == {"a", "b", "c", "d"}
        assert all(len(r["embedding"]) == 8 for r in rows)


class TestNode2vecBias:
    EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]

    def _walks(self, spark, **kw):
        edges = spark.createDataFrame(self.EDGES, ["src", "dst"])
        return generate_walks(edges, walks_per_node=20, walk_length=10,
                              seed=3, **kw).collect()

    @staticmethod
    def _return_rate(rows):
        n = t = 0
        for r in rows:
            w = r["walk"]
            for i in range(2, len(w)):
                t += 1
                n += w[i] == w[i - 2]
        return n / t

    def test_biased_walks_valid_and_shifted(self, spark):
        """p < 1 boosts immediate returns, p > 1 suppresses them (the
        node2vec return factor); every step stays a real edge."""
        und = set(self.EDGES) | {(b, a) for a, b in self.EDGES}
        low_p = self._walks(spark, p=0.05, q=1.0)
        high_p = self._walks(spark, p=20.0, q=1.0)
        for rows in (low_p, high_p):
            for r in rows:
                for x, y in zip(r["walk"], r["walk"][1:]):
                    assert (x, y) in und
        assert self._return_rate(low_p) > 0.7
        assert self._return_rate(high_p) < 0.3

    def test_biased_walks_deterministic_across_parallelism(self, spark):
        a = {r["walk_key"]: r["walk"] for r in self._walks(spark, p=0.5, q=2.0)}
        b = {r["walk_key"]: r["walk"] for r in self._walks(spark, p=0.5, q=2.0)}
        assert a == b

    def test_portable_hash_matches_duckdb_replay(self, spark):
        """The portable neighbor-choice hash must equal DuckDB's
        ('0x' || substr(md5(key),1,8))::BIGINT — the contract the
        random-walk oracle depends on."""
        import duckdb
        from pyspark.sql import functions as F

        key = "N1#0#3#7"
        got = (
            spark.range(1)
            .select(
                F.conv(F.substring(F.md5(F.lit(key)), 1, 8), 16, 10)
                .cast("long")
                .alias("h")
            )
            .collect()[0]["h"]
        )
        want = duckdb.sql(
            f"select ('0x' || substr(md5('{key}'),1,8))::BIGINT"
        ).fetchone()[0]
        assert got == want

    def test_projection_sweep(self, spark):
        from bertseyeview_spark.operators.node2vec import (
            node2vec_projection_sweep,
        )

        edges = spark.createDataFrame(
            [
                ("https://a", "Gene:1"),
                ("https://a", "Disease:2"),
                ("https://b", "Gene:1"),
                ("https://b", "Chemical:3"),
                ("https://a", "https://b"),
            ],
            ["src", "dst"],
        )
        out = node2vec_projection_sweep(
            edges,
            runs=[("gen", ["gene"]), ("gen_dis", ["gene", "disease"])],
            dim=4, walks_per_node=2, walk_length=4, seed=1,
        )
        by_run = {}
        for r in out.collect():
            by_run.setdefault(r["run"], set()).add(r["id"])
            assert len(r["embedding"]) == 4
        # gene projection never sees Disease/Chemical nodes
        assert by_run["gen"] == {"https://a", "https://b", "Gene:1"}
        assert by_run["gen_dis"] == {
            "https://a", "https://b", "Gene:1", "Disease:2",
        }

    def test_projection_sweep_skips_empty_runs(self, spark):
        from bertseyeview_spark.operators.node2vec import (
            node2vec_projection_sweep,
        )

        edges = spark.createDataFrame(
            [("https://a", "Gene:1"), ("https://b", "Gene:1")],
            ["src", "dst"],
        )
        out = node2vec_projection_sweep(
            edges,
            runs=[("gen", ["gene"]), ("mut", ["mutation"])],
            dim=4, walks_per_node=2, walk_length=4, seed=1,
        )
        runs = {r["run"] for r in out.collect()}
        assert runs == {"gen"}  # empty mutation projection skipped


class TestWarc:
    def _recs(self):
        from bertseyeview_spark.sources.warc import warc_record_bytes

        return [
            warc_record_bytes(
                "meta:ignore", "2024-01-01T00:00:00Z", b"crawler info",
                warc_type="warcinfo", http_envelope=False,
            ),
            warc_record_bytes(
                "https://ex.org/a", "2024-01-01T00:05:00Z", b"<html>A</html>"
            ),
            warc_record_bytes(
                "https://ex.org/b", "2024-01-01T00:06:00Z", b"<html>B</html>"
            ),
        ]

    def test_parse_plain_and_gzip_members(self):
        from bertseyeview_spark.sources.warc import gzip_member, parse_warc

        recs = self._recs()
        for blob in (
            b"".join(recs),
            b"".join(gzip_member(r) for r in recs),
        ):
            got = list(parse_warc(blob))
            # warcinfo skipped; HTTP envelope stripped; ts parsed UTC
            assert [(r["url"], r["html"]) for r in got] == [
                ("https://ex.org/a", b"<html>A</html>"),
                ("https://ex.org/b", b"<html>B</html>"),
            ]
            assert got[0]["warc_ts"].minute == 5

    def test_parse_truncated_tail(self):
        from bertseyeview_spark.sources.warc import parse_warc

        blob = b"".join(self._recs())
        got = list(parse_warc(blob[: len(blob) - 20]))  # cut last record
        assert [r["url"] for r in got] == ["https://ex.org/a"]

    def test_read_warc_files(self, spark, tmp_path):
        from bertseyeview_spark.sources.warc import gzip_member, read_warc

        recs = self._recs()
        (tmp_path / "seg0.warc").write_bytes(b"".join(recs))
        (tmp_path / "seg1.warc.gz").write_bytes(
            b"".join(gzip_member(r) for r in recs)
        )
        got = read_warc(spark, str(tmp_path)).collect()
        assert len(got) == 4  # 2 response records per file
        assert {r["url"] for r in got} == {
            "https://ex.org/a", "https://ex.org/b",
        }
        assert all(bytes(r["html"]).startswith(b"<html>") for r in got)

    def test_corrupt_gzip_member_salvages_earlier_records(self):
        from bertseyeview_spark.sources.warc import gzip_member, parse_warc

        recs = self._recs()
        blob = (
            gzip_member(recs[1])
            + b"\x1f\x8b\x00garbage-not-a-member"
            + gzip_member(recs[2])
        )
        got = list(parse_warc(blob))
        # records before the corrupt member survive; scan stops there
        assert [r["url"] for r in got] == ["https://ex.org/a"]

    def test_chunked_transfer_body_deframed(self):
        from bertseyeview_spark.sources.warc import parse_warc

        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n"
            b"6\r\n<html>\r\n"
            b"8\r\nchunked!\r\n"
            b"7\r\n</html>\r\n"
            b"0\r\n\r\n"
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: https://ex.org/c\r\n"
            b"WARC-Date: 2024-01-01T00:07:00Z\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n" + http + b"\r\n\r\n"
        )
        got = list(parse_warc(rec))
        assert got[0]["html"] == b"<html>chunked!</html>"

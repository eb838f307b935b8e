"""Motif finding (Cypher-MATCH analogue): term parsing, join chaining,
anonymous rels, repeated variables."""

import pytest

from bertseyeview_spark.operators.motif import find_motif, parse_pattern


def test_parse():
    assert parse_pattern("(a)-[x]->(b); (b)-[*]->(c)") == [
        ("a", "x", "b"), ("b", "*", "c"),
    ]
    with pytest.raises(ValueError):
        parse_pattern("(a)-[x]-(b)")  # undirected not supported
    with pytest.raises(ValueError):
        parse_pattern("")


def test_two_hop_and_anonymous(spark):
    edges = spark.createDataFrame(
        [
            ("u1", "citing", "u2"),
            ("u2", "mentions", "G1"),
            ("u2", "mentions", "G2"),
            ("u1", "mentions", "G3"),
            ("u3", "citing", "u1"),
        ],
        ["src", "rel", "dst"],
    )
    got = {
        tuple(r)
        for r in find_motif(
            edges, "(a)-[citing]->(b); (b)-[mentions]->(e)"
        ).collect()
    }
    assert got == {("u1", "u2", "G1"), ("u1", "u2", "G2"), ("u3", "u1", "G3")}

    # anonymous rel matches both edge types
    anon = {
        tuple(r) for r in find_motif(edges, "(a)-[*]->(b)").collect()
    }
    assert ("u1", "u2") in anon and ("u2", "G1") in anon and len(anon) == 5


def test_shared_endpoint_triangle(spark):
    edges = spark.createDataFrame(
        [("a1", "r", "b1"), ("b1", "r", "c1"), ("a1", "r", "c1"),
         ("b1", "r", "c2")],
        ["src", "rel", "dst"],
    )
    tri = {
        tuple(r)
        for r in find_motif(
            edges, "(x)-[r]->(y); (y)-[r]->(z); (x)-[r]->(z)"
        ).collect()
    }
    assert tri == {("a1", "b1", "c1")}


def test_self_loop_terms(spark):
    edges = spark.createDataFrame(
        [("x", "r", "x"), ("x", "r", "y"), ("y", "r", "y")],
        ["src", "rel", "dst"],
    )
    loops = {tuple(r) for r in find_motif(edges, "(a)-[r]->(a)").collect()}
    assert loops == {("x",), ("y",)}
    chained = {
        tuple(r)
        for r in find_motif(edges, "(a)-[r]->(b); (b)-[r]->(b)").collect()
    }
    assert ("x", "y") in chained

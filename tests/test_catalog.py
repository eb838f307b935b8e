"""Iceberg-shaped catalog: write/read, MERGE INTO semantics, snapshots."""

import pytest

from bertseyeview_spark.sources.catalog import TableCatalog, iceberg_available


def test_write_read_partitioned(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("Gene:1", "gene", 0.5), ("u1", "Article", 1.2)],
        ["id", "label", "rank"],
    )
    cat.write_table(df, "nodes", partition_by=["label"])
    back = cat.read_table("nodes")
    assert {r["id"] for r in back.collect()} == {"Gene:1", "u1"}
    assert len(cat.snapshots("nodes")) == 1


def test_merge_into_upsert(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh2"))
    base = spark.createDataFrame(
        [("a", 1), ("b", 2)], ["id", "v"]
    )
    cat.write_table(base, "t")
    incoming = spark.createDataFrame(
        [("b", 20), ("c", 3), ("c", 3)], ["id", "v"]  # update + insert + dup
    )
    cat.merge_into(incoming, "t", keys=["id"])
    got = {r["id"]: r["v"] for r in cat.read_table("t").collect()}
    assert got == {"a": 1, "b": 20, "c": 3}
    # snapshot history grows, recency ts advances
    snaps = cat.snapshots("t")
    assert [s["op"] for s in snaps] == ["overwrite", "merge"]
    assert snaps[-1]["rows"] == 3
    assert cat.last_snapshot_ts("t") >= snaps[0]["ts"]


def test_merge_into_creates_table(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh3"))
    inc = spark.createDataFrame([("x", 9)], ["id", "v"])
    cat.merge_into(inc, "fresh", keys=["id"])
    assert cat.read_table("fresh").count() == 1


def test_iceberg_gate(spark, tmp_path):
    assert not iceberg_available(spark)  # no jars in this image
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        TableCatalog(spark, str(tmp_path / "wh4"), format="iceberg")

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


def test_time_travel_and_rollback(spark, tmp_path):
    """Iceberg snapshot parity: every commit is an immutable version,
    old snapshots stay readable (time travel), and rollback swings the
    pointer back as a NEW history entry without deleting anything."""
    cat = TableCatalog(spark, str(tmp_path / "wh5"))
    cat.write_table(spark.createDataFrame([("a", 1)], ["id", "v"]), "t")
    v1 = cat.current_version("t")
    cat.merge_into(
        spark.createDataFrame([("a", 10), ("b", 2)], ["id", "v"]), "t", ["id"]
    )
    v2 = cat.current_version("t")
    assert v2 != v1
    # time travel: the old snapshot is intact
    assert {r["v"] for r in cat.read_table("t", version=v1).collect()} == {1}
    assert {r["v"] for r in cat.read_table("t").collect()} == {10, 2}
    # rollback: current reads like v1 again, history is append-only
    cat.rollback("t", v1)
    assert {r["v"] for r in cat.read_table("t").collect()} == {1}
    ops = [s["op"] for s in cat.snapshots("t")]
    assert ops == ["overwrite", "merge", "rollback"]
    # and v2's data was NOT deleted by the rollback
    assert {r["v"] for r in cat.read_table("t", version=v2).collect()} == {10, 2}


def test_commit_after_rollback_never_clobbers(spark, tmp_path):
    """Iceberg corner: committing AFTER a rollback must allocate a
    fresh version — never reuse/overwrite the rolled-past snapshot's
    data dir — and the merge must apply to the rolled-back state."""
    cat = TableCatalog(spark, str(tmp_path / "wh9"))
    cat.write_table(spark.createDataFrame([("a", 1)], ["id", "v"]), "t")
    cat.merge_into(
        spark.createDataFrame([("a", 10), ("b", 2)], ["id", "v"]), "t", ["id"]
    )
    v2 = cat.current_version("t")
    cat.rollback("t", 1)
    # new write from the rolled-back state: v2's dir exists, so the
    # slot reservation must skip to v3
    cat.merge_into(spark.createDataFrame([("c", 3)], ["id", "v"]), "t", ["id"])
    v3 = cat.current_version("t")
    assert v3 > v2
    # merge applied to v1's contents (a=1), not v2's (a=10, b=2)
    assert {(r["id"], r["v"]) for r in cat.read_table("t").collect()} == {
        ("a", 1), ("c", 3)
    }
    # the rolled-past snapshot is byte-intact
    assert {r["v"] for r in cat.read_table("t", version=v2).collect()} == {10, 2}
    ops = [s["op"] for s in cat.snapshots("t")]
    assert ops == ["overwrite", "merge", "rollback", "merge"]


def test_concurrent_merge_conflict(spark, tmp_path):
    """Optimistic concurrency: a merge computed against a base snapshot
    must fail with SnapshotConflictError if another writer committed in
    between — never silently clobber the concurrent write."""
    import pytest as _pytest

    from bertseyeview_spark.sources.catalog import SnapshotConflictError

    cat = TableCatalog(spark, str(tmp_path / "wh6"))
    cat.write_table(spark.createDataFrame([("a", 1)], ["id", "v"]), "t")
    base = cat.current_version("t")
    # writer 2 commits first
    cat.merge_into(
        spark.createDataFrame([("b", 2)], ["id", "v"]), "t", ["id"]
    )
    # writer 1 (stale base) must conflict
    with _pytest.raises(SnapshotConflictError):
        cat.merge_into(
            spark.createDataFrame([("c", 3)], ["id", "v"]),
            "t",
            ["id"],
            base_version=base,
        )
    # the winning write is intact
    assert {r["id"] for r in cat.read_table("t").collect()} == {"a", "b"}


def test_stale_commit_lock_reclaimed(spark, tmp_path):
    """A writer that crashed while holding _commit.lock must not wedge
    the table: a lock whose recorded owner pid is dead is reclaimed and
    the commit proceeds (no hand cleanup, no 100s spin)."""
    import os
    import time as _time

    cat = TableCatalog(spark, str(tmp_path / "wh8"))
    cat.write_table(spark.createDataFrame([("a", 1)], ["id", "v"]), "t")
    lock = os.path.join(cat._root("t"), "_commit.lock")
    # forge a lock owned by a dead pid (spawn-and-reap a child)
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()
    pid = proc.pid
    with open(lock, "w") as f:
        f.write(f"{pid} {_time.time()}")
    t0 = _time.time()
    cat.write_table(spark.createDataFrame([("b", 2)], ["id", "v"]), "t")
    assert _time.time() - t0 < 30  # reclaimed, not spun to timeout
    assert cat.read_table("t").collect()[0]["id"] == "b"
    # a live-owner lock is NOT stolen
    with open(lock, "w") as f:
        f.write(f"{os.getpid()} {_time.time()}")
    assert not cat._lock_is_stale(lock)
    os.unlink(lock)
    # garbled lock: fresh -> kept; old -> reclaimable
    with open(lock, "w") as f:
        f.write("not-a-pid")
    assert not cat._lock_is_stale(lock)
    os.utime(lock, (1.0, 1.0))
    assert cat._lock_is_stale(lock)
    os.unlink(lock)


def test_expire_snapshots(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path / "wh7"))
    for i in range(4):
        cat.write_table(
            spark.createDataFrame([("a", i)], ["id", "v"]), "t"
        )
    removed = cat.expire_snapshots("t", keep_last=2)
    assert removed == 2
    # current still reads
    assert cat.read_table("t").collect()[0]["v"] == 3


def test_bucketed_store_never_deletes_unrelated_dir(spark, tmp_path, monkeypatch):
    """Stale-location cleanup must be catalog-driven: a directory that
    happens to sit at the default warehouse path but is NOT Spark table
    output may not be rmtree'd."""
    import os

    from bertseyeview_spark.sources.catalog import BucketedStore, _looks_like_table_dir

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    victim = os.path.join(wh, "bkt_guard_victim")
    os.makedirs(victim, exist_ok=True)
    keep = os.path.join(victim, "precious.txt")
    with open(keep, "w") as f:
        f.write("do not delete")
    assert not _looks_like_table_dir(victim)

    store = BucketedStore(spark)
    df = spark.createDataFrame([(1, "x")], ["k", "s"])
    try:
        # saveAsTable may refuse the occupied foreign location — that is
        # acceptable; destroying the foreign data to make room is not
        store.write_bucketed(df, "bkt_guard_victim", "k", n_buckets=2)
    except Exception:  # noqa: BLE001
        pass
    finally:
        assert os.path.exists(keep), "unrelated file was deleted"
        spark.sql("DROP TABLE IF EXISTS bkt_guard_victim")
        import shutil

        shutil.rmtree(victim, ignore_errors=True)


def test_bucketed_store_idempotent_rewrite(spark):
    """write_bucketed twice must succeed (catalog-reported location is
    cleared) and the second write's data wins."""
    from bertseyeview_spark.sources.catalog import BucketedStore

    store = BucketedStore(spark)
    store.write_bucketed(
        spark.createDataFrame([(1, "a")], ["k", "s"]), "bkt_rewrite_t", "k"
    )
    store.write_bucketed(
        spark.createDataFrame([(2, "b"), (3, "c")], ["k", "s"]),
        "bkt_rewrite_t",
        "k",
    )
    got = {r["k"] for r in store.read("bkt_rewrite_t").collect()}
    assert got == {2, 3}
    spark.sql("DROP TABLE IF EXISTS bkt_rewrite_t")


def test_snapshot_diff_changelog(spark, tmp_path):
    """Incremental/changelog read between two snapshots (Iceberg
    changelog parity): inserts, deletes, payload updates — including
    NULL-payload rows, which a non-null-safe compare would miss."""
    cat = TableCatalog(spark, str(tmp_path / "wh6"))
    v1_df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, None), ("c", 3, "z"), ("d", 4, None)],
        ["id", "v", "tag"],
    )
    cat.write_table(v1_df, "t")
    v2_df = spark.createDataFrame(
        # a unchanged; b NULL->NULL with v bumped (update must fire);
        # c deleted; d unchanged incl. NULL tag; e inserted
        [("a", 1, "x"), ("b", 20, None), ("d", 4, None), ("e", 5, "w")],
        ["id", "v", "tag"],
    )
    cat.write_table(v2_df, "t")
    got = {
        r["id"]: r["change_type"]
        for r in cat.snapshot_diff("t", 1, 2, keys=["id"]).collect()
    }
    assert got == {"b": "update", "c": "delete", "e": "insert"}

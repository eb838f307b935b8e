"""As-of join edge cases: exact-tie timestamps, no preceding row,
multiple right updates, key isolation."""

import datetime as dt

from bertseyeview_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts(5)),    # after right@3 -> 30
            (2, 7, _ts(10)),   # exact tie with right@10 -> 100
            (3, 7, _ts(1)),    # before any right -> NULL
            (4, 9, _ts(20)),   # other key, right@15 -> 150
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, _ts(3), 30.0),
            (7, _ts(10), 100.0),
            (9, _ts(15), 150.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(left, right, on="user_id", ts="ts").collect()
    }
    assert got == {1: 30.0, 2: 100.0, 3: None, 4: 150.0}
    # all left rows survive (left-join semantics)
    assert len(got) == 4


def test_asof_join_row_atomic_and_null_ts(spark):
    """A NULL payload field in the matched right row must NOT blend in a
    value from an older right row (row-atomic struct attach), and right
    rows with NULL ts never match (SQL ASOF semantics)."""
    left = spark.createDataFrame(
        [(1, 7, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, _ts(3), 30.0, "old"),
            (7, _ts(10), None, "new"),   # matched row has NULL value
            (7, None, 999.0, "nullts"),  # must never leak
        ],
        "user_id long, ts timestamp, value double, tag string",
    )
    row = asof_join(left, right, on="user_id", ts="ts").collect()[0]
    assert row["tag_asof"] == "new"
    assert row["value_asof"] is None  # NOT 30.0 from the older row


def test_asof_join_duplicate_ts_deterministic(spark):
    """Duplicate (key, ts) right rows resolve to one deterministic
    winner (max payload struct) at any parallelism."""
    left = spark.createDataFrame(
        [(1, 7, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _ts(10), v) for v in (5.0, 1.0, 3.0)],
        "user_id long, ts timestamp, value double",
    )
    vals = set()
    for parts in (2, 8):
        out = asof_join(
            left.repartition(parts), right.repartition(parts),
            on="user_id", ts="ts",
        ).collect()
        vals.add(out[0]["value_asof"])
    assert vals == {5.0}

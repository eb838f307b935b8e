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

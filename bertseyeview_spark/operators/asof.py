"""As-of join — a temporal operator Spark lacks natively.

``asof_join(left, right, key, ts)``: for every left row, attach the
most recent right row with ``right.ts <= left.ts`` within the same key
(the standard market-data / event-enrichment join).

Implementation is the *union-marker* technique — fully Catalyst, one
shuffle, no Python, no range explosion:

1. union left (marker=1) and right (marker=0) rows on (key, ts);
2. window ``last(right_value, ignoreNulls=True)`` ordered by
   (ts, marker) over the key partition — every left row sees the
   latest right payload at or before its timestamp (marker ordering
   makes a tie resolve to the right row first);
3. keep only left rows.

At 100 TB both sides hash-partition on the key once; the window sort
is per-key. The alternative (`applyInPandas` + ``pd.merge_asof`` per
key group) is kept as a reference path for skewless small keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with right.ts <= left.ts per key.

    Returns all left columns plus ``<right_col><suffix>`` columns
    (NULL when no right row precedes the left timestamp).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, ts)
    ]
    l = left.withColumn("_marker", F.lit(1))
    r = right.select(
        on,
        ts,
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("_marker", F.lit(0))

    for c in left.columns:
        if c not in (on, ts) and c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in r.columns:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))

    unioned = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_marker").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in right_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    return out.where(F.col("_marker") == 1).drop("_marker")

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
    # Row-atomic semantics: pack the right payload into ONE struct and take
    # a single last(ignorenulls) over it, so the matched right row is
    # attached whole — per-column last() would let a NULL payload field
    # blend values from different right rows (diverges from merge_asof /
    # SQL ASOF JOIN). NULL-ts right rows are dropped up front: SQL ASOF's
    # ts >= comparison never matches NULL, and Spark's nulls-first asc sort
    # would otherwise leak them to every left row.
    r = (
        right.where(F.col(ts).isNotNull())
        .select(
            on,
            ts,
            F.struct(*[F.col(c) for c in right_cols]).alias("_payload"),
        )
        .withColumn("_marker", F.lit(0))
    )
    payload_type = r.schema["_payload"].dataType
    l = left.withColumn("_marker", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(payload_type)
    )
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))

    unioned = l.unionByName(r.select(*l.columns))
    # Ordering: (ts, marker) puts right rows before left rows at equal ts
    # (tie resolves to "match"); the struct itself is the final tiebreak so
    # duplicate (key, ts) right rows pick a deterministic winner (max
    # payload) instead of a partition-order-dependent one. Right payload
    # fields must therefore be orderable types (no maps).
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts).asc(), F.col("_marker").asc(), F.col("_payload").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    return (
        matched.where(F.col("_marker") == 1)
        .select(
            *left.columns,
            *[
                F.col("_match").getField(c).alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
    )

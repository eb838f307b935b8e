"""Bucketed-table co-location: same-key bucketed tables must join
without a shuffle (the node/edge store layout at scale)."""

from pyspark.sql import functions as F

from bertseyeview_spark.sources.catalog import (
    BucketedStore,
    plan_has_shuffle,
)


def test_bucketed_join_has_no_shuffle(spark):
    store = BucketedStore(spark)
    # force the join strategy the layout exists for: at scale neither
    # side is broadcastable, so disable broadcast to see the bucketed
    # shuffle-free SortMergeJoin the planner would pick there
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    nodes = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("id"),
        (F.col("id") % 7).alias("label_n"),
    )
    ranks = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("id"),
        (F.col("id") * 2).cast("double").alias("rank"),
    )
    spark.sql("DROP TABLE IF EXISTS t_nodes_b")
    spark.sql("DROP TABLE IF EXISTS t_ranks_b")
    store.write_bucketed(nodes, "t_nodes_b", "id", n_buckets=8)
    store.write_bucketed(ranks, "t_ranks_b", "id", n_buckets=8)

    joined = store.colocated_join("t_nodes_b", "t_ranks_b", "id")
    assert joined.count() == 1000
    assert not plan_has_shuffle(joined), (
        "co-bucketed join must not shuffle"
    )

    # contrast: joining the un-bucketed sources DOES shuffle
    plain = nodes.join(ranks, "id")
    assert plan_has_shuffle(plain)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS t_nodes_b")
    spark.sql("DROP TABLE IF EXISTS t_ranks_b")

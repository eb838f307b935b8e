"""SparkSession construction tuned for the KG-construction workload.

Local testing runs on ``local[N]`` (single JVM); production is a
multi-executor cluster via ``spark-submit --py-files``. The configs below
are the ones that matter at both scales:

* AQE on (runtime re-plan: skew-join splitting, partition coalescing) —
  the north rule's skew handling leans on this plus manual salting.
* ``spark.sql.shuffle.partitions`` sized to cores locally; at cluster
  scale callers pass ``shuffle_partitions`` ~= 2-3x total cores.
* Arrow enabled and batch-sized: every Python-side operator in this
  engine is a batched Arrow UDF (``mapInPandas`` / ``pandas_udf``),
  never per-row Python (BASELINE.json input_hint).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 2_000  # pages carry whole HTML bodies; keep batches modest


def get_spark(
    app_name: str = "bertseyeview_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the bench harness can pin parallelism for the N-vs-4N scaling runs.
    """
    # one BLAS thread per python worker: N workers x multithreaded
    # numpy oversubscribes the box and ANTI-scales (measured: local[32]
    # 2x slower than local[8] before this). Must be set before the JVM
    # (and its forked python workers) start.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> N; "local[*]" -> cpu count
        inner = master.split("[")[-1].rstrip("]")
        shuffle_partitions = cpus if inner == "*" else int(inner)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Input split sizing (guide §6), parameterised for scale. The
        # local default (16m) exists because the bench tables are
        # SINGLE parquet files: at the stock 128m a 126 MB lineitem
        # scans as ONE task and everything upstream of the first
        # exchange runs serially on local[32] (measured: 3.5s
        # label_abundance_two_groups, 2.2s top_entities at sf1.0, both
        # scan-serial). 16m splits it across its row groups with no
        # extra exchange. Production 100 TB scans should RAISE this
        # (512m-1g) via the env: there the scan has millions of splits
        # and larger ones cut scheduling overhead and the map-task
        # count feeding shuffles (guide §2.2) — small splits are only
        # right when files are few and cores outnumber them.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

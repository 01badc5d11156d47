"""SparkSession factory with scale-aware defaults.

The reference connector's performance model is: large buffered I/O (4 MiB,
``CephRgwFileSystem.java:120``), server-side prefetch, and a *virtual block
size* (32 MiB, ``CephRgwFileSystem.java:112``) that drives input-split count
and hence scan parallelism. In Spark the same three levers are the format
readers' buffering, ``spark.sql.files.maxPartitionBytes`` (split sizing),
and AQE. We pin them here once so every operator inherits them.

Scale posture (100 TB): AQE on (runtime coalesce + skew-join splitting),
explicit broadcast threshold for bounded dimension tables, Arrow for any
Python exchange, UTC session timezone for cross-engine determinism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The reference reports a fabricated 32 MiB block size per file purely as a
# parallelism hint (AbstractFileHandlerReceiver.java:29). Spark's equivalent
# knob is maxPartitionBytes; we keep Spark's 128 MiB default for local tests
# but record the mapping so a cluster deployment can tune it the same way.
DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024
# Dimension tables (region/nation/customer/supplier/part at warehouse scale)
# stay broadcast-able well past the 10 MB Spark default; 64 MiB is a safe
# bound for 1000-executor clusters with multi-GiB executors.
DEFAULT_BROADCAST_THRESHOLD = 64 * 1024 * 1024


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "hadoop-fs-ceph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    On a real cluster ``master``/memory come from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``. Shuffle partitions default to
    the core count — at 100 TB this should instead be ~2-3× total cluster
    cores, but AQE's partition coalescing makes the initial number mostly a
    ceiling rather than a tuning cliff.
    """
    cpus = _cpus()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(DEFAULT_BROADCAST_THRESHOLD))
        .config("spark.sql.files.maxPartitionBytes", str(DEFAULT_MAX_PARTITION_BYTES))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

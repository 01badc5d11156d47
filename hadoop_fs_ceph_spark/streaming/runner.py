"""Streaming building blocks: the events file-stream source and a
finite-drain runner (availableNow → memory sink).

At production scale the same plans run unchanged against an unbounded
directory (or Kafka) with a real sink; ``availableNow`` is the bounded
verification mode. Checkpoint dirs are per-run scratch — a real deployment
points them at durable storage.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- streaming-state audit capture ------------------------------------------
# When the scale-audit CLI (plans/__main__.py --all) audits a streaming
# query, it must see the PRE-SINK streaming plan without draining the
# stream. It sets `_capture` to a list; every sink entry point then records
# (sink_name, output_mode, state_flags) and raises AuditStop instead of
# starting the query. Normal runs (``_capture is None``) are unaffected.
_capture: list | None = None


class AuditStop(Exception):
    """Raised by audit_gate in audit mode — the stream was inspected, not run."""


def audit_gate(sdf: DataFrame, name: str, output_mode: str) -> None:
    """Record the streaming-state audit for a sink-bound plan and, in audit
    mode, stop before the stream starts. Called by run_to_memory and by
    every streaming query that drives its own ``writeStream...start()``."""
    if _capture is None:
        return
    from hadoop_fs_ceph_spark.plans.inspect import streaming_state_flags

    _capture.append((name, output_mode, streaming_state_flags(sdf, output_mode)))
    raise AuditStop(name)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events table directory.

    Schema comes from a batch read (streaming file sources require an
    explicit schema — inference would be an extra full pass at scale).
    ``ts`` is normalized to a zoned TIMESTAMP exactly like the batch path
    in ``tables.t`` — handles both the old NANOS-as-long fixtures and the
    current TIMESTAMP(MICROS) no-tz fixtures (Spark 4 reads the latter as
    TIMESTAMP_NTZ, which ``withWatermark`` rejects).
    """
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # Spark-written layout (e.g. the soak replicas): events.parquet is
        # a DIRECTORY of part files — stream it directly; the glob filter
        # below would reject every part-*.parquet inside it.
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        # Single-file fixture layout: the file stream source requires a
        # *directory*; stream the sf_dir and glob-filter down to the
        # events table file(s).
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    ts_dtype = dict(stream.dtypes).get("ts")
    if ts_dtype == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_dtype == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def run_to_memory(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain a streaming DataFrame with availableNow into a memory sink
    and return the resulting (batch) table.

    The sink table name is uniquified per invocation: a memory sink in
    append mode otherwise accumulates across re-runs of the same declared
    query within one session (fresh checkpoint ⇒ full replay ⇒ doubled
    rows)."""
    audit_gate(sdf, name, output_mode)
    spark = sdf.sparkSession
    run_id = uuid.uuid4().hex[:8]
    table = f"{name}_{run_id}"
    checkpoint = os.path.join(tempfile.gettempdir(), "hfcs_ckpt", f"{name}-{run_id}")
    q = (
        sdf.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)

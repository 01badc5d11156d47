"""Streaming crash-recovery across a REAL process boundary (VERDICT r7
item 4, carried from r6 #5).

Prior rounds asserted checkpoint recovery within one process — which never
exercises the property that matters in production: a driver crash
(SIGKILL, no shutdown hooks, no graceful stop) mid-stream, followed by a
fresh process resuming from the same checkpoint with recovered offsets AND
recovered RocksDB operator state, finishing with exactly-once results.

Topology: 4 staged parquet files → file source at maxFilesPerTrigger=1 →
watermarked 1-hour windowed count (append mode, RocksDB state store) →
parquet file sink. Phase A runs on a slow processingTime trigger, the
parent waits for the FIRST batch commit and SIGKILLs the whole process
group (python + its JVM — a true crash, mid-stream by construction since
batch 1 is seconds away). Phase B starts a new interpreter + JVM on the
SAME checkpoint with an availableNow trigger and drains the remaining
files. The final sink (read via Spark, which honors `_spark_metadata`, so
any uncommitted orphan from the kill is invisible — the exactly-once
contract) must equal the batch replica of the same windowed aggregate on
the watermark-finalized windows.

What this pins at 100 TB: state restore from checkpointed RocksDB SSTs is
the only thing standing between a preempted driver and double-counted
windows; a partial count for a window opened in batch 0 must be CONTINUED
(not restarted) by the new process.
"""

import datetime
import os
import signal
import subprocess
import sys
import textwrap
import time

import pyspark.sql.functions as F

from hadoop_fs_ceph_spark.tables import t

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _phase_script(phase: str, workdir: str) -> str:
    return textwrap.dedent(
        f"""
        import sys, time, os
        sys.path.insert(0, "/root/repo")
        import pyspark.sql.functions as F
        from hadoop_fs_ceph_spark.session import get_spark

        wd = {workdir!r}
        spark = get_spark("recovery-{phase}", shuffle_partitions=4, driver_memory="3g")
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", {_ROCKSDB!r})
        src = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(wd, "input"))
        )
        agg = (
            src.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("event_type", F.col("w.start").alias("w_start"), "n")
        )
        writer = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", os.path.join(wd, "sink"))
            .option("checkpointLocation", os.path.join(wd, "ck"))
        )
        if {phase!r} == "A":
            # slow trigger: batch 1 is seconds away when the parent kills us
            q = writer.trigger(processingTime="15 seconds").start()
            q.awaitTermination(180)
            os._exit(3)  # should have been SIGKILLed long before this
        else:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            os._exit(0)
        """
    )


def test_crash_recovery_across_process_boundary(spark, sf_dir, tmp_path):
    import glob
    import shutil

    wd = str(tmp_path)
    events = t(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    # 4 input files, split into TIME quartiles and landed in time order
    # (forced modTimes), so each micro-batch advances the watermark
    # monotonically — files spanning the full range would make batch 0
    # jump the watermark to the end and drop batches 1-3 as late data,
    # which tests watermark semantics, not crash recovery. The kill after
    # batch 0 strands quartiles 2-4; windows straddling the quartile-1/2
    # boundary hold partial state at crash time — exactly what phase B
    # must CONTINUE from the recovered store.
    from pyspark.sql import Window

    quartiled = events.withColumn(
        "q", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    os.makedirs(os.path.join(wd, "input"))
    for g in range(1, 5):
        stage = os.path.join(wd, f"stage{g}")
        quartiled.filter(F.col("q") == g).drop("q").coalesce(1).write.parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(wd, "input", f"chunk-{g}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (g * 1000, g * 1000))  # deterministic arrival order

    env = {**os.environ, "PYTHONUNBUFFERED": "1"}
    pa = subprocess.Popen(
        [sys.executable, "-c", _phase_script("A", wd)],
        start_new_session=True,  # own process group: SIGKILL takes the JVM too
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        commits = os.path.join(wd, "ck", "commits")
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(os.path.join(commits, "0")):
                break
            if pa.poll() is not None:
                raise AssertionError(f"phase A died early rc={pa.returncode}")
            time.sleep(0.2)
        else:
            raise AssertionError("phase A never committed batch 0")
        # batch 0 committed; batch 1 is >10s away on the slow trigger.
        # SIGKILL the whole group: a crash, not a stop — no shutdown hooks.
        os.killpg(os.getpgid(pa.pid), signal.SIGKILL)
        pa.wait(timeout=30)
    finally:
        if pa.poll() is None:
            os.killpg(os.getpgid(pa.pid), signal.SIGKILL)
    assert not os.path.exists(os.path.join(commits, "3")), (
        "phase A processed every file before the kill — the crash was not "
        "mid-stream; slow the trigger down"
    )

    pb = subprocess.run(
        [sys.executable, "-c", _phase_script("B", wd)],
        env=env,
        timeout=300,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    assert pb.returncode == 0, "phase B (restart from checkpoint) failed"

    # exactly-once: sink (read via _spark_metadata) == batch replica on
    # every watermark-finalized window — partial batch-0 state for a window
    # must have been CONTINUED by phase B, never restarted or double-counted
    got = {
        (r.event_type, r.w_start, r.n)
        for r in spark.read.parquet(os.path.join(wd, "sink")).collect()
    }
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(minutes=30)
    expect = {
        (r.event_type, r.w_start, r.n)
        for r in (
            events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("event_type", F.col("w.start").alias("w_start"), "n")
            .filter(F.col("w_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(horizon))
            .collect()
        )
    }
    assert expect, "no finalized windows — fixture too small for the watermark"
    assert got == expect

"""Headline bench: run the bench-tagged declared queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Results are materialized with the no-op sink (full execution, no driver
collection) so timings measure the distributed plan, not toPandas.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_fs_ceph_spark.registry import load_all
from hadoop_fs_ceph_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    specs = load_all()
    bench_specs = {n: s for n, s in sorted(specs.items()) if s.bench}
    spark = get_spark("bench", driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing once so per-query numbers measure the plans
    next(iter(bench_specs.values())).fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Host-speed calibration probes, reported alongside the timings so
    # cross-round comparisons can normalize for container/CPU variance
    # (round-to-round runs land on different hosts; a 1.5-2x per-core
    # frequency difference otherwise reads as a code regression):
    # * calib_spark_sec — fixed 32-partition JVM aggregate (parallel
    #   throughput incl. codegen path)
    # * calib_py_sec — fixed single-thread Python loop (scalar speed)
    def _calibrate() -> tuple[float, float]:
        start = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr("sum(id * 3 % 7)").collect()
        c_spark = round(time.perf_counter() - start, 3)
        start = time.perf_counter()
        acc = 0
        for i in range(5_000_000):
            acc += i * i % 97
        c_py = round(time.perf_counter() - start, 3)
        return c_spark, c_py

    calibs = [_calibrate()]

    # Two timed runs per query as two INTERLEAVED full passes, report the
    # per-query min: the first pass pays one-time whole-stage-codegen +
    # JIT compilation (~1s for the widest expression trees), which at
    # 100 TB amortizes to nothing — steady-state execution is the
    # throughput being measured. Interleaving matters on these hosts:
    # contention arrives in multi-second bursts (observed 40% total swings,
    # single queries 5x), so back-to-back repeats of one query all land in
    # the same burst, while passes separated by the full suite length give
    # every query one quiet measurement with high probability — without
    # growing total runtime past the harness budget.
    # Two tiers per query:
    # * COLD (the headline `queries` dict): every run starts with a cleared
    #   SQL cache, so operators that persist() intermediates pay their full
    #   pipeline — the number a first execution at 100 TB pays.
    # * WARM (`queries_warm`): an immediate re-run with the persisted
    #   intermediates still cached — the steady-state of a pipeline that
    #   keeps its signature/gram tables materialized, and the semantics
    #   earlier BENCH_r* rounds effectively reported (min of back-to-back
    #   runs reused the cache), kept for series continuity.
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for _pass in range(2):
        if _pass:
            calibs.append(_calibrate())  # mid-suite probe, interleaved
        for name, spec in bench_specs.items():
            start = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            timings[name] = min(timings.get(name, float("inf")), elapsed)
            start = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm[name] = min(
                warm.get(name, float("inf")), time.perf_counter() - start
            )
            # drop per-query persisted intermediates so one query's cached
            # blocks can't crowd executor memory for the next
            spark.catalog.clearCache()
    timings = {name: round(v, 3) for name, v in timings.items()}
    warm = {name: round(v, 3) for name, v in warm.items()}

    calibs.append(_calibrate())
    total = round(sum(timings.values()), 3)
    # Normalization: 3 interleaved probes (pre / mid-suite / post), MEDIAN
    # spark-calib — min-of-2 undersells sustained contention, mean is
    # hostage to one burst. calib_ref pins the round-3 host (0.285 s) so
    # total_normalized is comparable across rounds: it is the total this
    # suite would have taken on the r3 reference host.
    calib_ref = 0.285
    calib_spark = sorted(c[0] for c in calibs)[len(calibs) // 2]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "total_warm": round(sum(warm.values()), 3),
                "sf": sf,
                "calib_spark_sec": calib_spark,
                "calib_py_sec": sorted(c[1] for c in calibs)[len(calibs) // 2],
                "calib_probes": calibs,
                "calib_ref": calib_ref,
                "total_normalized": round(total * (calib_ref / calib_spark), 3),
                "total_warm_normalized": round(
                    sum(warm.values()) * (calib_ref / calib_spark), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

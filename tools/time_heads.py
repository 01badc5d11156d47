"""Isolated per-head timing: noop-sink wall clock for named bench heads.

Usage: python tools/time_heads.py name [name ...] [--passes N]

Mirrors bench.py methodology (cold = cache cleared before each run, warm =
immediate re-run, min over passes) on one session, so A/B comparisons of a
single operator don't pay a full-suite run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_fs_ceph_spark.registry import load_all  # noqa: E402
from hadoop_fs_ceph_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    confs = []
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])
        elif a.startswith("--conf="):
            confs.append(a[len("--conf="):].split("=", 1))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark("time-heads", driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in confs:
        spark.conf.set(k, v)
        print(f"conf {k}={v}")
    from hadoop_fs_ceph_spark.operators.tpcds_suite4 import ensure_q14_layout

    ensure_q14_layout(spark, sf_dir)
    # warm JVM/codegen once
    specs[args[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    out = {}
    for name in args:
        cold, warm = [], []
        for _ in range(passes):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = {
            "cold": round(min(cold), 3),
            "warm": round(min(warm), 3),
            "cold_all": [round(v, 3) for v in cold],
            "warm_all": [round(v, 3) for v in warm],
        }
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

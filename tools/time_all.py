"""One-pass noop-sink timing sweep over EVERY registered query at sf0.1.

Usage: python tools/time_all.py [--out /tmp/time_all.json]

Finds tail hotspots the bench heads miss: each query is executed once
(cold, cache cleared first) with the noop sink on a single session.
Streaming queries (no batch noop path) are skipped.
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
    out_path = "/tmp/time_all.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark("time-all", driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")
    from hadoop_fs_ceph_spark.operators.tpcds_suite4 import ensure_q14_layout

    ensure_q14_layout(spark, sf_dir)
    out = {}
    for name in sorted(specs):
        spec = specs[name]
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            out[name] = f"skip:{type(exc).__name__}"
        with open(out_path, "w") as fh:
            json.dump(out, fh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

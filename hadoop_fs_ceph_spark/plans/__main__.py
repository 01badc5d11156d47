"""Scale-audit CLI: per-query 100 TB posture report.

    python -m hadoop_fs_ceph_spark.plans q5_local_supplier_volume
    python -m hadoop_fs_ceph_spark.plans --all [sf_dir]   # fleet summary

Per query: join strategies, shuffle count, codegen spans, scan pushdown
facts, and red flags (cartesian joins, world sorts, row-at-a-time Python).
``--all`` prints one summary line per declared query and exits non-zero if
any query has an UNALLOWLISTED red flag — the same allowlist
(`plans/allowlist.py`) the plan tests pin, so exit 0 is the real gate.
Allowlisted flags still print (prefixed ``ok:``) with their reason.
"""

from __future__ import annotations

import sys

from hadoop_fs_ceph_spark.plans import scale_audit
from hadoop_fs_ceph_spark.plans.allowlist import split_flags
from hadoop_fs_ceph_spark.registry import load_all
from hadoop_fs_ceph_spark.session import get_spark
from hadoop_fs_ceph_spark.tables import DEFAULT_SF_DIR


def _report(name: str, spec, spark, sf_dir: str):
    audit = scale_audit(spec.fn(spark, sf_dir))
    line = (
        f"{name}: bhj={audit.broadcast_joins} smj={audit.sort_merge_joins} "
        f"shuffles={audit.shuffles} codegen={audit.codegen_spans} "
        f"topk={'y' if audit.take_ordered else 'n'} "
        f"spw={audit.single_partition_windows}"
    )
    real, allowed = split_flags(name, audit.problems())
    return line, real, allowed, audit


def main() -> None:
    args = [a for a in sys.argv[1:]]
    fleet = "--all" in args
    args = [a for a in args if a != "--all"]
    names = [a for a in args if not a.startswith("/")]
    dirs = [a for a in args if a.startswith("/")]
    sf_dir = dirs[0] if dirs else DEFAULT_SF_DIR

    specs = load_all()
    if not fleet and not names:
        print(__doc__)
        sys.exit(2)
    if fleet:
        names = sorted(n for n, s in specs.items() if "streaming" not in s.tags)

    spark = get_spark("scale-audit", driver_memory="8g")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    used: set[str] = set()
    for name in names:
        if name not in specs:
            print(f"unknown query: {name}")
            flagged += 1
            continue
        try:
            line, real, allowed, audit = _report(name, specs[name], spark, sf_dir)
        except Exception as e:  # noqa: BLE001 - CLI reports, caller decides
            print(f"{name}: ERROR {e}")
            flagged += 1
            continue
        print(line)
        for p in real:
            print(f"  !! {p}")
            flagged += 1
        for p in allowed:
            print(f"  ok: {p}")
            used.add(name)
        if not fleet:
            for s in audit.scans:
                print(f"  scan: {s}")
    if fleet:
        # Allowlist hygiene: an entry whose query no longer carries the
        # flag is drift — not a gate failure, but visible so entries get
        # retired when a reformulation removes the pattern they excused.
        from hadoop_fs_ceph_spark.plans.allowlist import _FLAG_ALLOW

        listed = {n for allow in _FLAG_ALLOW.values() for n in allow}
        for stale in sorted(listed - used):
            print(f"note: allowlist entry no longer matches any flag: {stale}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()

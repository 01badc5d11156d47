"""Plan inspection — the engine's 100 TB posture tooling."""

from hadoop_fs_ceph_spark.plans.inspect import plan_of, scale_audit, scan_info

__all__ = ["plan_of", "scale_audit", "scan_info"]

"""Readers/writers — the engine's storage surface.

Maps the reference connector's byte-stream + FileStatus contract onto
Spark's format readers/writers (SURVEY.md §1.2, §2A). Save modes mirror the
connector's CreateFlag semantics (``CephRgwFileSystem.java:263-271``):
OVERWRITE → ``overwrite``, plain CREATE → ``errorifexists``; table-level
``append`` exists here even though the object store forbids byte-append
(``:304-308``) because appending to a table means adding files, not bytes.
"""

from hadoop_fs_ceph_spark.sources.readers import read_csv, read_json, read_orc, read_parquet
from hadoop_fs_ceph_spark.sources.writers import write_table

__all__ = ["read_csv", "read_json", "read_orc", "read_parquet", "write_table"]

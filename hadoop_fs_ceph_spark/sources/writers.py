"""Format writers with CreateFlag-mapped save modes.

Reference semantics (CephRgwFileSystem.java:250-289):
* CreateFlag.OVERWRITE → parent must exist, target replaced → Spark
  ``mode('overwrite')``
* plain CREATE → target must not exist (FileAlreadyExistsException) →
  Spark ``mode('errorifexists')``
* byte-append unsupported (:304-308) → table ``append`` = new files.

Commit safety: the reference's ``rename`` is a non-atomic S3A copy+delete
(:310-313), so nothing here relies on atomic directory rename — Spark's
FileOutputCommitter owns task/job commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "errorifexists",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    writer = df.write.format(format).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)

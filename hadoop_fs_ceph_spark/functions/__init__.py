"""Reusable column-expression libraries for the LLM-data-pipeline
operators (dedup, similarity, text analysis).

Two hash tiers throughout:
* **portable** — polynomial character hashes built from ``ascii``/fold
  primitives that evaluate bit-identically in Spark *and* DuckDB, so the
  operators stay oracle-checkable end-to-end;
* **production** — ``xxhash64`` (JVM, codegen) for the 100 TB hot path,
  exposed by the same builders via ``portable=False``.

Everything is pure `pyspark.sql.functions` composition — no UDFs anywhere
in these libraries.
"""

from hadoop_fs_ceph_spark.functions import similarity, text  # noqa: F401

"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``hadoop_fs_ceph_spark.registry``: every declared operator
from SURVEY.md §2B is registered there exactly once with its PySpark
implementation and (when SQL-expressible) its DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_fs_ceph_spark.registry import load_all  # noqa: E402

FLAGSHIP = "q1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return load_all()[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL ops)."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}

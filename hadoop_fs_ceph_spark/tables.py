"""Table loading helpers shared by all declared queries."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (parquet) from the scale-factor directory."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

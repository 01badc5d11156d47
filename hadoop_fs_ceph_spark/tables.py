"""Table loading helpers shared by all declared queries."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (parquet) from the scale-factor directory.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. We read it as raw nanos (``nanosAsLong``) and floor to
    microseconds — the same truncation DuckDB applies — so both engines see
    identical µs timestamps.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # events.ts becomes a zoned TIMESTAMP via timestamp_micros; pin the
        # session to UTC so its rendering matches DuckDB regardless of how
        # the consuming session was built (all other tables are ntz).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)

"""Differential tests: every declared query vs its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01); fast local tier
runs at sf0.001 so the suite stays quick while iterating.
"""

import pytest

from hadoop_fs_ceph_spark.oracle import run_one
from hadoop_fs_ceph_spark.registry import load_all

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    try:
        result = run_one(spark, duck, spec, sf_dir)
    finally:
        # operators may persist() intermediates; drop them between queries
        # so cached blocks don't accumulate across the 250+-case sweep
        spark.catalog.clearCache()
    assert result.ok, result.detail
    if spec.oracle is None:
        # rows-only contract: it must at least execute and return a schema
        assert result.detail is not None

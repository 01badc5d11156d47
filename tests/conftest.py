import os

import pytest

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("TEST_SF_DIR_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from hadoop_fs_ceph_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8, driver_memory="6g")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    from hadoop_fs_ceph_spark.oracle import duckdb_connection

    return duckdb_connection(SF_DIR)

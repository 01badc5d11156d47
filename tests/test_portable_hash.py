"""Property test for the portable hash tier: the Spark column expression
and its DuckDB SQL twin must agree on arbitrary ASCII input — this pair
of builders underpins every dedup/text oracle, so it gets its own
adversarial check beyond the fixture data.
"""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_fs_ceph_spark.functions.text import MOD, poly_hash, sql_poly_hash

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=80
)


def _py_poly(s: str, mod: int = MOD) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % mod
    return acc


@given(st.lists(ascii_text, min_size=1, max_size=24, unique=True))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_poly_hash_cross_engine(spark, strings):
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got_spark = {
        r.s: r.h for r in sdf.select("s", poly_hash(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    got_duck = {}
    for s in strings:
        con.execute("CREATE OR REPLACE TEMP TABLE one AS SELECT ? AS s", [s])
        got_duck[s] = con.execute(f"SELECT {sql_poly_hash('s')} FROM one").fetchone()[0]
    expected = {s: _py_poly(s) for s in strings}
    assert got_spark == expected
    assert got_duck == expected

"""Whale-basket cap contract (basket_common).

Pins the three properties the round-10 verdict asked for:

1. **Cap never binds on fixture data** — TPC-H-shaped baskets (≤7 lines)
   pass through the capped projection untouched, so every basket/graph
   oracle hash is unchanged by the cap's introduction.
2. **A planted whale IS capped, deterministically, identically in both
   engines** — one synthetic order with thousands of distinct parts comes
   back as exactly BASKET_CAP lines, the same lines in Spark and DuckDB
   (the property that keeps the pair queries hash-checked under skew).
3. **The fan-out bound is real** — the pair self-join over the capped
   projection emits at most C(BASKET_CAP, 2) rows per order, whale or not.
"""

import os

import pytest
from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.operators.basket_common import (
    BASKET_CAP,
    OP_CAPPED_CTES,
    capped_order_parts,
)
from hadoop_fs_ceph_spark.tables import t

_WHALE_ORDER = 900_000_001
_WHALE_LINES = 2000  # far above the pre-gate activation bound (CAP * 4)
_MID_ORDER = 900_000_002
_MID_LINES = 90  # between CAP and CAP*OVERSAMPLE: rank cap binds, gate not


@pytest.fixture(scope="module")
def whale_dir(spark, tmp_path_factory):
    """A lineitem.parquet with one whale basket, one mid basket, and a few
    normal ones (keys far above fixture ranges so nothing collides)."""
    d = tmp_path_factory.mktemp("whale_sf")
    rows = [(_WHALE_ORDER, 10_000 + i) for i in range(_WHALE_LINES)]
    rows += [(_MID_ORDER, 50_000 + i) for i in range(_MID_LINES)]
    for o in range(5):
        rows += [(900_000_100 + o, 70_000 + 10 * o + i) for i in range(4)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(os.path.join(str(d), "lineitem.parquet"))
    return str(d)


def test_cap_never_binds_on_fixture(spark, sf_dir):
    op = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    capped = capped_order_parts(spark, sf_dir)
    assert capped.count() == op.count()
    # strongest form: the capped projection IS the uncapped one
    assert capped.exceptAll(op).count() == 0


def test_whale_is_capped_exactly(spark, whale_dir):
    capped = capped_order_parts(spark, whale_dir)
    per_order = {
        r["l_orderkey"]: r["n"]
        for r in capped.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_order[_WHALE_ORDER] == BASKET_CAP
    assert per_order[_MID_ORDER] == BASKET_CAP
    for o in range(5):
        assert per_order[900_000_100 + o] == 4  # small baskets untouched


def test_capped_projection_matches_duckdb(spark, whale_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM read_parquet("
        f"'{os.path.join(whale_dir, 'lineitem.parquet')}/*.parquet')"
    )
    duck_rows = set(
        map(
            tuple,
            con.sql(
                f"WITH {OP_CAPPED_CTES} SELECT l_orderkey, l_partkey FROM op"
            ).fetchall(),
        )
    )
    spark_rows = {
        (r["l_orderkey"], r["l_partkey"])
        for r in capped_order_parts(spark, whale_dir).collect()
    }
    assert spark_rows == duck_rows  # same SAMPLE, not just same size


def test_whale_samples_decorrelate(spark, tmp_path_factory):
    """Round-12 (ADVICE r11): the sampling hash is salted with the order
    key, so two whales holding the SAME part universe keep (mostly)
    DIFFERENT part subsets — under the old part-only hash the kept sets
    were identical, which concentrated pair support on the same few
    low-hash parts across every whale basket."""
    import os as _os

    d = tmp_path_factory.mktemp("twin_whales")
    parts = list(range(10_000, 12_000))
    rows = [(_WHALE_ORDER, p) for p in parts]
    rows += [(_WHALE_ORDER + 1, p) for p in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(_os.path.join(str(d), "lineitem.parquet"))
    kept = {
        o: {
            r["l_partkey"]
            for r in capped_order_parts(spark, str(d))
            .filter(F.col("l_orderkey") == o)
            .collect()
        }
        for o in (_WHALE_ORDER, _WHALE_ORDER + 1)
    }
    a, b = kept[_WHALE_ORDER], kept[_WHALE_ORDER + 1]
    assert len(a) == len(b) == BASKET_CAP
    # expected overlap for independent CAP-of-2000 samples ≈ CAP²/2000 ≈ 0.5;
    # the bound below is ~8σ away, yet the old unsalted hash gave overlap=CAP
    assert len(a & b) <= BASKET_CAP // 4


def test_pair_fanout_bounded(spark, whale_dir):
    op = capped_order_parts(spark, whale_dir)
    a = op.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("p2"))
    fanout = (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    bound = BASKET_CAP * (BASKET_CAP - 1) // 2
    assert fanout.agg(F.max("n_pairs")).collect()[0][0] == bound
    assert fanout.filter(F.col("n_pairs") > bound).count() == 0

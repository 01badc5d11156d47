"""Composite TPC-H-shaped queries (Q3 / Q5 / Q18 flavors, adapted to the
driver's column set) — multi-table join trees exercising the optimizer's
join ordering, broadcast selection, partial aggregation, and top-k,
composed from operators the families already verify individually.

These are the workloads the reference connector was built to serve:
Spark SQL over TPC-style warehouse data on object storage (SURVEY.md §0);
the connector moves bytes, Catalyst does everything here.

Scale notes: dimension chains (region→nation) broadcast; fact-fact edges
(orders⋈lineitem) shuffle on the order key; every aggregate is partial
before the exchange; top-k is TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.canonical import dsum, sql_dsum
from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum(_REV, "revenue")},
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
    bench=True,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: unshipped-revenue top-10. customer filters
    broadcast into orders; orders⋈lineitem shuffles on the order key;
    the LIMIT folds into TakeOrderedAndProject."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.expr(_REV), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {sql_dsum(_REV, "revenue")}
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    tags=("tpch", "join"),
    bench=True,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: six-table join, revenue where customer and supplier
    share a nation inside one region. The region→nation→customer chain
    broadcasts down to the orders scan; only orders⋈lineitem shuffles."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.expr(_REV), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    tags=("tpch", "join", "subquery", "having"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-quantity orders via HAVING semi-join.
    The qualifying-key set (orders with >300 total quantity) is an
    aggregate over lineitem reused as a left-semi join — at scale the
    aggregated key set is orders-of-magnitude smaller than lineitem, so
    it broadcasts into the main join tree. l_quantity is integral-valued
    (double-typed), so BIGINT accumulation is exact in both engines."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(big), li.l_orderkey == big.big_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )

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
        .join(c, o.o_custkey == c.c_custkey)
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
    share a nation inside one region. The region filter is pushed INTO
    customer and supplier as broadcast semi-joins against the qualifying
    nation keys (5 of 25 — spec-bounded at every SF) BEFORE any fact
    join (r9 cluster-shape rehearsal): both big-side shuffles then carry
    ~1/5 of the rows whether the engine picks broadcast or SMJ for the
    fact joins. The nation name attaches at the end via the same bounded
    broadcast."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    nk = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )  # ≤25 rows by spec, at ANY scale factor
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(nk.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(nk.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(nk), c.c_nationkey == nk.n_nationkey)
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
        .join(big, li.l_orderkey == big.big_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("tpch", "subquery", "semi"),
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders (in a date window) having at least one line
    shipped after the order date — correlated EXISTS compiled to a
    left-semi join on the order key; the lineitem side carries only
    (l_orderkey, l_shipdate) into the join."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum(_REV, "revenue")},
           ANY_VALUE(c.c_mktsegment) AS segment
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: customers who returned the most revenue — the
    churn-analysis join tree with a selective fact filter (returnflag
    pushed to the lineitem scan) and top-k on the aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(F.expr(_REV), "revenue"),
            F.any_value("c_mktsegment").alias("segment"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT {sql_dsum(f"CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REV} ELSE 0.0 END", "promo_rev")},
           {sql_dsum(_REV, "total_rev")}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("tpch", "join", "conditional"),
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promotional revenue share for one month — a
    broadcast dimension join with conditional aggregation (the CASE rides
    inside the fixed-point sum, so both engines accumulate identically)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.expr(_REV)
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(dsum(promo, "promo_rev"), dsum(rev, "total_rev"))
    )


@query(
    "q19_disjunctive",
    oracle=f"""
    SELECT {sql_dsum(_REV, "revenue")}, COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 5)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 10)
       OR (p.p_size BETWEEN 40 AND 50 AND l.l_quantity < 3)
    """,
    tags=("tpch", "join", "disjunctive"),
)
def q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst's CNF
    conversion extracts the common single-side conjuncts so part of the
    disjunction still pushes into each scan — the canonical test that
    predicate pushdown survives disjunctions."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 10))
        | (F.col("p_size").between(40, 50) & (F.col("l_quantity") < 3))
    )
    return j.filter(cond).agg(
        dsum(F.expr(_REV), "revenue"), F.count(F.lit(1)).alias("n_lines")
    )

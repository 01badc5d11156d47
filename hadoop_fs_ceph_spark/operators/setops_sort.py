"""Set operations + multi-key sort / limit / global top-k.

UNION ALL is shuffle-free (plan concatenation); UNION/INTERSECT/EXCEPT
dedup via hash aggregate on all columns. Global top-k never globally sorts:
Spark's TakeOrderedAndProject keeps k rows per partition then merges on the
driver — O(k) driver memory at any scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t


def _cust_keys(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.lit("customer").alias("side"),
    )


def _supp_keys(spark, sf_dir):
    return t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey"),
        F.lit("supplier").alias("side"),
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT nationkey, side, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    ) GROUP BY nationkey, side
    """,
    tags=("setop",),
)
def setop_union_all(spark, sf_dir):
    u = _cust_keys(spark, sf_dir).unionByName(_supp_keys(spark, sf_dir))
    return u.groupBy("nationkey", "side").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nationkey
    FROM customer
    INTERSECT
    SELECT CASE WHEN s_nationkey % 7 = 0 THEN NULL ELSE s_nationkey END AS nationkey
    FROM supplier
    """,
    tags=("setop", "null"),
)
def setop_intersect(spark, sf_dir):
    """INTERSECT with injected NULLs — set-op NULL equality (NULL matches
    NULL in set operations, unlike join predicates)."""
    c = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_nationkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .cast("int")
        .alias("nationkey")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.when(F.col("s_nationkey") % 7 == 0, None)
        .otherwise(F.col("s_nationkey"))
        .cast("int")
        .alias("nationkey")
    )
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
    SELECT CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nationkey
    FROM customer
    EXCEPT
    SELECT CASE WHEN s_nationkey % 7 = 0 THEN NULL ELSE s_nationkey END AS nationkey
    FROM supplier
    """,
    tags=("setop", "null"),
)
def setop_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_nationkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .cast("int")
        .alias("nationkey")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.when(F.col("s_nationkey") % 7 == 0, None)
        .otherwise(F.col("s_nationkey"))
        .cast("int")
        .alias("nationkey")
    )
    return c.subtract(s)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity <= 3
    EXCEPT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity = 1
    """,
    tags=("setop",),
)
def setop_except_all(spark, sf_dir):
    """EXCEPT ALL — bag semantics (multiplicity-preserving difference)."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") <= 3).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_quantity") == 1).select(F.col("l_returnflag").alias("flag"))
    return a.exceptAll(b)


@query(
    "sort_multikey_nulls",
    oracle="""
    SELECT c_custkey, seg, bal FROM (
      SELECT c_custkey,
             CASE WHEN c_nationkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    ORDER BY bal DESC NULLS LAST, seg ASC NULLS FIRST, c_custkey
    LIMIT 60
    """,
    tags=("sort", "null"),
)
def sort_multikey_nulls(spark, sf_dir):
    """Multi-key sort with explicit null ordering; LIMIT makes the null
    placement semantically observable in the returned set."""
    c = t(spark, sf_dir, "customer")
    proj = c.select(
        "c_custkey",
        F.when(F.col("c_nationkey") % 5 == 0, None).otherwise(F.col("c_mktsegment")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    return proj.orderBy(
        F.col("bal").desc_nulls_last(), F.col("seg").asc_nulls_first(), "c_custkey"
    ).limit(60)


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort", "topk"),
    bench=True,
)
def topk_global(spark, sf_dir):
    """Global top-k: orderBy().limit(k) compiles to TakeOrderedAndProject —
    per-partition heaps, no global sort, O(k) merge."""
    o = t(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(20).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity <= 3
    INTERSECT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity <= 2
    """,
    tags=("setop",),
)
def setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag semantics (multiplicity-preserving
    intersection), completing the set-op family next to
    `setop_except_all`: each flag survives min(countA, countB) times.
    Spark plans this as a partial-aggregated count-compare join — one
    shuffle on the value, no distinct collapse."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") <= 3).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_quantity") <= 2).select(F.col("l_returnflag").alias("flag"))
    return a.intersectAll(b)


@query(
    "sort_paginate_offset",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 10 OFFSET 20
    """,
    tags=("sort", "pagination", "offset"),
)
def sort_paginate_offset(spark, sf_dir):
    """Keyset-free pagination: page 3 (OFFSET 20 LIMIT 10) of the
    balance leaderboard via `DataFrame.offset()` — only deterministic
    because the sort key is TOTAL (balance, custkey tie-break); an
    OFFSET over a partial order returns an engine-dependent page,
    which is the classic pagination bug this row pins against.

    Plan: Spark folds offset+limit into one TakeOrdered(30) and drops
    the head client-side of the exchange — no world sort
    materializes; at deep offsets production pivots to keyset
    pagination (WHERE key > last_seen), same total-order requirement."""
    c = t(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .offset(20)
        .limit(10)
    )

"""TPC-DS-style composite shapes the TPC-H suite doesn't exercise:
year-over-year self-join of an aggregate (Q11/Q4 family), multi-channel
UNION ALL feeding a ROLLUP (Q5 family), and multi-way INTERSECT
customer-overlap counting (Q38/Q87 family) — adapted to the driver's
star schema (orders stands in for the store/web/catalog channel tables,
with order priority as the channel discriminator).

Scale posture: every shape aggregates BEFORE joining or set-opping, so
shuffles carry (key, partial) rows, never facts; the YoY self-join
reuses one shuffle output on both sides (same grouping key); rollup
expands after partial aggregation inside Spark's Expand operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.canonical import dsum, sql_dsum
from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t


@query(
    "ds_yoy_growth",
    oracle=f"""
    WITH yearly AS (
      SELECT o_custkey, EXTRACT(year FROM o_orderdate) AS yr,
             {sql_dsum("o_totalprice", "rev")}
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
      GROUP BY o_custkey, yr
    )
    SELECT a.o_custkey, a.rev AS rev_1997, b.rev AS rev_1998,
           b.rev / a.rev AS growth
    FROM yearly a JOIN yearly b ON a.o_custkey = b.o_custkey
    WHERE a.yr = 1997 AND b.yr = 1998 AND b.rev > 1.2 * a.rev
    ORDER BY growth DESC, a.o_custkey
    """,
    tags=("tpcds", "self-join", "yoy"),
)
def ds_yoy_growth(spark, sf_dir):
    """Year-over-year revenue growth per customer (TPC-DS Q11 shape): one
    per-customer-per-year aggregate consumed twice — the 1997 side joined
    to the 1998 side on the customer key, keeping customers who grew
    >20%. Both join inputs come from the SAME shuffle (grouping key
    covers the join key), so Catalyst co-partitions them with no extra
    exchange. Growth is a single double division of two fixed-point
    sums — deterministic cross-engine."""
    o = t(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    yearly = (
        o.filter(F.col("yr").isin(1997, 1998))
        .groupBy("o_custkey", "yr")
        .agg(dsum("o_totalprice", "rev"))
    )
    a = yearly.filter(F.col("yr") == 1997).select(
        "o_custkey", F.col("rev").alias("rev_1997")
    )
    b = yearly.filter(F.col("yr") == 1998).select(
        F.col("o_custkey").alias("ck"), F.col("rev").alias("rev_1998")
    )
    return (
        a.join(b, a.o_custkey == b.ck)
        .filter(F.col("rev_1998") > 1.2 * F.col("rev_1997"))
        .select(
            "o_custkey",
            "rev_1997",
            "rev_1998",
            (F.col("rev_1998") / F.col("rev_1997")).alias("growth"),
        )
        .orderBy(F.col("growth").desc(), "o_custkey")
    )


@query(
    "ds_channel_rollup",
    oracle=f"""
    SELECT channel, o_orderstatus,
           COUNT(*) AS n, {sql_dsum("o_totalprice", "revenue")},
           GROUPING(channel) + 2 * GROUPING(o_orderstatus) AS gid
    FROM (
      SELECT 'express' AS channel, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      UNION ALL
      SELECT 'standard' AS channel, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    )
    GROUP BY ROLLUP (channel, o_orderstatus)
    ORDER BY gid, channel, o_orderstatus
    """,
    tags=("tpcds", "union", "rollup"),
)
def ds_channel_rollup(spark, sf_dir):
    """Multi-channel sales report (TPC-DS Q5 shape): two channel
    relations (express vs standard priority, standing in for store/web
    tables) tagged and UNION ALLed, then ROLLUP over (channel, status)
    gives per-channel-status, per-channel, and grand-total rows in one
    pass. grouping() flags disambiguate synthesized NULLs from data
    NULLs. The union is append-only (no shuffle); the rollup shuffles
    once on the group keys after map-side partials."""
    o = t(spark, sf_dir, "orders")
    express = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    tagged = o.withColumn(
        "channel", F.when(express, F.lit("express")).otherwise(F.lit("standard"))
    )
    return (
        tagged.rollup("channel", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "revenue"),
            (
                F.grouping("channel") + F.lit(2) * F.grouping("o_orderstatus")
            ).alias("gid"),
        )
        .orderBy("gid", "channel", "o_orderstatus")
    )


@query(
    "ds_cross_channel_customers",
    oracle="""
    SELECT COUNT(*) AS n_loyal FROM (
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
    )
    """,
    tags=("tpcds", "intersect", "setop"),
)
def ds_cross_channel_customers(spark, sf_dir):
    """Customers active in all three years (TPC-DS Q38 shape): a chain of
    INTERSECTs over deduplicated key sets, then a count. Spark compiles
    each INTERSECT to a distinct + left-semi join on the key — the sets
    shrink monotonically left to right, so the cheapest plan puts the
    most selective year first at scale (here sizes are comparable)."""
    o = t(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))

    def keys(year: int):
        return o.filter(F.col("yr") == year).select("o_custkey")

    loyal = keys(1996).intersect(keys(1997)).intersect(keys(1998))
    return loyal.agg(F.count(F.lit(1)).alias("n_loyal"))

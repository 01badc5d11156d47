"""TPC-DS representative tier (VERDICT r6 item 3) — twelve canonical
TPC-DS query shapes adapted to the driver's star schema, named by the
TPC-DS query whose plan shape they reproduce. ``tpcds_lite.py`` holds the
first three (Q11 YoY, Q5 channel rollup, Q38 INTERSECT); this module adds
the shapes a Spark warehouse actually runs daily: star-join top-N
reports, segment profiling, cross-border analysis, ticket-size banding,
cumulative channel comparison, week-over-week pivots, deviation-from-mean
screens, rollup-with-rank hierarchies, time-bucket scans, returns
adjustment, and frequent-item/best-customer intersection.

Schema mapping (same conventions as tpcds_lite): ``orders`` stands in for
the channel fact heads with ``o_orderpriority`` as the channel
discriminator (express = 1-URGENT/2-HIGH), ``lineitem`` is the item-level
fact, ``part``/``customer``/``supplier``/``nation`` are the dimensions,
and ``events`` plays the time-of-day fact for Q88.

Scale posture, uniform across the module: aggregate BEFORE joining or
windowing wherever the shape allows, so shuffles carry (key, partial)
rows; dimension joins broadcast only spec-bounded relations (nation) or
rely on AQE for SF-scaled dims; every ORDER BY feeding a LIMIT is a
TakeOrdered, never a global sort; ratios divide two fixed-point sums
(canonical.py) so results hash-match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.canonical import dsum, sql_dsum
from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import dim, t

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "ds_tpcds_q3_brand_report",
    oracle=f"""
    SELECT EXTRACT(year FROM o_orderdate) AS yr, p_brand,
           {sql_dsum(_REV, "revenue")}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part   ON l_partkey = p_partkey
    WHERE p_type IN ('STANDARD', 'SMALL')
    GROUP BY yr, p_brand
    ORDER BY yr, revenue DESC, p_brand
    LIMIT 40
    """,
    tags=("tpcds", "star-join", "topn"),
    bench=True,
)
def ds_tpcds_q3_brand_report(spark, sf_dir):
    """TPC-DS Q3: the canonical star top-N — fact filtered through one
    dimension predicate (item manufacturer → part type), dated through a
    second (date_dim → orders), grouped by (year, brand), best rows
    first. Plan: part-type filter reaches the part scan (pushed); the
    fact is pre-aggregated to (partkey, year) grain BEFORE the part join
    (r9 cluster-shape rehearsal: with auto-broadcast off, the part join
    is a shuffle — reducing facts ~4× first is the two-phase plan a
    100 TB run wants regardless of join strategy). The two-phase
    fixed-point sum keeps integer micro-units until the final division,
    so it is bit-identical to the single-phase dsum (integer sums are
    associative) and the DuckDB oracle is untouched. ORDER+LIMIT
    compiles to TakeOrderedAndProject — no global sort at any scale."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", F.year("o_orderdate").alias("yr"))
    p = t(spark, sf_dir, "part").filter(F.col("p_type").isin("STANDARD", "SMALL")).select(
        "p_partkey", "p_brand"
    )
    pre = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_partkey", "yr")
        .agg(
            F.sum(F.round(_rev_col() * F.lit(1e6)).cast("long")).alias("_micro")
        )
    )
    return (
        pre.join(p, pre.l_partkey == p.p_partkey)
        .groupBy("yr", "p_brand")
        .agg((F.sum("_micro").cast("double") / F.lit(1e6)).alias("revenue"))
        .orderBy("yr", F.col("revenue").desc(), "p_brand")
        .limit(40)
    )


@query(
    "ds_tpcds_q7_segment_profile",
    oracle=f"""
    SELECT p_type,
           COUNT(*) AS n_lines,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_price")},
           {sql_dsum("l_discount", "sum_disc")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part     ON l_partkey = p_partkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY p_type
    ORDER BY p_type
    """,
    tags=("tpcds", "star-join", "profile"),
)
def ds_tpcds_q7_segment_profile(spark, sf_dir):
    """TPC-DS Q7: demographic purchase profile — item-level averages for
    one customer segment across every product class. Sums are emitted as
    fixed-point canonicals (the averages are sum/n, derivable by any
    consumer; emitting sums keeps the hash exact). Four-table star: the
    segment filter prunes customer before its join, part joins on the
    item key, one partial-merged aggregate on the 6-value p_type."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            dsum("l_discount", "sum_disc"),
        )
        .orderBy("p_type")
    )


@query(
    "ds_tpcds_q19_cross_border_brands",
    oracle=f"""
    SELECT p_brand, {sql_dsum(_REV, "revenue")}, COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey
    WHERE c_nationkey <> s_nationkey
      AND EXTRACT(year FROM o_orderdate) = 1997
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    """,
    tags=("tpcds", "star-join", "geography"),
)
def ds_tpcds_q19_cross_border_brands(spark, sf_dir):
    """TPC-DS Q19: brand revenue where the buyer's geography differs from
    the seller's (store zip != customer zip in DS; nations here) — the
    'out-of-area purchases' report. The geography mismatch is a residual
    predicate on the joined row (not an equi-key), applied after the two
    entity joins; everything else is standard star wiring with the year
    filter pushed to the orders scan."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey", "o_custkey"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(dsum(_rev_col(), "revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.col("revenue").desc(), "p_brand")
    )


@query(
    "ds_tpcds_q34_ticket_band",
    oracle="""
    WITH tickets AS (
      SELECT l_orderkey, COUNT(*) AS n_items
      FROM lineitem GROUP BY l_orderkey
      HAVING COUNT(*) BETWEEN 5 AND 7
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_tickets,
           CAST(SUM(n_items) AS BIGINT) AS total_items
    FROM tickets JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    HAVING COUNT(*) >= 2
    ORDER BY n_tickets DESC, total_items DESC, o_custkey
    """,
    tags=("tpcds", "having", "band"),
)
def ds_tpcds_q34_ticket_band(spark, sf_dir):
    """TPC-DS Q34/Q73: customers with repeated mid-size baskets — count
    items per ticket, keep tickets in the [5,7] band, then count
    qualifying tickets per customer and keep repeaters. Two HAVING
    tiers; the first aggregate shrinks lineitem to one row per order
    BEFORE the orders join, so the join input is already order-grained
    (the shape that matters at 100 TB: never join the raw item fact to
    get a per-order property)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    tickets = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items").between(5, 7))
    )
    return (
        tickets.join(o, tickets.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tickets"),
            F.sum("n_items").cast("long").alias("total_items"),
        )
        .filter(F.col("n_tickets") >= 2)
        .orderBy(F.col("n_tickets").desc(), F.col("total_items").desc(), "o_custkey")
    )


@query(
    "ds_tpcds_q51_cumulative_channels",
    oracle=f"""
    WITH monthly AS (
      SELECT DATE_TRUNC('month', o_orderdate) AS mon,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'express' ELSE 'standard' END AS channel,
             {sql_dsum("o_totalprice", "rev")}
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
      GROUP BY mon, channel
    ),
    cum AS (
      SELECT mon, channel, rev,
             SUM(CAST(ROUND(rev * 1000000.0) AS BIGINT))
               OVER (PARTITION BY channel ORDER BY mon) AS cum_fix
      FROM monthly
    ),
    wide AS (
      SELECT mon,
             CAST(MAX(CASE WHEN channel = 'express' THEN cum_fix END) AS DOUBLE)
               / 1000000.0 AS express_cum,
             CAST(MAX(CASE WHEN channel = 'standard' THEN cum_fix END) AS DOUBLE)
               / 1000000.0 AS standard_cum
      FROM cum GROUP BY mon
    )
    SELECT mon, express_cum, standard_cum
    FROM wide
    WHERE express_cum > standard_cum
    ORDER BY mon
    """,
    tags=("tpcds", "window", "cumulative"),
)
def ds_tpcds_q51_cumulative_channels(spark, sf_dir):
    """TPC-DS Q51: cumulative revenue race between two channels — monthly
    aggregates per channel, running totals via a window, channels pivoted
    wide, keep the months where the express channel's cumulative leads.
    The window runs over MONTHLY rows (24 per channel), never over facts:
    aggregate-then-window is the Q51 discipline that keeps window state
    tiny at any scale. Running sums accumulate the fixed-point integers
    (exact, order-independent) and convert to double once at the end —
    bit-identical to the oracle's window over BIGINTs."""
    o = t(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    express = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    monthly = (
        o.filter(F.col("yr").isin(1997, 1998))
        .withColumn("mon", F.date_trunc("month", "o_orderdate"))
        .withColumn("channel", F.when(express, "express").otherwise("standard"))
        .groupBy("mon", "channel")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 1e6).cast("long")).alias("rev_fix")
        )
    )
    w = Window.partitionBy("channel").orderBy("mon")
    cum = monthly.withColumn("cum_fix", F.sum("rev_fix").over(w))
    wide = (
        cum.groupBy("mon")
        .pivot("channel", ["express", "standard"])
        .agg(F.max("cum_fix"))
        .select(
            "mon",
            (F.col("express").cast("double") / 1e6).alias("express_cum"),
            (F.col("standard").cast("double") / 1e6).alias("standard_cum"),
        )
    )
    return wide.filter(F.col("express_cum") > F.col("standard_cum")).orderBy("mon")


@query(
    "ds_tpcds_q59_wow_ratio",
    oracle=f"""
    WITH weekly AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(week FROM o_orderdate) AS wk,
             dayofweek(o_orderdate) + 1 AS dow,  -- DuckDB Sun=0, Spark Sun=1
             {sql_dsum("o_totalprice", "rev")}
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
        AND EXTRACT(week FROM o_orderdate) <= 52
      GROUP BY yr, wk, dow
    )
    SELECT a.wk, a.dow, a.rev AS rev_1997, b.rev AS rev_1998,
           b.rev / a.rev AS ratio
    FROM weekly a JOIN weekly b
      ON a.wk = b.wk AND a.dow = b.dow AND a.yr = 1997 AND b.yr = 1998
    ORDER BY a.wk, a.dow
    """,
    tags=("tpcds", "self-join", "seasonality"),
)
def ds_tpcds_q59_wow_ratio(spark, sf_dir):
    """TPC-DS Q59: week-over-week sales by weekday — the same
    (week, weekday) cell compared across two years via a self-join of
    one weekly aggregate (Q59 pivots weekdays wide then joins stores
    year-over-year; the join-on-(wk,dow) form is the same dataflow with
    the pivot deferred to the consumer). Both self-join inputs reuse a
    single shuffle (grouping key ⊇ join key). Week 53 is excluded: it
    exists in only some years, so the ratio cell would be unmatched —
    the same guard the DS spec applies via its 52-week date_dim slice.
    DuckDB/Spark agree on ISO weekofyear and on Sunday=1 dayofweek."""
    o = t(spark, sf_dir, "orders")
    weekly = (
        o.withColumn("yr", F.year("o_orderdate"))
        .filter(F.col("yr").isin(1997, 1998))
        .withColumn("wk", F.weekofyear("o_orderdate"))
        .filter(F.col("wk") <= 52)
        .withColumn("dow", F.dayofweek("o_orderdate"))
        .groupBy("yr", "wk", "dow")
        .agg(dsum("o_totalprice", "rev"))
    )
    a = weekly.filter(F.col("yr") == 1997).select(
        "wk", "dow", F.col("rev").alias("rev_1997")
    )
    b = weekly.filter(F.col("yr") == 1998).select(
        F.col("wk").alias("wk2"), F.col("dow").alias("dow2"), F.col("rev").alias("rev_1998")
    )
    return (
        a.join(b, (a.wk == b.wk2) & (a.dow == b.dow2))
        .select(
            "wk",
            "dow",
            "rev_1997",
            "rev_1998",
            (F.col("rev_1998") / F.col("rev_1997")).alias("ratio"),
        )
        .orderBy("wk", "dow")
    )


@query(
    "ds_tpcds_q89_monthly_deviation",
    oracle=f"""
    WITH monthly AS (
      SELECT p_brand, EXTRACT(month FROM o_orderdate) AS mon,
             {sql_dsum(_REV, "rev")}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part   ON l_partkey = p_partkey
      WHERE EXTRACT(year FROM o_orderdate) = 1997
      GROUP BY p_brand, mon
    ),
    yearly AS (
      SELECT p_brand,
             CAST(SUM(CAST(ROUND(rev * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS tot,
             COUNT(*) AS n_months
      FROM monthly GROUP BY p_brand
    )
    SELECT m.p_brand, m.mon, m.rev,
           y.tot / y.n_months AS avg_monthly,
           m.rev - y.tot / y.n_months AS deviation
    FROM monthly m JOIN yearly y ON m.p_brand = y.p_brand
    WHERE ABS(m.rev - y.tot / y.n_months) > 0.3 * (y.tot / y.n_months)
    ORDER BY deviation, m.p_brand, m.mon
    """,
    tags=("tpcds", "deviation", "screen"),
)
def ds_tpcds_q89_monthly_deviation(spark, sf_dir):
    """TPC-DS Q89: months that deviate sharply from a brand's average
    monthly revenue — the anomaly screen merchandisers run. Q89 uses
    AVG() OVER (PARTITION BY brand); windowed AVG over doubles is
    accumulation-order-sensitive cross-engine, so the deterministic
    formulation keeps the EXACT micro-unit integers per month and takes
    a window SUM of them over the brand partition (integer window sums
    are order-independent) — one fact aggregation instead of the
    join-back CTE the oracle phrases, which would make Spark re-execute
    the whole fact pipeline for the second reference (2× fact scans at
    100 TB). Window state is the ≤25×12-row aggregated series. The
    deviation predicate and ordering use raw IEEE ops on identical
    operands (no rounding), so the hash matches bit-for-bit."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey", F.month("o_orderdate").alias("mon")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "mon")
        .agg(F.sum(F.round(_rev_col() * F.lit(1e6)).cast("long")).alias("_micro"))
        .withColumn("rev", F.col("_micro").cast("double") / F.lit(1e6))
    )
    wb = Window.partitionBy("p_brand")
    avg_m = (F.sum("_micro").over(wb).cast("double") / F.lit(1e6)) / F.count(
        F.lit(1)
    ).over(wb)
    return (
        monthly.withColumn("avg_monthly", avg_m)
        .withColumn("deviation", F.col("rev") - F.col("avg_monthly"))
        .filter(F.abs(F.col("deviation")) > 0.3 * F.col("avg_monthly"))
        .select("p_brand", "mon", "rev", "avg_monthly", "deviation")
        .orderBy("deviation", "p_brand", "mon")
    )


@query(
    "ds_tpcds_q36_margin_rollup_rank",
    oracle=f"""
    WITH g AS (
      SELECT n_name, p_type,
             CAST(GROUPING(n_name) + GROUPING(p_type) AS INTEGER)
               AS lochierarchy,
             CAST(GROUPING(p_type) AS INTEGER) AS gp,
             {sql_dsum(_REV, "revenue")},
             {sql_dsum("l_quantity", "qty")}
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN part     ON l_partkey = p_partkey
      GROUP BY ROLLUP (n_name, p_type)
    )
    SELECT lochierarchy, n_name, p_type, revenue,
           revenue / qty AS rev_per_unit,
           CAST(RANK() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN gp = 1 THEN NULL ELSE n_name END
             ORDER BY revenue / qty DESC, n_name NULLS FIRST,
                      p_type NULLS FIRST
           ) AS INTEGER) AS rank_within_parent
    FROM g
    ORDER BY lochierarchy DESC, n_name NULLS FIRST, p_type NULLS FIRST
    """,
    tags=("tpcds", "rollup", "rank"),
)
def ds_tpcds_q36_margin_rollup_rank(spark, sf_dir):
    """TPC-DS Q36: revenue-per-unit hierarchy — ROLLUP over
    (nation, part-type) with a RANK *within each parent* at every
    hierarchy level (the 'rank children under their parent' report).
    The rank partition key is (lochierarchy, parent): detail rows rank
    among siblings of the same nation, nation rows rank among nations,
    the grand total ranks alone. Like Q67, the fact is reduced to the
    LEAF grain by a plain groupBy BEFORE the ROLLUP (Spark expands
    grouping sets before the partial aggregate, so rolling up raw facts
    would triple the aggregation input; rolling up the ≤150-row leaf
    relation is free and exact — fixed-point micro-unit sums are
    associative). The window input is the rolled-up relation
    (≤ 25·6+25+1 rows) — window-over-aggregate, never over facts.
    Ratio = division of two fixed-point sums (bit-identical
    cross-engine); rank ties broken by the full key."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = dim(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    # two-phase leaf (the Q3/Q67 trade): reduce the fact to the numeric
    # (suppkey, partkey) grain BEFORE the dimension joins — the first
    # exchange carries (2 longs, 2 longs) rows, the dim joins probe the
    # reduced relation, and the second aggregate re-sums exact
    # micro-units after keys widen to names (integer sums associative —
    # bit-identical, oracle untouched).
    pre = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.round(_rev_col() * F.lit(1e6)).cast("long")).alias("_pr"),
        F.sum(F.round(F.col("l_quantity") * F.lit(1e6)).cast("long")).alias("_pq"),
    )
    leaf = (
        pre.join(s, pre.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(p, pre.l_partkey == p.p_partkey)
        .groupBy("n_name", "p_type")
        .agg(
            F.sum("_pr").alias("_rev6"),
            F.sum("_pq").alias("_qty6"),
        )
    )
    g = (
        leaf.rollup("n_name", "p_type")
        .agg(
            (F.grouping("n_name") + F.grouping("p_type")).cast("int").alias(
                "lochierarchy"
            ),
            (F.sum("_rev6").cast("double") / F.lit(1e6)).alias("revenue"),
            (F.sum("_qty6").cast("double") / F.lit(1e6)).alias("qty"),
            F.grouping("p_type").cast("int").alias("_gp"),
        )
    )
    parent = F.when(F.col("_gp") == 1, F.lit(None)).otherwise(F.col("n_name"))
    w = Window.partitionBy("lochierarchy", parent).orderBy(
        (F.col("revenue") / F.col("qty")).desc(),
        F.col("n_name").asc_nulls_first(),
        F.col("p_type").asc_nulls_first(),
    )
    return (
        g.withColumn("rev_per_unit", F.col("revenue") / F.col("qty"))
        .withColumn("rank_within_parent", F.rank().over(w))
        .select(
            "lochierarchy", "n_name", "p_type", "revenue",
            "rev_per_unit", "rank_within_parent",
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("n_name").asc_nulls_first(),
            F.col("p_type").asc_nulls_first(),
        )
    )


@query(
    "ds_tpcds_q88_time_buckets",
    oracle="""
    SELECT
      CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) < 3)  AS BIGINT) AS h00_02,
      CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 3 AND 5) AS BIGINT) AS h03_05,
      CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 6 AND 8) AS BIGINT) AS h06_08,
      CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 9 AND 11) AS BIGINT) AS h09_11,
      CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 12 AND 14) AS BIGINT) AS h12_14,
      CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 15 AND 17) AS BIGINT) AS h15_17,
      CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 18 AND 20) AS BIGINT) AS h18_20,
      CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) >= 21) AS BIGINT) AS h21_23
    FROM events
    WHERE value > 10
    """,
    tags=("tpcds", "conditional-agg", "single-row"),
)
def ds_tpcds_q88_time_buckets(spark, sf_dir):
    """TPC-DS Q88: store traffic by time-of-day band — the spec writes it
    as EIGHT scalar subqueries cross-joined into one row; the Spark-first
    formulation is ONE conditional aggregate over a single scan (8
    count_if columns), which is what a columnar engine should execute:
    one pass, map-side partials, a 1-row result. The oracle keeps
    DuckDB's FILTER form — same semantics, and the hash match proves
    the one-pass rewrite exact."""
    e = t(spark, sf_dir, "events").filter(F.col("value") > 10)
    h = F.hour("ts")

    def band(lo, hi, name):
        return F.count_if((h >= lo) & (h <= hi)).cast("long").alias(name)

    return e.agg(
        band(0, 2, "h00_02"),
        band(3, 5, "h03_05"),
        band(6, 8, "h06_08"),
        band(9, 11, "h09_11"),
        band(12, 14, "h12_14"),
        band(15, 17, "h15_17"),
        band(18, 20, "h18_20"),
        band(21, 23, "h21_23"),
    )


@query(
    "ds_tpcds_q93_returns_adjusted",
    oracle=f"""
    WITH adj AS (
      SELECT o_custkey,
             CASE WHEN l_returnflag = 'R'
                  THEN -(l_extendedprice * (1 - l_discount))
                  ELSE l_extendedprice * (1 - l_discount) END AS signed_rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT o_custkey, {sql_dsum("signed_rev", "net_revenue")}
    FROM adj
    GROUP BY o_custkey
    ORDER BY net_revenue DESC, o_custkey
    LIMIT 100
    """,
    tags=("tpcds", "returns", "topn"),
)
def ds_tpcds_q93_returns_adjusted(spark, sf_dir):
    """TPC-DS Q93: customer value net of returns — returned lines
    (store_returns in DS; the R return flag here) flip sign instead of
    being joined against a separate returns table, then net revenue per
    customer, top 100. The sign flip is a map-side CASE (no
    returns-table join needed in this schema — where one exists the
    shape adds one equi-join on the line key); TakeOrdered for the
    top-N. Signed fixed-point sums stay exact under cancellation —
    doubles would lose associativity exactly where positives and
    negatives interleave."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    signed = F.when(F.col("l_returnflag") == "R", -_rev_col()).otherwise(_rev_col())
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", signed.alias("signed_rev"))
        .groupBy("o_custkey")
        .agg(dsum("signed_rev", "net_revenue"))
        .orderBy(F.col("net_revenue").desc(), "o_custkey")
        .limit(100)
    )


@query(
    "ds_tpcds_q23_frequent_best",
    oracle=f"""
    WITH frequent_parts AS (
      SELECT l_partkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
      GROUP BY l_partkey
      HAVING COUNT(DISTINCT l_orderkey) >= 3
    ),
    best_customers AS (
      SELECT o_custkey
      FROM orders
      GROUP BY o_custkey
      HAVING SUM(CAST(ROUND(o_totalprice * 1000000.0) AS BIGINT)) >
        (SELECT 0.5 * MAX(s) FROM (
           SELECT SUM(CAST(ROUND(o_totalprice * 1000000.0) AS BIGINT)) AS s
           FROM orders GROUP BY o_custkey))
    )
    SELECT EXTRACT(month FROM o_orderdate) AS mon,
           {sql_dsum(_REV, "revenue")},
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE EXTRACT(year FROM o_orderdate) = 1998
      AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
      AND o_custkey IN (SELECT o_custkey FROM best_customers)
    GROUP BY mon
    ORDER BY mon
    """,
    tags=("tpcds", "cte", "semi-join"),
    bench=True,
)
def ds_tpcds_q23_frequent_best(spark, sf_dir):
    """TPC-DS Q23 (the hardest DS shape): revenue from BEST customers
    buying FREQUENT items — two independently-derived qualification
    sets (items sold in ≥3 distinct orders across two years; customers
    whose lifetime spend exceeds half the maximum) intersected against
    a third year's fact via two LEFT SEMI joins. The spend threshold is
    a 1-row aggregate-of-aggregate (broadcast scalar); both
    qualification relations are key-only projections, so the semi
    joins ship nothing but keys. Fixed-point spend comparison keeps the
    >50%-of-max cut deterministic cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    li_dated = li.join(
        o.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr"),
                 F.month("o_orderdate").alias("mon")),
        li.l_orderkey == o.o_orderkey,
    )
    frequent = (
        li_dated.filter(F.col("yr").isin(1996, 1997))
        .groupBy("l_partkey")
        .agg(F.count_distinct("l_orderkey").alias("n_ord"))
        .filter(F.col("n_ord") >= 3)
        .select("l_partkey")
    )
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 1e6).cast("long")).alias("spend_fix")
    )
    max_spend = spend.agg(F.max("spend_fix").alias("mx"))
    best = (
        spend.crossJoin(F.broadcast(max_spend))
        .filter(F.col("spend_fix") > 0.5 * F.col("mx"))
        .select("o_custkey")
    )
    return (
        li_dated.filter(F.col("yr") == 1998)
        .join(frequent, "l_partkey", "left_semi")
        .join(best, "o_custkey", "left_semi")
        .groupBy("mon")
        .agg(dsum(_rev_col(), "revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("mon")
    )


@query(
    "ds_tpcds_q66_monthly_matrix",
    oracle=f"""
    WITH base AS (
      SELECT n_name, EXTRACT(month FROM o_orderdate) AS mon,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE EXTRACT(year FROM o_orderdate) = 1997
    )
    SELECT n_name,
           {sql_dsum("CASE WHEN mon <= 3 THEN rev ELSE 0 END", "q1_rev")},
           {sql_dsum("CASE WHEN mon BETWEEN 4 AND 6 THEN rev ELSE 0 END", "q2_rev")},
           {sql_dsum("CASE WHEN mon BETWEEN 7 AND 9 THEN rev ELSE 0 END", "q3_rev")},
           {sql_dsum("CASE WHEN mon >= 10 THEN rev ELSE 0 END", "q4_rev")},
           {sql_dsum("rev", "total_rev")}
    FROM base
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("tpcds", "matrix", "conditional-agg"),
    bench=True,
)
def ds_tpcds_q66_monthly_matrix(spark, sf_dir):
    """TPC-DS Q66: the warehouse shipping matrix — one row per entity
    (warehouse in DS, supplier nation here) with the year's revenue
    unrolled into per-period columns. Q66 writes 12 SUM(CASE) columns;
    four quarterly ones keep the shape while staying readable. ONE scan,
    ONE aggregate: the matrix pivot is map-side CASE arithmetic inside
    the same partial agg — never 4 self-joins. The nation dim is
    spec-bounded → broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey", F.month("o_orderdate").alias("mon")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = dim(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select("n_name", "mon", _rev_col().alias("rev"))
    )
    def qsum(cond, name):
        return dsum(F.when(cond, F.col("rev")).otherwise(F.lit(0.0)), name)

    return (
        base.groupBy("n_name")
        .agg(
            qsum(F.col("mon") <= 3, "q1_rev"),
            qsum(F.col("mon").between(4, 6), "q2_rev"),
            qsum(F.col("mon").between(7, 9), "q3_rev"),
            qsum(F.col("mon") >= 10, "q4_rev"),
            dsum("rev", "total_rev"),
        )
        .orderBy("n_name")
    )


_CHANNEL_SQL = """CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'express'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                  ELSE 'economy' END"""


def _channel_col():
    return (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "express")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "standard")
        .otherwise("economy")
    )


_CHANNELS = ["express", "standard", "economy"]


# Shared with ds_tpcds_q14_bucketed (tpcds_suite4): the bucketed layout
# twin computes the SAME answer, so it pins the same oracle.
Q14_ORACLE = f"""
    WITH dated AS (
      SELECT l_partkey,
             {_CHANNEL_SQL} AS channel,
             EXTRACT(year FROM o_orderdate) AS yr,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    cross_items AS (
      SELECT l_partkey FROM dated WHERE channel = 'express' AND yr IN (1996, 1997)
      INTERSECT
      SELECT l_partkey FROM dated WHERE channel = 'standard' AND yr IN (1996, 1997)
      INTERSECT
      SELECT l_partkey FROM dated WHERE channel = 'economy' AND yr IN (1996, 1997)
    ),
    sales AS (
      SELECT d.channel, p.p_brand,
             SUM(CAST(ROUND(d.rev * 100.0) AS BIGINT)) AS rev_fix,
             COUNT(*) AS n_lines
      FROM dated d
      JOIN part p ON d.l_partkey = p.p_partkey
      WHERE d.yr = 1998
        AND d.l_partkey IN (SELECT l_partkey FROM cross_items)
      GROUP BY d.channel, p.p_brand
    ),
    gate AS (SELECT CAST(SUM(rev_fix) AS BIGINT) AS tot,
                    COUNT(*) AS ng FROM sales)
    SELECT channel, p_brand,
           CAST(rev_fix AS DOUBLE) / 100.0 AS revenue,
           n_lines
    FROM sales, gate
    WHERE rev_fix * ng > tot
    ORDER BY channel, p_brand
    """


def _q14_report(dated, p):
    """Everything downstream of the `dated` fact join in Q14 — shared by
    the plain and bucketed-layout variants (identical answer; only the
    physical layout of the two fact inputs differs)."""
    chbit = (
        F.when(F.col("channel") == "express", 1)
        .when(F.col("channel") == "standard", 2)
        .otherwise(4)
    )
    cross_items = (
        dated.filter(F.col("yr").isin(1996, 1997))
        .groupBy("l_partkey")
        .agg(F.bit_or(chbit).alias("_m"))
        .filter(F.col("_m") == 7)
        .select("l_partkey")
    )
    grain_aggs = []
    for i, c in enumerate(_CHANNELS):
        hit = F.col("channel") == c
        grain_aggs.append(
            F.sum(
                F.when(hit, F.round(F.col("rev") * 100.0).cast("long"))
            ).alias(f"rf_{i}")
        )
        grain_aggs.append(F.count(F.when(hit, F.lit(1))).alias(f"nl_{i}"))
    grain = dated.filter(F.col("yr") == 1998).groupBy("l_partkey").agg(*grain_aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("channel"),
                F.col(f"rf_{i}").alias("rev_fix"),
                F.col(f"nl_{i}").alias("n_lines"),
            )
            for i, c in enumerate(_CHANNELS)
        ]
    )
    sales = (
        grain.join(cross_items, "l_partkey", "left_semi")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select("p_brand", F.explode(cells).alias("c"))
        .select("p_brand", "c.channel", "c.rev_fix", "c.n_lines")
        .filter(F.col("n_lines") > 0)
        .groupBy("channel", "p_brand")
        .agg(F.sum("rev_fix").alias("rev_fix"), F.sum("n_lines").alias("n_lines"))
    )
    wall = Window.partitionBy()
    return (
        sales.withColumn("tot", F.sum("rev_fix").over(wall))
        .withColumn("ng", F.count(F.lit(1)).over(wall))
        .filter(F.col("rev_fix") * F.col("ng") > F.col("tot"))
        .select(
            "channel",
            "p_brand",
            (F.col("rev_fix").cast("double") / 100.0).alias("revenue"),
            "n_lines",
        )
        .orderBy("channel", "p_brand")
    )


@query(
    "ds_tpcds_q14_cross_channel",
    oracle=Q14_ORACLE,
    tags=("tpcds", "intersect", "cte", "semi-join"),
    bench=True,
)
def ds_tpcds_q14_cross_channel(spark, sf_dir):
    """TPC-DS Q14: cross-channel items — the INTERSECT-into-shared-CTE
    shape. Items sold through ALL THREE channels (order-priority tiers
    stand in for store/catalog/web) over two base years become one
    qualification set (`cross_items`, two INTERSECTs = two hash-distinct
    semi-join stages on a key-only projection); the report year's sales
    of those items, per (channel, brand), are then gated to
    above-average groups via a one-row totals broadcast (Q14's
    avg_sales scalar subquery). The gate compares integer cross-products
    (rev_fix·n_groups > total_fix) — exact in both engines, no division.

    Scale (round-9 single-scan replan; round-10 shuffle mitigation — the
    oracle keeps the spec's INTERSECT/CTE phrasing, the Spark plan does
    not): the three INTERSECT legs each re-executed the fact join (the
    r8 plan paid 8 fact scans), so qualification became ONE aggregate
    set-identical to the 3-way INTERSECT; r9's form (count DISTINCT
    channel = 3 + a fact-grain semi join) still shuffled distinct
    (part, channel) PAIRS for the distinct-count and every 1998 fact
    row into the semi join — the ×100 soak measured 2.0 GiB. Round 10
    replaces both (VERDICT r9 item 4):
    * qualification = GROUP BY l_partkey BIT_OR(channel bit) = 7 — a
      single-phase aggregate whose map-side combine emits ONE long per
      (mapper, part) instead of up to three pair rows, and still
      set-identical to the INTERSECT (3 channels ⇔ mask 7);
    * the 1998 slice pivots to PART grain first (per-channel
      conditional integer sums), so the semi join and the part join
      probe a |parts|-row relation, not fact rows — and both REUSE the
      pivot's l_partkey hash partitioning (no new exchange on the big
      side; verified in the plan). The channel rows are re-exploded
      from the pivot cells after the joins (empty cells dropped, so
      the (channel, brand) aggregate sees exactly the original groups
      and integer sums re-associate bit-identically).
    Measured same-session: sf0.1 shuffle 1915 → 693 KiB (2.8×), ×10
    soak 19.9 → 6.5 MiB (3.1×), wall 2.85 → 2.34 s, hash unchanged.
    The remaining floor is the two lineitem⋈orders SMJs — inherent
    while the year/channel live in orders and the layout is unbucketed
    (a deployment that owns the layout co-buckets both on the order
    key, the src_bucketed_join pattern, and removes that too). The
    avg_sales gate stays the integer window SUM over the bounded
    sales spine (allowlisted). Fact scans: 8 → 2 (pinned).
    `ds_tpcds_q14_bucketed` (tpcds_suite4) is the owned-layout twin:
    both fact inputs bucketed on the order key remove those two SMJ
    exchanges (zero-Exchange legs plan-pinned, same answer)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        _channel_col().alias("channel"),
        F.year("o_orderdate").alias("yr"),
    )
    dated = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_partkey", "channel", "yr", _rev_col().alias("rev")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return _q14_report(dated, p)


@query(
    "ds_tpcds_q64_wide_star_two_period",
    oracle="""
    WITH wide AS (
      SELECT p.p_brand, cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             EXTRACT(year FROM o.o_orderdate) AS yr,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1000000.0)
                 AS BIGINT)) AS rev_fix,
             COUNT(*) AS n_lines
      FROM lineitem l
      JOIN orders o    ON l.l_orderkey = o.o_orderkey
      JOIN customer c  ON o.o_custkey = c.c_custkey
      JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
      JOIN part p      ON l.l_partkey = p.p_partkey
      JOIN supplier s  ON l.l_suppkey = s.s_suppkey
      JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
      WHERE EXTRACT(year FROM o.o_orderdate) IN (1997, 1998)
      GROUP BY p.p_brand, cust_nation, supp_nation, yr
    )
    SELECT a.p_brand, a.cust_nation, a.supp_nation,
           CAST(a.rev_fix AS DOUBLE) / 1000000.0 AS rev_1997,
           CAST(b.rev_fix AS DOUBLE) / 1000000.0 AS rev_1998,
           a.n_lines AS n_1997, b.n_lines AS n_1998
    FROM wide a JOIN wide b
      ON a.p_brand = b.p_brand AND a.cust_nation = b.cust_nation
     AND a.supp_nation = b.supp_nation AND a.yr = 1997 AND b.yr = 1998
    WHERE b.rev_fix > a.rev_fix
    ORDER BY a.p_brand, a.cust_nation, a.supp_nation
    """,
    tags=("tpcds", "wide-join", "self-join", "two-period"),
)
def ds_tpcds_q64_wide_star_two_period(spark, sf_dir):
    """TPC-DS Q64: the widest multi-join in the suite (~17 relations in
    DS; 7 here — both facts' full dimension closure: orders, customer,
    customer-nation, part, supplier, supplier-nation around lineitem),
    aggregated per dimension spine and YEAR, then the two periods
    self-joined on the spine keeping spines whose revenue GREW (Q64's
    cnt1 <= cnt2 sales-pair condition). The integer fixed-point compare
    makes the growth cut deterministic cross-engine.

    Scale: the wide join reduces to ONE aggregate BEFORE the period
    self-join, so the self-join runs on |brands × nations²| spine rows,
    not fact rows; nation is spec-bounded (25) and explicitly broadcast
    twice under distinct aliases; the remaining joins shuffle on their
    FK keys — at 100 TB AQE picks shuffle-hash for customer/part/
    supplier, and the spine self-join is a few thousand rows on any
    cluster."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1997, 1998)
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr"))
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = dim(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = dim(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    wide = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy("p_brand", "cust_nation", "supp_nation", "yr")
        .agg(
            F.sum(F.round(_rev_col() * 1000000.0).cast("long")).alias("rev_fix"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    a = wide.filter(F.col("yr") == 1997).select(
        "p_brand", "cust_nation", "supp_nation",
        F.col("rev_fix").alias("rev_a"), F.col("n_lines").alias("n_1997"),
    )
    b = wide.filter(F.col("yr") == 1998).select(
        F.col("p_brand").alias("pb"), F.col("cust_nation").alias("cn"),
        F.col("supp_nation").alias("sn"),
        F.col("rev_fix").alias("rev_b"), F.col("n_lines").alias("n_1998"),
    )
    return (
        a.join(
            b,
            (a.p_brand == b.pb) & (a.cust_nation == b.cn) & (a.supp_nation == b.sn),
        )
        .filter(F.col("rev_b") > F.col("rev_a"))
        .select(
            "p_brand", "cust_nation", "supp_nation",
            (F.col("rev_a").cast("double") / 1000000.0).alias("rev_1997"),
            (F.col("rev_b").cast("double") / 1000000.0).alias("rev_1998"),
            "n_1997", "n_1998",
        )
        .orderBy("p_brand", "cust_nation", "supp_nation")
    )


@query(
    "ds_tpcds_q72_inventory_shortfall",
    oracle="""
    WITH demand AS (
      SELECT l_partkey,
             epoch_us(o_orderdate) // 604800000000 AS wk,
             SUM(CAST(ROUND(l_quantity * 1000.0) AS BIGINT)) AS d_qty,
             COUNT(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_partkey, wk
    ),
    supply AS (
      SELECT l_partkey,
             epoch_us(l_shipdate) // 604800000000 + 1 AS wk,
             SUM(CAST(ROUND(l_quantity * 1000.0) AS BIGINT)) AS s_qty
      FROM lineitem
      GROUP BY l_partkey, wk
    )
    SELECT d.wk,
           COUNT(*) AS n_parts_short,
           CAST(SUM(d.d_qty - COALESCE(s.s_qty, 0)) AS DOUBLE) / 1000.0
             AS shortfall_qty,
           CAST(SUM(d.n_lines) AS BIGINT) AS n_lines
    FROM demand d LEFT JOIN supply s
      ON d.l_partkey = s.l_partkey AND d.wk = s.wk
    WHERE d.d_qty > COALESCE(s.s_qty, 0)
    GROUP BY d.wk
    ORDER BY d.wk
    """,
    tags=("tpcds", "triple-fact", "date-shift", "outer-join"),
    bench=True,
)
def ds_tpcds_q72_inventory_shortfall(spark, sf_dir):
    """TPC-DS Q72: the inventory/date triple-fact — the suite's
    notorious largest join (catalog_sales × inventory × date chain with
    a shifted-date condition and an inv_quantity < sales_quantity cut).
    Adapted: demand = ordered quantity per (part, order-week); supply =
    shipped quantity landing the FOLLOWING week (the d_date_sk + 5 date
    shift, at week grain); a LEFT join keeps fully-unsupplied weeks
    (Q72's LEFT OUTER promotion/returns legs), and the output reports
    stockout weeks. Weeks are integer epoch-µs divisions — identical
    arithmetic both engines.

    Scale: THE Q72 lesson is aggregate-before-join — both facts reduce
    to (part, week) grain BEFORE any join, so no |lineitem|²-shaped
    intermediate ever exists, and the shifted week is computed map-side
    (no non-equi range join). Round-12 (guide §1.2/§2.3/§2.4, the Q9/Q17
    discipline): demand and supply live at the SAME (part, week) grain,
    so the former demand⋈supply LEFT join collapses into ONE conditional
    aggregation — each line emits a demand row at its order week and a
    supply row at its ship week + 1 (a 2× map-side explode of three
    narrow columns), one groupBy computes d_qty/n_lines/s_qty per cell,
    and the LEFT-join-plus-filter is exactly d_qty > s_qty (demand-less
    cells have NULL d_qty and never pass; unsupplied demand cells see
    s_qty = 0 — LEFT semantics preserved). Before: two lineitem scans,
    two (part, week) exchanges, one left join; after: ONE lineitem scan
    (pinned in tests/test_plans.py) and one (part, week) exchange whose
    map-side partial agg reduces the exploded rows to the same cell
    count the two old exchanges carried combined. Measured at sf0.1:
    a WASH locally (1.55 vs 1.58 s cold isolated — the saved second
    scan reads page-cached parquet and the saved cell join was
    broadcast at this size), kept for the cluster posture where the
    fact scan is real I/O and the cell join is a real SMJ: one fact
    pass instead of two, one exchange instead of two, zero joins
    between fact-derived relations. Hash-identical to the unchanged
    DuckDB oracle at sf0.001 + sf0.01."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 604800000000").alias("o_wk"),
    )
    q_line = F.round(F.col("l_quantity") * 1000.0).cast("long")
    ship_wk = (
        F.expr("unix_micros(cast(l_shipdate as timestamp)) div 604800000000") + 1
    )
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_partkey",
            q_line.alias("q"),
            F.explode(
                F.array(
                    F.struct(F.col("o_wk").alias("wk"), F.lit(True).alias("dm")),
                    F.struct(ship_wk.cast("long").alias("wk"), F.lit(False).alias("dm")),
                )
            ).alias("e"),
        )
        .select("l_partkey", "q", "e.wk", "e.dm")
        .groupBy("l_partkey", "wk")
        .agg(
            F.sum(F.when(F.col("dm"), F.col("q"))).alias("d_qty"),
            F.count(F.when(F.col("dm"), F.lit(1))).alias("n_lines"),
            F.coalesce(
                F.sum(F.when(~F.col("dm"), F.col("q"))), F.lit(0).cast("long")
            ).alias("s_qty"),
        )
    )
    return (
        cells.filter(F.col("d_qty") > F.col("s_qty"))
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).alias("n_parts_short"),
            (F.sum(F.col("d_qty") - F.col("s_qty")).cast("double") / 1000.0).alias(
                "shortfall_qty"
            ),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
        .orderBy("wk")
    )


@query(
    "ds_tpcds_q67_rollup_rank_spine",
    oracle=f"""
    WITH g AS (
      SELECT p_type, p_brand, EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mon, n_name,
             {sql_dsum(_REV, "sumsales")}
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY ROLLUP (p_type, p_brand, yr, mon, n_name)
    )
    SELECT p_type, p_brand, yr, mon, n_name, sumsales, rk
    FROM (
      SELECT p_type, p_brand, yr, mon, n_name, sumsales,
             CAST(RANK() OVER (
               PARTITION BY p_type
               ORDER BY sumsales DESC, p_brand NULLS FIRST, yr NULLS FIRST,
                        mon NULLS FIRST, n_name NULLS FIRST
             ) AS INTEGER) AS rk
      FROM g
    )
    WHERE rk <= 100
    ORDER BY p_type NULLS FIRST, rk, p_brand NULLS FIRST, yr NULLS FIRST,
             mon NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("tpcds", "rollup", "rank", "window"),
    bench=True,
)
def ds_tpcds_q67_rollup_rank_spine(spark, sf_dir):
    """TPC-DS Q67 (VERDICT r8 item 6): the widest windowed rollup in the
    suite — a FIVE-level ROLLUP over the full reporting spine
    (category/brand/year/month/region ← p_type/p_brand/yr/mon/n_name),
    then a RANK over sumsales within the top-level category INCLUDING
    the super-aggregate rows, keeping each category's 100 best spine
    rows. This is the 'best sellers at every hierarchy level in one
    pass' report, and the classic Q67 stress: the window input is the
    ROLLED-UP relation, never the fact.

    Scale shape — the canonical Q67 rewrite: Spark expands grouping sets
    BEFORE the partial aggregate, so a naive ROLLUP over the joined fact
    would feed 6× the fact rows into aggregation. Instead the fact is
    reduced to the LEAF grain first (one plain groupBy over the 5 spine
    columns — map-side partials on raw rows), and the ROLLUP runs over
    the leaf relation (~3 orders of magnitude smaller), which is exact
    because fixed-point micro-unit sums are associative. The rank
    partitions by p_type (≤7 groups incl. the NULL super-aggregate) so
    no partition approaches the all-rows window that makes naive Q67
    plans fall over; rk ≤ 100 cuts to ≤ 700 rows before the final
    order. Rank ties are broken by the full spine (NULLS FIRST both
    engines) so rk itself is deterministic, not just the cut. Sums are
    fixed-point (canonical.py) — bit-identical cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = dim(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # ONE-phase leaf (round-10 replan of the r9 "two-phase" trade): the
    # r9 plan reduced the fact to (l_partkey, l_suppkey, yr, mon) grain
    # before the dim joins, but that grain never consolidates on
    # TPC-H-shaped data — distinct (part, supp, month) combos outnumber
    # lines at EVERY scale factor (measured here: 599,869 groups from
    # ~600k lines; at sf1000 partsupp×months ≈ 67B combos vs 6B lines),
    # so the extra exchange moved the whole fact for zero reduction.
    # Aggregating once at the named leaf grain removes that full-fact
    # exchange: measured A/B same-session at sf0.1 — default shape
    # 1.84s → 1.85s (tie), cluster-shape rehearsal 5.91s → 5.17s
    # (−12%, one fewer wide exchange at 200 partitions). A hierarchical
    # 5-level rollup (replacing Expand with chained re-aggregates) was
    # also measured and REJECTED: 2.10–2.26s vs 1.85s — Expand's 6×
    # fan-out over the 255k-row leaf is cheaper than 5 extra stages.
    leaf = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("p_type", "p_brand", "yr", "mon", "n_name")
        .agg(F.sum(F.round(_rev_col() * F.lit(1e6)).cast("long")).alias("_micro"))
    )
    g = (
        leaf.rollup("p_type", "p_brand", "yr", "mon", "n_name")
        .agg((F.sum("_micro").cast("double") / F.lit(1e6)).alias("sumsales"))
    )
    w = Window.partitionBy("p_type").orderBy(
        F.col("sumsales").desc(),
        F.col("p_brand").asc_nulls_first(),
        F.col("yr").asc_nulls_first(),
        F.col("mon").asc_nulls_first(),
        F.col("n_name").asc_nulls_first(),
    )
    return (
        g.withColumn("rk", F.rank().over(w).cast("int"))
        .filter(F.col("rk") <= 100)
        .select("p_type", "p_brand", "yr", "mon", "n_name", "sumsales", "rk")
        .orderBy(
            F.col("p_type").asc_nulls_first(),
            "rk",
            F.col("p_brand").asc_nulls_first(),
            F.col("yr").asc_nulls_first(),
            F.col("mon").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


@query(
    "ds_tpcds_q78_channel_ratio_dropouts",
    oracle=f"""
    WITH ret AS (
      SELECT l_orderkey AS ro, l_linenumber AS rl
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    clean AS (
      SELECT l.* FROM lineitem l
      LEFT JOIN ret ON l.l_orderkey = ret.ro AND l.l_linenumber = ret.rl
      WHERE ret.ro IS NULL
    ),
    std AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr, o_custkey,
             {sql_dsum(_REV, "std_rev")},
             {sql_dsum("l_quantity", "std_qty")}
      FROM clean JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      GROUP BY yr, o_custkey
    ),
    exp AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr, o_custkey,
             {sql_dsum(_REV, "exp_rev")},
             {sql_dsum("l_quantity", "exp_qty")}
      FROM clean JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY yr, o_custkey
    )
    SELECT std.yr, std.o_custkey AS custkey, std_rev, exp_rev,
           exp_rev / std_rev AS channel_ratio,
           CAST(std_qty AS BIGINT) AS std_qty,
           CAST(exp_qty AS BIGINT) AS exp_qty
    FROM std JOIN exp ON std.yr = exp.yr AND std.o_custkey = exp.o_custkey
    WHERE std_rev > 0
    ORDER BY channel_ratio DESC, std.yr, custkey
    LIMIT 100
    """,
    tags=("tpcds", "anti-join", "multi-channel", "ratio"),
)
def ds_tpcds_q78_channel_ratio_dropouts(spark, sf_dir):
    """TPC-DS Q78 (VERDICT r8 item 6): multi-channel yearly ratios with
    RETURN DROPOUTS — each channel's per-(year, customer) sales are
    computed over only the fact rows with NO matching return (Q78's
    `ws_order_number IS NULL` left-join dropout, expressed here as a
    LEFT ANTI join of lineitem against the returned line keys), then the
    two channels join on (year, customer) and the express/standard
    revenue ratio ranks the customers whose urgent-channel spend most
    outweighs their standard spend. Channels come from o_orderpriority
    (the module's channel discriminator); returns from l_returnflag='R'.

    Scale shape: the anti-join is key-only on its build side
    ((orderkey, linenumber) pairs — no payload) and Spark executes it as
    a real LeftAnti hash join, the cheapest dropout form; both channel
    aggregates reduce to (year, customer) grain BEFORE the cross-channel
    join, so that join carries two already-small relations; the final
    ORDER+LIMIT is a TakeOrdered. The ratio divides two fixed-point sums
    — bit-identical cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    ret = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ro"), F.col("l_linenumber").alias("rl")
    )
    clean = li.join(
        ret,
        (li.l_orderkey == ret.ro) & (li.l_linenumber == ret.rl),
        "left_anti",
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.year("o_orderdate").alias("yr"),
    )
    joined = clean.join(o, clean.l_orderkey == o.o_orderkey)
    express = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")

    def channel(pred, rev_name, qty_name):
        return (
            joined.filter(pred)
            .groupBy("yr", "o_custkey")
            .agg(
                dsum(_rev_col(), rev_name),
                dsum("l_quantity", qty_name),
            )
        )

    std = channel(~express, "std_rev", "std_qty")
    exp = channel(express, "exp_rev", "exp_qty")
    return (
        std.join(exp, ["yr", "o_custkey"])
        .filter(F.col("std_rev") > 0)
        .select(
            "yr",
            F.col("o_custkey").alias("custkey"),
            "std_rev",
            "exp_rev",
            (F.col("exp_rev") / F.col("std_rev")).alias("channel_ratio"),
            F.col("std_qty").cast("long").alias("std_qty"),
            F.col("exp_qty").cast("long").alias("exp_qty"),
        )
        .orderBy(F.col("channel_ratio").desc(), "yr", "custkey")
        .limit(100)
    )

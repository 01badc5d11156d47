"""TPC-DS fourth tier (round 9 extension) — five shapes the first three
tiers don't cover, adapted to the driver's star schema with the module
conventions of ``tpcds_suite.py`` (channels = ``o_orderpriority``,
returns = ``l_returnflag = 'R'``, fixed-point canonical sums from
``canonical.py`` so every ratio divides bit-identical operands).

* Q47 — windowed LAG/LEAD neighbors around a deviation screen: the
  monthly series per brand carries its previous and next month's value
  through the filter (the "show me the months around the anomaly"
  report). New shape: window value-movement (lag+lead) OVER an
  aggregate, composed with the join-back average.
* Q75 — year-over-year item delta over returns-netted sales: signed
  facts (returns flip sign) aggregated to (year, brand) grain, then the
  series self-joins on (brand, year+1) and filters on the count ratio.
  New shape: signed aggregate → adjacent-period self-join → ratio gate.
* Q39 — coefficient-of-variation screen with a consecutive-month
  self-join: per (supplier, month) demand mean/stddev, flag months with
  CoV above threshold, and keep only suppliers where TWO CONSECUTIVE
  months are both flagged. New shape: second-moment aggregate feeding a
  sequential-pair self-join.
* Q95 — the EXISTS/NOT-EXISTS reachability chain, collapsed to
  key-grain qualification sets applied as one LEFT SEMI + one LEFT
  ANTI join (the pairwise self-join EXISTS never materializes).
* Q4 — the six year_total CTE self-joins collapsed to ONE
  (customer, channel, year) aggregate pivoted with conditional sums;
  ratio screen on the pivoted relation.

Scale posture, uniform: every self-join input is an already-aggregated
relation orders of magnitude smaller than the fact (brand×month,
brand×year, supplier×month grains); facts are reduced BEFORE any join
that can be fed partials; ORDER BY feeding LIMIT compiles to
TakeOrderedAndProject. At 100 TB the only full-fact work is the one
scan + partial aggregate per query — the joins above it carry
dimension-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.canonical import (
    dsum,
    sql_dsum,
)
from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "ds_tpcds_q47_monthly_neighbors",
    oracle=f"""
    WITH monthly AS (
      SELECT p_brand, EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mon,
             {sql_dsum(_REV, "rev")}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part   ON l_partkey = p_partkey
      GROUP BY p_brand, yr, mon
    ),
    yearly AS (
      SELECT p_brand, yr,
             CAST(SUM(CAST(ROUND(rev * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS tot,
             COUNT(*) AS n_months
      FROM monthly GROUP BY p_brand, yr
    ),
    series AS (
      SELECT m.p_brand, m.yr, m.mon, m.rev,
             y.tot / y.n_months AS avg_monthly,
             LAG(m.rev)  OVER (PARTITION BY m.p_brand ORDER BY m.yr, m.mon)
               AS prev_rev,
             LEAD(m.rev) OVER (PARTITION BY m.p_brand ORDER BY m.yr, m.mon)
               AS next_rev
      FROM monthly m JOIN yearly y ON m.p_brand = y.p_brand AND m.yr = y.yr
    )
    SELECT p_brand, mon, rev, avg_monthly, prev_rev, next_rev,
           rev - avg_monthly AS deviation
    FROM series
    WHERE yr = 1997 AND avg_monthly > 0
      AND ABS(rev - avg_monthly) / avg_monthly > 0.1
    ORDER BY deviation, p_brand, mon
    LIMIT 60
    """,
    tags=("tpcds", "window", "lag-lead", "deviation"),
    bench=True,
)
def ds_tpcds_q47_monthly_neighbors(spark, sf_dir):
    """TPC-DS Q47: months deviating >10% from the brand's yearly average,
    reported WITH the neighboring months' values (Q47's psum/nsum via
    LAG/LEAD over the monthly series). The average uses the Q89
    deterministic form — per-(brand, year) fixed-point re-sum of the
    exact monthly canonicals joined back — because windowed AVG over
    doubles is accumulation-order-sensitive cross-engine; LAG/LEAD move
    values without arithmetic, so they are exact in both engines given
    the total (yr, mon) order within each brand partition (unique by
    construction: the series is grouped at that grain).

    Scale shape: the windows run over the AGGREGATED series (brand ×
    month ≈ 25×84 rows here; bounded by |brands|·|months| at any SF),
    never over facts — window state is dimension-sized. The fact is
    scanned ONCE into the (brand, yr, mon) partial aggregate; the
    yearly average comes from a window SUM of the exact micro-unit
    integers over (brand, yr) rather than the oracle's join-back CTE —
    the join-back form makes Spark re-execute the whole fact
    aggregation for the second reference (Q89's plan pays 2× fact
    scans for exactly this reason), while the window form reuses the
    one series and integer window sums are order-independent, so the
    hash still matches bit-for-bit. TakeOrdered for the final LIMIT.
    Reference parity: SURVEY §2B window family (reference has no
    relational operators; CephRgwFileSystem.java is a FileSystem
    connector — this extends the engine contract)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "yr", "mon")
        .agg(
            F.sum(F.round(_rev_col() * F.lit(1e6)).cast("long")).alias("_micro")
        )
        .withColumn("rev", F.col("_micro").cast("double") / F.lit(1e6))
    )
    wy = Window.partitionBy("p_brand", "yr")
    w = Window.partitionBy("p_brand").orderBy("yr", "mon")
    series = (
        monthly.withColumn(
            "avg_monthly",
            (F.sum("_micro").over(wy).cast("double") / F.lit(1e6))
            / F.count(F.lit(1)).over(wy),
        )
        .withColumn("prev_rev", F.lag("rev").over(w))
        .withColumn("next_rev", F.lead("rev").over(w))
    )
    return (
        series.filter(
            (F.col("yr") == 1997)
            & (F.col("avg_monthly") > 0)
            & (F.abs(F.col("rev") - F.col("avg_monthly")) / F.col("avg_monthly") > 0.1)
        )
        .select(
            "p_brand",
            "mon",
            "rev",
            "avg_monthly",
            "prev_rev",
            "next_rev",
            (F.col("rev") - F.col("avg_monthly")).alias("deviation"),
        )
        .orderBy("deviation", "p_brand", "mon")
        .limit(60)
    )


@query(
    "ds_tpcds_q75_yoy_item_delta",
    oracle=f"""
    WITH sales AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr, p_brand,
             {sql_dsum("CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END", "cnt", 0)},
             {sql_dsum("CASE WHEN l_returnflag = 'R' THEN -(" + _REV + ") ELSE " + _REV + " END", "amt")}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part   ON l_partkey = p_partkey
      GROUP BY yr, p_brand
    )
    SELECT p.yr AS prev_year, c.yr AS yr, c.p_brand,
           p.cnt AS prev_cnt, c.cnt AS cur_cnt,
           c.cnt / p.cnt AS cnt_ratio,
           c.cnt - p.cnt AS sales_cnt_diff,
           c.amt - p.amt AS sales_amt_diff
    FROM sales c JOIN sales p
      ON c.p_brand = p.p_brand AND c.yr = p.yr + 1
    WHERE p.cnt > 0 AND c.cnt / p.cnt < 0.97
    ORDER BY sales_cnt_diff, c.p_brand, yr
    LIMIT 60
    """,
    tags=("tpcds", "yoy", "returns", "self-join"),
)
def ds_tpcds_q75_yoy_item_delta(spark, sf_dir):
    """TPC-DS Q75: items whose net sales count SHRANK year-over-year —
    the spec unions three channel facts, nets each against its returns
    table, aggregates to item grain per year, self-joins consecutive
    years and keeps ratio < 0.9 (0.97 here, sized to the fixture's
    spread so both oracle scales return rows). Returns net out as a
    map-side sign flip (the module's returns convention), so no
    returns-table join is needed; where one exists the shape adds one
    equi-join on the line key before the aggregate.

    Scale shape: ONE full-fact scan into the signed (year, brand)
    partial aggregate; the YoY self-join then carries a |brands|·|years|
    relation (~175 rows here, dimension-sized at any SF). Signed
    fixed-point sums stay exact under cancellation — quantity at scale 0
    (integer-valued), revenue at the house 1e-6. The ratio and deltas
    divide/subtract identical exact doubles, so the DuckDB hash matches
    bit-for-bit. TakeOrdered for the LIMIT."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ret = F.col("l_returnflag") == "R"
    sales = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("yr", "p_brand")
        .agg(
            dsum(F.when(ret, -F.col("l_quantity")).otherwise(F.col("l_quantity")), "cnt", 0),
            dsum(F.when(ret, -_rev_col()).otherwise(_rev_col()), "amt"),
        )
    )
    cur = sales.select(
        F.col("yr"),
        F.col("p_brand"),
        F.col("cnt").alias("cur_cnt"),
        F.col("amt").alias("cur_amt"),
    )
    prev = sales.select(
        (F.col("yr") + 1).alias("yr"),
        F.col("p_brand"),
        F.col("yr").alias("prev_year"),
        F.col("cnt").alias("prev_cnt"),
        F.col("amt").alias("prev_amt"),
    )
    return (
        cur.join(prev, ["yr", "p_brand"])
        .filter((F.col("prev_cnt") > 0) & (F.col("cur_cnt") / F.col("prev_cnt") < 0.97))
        .select(
            "prev_year",
            "yr",
            "p_brand",
            "prev_cnt",
            "cur_cnt",
            (F.col("cur_cnt") / F.col("prev_cnt")).alias("cnt_ratio"),
            (F.col("cur_cnt") - F.col("prev_cnt")).alias("sales_cnt_diff"),
            (F.col("cur_amt") - F.col("prev_amt")).alias("sales_amt_diff"),
        )
        .orderBy("sales_cnt_diff", "p_brand", "yr")
        .limit(60)
    )


@query(
    "ds_tpcds_q39_demand_cov_pairs",
    oracle=f"""
    WITH g AS (
      SELECT l_suppkey, EXTRACT(month FROM o_orderdate) AS mon,
             COUNT(*) AS n,
             {sql_dsum(_REV, "s1")},
             {sql_dsum("(" + _REV + ") * (" + _REV + ")", "s2", 4)}
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(year FROM o_orderdate) = 1997
      GROUP BY l_suppkey, mon
      HAVING COUNT(*) >= 5
    ),
    f AS (
      SELECT l_suppkey, mon, n,
             SQRT((s2 - s1 * s1 / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0))
               / (s1 / CAST(n AS DOUBLE)) AS cov
      FROM g
      WHERE s1 > 0
    )
    SELECT a.l_suppkey, a.mon,
           a.cov AS cov_mon, b.cov AS cov_next,
           a.n AS n_mon, b.n AS n_next
    FROM f a JOIN f b
      ON a.l_suppkey = b.l_suppkey AND b.mon = a.mon + 1
    WHERE a.cov > 0.6 AND b.cov > 0.6
    ORDER BY a.l_suppkey, a.mon
    """,
    tags=("tpcds", "stats", "self-join", "cov"),
)
def ds_tpcds_q39_demand_cov_pairs(spark, sf_dir):
    """TPC-DS Q39: demand-variability screen — per (supplier, month)
    revenue coefficient of variation (stddev/mean), keeping only
    suppliers where two CONSECUTIVE months both exceed the threshold
    (Q39's inv1 JOIN inv2 ON d_moy+1). CoV derives from fixed-point
    first/second moments (the dstddev_samp scheme): the per-group sums
    are exact integers, and every double op after them — sqrt, the two
    divisions — is a scalar on identical operands in both engines, so
    the hash matches bit-for-bit. n ≥ 5 gates sample-stddev noise
    (and n ≥ 2 validity); the second-moment scale (1e4) keeps
    |rev²·10⁴| ≈ 1e14 per row well under 2^63 for per-group sums.

    Scale shape: one fact scan into a (supplier, month) partial
    aggregate carrying three numbers; the oracle phrases the
    consecutive-month pairing as a self-join, but the Spark plan uses
    LEAD over the aggregated series instead (next month's cov/n are
    value movement, no arithmetic) gated on lead(mon) == mon+1 — the
    self-join form re-executes the whole fact aggregation for each side
    (4 scans in the physical plan), while the window form scans ONCE and
    its state is |suppliers|·12 rows, dimension-sized at any SF. Same
    rows, same hash. The full-series sort is the final presentation
    ORDER BY only."""
    li = t(spark, sf_dir, "lineitem")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .select("o_orderkey", F.month("o_orderdate").alias("mon"))
    )
    rev = _rev_col()
    g = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey", "mon")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(rev, "s1"),
            dsum(rev * rev, "s2", 4),
        )
        .filter(F.col("n") >= 5)
    )
    nd = F.col("n").cast("double")
    f = g.filter(F.col("s1") > 0).select(
        "l_suppkey",
        "mon",
        "n",
        (
            F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / nd) / (nd - F.lit(1.0)))
            / (F.col("s1") / nd)
        ).alias("cov"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("mon")
    return (
        f.withColumn("next_mon", F.lead("mon").over(w))
        .withColumn("cov_next", F.lead("cov").over(w))
        .withColumn("n_next", F.lead("n").over(w))
        .filter(
            (F.col("next_mon") == F.col("mon") + 1)
            & (F.col("cov") > 0.6)
            & (F.col("cov_next") > 0.6)
        )
        .select(
            "l_suppkey",
            "mon",
            F.col("cov").alias("cov_mon"),
            "cov_next",
            F.col("n").alias("n_mon"),
            "n_next",
        )
        .orderBy("l_suppkey", "mon")
    )


@query(
    "ds_tpcds_q95_multi_supplier_clean",
    oracle=f"""
    WITH multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) >= 2
    ),
    ret AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    q AS (
      SELECT o_orderkey, EXTRACT(month FROM o_orderdate) AS mon,
             o_totalprice
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1997
        AND o_orderkey IN (SELECT l_orderkey FROM multi)
        AND o_orderkey NOT IN (SELECT l_orderkey FROM ret)
    )
    SELECT mon,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum("o_totalprice", "total_value")}
    FROM q
    GROUP BY mon
    ORDER BY mon
    """,
    tags=("tpcds", "semi-join", "anti-join", "exists-chain"),
)
def ds_tpcds_q95_multi_supplier_clean(spark, sf_dir):
    """TPC-DS Q95: the EXISTS/NOT-EXISTS reachability chain — orders
    fulfilled from AT LEAST TWO distinct suppliers (Q95's 'shipped from
    more than one warehouse' two-hop EXISTS self-join) with NO returned
    line (the NOT EXISTS against web_returns), reported monthly. The
    spec phrases both conditions as correlated self-joins over the fact;
    the Spark-first form derives each qualification set ONCE — the
    multi-supplier set as a key-grain aggregate (count DISTINCT supplier
    ≥ 2 is set-identical to the pairwise ws1/ws2 self-join EXISTS), the
    returns set as a distinct key projection — and applies them as one
    LEFT SEMI and one LEFT ANTI join on key-only relations.

    Scale shape: one fact scan per qualification set plus the orders
    scan, each reduced to key grain before any join (the semi/anti build
    sides carry 8-byte keys, no payload); the monthly aggregate's spine
    is 12 rows. No self-join of raw fact rows ever materializes — the
    pairwise EXISTS form would shuffle fact×avg_lines_per_order rows.
    Fixed-point value sums keep the hash exact."""
    li = t(spark, sf_dir, "lineitem")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("_ns"))
        .filter(F.col("_ns") >= 2)
        .select("l_orderkey")
    )
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .select(
            "o_orderkey",
            F.month("o_orderdate").alias("mon"),
            "o_totalprice",
        )
    )
    return (
        o.join(multi, o.o_orderkey == multi.l_orderkey, "left_semi")
        .join(ret, o.o_orderkey == ret.l_orderkey, "left_anti")
        .groupBy("mon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice", "total_value"),
        )
        .orderBy("mon")
    )


@query(
    "ds_tpcds_q4_channel_growth_screen",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             o_orderpriority IN ('1-URGENT', '2-HIGH') AS express,
             EXTRACT(year FROM o_orderdate) AS yr,
             SUM(CAST(ROUND(o_totalprice * 1000000.0) AS BIGINT)) AS spend_fix
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
      GROUP BY o_custkey, express, yr
    ),
    wide AS (
      SELECT o_custkey,
             SUM(CASE WHEN express AND yr = 1996 THEN spend_fix END) AS e1,
             SUM(CASE WHEN express AND yr = 1997 THEN spend_fix END) AS e2,
             SUM(CASE WHEN NOT express AND yr = 1996 THEN spend_fix END) AS s1,
             SUM(CASE WHEN NOT express AND yr = 1997 THEN spend_fix END) AS s2
      FROM s GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey,
           CAST(e2 AS DOUBLE) / e1 AS express_ratio,
           CAST(s2 AS DOUBLE) / s1 AS standard_ratio
    FROM wide
    WHERE e1 > 0 AND s1 > 0 AND e2 IS NOT NULL AND s2 IS NOT NULL
      AND CAST(e2 AS DOUBLE) / e1 > CAST(s2 AS DOUBLE) / s1
    ORDER BY express_ratio DESC, custkey
    LIMIT 60
    """,
    tags=("tpcds", "yoy", "multi-channel", "pivot"),
)
def ds_tpcds_q4_channel_growth_screen(spark, sf_dir):
    """TPC-DS Q4: customers whose premium-channel spend GREW FASTER than
    their standard-channel spend year-over-year — the spec builds six
    year_total CTE slices (3 channels × 2 years) and joins them all at
    customer grain; the Spark-first form computes ONE aggregate at
    (customer, channel, year) grain and PIVOTs the four cells with
    conditional sums, replacing five self-joins of the same subtree
    with map-side CASE — one fact scan instead of six.

    Scale shape: the only full-relation work is the single orders scan
    into the (customer, channel, year) partial aggregate; the pivot is
    a second aggregate at customer grain (strictly fewer rows); the
    ratio screen and ORDER+LIMIT (TakeOrdered) run on the pivoted
    relation. Spend is fixed-point (exact longs); each ratio divides
    the same exact operands in both engines, and the cross-channel
    comparison compares those identical doubles — hash-exact. NULL
    cells (customer absent from a channel-year) are filtered exactly
    like Q4's inner joins drop them."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate").isin(1996, 1997))
        .select(
            "o_custkey",
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("express"),
            F.year("o_orderdate").alias("yr"),
            "o_totalprice",
        )
    )
    s = o.groupBy("o_custkey", "express", "yr").agg(
        F.sum(F.round(F.col("o_totalprice") * F.lit(1e6)).cast("long")).alias(
            "spend_fix"
        )
    )

    def cell(express, yr):
        return F.sum(
            F.when(
                (F.col("express") == express) & (F.col("yr") == yr),
                F.col("spend_fix"),
            )
        )

    wide = s.groupBy("o_custkey").agg(
        cell(True, 1996).alias("e1"),
        cell(True, 1997).alias("e2"),
        cell(False, 1996).alias("s1"),
        cell(False, 1997).alias("s2"),
    )
    e_ratio = F.col("e2").cast("double") / F.col("e1")
    s_ratio = F.col("s2").cast("double") / F.col("s1")
    return (
        wide.filter(
            (F.col("e1") > 0)
            & (F.col("s1") > 0)
            & F.col("e2").isNotNull()
            & F.col("s2").isNotNull()
            & (e_ratio > s_ratio)
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            e_ratio.alias("express_ratio"),
            s_ratio.alias("standard_ratio"),
        )
        .orderBy(F.col("express_ratio").desc(), "custkey")
        .limit(60)
    )

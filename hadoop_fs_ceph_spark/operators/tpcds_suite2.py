"""TPC-DS fourth tier (round 9 extension) — three shapes the first three
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

"""TPC-DS fifth tier (round 10) — three shapes tiers 1–4 still lack,
adapted to the driver's star schema with the module conventions of
``tpcds_suite.py`` (channels = ``o_orderpriority``, returns =
``l_returnflag = 'R'``, fixed-point canonical sums from ``canonical.py``
so every ratio/screen compares bit-identical operands).

* Q17 — the TRIPLE-fact chain: sales ⋈ returns ⋈ repurchase joined at
  (customer, item) grain with quantity mean/stdev screens per leg. The
  widest fact-fact-fact join the suite owns; three inherent fact scans
  (three different slices feed three different legs of one join tree).
* Q92 — the excess-discount scalar-subquery gate: lines whose discount
  amount exceeds 1.3× the per-item average. The correlated scalar
  subquery is replanned as a WINDOW average over the item partition —
  ONE fact scan instead of the join-back's two.
* Q58 — three-channel revenue agreement: items whose per-channel
  revenues all sit within 15% of their three-channel average. The
  spec's three channel-CTE self-joins collapse to ONE aggregate
  pivoted with conditional sums (the Q4 pivot pattern).

Scale posture, uniform with tiers 1–4: facts reduce to narrow
projections/partials before any join; window state is bounded by the
partition key's cardinality (items), never fact-sized; ORDER BY feeding
LIMIT compiles to TakeOrderedAndProject. Reference parity: SURVEY §2B
advanced-SQL family (the reference, a FileSystem connector —
CephRgwFileSystem.java — has no relational operators; these extend the
engine contract the way its consumers would use Spark).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.canonical import (
    sql_davg,
    sql_dstddev_samp,
)
from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t

_Q17_LEG = """
      SELECT o_custkey AS ck, p_brand AS b, l_quantity AS q
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part   ON l_partkey = p_partkey
      WHERE EXTRACT(year FROM o_orderdate) = 1997
        AND EXTRACT(quarter FROM o_orderdate) IN {quarters}{extra}
"""


@query(
    "ds_tpcds_q17_sale_return_repurchase",
    oracle=f"""
    WITH sales AS ({_Q17_LEG.format(quarters="(1, 2)", extra="")}),
    ret AS ({_Q17_LEG.format(quarters="(1, 2)", extra=" AND l_returnflag = 'R'")}),
    rep AS ({_Q17_LEG.format(quarters="(3, 4)", extra="")}),
    tri AS (
      SELECT s.b AS p_brand, s.q AS sq, r.q AS rq, c.q AS cq
      FROM sales s
      JOIN ret r ON s.ck = r.ck AND s.b = r.b
      JOIN rep c ON s.ck = c.ck AND s.b = c.b
    )
    SELECT p_brand,
           COUNT(*) AS n_triples,
           {sql_davg("sq", "s_qty_mean", 0)},
           {sql_dstddev_samp("sq", "s_qty_std", 0, 0)},
           {sql_davg("rq", "r_qty_mean", 0)},
           {sql_dstddev_samp("rq", "r_qty_std", 0, 0)},
           {sql_davg("cq", "c_qty_mean", 0)},
           {sql_dstddev_samp("cq", "c_qty_std", 0, 0)}
    FROM tri
    GROUP BY p_brand
    HAVING COUNT(*) >= 2
    ORDER BY p_brand
    """,
    tags=("tpcds", "triple-fact", "chain-join", "stats"),
    bench=True,
)
def ds_tpcds_q17_sale_return_repurchase(spark, sf_dir):
    """TPC-DS Q17: the sale → return → repurchase chain — customers who
    bought an item (H1 1997), returned it in the same window, and
    bought the same item again in H2; per item, the count and the
    quantity mean/stdev of each leg (Q17's store_sales ⋈ store_returns
    ⋈ catalog_sales with its three quantity stat triples). Adapted to
    the fixture's star: item grain = p_brand (the (customer, partkey)
    chain is near-empty at oracle scales — 1-3 triples — while brand
    grain gives a stable 10-24 group spine at both), returns = the
    module's l_returnflag = 'R' convention, repurchase channel = the
    later half-year.

    Round-12 optimization (guide §1.2 "the distributed algorithm" /
    §2.3 "aggregate before you shuffle"): the three legs collapse to
    ONE conditional-aggregation pass. The legs differ only in row
    predicates (quarter ∈ {1,2} / + returnflag = 'R' / quarter ∈
    {3,4}), so one lineitem⋈orders(1997)⋈part join grouped by
    (customer, brand) computes all nine per-cell moments as
    SUM(CASE)/COUNT(CASE) columns, and the three-way INNER chain join
    on (ck, b) is exactly the filter n_s > 0 AND n_r > 0 AND n_c > 0
    (a cell survives the chain iff present in all three legs, and for
    surviving cells each leg's moments equal the conditional sums).
    Before: 3 lineitem + 3 orders + 3 part scans, two (ck, b)
    sort-merge joins (18 scan nodes, 22 exchanges at sf0.1); after:
    one scan of each table and zero cell-grain joins — the fact is
    read ONCE (pinned at 1 in tests/test_plans.py; the year-1997
    orders filter is year(o_orderdate), which parquet cannot prune, so
    each removed orders leg was a full scan).

    Scale/skew shape (round-10 rewrite, caught by the FIRST --skew run
    of this head): the fan-out product S×R×C per (customer, brand) is
    the CUBE of a hot customer's per-brand line counts — the planted
    whale (25% of orders) made one task materialize ~10⁹ joined rows
    and pinned a core for >12 minutes. The triple relation is never
    materialized now: each leg aggregates to (customer, brand) grain
    FIRST — count, Σq, Σq² per cell, map-side combinable — and the
    chain join carries ONE row per cell per leg; the per-brand stats
    of the fan-out product derive arithmetically (for the sales leg,
    Σ_triples q = Σ_cells s1ₛ·n_r·n_c and Σ_triples q² =
    Σ_cells s2ₛ·n_r·n_c; symmetrically for the other legs;
    N = Σ n_s·n_r·n_c), which equals the materialized form EXACTLY —
    integer arithmetic throughout (quantities are integer-valued, so
    all moments are exact at scale 0; per-cell products stay under
    2⁶³ until a single customer exceeds ~10⁶ lines per brand per leg,
    a documented bound far past any plausible whale). The mean/stdev
    chains divide the same exact operands as the oracle's materialized
    form — hash-exact. HAVING N ≥ 2 gates the sample-stdev
    denominator. Whale cost after the rewrite: one (ck, b) cell row —
    the skew rehearsal's planted whale is now ~free."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .select(
            "o_orderkey", "o_custkey", F.quarter("o_orderdate").alias("_qtr")
        )
    )
    q = F.round(F.col("l_quantity")).cast("long")
    in_s = F.col("_qtr").isin(1, 2)
    in_r = in_s & (F.col("l_returnflag") == "R")
    in_c = F.col("_qtr").isin(3, 4)

    def leg_aggs(cond, tag):
        return [
            F.count(F.when(cond, F.lit(1))).alias(f"n_{tag}"),
            F.sum(F.when(cond, q)).alias(f"s1_{tag}"),
            F.sum(F.when(cond, q * q)).alias(f"s2_{tag}"),
        ]

    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("p_brand").alias("b"))
        .agg(*leg_aggs(in_s, "s"), *leg_aggs(in_r, "r"), *leg_aggs(in_c, "c"))
        .filter(
            (F.col("n_s") > 0) & (F.col("n_r") > 0) & (F.col("n_c") > 0)
        )
    )
    n_s, n_r, n_c = F.col("n_s"), F.col("n_r"), F.col("n_c")
    brand = (
        cells.groupBy(F.col("b").alias("p_brand"))
        .agg(
            F.sum(n_s * n_r * n_c).alias("N"),
            F.sum(F.col("s1_s") * n_r * n_c).alias("S1s"),
            F.sum(F.col("s2_s") * n_r * n_c).alias("S2s"),
            F.sum(F.col("s1_r") * n_s * n_c).alias("S1r"),
            F.sum(F.col("s2_r") * n_s * n_c).alias("S2r"),
            F.sum(F.col("s1_c") * n_s * n_r).alias("S1c"),
            F.sum(F.col("s2_c") * n_s * n_r).alias("S2c"),
        )
        .filter(F.col("N") >= 2)
    )

    def stats(s1, s2, mean_alias, std_alias):
        # identical double chains to canonical.sql_davg/sql_dstddev_samp
        # over the materialized fan-out: s1/s2 here ARE those fixsums
        nd = F.col("N").cast("double")
        s1d = F.col(s1).cast("double")
        s2d = F.col(s2).cast("double")
        return [
            (s1d / nd).alias(mean_alias),
            F.sqrt((s2d - s1d * s1d / nd) / (nd - F.lit(1.0))).alias(std_alias),
        ]

    return (
        brand.select(
            "p_brand",
            F.col("N").alias("n_triples"),
            *stats("S1s", "S2s", "s_qty_mean", "s_qty_std"),
            *stats("S1r", "S2r", "r_qty_mean", "r_qty_std"),
            *stats("S1c", "S2c", "c_qty_mean", "c_qty_std"),
        )
        .orderBy("p_brand")
    )


@query(
    "ds_tpcds_q92_excess_discount",
    oracle="""
    WITH j AS (
      SELECT l_partkey,
             EXTRACT(month FROM o_orderdate) AS mon,
             CAST(ROUND((l_extendedprice * l_discount) * 1000000.0)
                  AS BIGINT) AS micro
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE EXTRACT(year FROM o_orderdate) = 1997
    ),
    g AS (
      SELECT mon, micro,
             SUM(micro) OVER (PARTITION BY l_partkey) AS s,
             COUNT(*)   OVER (PARTITION BY l_partkey) AS n
      FROM j
    )
    SELECT CAST(mon AS INTEGER) AS mon,
           COUNT(*) AS n_lines,
           CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / 1000000.0
             AS excess_total
    FROM g
    WHERE CAST(micro AS DOUBLE) / 1000000.0
            > 1.3 * ((CAST(s AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))
    GROUP BY mon
    ORDER BY mon
    """,
    tags=("tpcds", "scalar-subquery", "window", "excess"),
)
def ds_tpcds_q92_excess_discount(spark, sf_dir):
    """TPC-DS Q92: excess discount — lines whose discount amount exceeds
    1.3× the AVERAGE discount amount for the same item over the window
    (Q92's correlated scalar subquery `ws_ext_discount_amt > 1.3 *
    (SELECT AVG(...) WHERE same item)`), reported as the monthly count
    and total of qualifying discount. The correlated subquery is
    replanned as a WINDOW average over the item partition: the
    join-back form (aggregate per item, rejoin to lines) re-executes
    the fact subtree — 2 scans, the Q89-class defect — while the
    window form scans ONCE (pinned at 1 in tests/test_plans.py) and
    its state per partition is one running (sum, count).

    Determinism: per-line discount micro-units are exact BIGINTs; the
    window SUM/COUNT are exact; the average and the 1.3× gate are the
    same scalar double chain on identical operands in both engines, so
    the qualifying SET is identical and the fixed-point total
    hash-matches. Scale shape: one fact scan, one hash exchange on
    l_partkey for the window (partition count = |parts|, balanced),
    then a 12-row monthly aggregate — no join at all."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .select("o_orderkey", F.month("o_orderdate").alias("mon"))
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_partkey",
        "mon",
        F.round((F.col("l_extendedprice") * F.col("l_discount")) * F.lit(1e6))
        .cast("long")
        .alias("micro"),
    )
    w = Window.partitionBy("l_partkey")
    g = j.withColumn("s", F.sum("micro").over(w)).withColumn(
        "n", F.count(F.lit(1)).over(w)
    )
    avg_d = (F.col("s").cast("double") / F.lit(1e6)) / F.col("n").cast("double")
    return (
        g.filter(F.col("micro").cast("double") / F.lit(1e6) > F.lit(1.3) * avg_d)
        .groupBy("mon")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("micro").cast("double") / F.lit(1e6)).alias("excess_total"),
        )
        .orderBy("mon")
    )


@query(
    "ds_tpcds_q58_three_channel_agreement",
    oracle="""
    WITH g AS (
      SELECT p_brand, o_orderpriority AS ch,
             CAST(CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount))
                    * 1000000.0) AS BIGINT)) AS BIGINT) AS BIGINT) AS m
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part   ON l_partkey = p_partkey
      WHERE EXTRACT(year FROM o_orderdate) = 1997
        AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      GROUP BY p_brand, ch
    ),
    wide AS (
      SELECT p_brand,
             CAST(SUM(CASE WHEN ch = '1-URGENT' THEN m END) AS BIGINT) AS m1,
             CAST(SUM(CASE WHEN ch = '2-HIGH' THEN m END) AS BIGINT) AS m2,
             CAST(SUM(CASE WHEN ch = '3-MEDIUM' THEN m END) AS BIGINT) AS m3
      FROM g GROUP BY p_brand
    )
    SELECT p_brand,
           CAST(m1 AS DOUBLE) / 1000000.0 AS urgent_rev,
           CAST(m2 AS DOUBLE) / 1000000.0 AS high_rev,
           CAST(m3 AS DOUBLE) / 1000000.0 AS medium_rev,
           CAST(m1 + m2 + m3 AS DOUBLE) / 3.0 / 1000000.0 AS avg_rev
    FROM wide
    WHERE m1 IS NOT NULL AND m2 IS NOT NULL AND m3 IS NOT NULL
      AND CAST(m1 AS DOUBLE) BETWEEN 0.85 * (CAST(m1 + m2 + m3 AS DOUBLE) / 3.0)
                                 AND 1.15 * (CAST(m1 + m2 + m3 AS DOUBLE) / 3.0)
      AND CAST(m2 AS DOUBLE) BETWEEN 0.85 * (CAST(m1 + m2 + m3 AS DOUBLE) / 3.0)
                                 AND 1.15 * (CAST(m1 + m2 + m3 AS DOUBLE) / 3.0)
      AND CAST(m3 AS DOUBLE) BETWEEN 0.85 * (CAST(m1 + m2 + m3 AS DOUBLE) / 3.0)
                                 AND 1.15 * (CAST(m1 + m2 + m3 AS DOUBLE) / 3.0)
    ORDER BY p_brand
    """,
    tags=("tpcds", "multi-channel", "agreement", "pivot"),
)
def ds_tpcds_q58_three_channel_agreement(spark, sf_dir):
    """TPC-DS Q58: three-channel revenue agreement — items whose revenue
    in each of three channels sits within a band of the three-channel
    average (Q58's ss_item_rev BETWEEN 0.9·avg AND 1.1·avg triple,
    applied across store/catalog/web). Channels map to the three
    equal-prior order priorities (1-URGENT / 2-HIGH / 3-MEDIUM — equal
    expected share, so agreement is a property of the data rather than
    structurally impossible; band widened to ±15%, sized so BOTH
    oracle scales return rows: 1 brand at sf0.001, 16 at sf0.01).

    The spec phrases this as three per-channel CTEs three-way-joined
    at item grain; the Spark-first form computes ONE (brand, channel)
    aggregate and PIVOTs with conditional sums (the Q4 pattern) — one
    fact scan (pinned) instead of three, and the agreement screen runs
    on the pivoted brand-grain relation (25 rows at any SF).

    Determinism: per-cell revenue is an exact micro-unit BIGINT all
    the way through the pivot (the conditional SUM moves integers, not
    doubles); the band compare and the reported averages are identical
    scalar double chains on those exact integers in both engines —
    hash-exact with no rounding convention needed."""
    li = t(spark, sf_dir, "lineitem")
    o = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.year("o_orderdate") == 1997)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        )
        .select("o_orderkey", F.col("o_orderpriority").alias("ch"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "ch")
        .agg(
            F.sum(
                F.round(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    * F.lit(1e6)
                ).cast("long")
            ).alias("m")
        )
    )

    def cell(ch):
        return F.sum(F.when(F.col("ch") == ch, F.col("m"))).cast("long")

    wide = g.groupBy("p_brand").agg(
        cell("1-URGENT").alias("m1"),
        cell("2-HIGH").alias("m2"),
        cell("3-MEDIUM").alias("m3"),
    )
    s_d = (F.col("m1") + F.col("m2") + F.col("m3")).cast("double")
    avg3 = s_d / F.lit(3.0)

    def within(m):
        md = F.col(m).cast("double")
        return (md >= F.lit(0.85) * avg3) & (md <= F.lit(1.15) * avg3)

    return (
        wide.filter(
            F.col("m1").isNotNull()
            & F.col("m2").isNotNull()
            & F.col("m3").isNotNull()
            & within("m1")
            & within("m2")
            & within("m3")
        )
        .select(
            "p_brand",
            (F.col("m1").cast("double") / F.lit(1e6)).alias("urgent_rev"),
            (F.col("m2").cast("double") / F.lit(1e6)).alias("high_rev"),
            (F.col("m3").cast("double") / F.lit(1e6)).alias("medium_rev"),
            (s_d / F.lit(3.0) / F.lit(1e6)).alias("avg_rev"),
        )
        .orderBy("p_brand")
    )

"""Third scalar/aggregate function batch: boolean-logic aggregates
(count_if / bool_and / bool_or) and the trigonometric scalar family.

Both map 1:1 to JVM built-ins (whole-stage codegen, no Python on the hot
path). Trig outputs are rounded to 9 decimal digits on BOTH engines:
per-row libm vs java.lang.Math can differ in the last ulp for
transcendentals, and explicit rounding declares the comparison precision
instead of relying on the harness default.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t


@query(
    "agg_bool_family",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT_IF(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
           BOOL_AND(o_totalprice > 0) AS all_positive,
           BOOL_OR(o_totalprice > 400000) AS any_jumbo,
           CAST(COUNT_IF(o_totalprice BETWEEN 100000 AND 200000) AS BIGINT) AS n_mid
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("aggregate", "boolean", "count_if"),
)
def agg_bool_family(spark, sf_dir):
    """Boolean-logic aggregates per order status: conditional counting
    (count_if), universal/existential quantifiers over a group (bool_and
    / bool_or). All exact integer/boolean results — no float hazard — and
    all computed in one hash-aggregate pass with map-side partials."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
            F.count_if(F.col("o_totalprice").between(100000, 200000)).alias("n_mid"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "fn_trig_family",
    oracle="""
    SELECT n_nationkey,
           ROUND(SIN(n_nationkey * 0.1), 9) AS sin_v,
           ROUND(COS(n_nationkey * 0.1), 9) AS cos_v,
           ROUND(TAN(n_nationkey * 0.1), 9) AS tan_v,
           ROUND(ATAN(n_nationkey * 0.1), 9) AS atan_v,
           ROUND(ATAN2(CAST(n_nationkey AS DOUBLE), 7.0), 9) AS atan2_v,
           ROUND(COT(n_nationkey * 0.1 + 1.0), 9) AS cot_v,
           ROUND(CBRT(CAST(n_nationkey AS DOUBLE)), 9) AS cbrt_v,
           ROUND(DEGREES(n_nationkey * 0.1), 9) AS deg_v,
           ROUND(RADIANS(CAST(n_nationkey AS DOUBLE)), 9) AS rad_v
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("function", "math", "trig"),
)
def fn_trig_family(spark, sf_dir):
    """Trigonometric scalar family over the nation key domain: sin, cos,
    tan, atan, atan2, cot, cbrt, degrees, radians. Each is a single JVM
    intrinsic inside whole-stage codegen. Hyperbolics are omitted from
    the declared surface because the oracle engine lacks them natively;
    they remain available via exp() composition."""
    n = t(spark, sf_dir, "nation")
    x = F.col("n_nationkey") * 0.1
    kd = F.col("n_nationkey").cast("double")
    return n.select(
        "n_nationkey",
        F.round(F.sin(x), 9).alias("sin_v"),
        F.round(F.cos(x), 9).alias("cos_v"),
        F.round(F.tan(x), 9).alias("tan_v"),
        F.round(F.atan(x), 9).alias("atan_v"),
        F.round(F.atan2(kd, F.lit(7.0)), 9).alias("atan2_v"),
        F.round(F.cot(x + 1.0), 9).alias("cot_v"),
        F.round(F.cbrt(kd), 9).alias("cbrt_v"),
        F.round(F.degrees(x), 9).alias("deg_v"),
        F.round(F.radians(kd), 9).alias("rad_v"),
    ).orderBy("n_nationkey")


@query(
    "join_null_safe_keys",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS k,
             o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    b AS (
      SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                  ELSE list_extract(['F','O','P'], CAST(n_nationkey % 3 AS INTEGER) + 1)
             END AS k,
             n_nationkey
      FROM nation
    )
    SELECT a.k AS status_key, COUNT(*) AS n_pairs,
           CAST(SUM(b.n_nationkey) AS BIGINT) AS nation_sum
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    ORDER BY a.k NULLS FIRST
    """,
    tags=("join", "null-safe"),
)
def join_null_safe_keys(spark, sf_dir):
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension the
    plain equi-join family can't express. Spark still plans this as a
    hash-partitioned equi-join (keys wrapped in a null-coalescing
    struct), NOT a nested loop, so the scale posture is the same as any
    shuffle join; NULL becomes one join group, which at skewed scale is
    handled like any hot key (AQE skew split)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 2 == 0)
    a = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("k"),
        "o_totalprice",
    )
    n = t(spark, sf_dir, "nation")
    statuses = F.array(F.lit("F"), F.lit("O"), F.lit("P"))
    b = n.select(
        F.when(F.col("n_nationkey") % 5 == 0, F.lit(None))
        .otherwise(F.element_at(statuses, (F.col("n_nationkey") % 3).cast("int") + 1))
        .alias("kb"),
        "n_nationkey",
    )
    return (
        a.join(b, a.k.eqNullSafe(b.kb))
        .groupBy(a.k.alias("status_key"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("n_nationkey").alias("nation_sum"),
        )
        .orderBy(F.col("status_key").asc_nulls_first())
    )


@query(
    "agg_weighted_stats",
    oracle="""
    SELECT l_returnflag,
           (CAST(SUM(CAST(ROUND(l_quantity * l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
            / 100.0)
           / (CAST(SUM(CAST(ROUND(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT)
              / 1000000.0) AS wavg_price,
           CAST(SUM(CAST(ROUND(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT) / 1000000.0
             AS total_weight
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "weighted"),
)
def agg_weighted_stats(spark, sf_dir):
    """Quantity-weighted mean price per return flag — the weighted
    aggregate every sample-weighted training pipeline needs. Both the
    weighted sum and the weight total use fixed-point integer
    accumulation (order-independent, canonical.py), so the final double
    division is a single identical rounding in both engines."""
    li = t(spark, sf_dir, "lineitem")

    def fix(col, scale):
        shift = float(10**scale)
        return F.sum(F.round(col * F.lit(shift)).cast("long")).cast("double") / F.lit(shift)

    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (fix(q * p, 2) / fix(q, 6)).alias("wavg_price"),
            fix(q, 6).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )

"""Tolerance checks for the approximate operators (SURVEY.md §2B:
"tolerance check vs exact, not hash").

HLL++ distinct counts must land within a few relative standard deviations
of the exact answer; approx percentiles must land within the declared
rank-error window of the exact distribution.
"""

import pyspark.sql.functions as F

from hadoop_fs_ceph_spark.registry import load_all
from hadoop_fs_ceph_spark.tables import t

SPECS = load_all()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    rows = SPECS["agg_approx_count_distinct"].fn(spark, sf_dir).collect()
    exact = {
        r.l_returnflag: r.n
        for r in t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert {r.l_returnflag for r in rows} == set(exact)
    for r in rows:
        assert r.exact_orders == exact[r.l_returnflag]
        assert r.within_tolerance, f"{r.l_returnflag}: approx outside 3σ"


def test_percentile_approx_within_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=a) guarantees rank error <= n/a; check
    the estimate sits between the exact values at rank +/- that window."""
    li = t(spark, sf_dir, "lineitem")
    est = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.9, 1000).alias("p90"),
    ).collect()[0]
    vals = sorted(r[0] for r in li.select("l_extendedprice").collect())
    n = len(vals)
    for q, got in ((0.5, est.p50), (0.9, est.p90)):
        rank = int(q * (n - 1))
        err = max(n // 1000, 1) + 1
        lo, hi = vals[max(rank - err, 0)], vals[min(rank + err, n - 1)]
        assert lo <= got <= hi, f"q={q}: {got} outside [{lo}, {hi}]"


def test_hll_sketch_merge_matches_exact(spark, sf_dir):
    """Merged per-group sketches must estimate the global distinct within
    HLL error (lgK=12 default → ~1.6% rsd; allow 5%)."""
    est = SPECS["agg_hll_sketch_merge"].fn(spark, sf_dir).collect()[0]
    o = t(spark, sf_dir, "orders")
    exact = o.select("o_custkey").distinct().count()
    assert est.exact_customers == exact
    assert est.within_tolerance
    assert est.total_rows == o.count()

"""Second scalar-function wave: cryptographic digests, bitwise ops,
date-spine generation, and edit distance.

All row-level expressions here are deterministic text/integer functions —
identical outputs in Spark and DuckDB with no float canonicalization
needed. The only cross-engine spelling differences are named per query
(``^`` vs ``xor()``, ``sequence`` vs ``generate_series``, DuckDB's
``'g'`` regexp flag elsewhere).

Reference parity: the connector ships no expression library (it moves
bytes, `CephRgwInputStream.java:103-120`); this is engine-layer surface
per SURVEY.md §2B scalar-function rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t


@query(
    "fn_hash_family",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS md5_hex,
           sha256(c_name) AS sha256_hex,
           md5(c_name || '|' || c_mktsegment) AS md5_composite
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("function", "hash"),
)
def fn_hash_family(spark, sf_dir):
    """Cryptographic digest functions over strings — content-hash dedup's
    primitive (`sha2` is what dedup_exact_content builds on). Both engines
    emit lowercase hex for identical byte input, so digests hash-match
    directly. Map-only; at scale this is the cheapest possible pass."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("md5_hex"),
        F.sha2("c_name", 256).alias("sha256_hex"),
        F.md5(F.concat_ws("|", "c_name", "c_mktsegment")).alias("md5_composite"),
    ).orderBy("c_custkey")


@query(
    "fn_bitwise_family",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           xor(o_orderkey, 21845) AS bxor,
           (o_orderkey & 15) << 2 AS shl,
           o_orderkey >> 3 AS shr,
           bit_count(o_orderkey) AS popcount
    FROM orders
    WHERE o_orderkey % 7 = 0
    ORDER BY o_orderkey
    """,
    tags=("function", "bitwise"),
)
def fn_bitwise_family(spark, sf_dir):
    """Bitwise operator family on int64 keys — the machinery under hash
    partitioning, LSH band packing, and bloom-filter addressing. Spark
    spells XOR ``^`` where DuckDB uses ``xor()``; all results are exact
    integers."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("band"),
        F.expr("o_orderkey | 4096").alias("bor"),
        F.expr("o_orderkey ^ 21845").alias("bxor"),
        F.expr("shiftleft(o_orderkey & 15, 2)").alias("shl"),
        F.expr("shiftright(o_orderkey, 3)").alias("shr"),
        F.expr("bit_count(o_orderkey)").alias("popcount"),
    ).orderBy("o_orderkey")


@query(
    "fn_sequence_spine",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '1997-01-01',
                                    TIMESTAMP '1997-03-31',
                                    INTERVAL 1 DAY)) AS day
    ),
    daily AS (
      SELECT date_trunc('day', o_orderdate) AS day, COUNT(*) AS cnt
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s.day, COALESCE(d.cnt, 0) AS n_orders
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    ORDER BY s.day
    """,
    tags=("function", "sequence", "spine"),
)
def fn_sequence_spine(spark, sf_dir):
    """Dense date spine via ``sequence`` + ``explode`` (DuckDB:
    ``generate_series`` + ``unnest``) left-joined to daily order counts so
    zero-activity days appear explicitly — the standard gap-free
    time-series frame. The spine is generated, not scanned, and is tiny
    (one row per day), so it broadcasts; the fact side aggregates BEFORE
    the join, keeping the outer join at spine-size × 1."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(timestamp'1997-01-01', timestamp'1997-03-31', interval 1 day)"
            )
        ).alias("day")
    )
    return (
        spine.join(daily, "day", "left_outer")
        .select("day", F.coalesce("cnt", F.lit(0)).alias("n_orders"))
        .orderBy("day")
    )


@query(
    "fn_edit_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(lower(p_name), lower(p_type)) AS lev_name_type,
           levenshtein(p_brand, 'Brand#1') AS lev_brand
    FROM part
    WHERE p_size <= 10
    ORDER BY p_partkey
    """,
    tags=("function", "string", "distance"),
)
def fn_edit_distance(spark, sf_dir):
    """Levenshtein edit distance — the character-level near-dup metric
    (complements token-level Jaccard in the dedup family). Exact integer
    DP in both engines. Scale note: edit distance is O(len²) per pair, so
    production runs it only on LSH-blocked candidate pairs, never
    all-pairs; here it runs row-local against fixed references."""
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return p.select(
        "p_partkey",
        F.levenshtein(F.lower("p_name"), F.lower("p_type")).alias("lev_name_type"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("lev_brand"),
    ).orderBy("p_partkey")


@query(
    "fn_unpivot_stack",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    WHERE l_orderkey % 50 = 0
    ORDER BY l_orderkey, l_linenumber, metric
    """,
    tags=("function", "unpivot", "reshape"),
)
def fn_unpivot_stack(spark, sf_dir):
    """Wide→long reshape (unpivot/melt) of four lineitem measures into
    (metric, value) rows via ``stack`` — the transpose primitive feature
    stores and metric pipelines lean on. The oracle spells it as the
    equivalent UNION ALL. Unpivot is a zero-shuffle Expand: output rows
    = 4× input, produced map-side; the selective filter is pushed below
    the expand by Catalyst so only matching rows quadruple."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax) AS (metric, value)"
        ),
    ).orderBy("l_orderkey", "l_linenumber", "metric")

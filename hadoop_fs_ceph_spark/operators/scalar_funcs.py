"""Scalar function families: string, date/time, math, conditional, cast.

All built-in ``pyspark.sql.functions`` (JVM-side, whole-stage codegen) —
never Python UDFs. Cross-engine parity notes live next to each use:

* ``regexp_replace``: Spark replaces all matches; DuckDB needs the ``'g'``
  flag.
* ``round(double, s)``: Spark rounds the shortest decimal repr (HALF_UP on
  BigDecimal.valueOf), DuckDB rounds the binary value — they agree only
  when ``s`` exceeds the value's actual decimal precision or the value is
  tie-free at scale ``s``; used accordingly.
* libm transcendentals (exp/ln/pow) may differ by 1 ulp between the JVM
  and libstdc++ — results are rounded at 1e-6 on bounded arguments.
* ``sign``: DuckDB returns int, Spark double → cast explicitly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t


@query(
    "fn_string_family",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 5) AS name_head,
           TRIM('  ' || p_name || ' ') AS name_trim,
           p_brand || ':' || p_type AS brand_type,
           CONCAT_WS('-', p_brand, p_type, CAST(p_size AS VARCHAR)) AS brand_key,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
           REPLACE(p_name, ' ', '_') AS name_snake,
           INSTR(p_name, 'red') AS red_pos,
           split_part(p_name, ' ', 1) AS first_word,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g') AS name_devoweled
    FROM part
    """,
    tags=("function", "string"),
)
def fn_string_family(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.concat_ws("-", "p_brand", "p_type", F.col("p_size").cast("string")).alias("brand_key"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.instr("p_name", "red").alias("red_pos"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devoweled"),
    )


@query(
    "fn_datetime_family",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mon,
           DAY(o_orderdate) AS dom,
           HOUR(o_orderdate) AS hr,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           epoch_us(o_orderdate) AS order_us,
           CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS order_epoch_s
    FROM orders WHERE o_orderkey % 50 = 3
    """,
    tags=("function", "datetime"),
)
def fn_datetime_family(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 3)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.hour("o_orderdate").alias("hr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.to_date("o_orderdate").alias("order_date"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(1000000))
        .cast("long")
        .alias("order_epoch_s"),
    )


@query(
    "fn_math_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           l_quantity * l_quantity AS qty_sq,
           CAST(POW(l_quantity, 2) AS DOUBLE) AS qty_pow2,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS key_pmod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem WHERE l_orderkey % 40 = 11
    """,
    tags=("function", "math"),
)
def fn_math_family(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 11)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.pow("l_quantity", F.lit(2)).alias("qty_pow2"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_pmod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "fn_conditional_family",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS bal_bucket,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           CASE WHEN c_nationkey % 3 = 0 THEN NULL ELSE c_nationkey END AS nk_or_null,
           COALESCE(CASE WHEN c_nationkey % 3 = 0 THEN NULL ELSE c_nationkey END, -1) AS nk_filled,
           CASE WHEN c_acctbal > 9000 THEN 'vip' ELSE 'std' END AS tier
    FROM customer
    """,
    tags=("function", "conditional"),
)
def fn_conditional_family(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    nk_or_null = F.when(F.col("c_nationkey") % 3 == 0, None).otherwise(F.col("c_nationkey"))
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        nk_or_null.alias("nk_or_null"),
        F.coalesce(nk_or_null, F.lit(-1)).alias("nk_filled"),
        F.expr("if(c_acctbal > 9000, 'vip', 'std')").alias("tier"),
    )


@query(
    "fn_cast_family",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS INTEGER) AS key_int,
           CAST(o_orderkey AS DOUBLE) AS key_double,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_roundtrip,
           CAST('123.5' AS DOUBLE) AS parsed_double,
           CAST('42' AS BIGINT) AS parsed_long,
           CAST(o_orderdate AS DATE) AS date_cast,
           CAST(CAST('2000-06-15 12:30:00' AS TIMESTAMP) AS DATE) AS literal_ts_date
    FROM orders WHERE o_orderkey % 100 = 42
    """,
    tags=("function", "cast"),
)
def fn_cast_family(spark, sf_dir):
    """Casts across long/int/double/string/timestamp/decimal(12,2).
    o_totalprice carries exactly 2 decimals, so the decimal(12,2) cast is
    exact in both engines (no rounding-mode divergence)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 42)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("int").alias("key_int"),
        F.col("o_orderkey").cast("double").alias("key_double"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price_dec"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("price_roundtrip"),
        F.lit("123.5").cast("double").alias("parsed_double"),
        F.lit("42").cast("bigint").alias("parsed_long"),
        F.col("o_orderdate").cast("date").alias("date_cast"),
        F.lit("2000-06-15 12:30:00").cast("timestamp").cast("date").alias("literal_ts_date"),
    )


@query(
    "fn_na_cleaning",
    oracle="""
    WITH dirty AS (
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'P') AS status,
             CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END AS price
      FROM orders
    )
    SELECT o_orderkey,
           COALESCE(status, 'UNKNOWN') AS status,
           COALESCE(price, 0.0) AS price
    FROM dirty
    WHERE NOT (status IS NULL AND price IS NULL)
      AND o_orderkey % 7 = 0
    """,
    tags=("function", "null", "cleaning"),
)
def fn_na_cleaning(spark, sf_dir):
    """Data-cleaning surface (DataFrameNaFunctions): inject NULLs, then
    na.drop(how='all' over the data columns) + na.fill with per-column
    defaults — the standardize-missing-values pass every ingest runs."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    dirty = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status"),
        F.when(F.col("o_totalprice") < 50000, None)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    return dirty.na.drop(how="all", subset=["status", "price"]).na.fill(
        {"status": "UNKNOWN", "price": 0.0}
    )


@query(
    "fn_posexplode_outer",
    oracle="""
    WITH hits AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(32)), x -> x = 'spark' OR x = 'hash') AS h
      FROM documents WHERE doc_id % 6 = 1
    ),
    grid AS (
      SELECT doc_id,
             CASE WHEN len(h) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE h END AS h2
      FROM hits
    ),
    z AS (
      SELECT doc_id,
             unnest(generate_series(1, len(h2))) AS pos1,
             unnest(h2) AS hit
      FROM grid
    )
    SELECT doc_id,
           CASE WHEN hit IS NULL THEN NULL ELSE pos1 - 1 END AS pos,
           hit
    FROM z
    """,
    tags=("function", "array", "explode", "outer"),
)
def fn_posexplode_outer(spark, sf_dir):
    """posexplode_outer: flatten with positions, KEEPING rows whose array
    is empty (as a NULL row) — the outer variant every flatten-then-join
    pipeline needs so empty documents don't silently vanish."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 6 == 1)
    hits = F.filter(
        F.split("text", " "), lambda x: (x == "spark") | (x == "hash")
    )
    return d.select("doc_id", hits.alias("h")).select(
        "doc_id", F.posexplode_outer("h").alias("pos", "hit")
    )


@query(
    "fn_try_family",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           TRY_CAST(event_type AS DOUBLE) AS bad_double,
           value / NULLIF(CAST(event_id % 5 AS DOUBLE), 0.0) AS safe_div
    FROM events WHERE event_id % 11 = 7
    """,
    tags=("function", "try", "null"),
)
def fn_try_family(spark, sf_dir):
    """Error-safe evaluation: try_cast returns NULL instead of raising
    under ANSI semantics (malformed input is data, not an exception at
    100 TB), and try_divide maps division-by-zero to NULL."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 7)
    return e.select(
        "event_id",
        F.try_to_number(F.get_json_object("props", "$.k"), F.lit("999999")).cast("int").alias("k_int"),
        F.col("event_type").try_cast("double").alias("bad_double"),
        F.try_divide(F.col("value"), (F.col("event_id") % 5).cast("double")).alias("safe_div"),
    )

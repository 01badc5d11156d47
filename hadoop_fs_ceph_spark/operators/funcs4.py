"""Fourth function batch: calendar-arithmetic datetime family and
bigram frequency mining over the documents corpus.

Datetime parity notes (verified empirically, both engines):
* ``last_day`` / ``date_trunc('week'|'quarter')`` / ``EXTRACT(week)`` /
  ``dayofyear`` agree exactly.
* ``dayofweek``: Spark is 1-based (Sunday=1), DuckDB 0-based (Sunday=0)
  — the oracle adds 1.
* ``add_months``: DuckDB spells it ``d + TO_MONTHS(n)`` (returns a
  timestamp — cast back to date).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.registry import query
from hadoop_fs_ceph_spark.tables import t


@query(
    "fn_calendar_family",
    oracle="""
    SELECT o_orderkey,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(DATE_TRUNC('week', o_orderdate) AS DATE) AS week_start,
           CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS quarter_start,
           CAST(EXTRACT(week FROM o_orderdate) AS INTEGER) AS iso_week,
           CAST(DAYOFWEEK(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow,
           CAST(DAYOFYEAR(CAST(o_orderdate AS DATE)) AS INTEGER) AS doy,
           CAST(CAST(o_orderdate AS DATE) + TO_MONTHS(3) AS DATE) AS plus_quarter,
           CAST(EXTRACT(year FROM o_orderdate) * 12
                + EXTRACT(month FROM o_orderdate) - (1992 * 12 + 1)
                AS INTEGER) AS months_since_epoch
    FROM orders
    WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
    tags=("function", "datetime", "calendar"),
)
def fn_calendar_family(spark, sf_dir):
    """Calendar arithmetic on order dates: month-end snapping
    (last_day), ISO week/quarter truncation, ISO week number,
    day-of-week / day-of-year, month shifting (add_months), and a
    month-index since the corpus epoch (the portable replacement for
    fractional months_between, whose day-fraction semantics are
    engine-specific). Pure JVM date intrinsics inside codegen; the
    modulo sample keeps oracle rows bounded at any SF."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("week_start"),
        F.to_date(F.date_trunc("quarter", "o_orderdate")).alias("quarter_start"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.add_months(d, 3).alias("plus_quarter"),
        (
            F.year(d) * F.lit(12) + F.month(d) - F.lit(1992 * 12 + 1)
        ).cast("int").alias("months_since_epoch"),
    ).orderBy("o_orderkey")


@query(
    "text_bigram_freq",
    oracle="""
    WITH grams AS (
      SELECT unnest(list_transform(
               range(1, len(l)), i -> l[i] || ' ' || l[i + 1]
             )) AS bigram
      FROM (SELECT string_split(text, ' ') AS l FROM documents)
    )
    SELECT bigram, COUNT(*) AS freq
    FROM grams
    GROUP BY bigram
    ORDER BY freq DESC, bigram
    LIMIT 50
    """,
    tags=("text", "ngram", "higher-order"),
)
def text_bigram_freq(spark, sf_dir):
    """Top-50 corpus bigrams: tokenize once per document, build the
    bigram list with a higher-order transform over an index sequence
    (no explode-then-self-join — the classic quadratic trap), then
    explode and count. All JVM-side; per-document work is linear in
    token count, the shuffle carries (bigram, partial count) pairs from
    map-side combine, and the top-50 is TakeOrderedAndProject with a
    total (freq, bigram) key.

    The token array is bound ONCE per document as a lambda variable —
    with the split() inlined into the bigram lambda, every element_at
    probe re-split the full text (no common-subexpression elimination
    inside higher-order lambdas → O(tokens²) re-splits per doc;
    measured 3.2 -> 0.45 s at sf0.1, identical output)."""
    docs = t(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    grams = F.transform(
        F.array(tokens),
        lambda toks: F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    )[0]
    return (
        docs.filter(F.size(tokens) >= 2)
        .select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "bigram")
        .limit(50)
    )


@query(
    "fn_string2_family",
    oracle="""
    SELECT c_custkey,
           REPEAT(LEFT(c_name, 2), 3) AS rep2,
           REVERSE(c_mktsegment) AS seg_rev,
           ASCII(c_name) AS first_code,
           CHR(65 + CAST(c_custkey % 26 AS INTEGER)) AS letter,
           LEFT(c_name, 8) AS name_l8,
           RIGHT(c_name, 4) AS name_r4,
           CAST(POSITION('0' IN c_name) AS INTEGER) AS zero_at,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS seg_folded,
           STARTS_WITH(c_name, 'Customer') AS is_cust,
           ENDS_WITH(c_mktsegment, 'RY') AS seg_ry
    FROM customer
    WHERE c_custkey % 53 = 0
    ORDER BY c_custkey
    """,
    tags=("function", "string"),
)
def fn_string2_family(spark, sf_dir):
    """Second string-function wave: repeat, reverse, ascii/chr codec,
    left/right slicing, substring position, character translation, and
    prefix/suffix predicates. Every member is a JVM intrinsic with an
    exact 1:1 oracle equivalent — no collation or locale dependence on
    ASCII-range fixture data."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 53 == 0)
    return c.select(
        "c_custkey",
        F.repeat(F.left(F.col("c_name"), F.lit(2)), 3).alias("rep2"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.ascii("c_name").alias("first_code"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias("letter"),
        F.left(F.col("c_name"), F.lit(8)).alias("name_l8"),
        F.right(F.col("c_name"), F.lit(4)).alias("name_r4"),
        F.locate("0", F.col("c_name")).alias("zero_at"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_folded"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_cust"),
        F.endswith(F.col("c_mktsegment"), F.lit("RY")).alias("seg_ry"),
    ).orderBy("c_custkey")


@query(
    "fn_format_radix_family",
    oracle="""
    SELECT p_partkey,
           hex(p_partkey) AS key_hex,
           bin(p_partkey % 256) AS key_bin,
           to_base(p_partkey, 16) AS key_base16,
           printf('%s=%d@%05.2f', p_brand, CAST(p_size AS INTEGER), p_retailprice)
             AS label,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           rpad(p_brand, 12, '.') AS brand_padded
    FROM part
    WHERE p_partkey % 41 = 0
    ORDER BY p_partkey
    """,
    tags=("function", "format", "radix"),
)
def fn_format_radix_family(spark, sf_dir):
    """Radix conversion (hex / bin / arbitrary base via conv) and
    printf-style formatting (format_string — same %-spec engine as the
    oracle's printf), plus pad-to-width. All JVM intrinsics. Note
    format_string rejects DECIMAL for %f — the price is double already;
    conv() uppercases like to_base."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 41 == 0)
    return p.select(
        "p_partkey",
        F.hex("p_partkey").alias("key_hex"),
        F.bin(F.col("p_partkey") % 256).alias("key_bin"),
        F.conv(F.col("p_partkey").cast("string"), 10, 16).alias("key_base16"),
        F.format_string(
            "%s=%d@%05.2f",
            F.col("p_brand"),
            F.col("p_size").cast("int"),
            F.col("p_retailprice"),
        ).alias("label"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
    ).orderBy("p_partkey")


@query(
    "fn_url_family",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc/'
               || CAST(doc_id AS VARCHAR) || '?v=' || CAST(n_chars AS VARCHAR)
               || '&u=1' AS url
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]v=([^&]*)', 1) AS v_param
    FROM u
    ORDER BY doc_id
    """,
    tags=("function", "url", "parse"),
)
def fn_url_family(spark, sf_dir):
    """URL component extraction over synthesized document URLs:
    parse_url(HOST / PATH / QUERY key) — the field extraction every
    web-crawl pipeline runs before per-domain dedup or rate analysis.
    The oracle mirrors each component with an anchored regexp (the
    oracle engine has no parse_url), which also pins parse_url's exact
    component boundaries (host excludes the scheme and slash, path
    excludes the query, QUERY 'v' returns the bare value)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"), F.col("lang"),
        F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?v="), F.col("n_chars").cast("string"), F.lit("&u=1"),
    )
    return (
        d.select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
            F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("v")).alias("v_param"),
        )
        .orderBy("doc_id")
    )
